import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ddsketch_ray.functions.diff import corpus_diff


def _mk(df, blocks):
    return rd.from_pandas(df).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 5])
def test_corpus_diff_statuses(ray_session, blocks):
    rng = np.random.default_rng(41)
    old = pd.DataFrame(
        {"doc_id": np.arange(1000, dtype=np.int64), "h": rng.integers(0, 1 << 40, 1000)}
    )
    new = old.copy()
    new = new[new.doc_id % 7 != 3]            # removed
    changed_mask = new.doc_id % 10 == 0
    new.loc[changed_mask, "h"] = new.loc[changed_mask, "h"] + 1  # changed
    added = pd.DataFrame({"doc_id": np.arange(5000, 5100, dtype=np.int64),
                          "h": rng.integers(0, 1 << 40, 100)})
    new = pd.concat([new, added], ignore_index=True)

    out = (
        corpus_diff(_mk(old, blocks), _mk(new, blocks), "doc_id", "h", num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = {}
    oldm = old.set_index("doc_id")["h"].to_dict()
    newm = new.set_index("doc_id")["h"].to_dict()
    for i in set(oldm) | set(newm):
        if i not in newm:
            want[i] = "removed"
        elif i not in oldm:
            want[i] = "added"
        elif oldm[i] != newm[i]:
            want[i] = "changed"
        else:
            want[i] = "same"
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == want
    assert len(out) == len(want)  # one row per id, no dups


def test_corpus_diff_empty_sides(ray_session):
    a = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "h": np.arange(5, dtype=np.int64)})
    empty = pd.DataFrame({"doc_id": np.array([], dtype=np.int64), "h": np.array([], dtype=np.int64)})
    out = corpus_diff(_mk(a, 2), _mk(empty, 1), "doc_id", "h").to_pandas()
    assert (out["status"] == "removed").all() and len(out) == 5
    out2 = corpus_diff(_mk(empty, 1), _mk(a, 2), "doc_id", "h").to_pandas()
    assert (out2["status"] == "added").all() and len(out2) == 5
