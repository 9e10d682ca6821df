"""substring_dedup: brute-force oracle + mode equality + edge cases."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.substring import substring_dedup

W = 4  # test window


def brute(docs: dict[int, str], window: int = W):
    """Pure-python recompute of the documented semantics."""
    toks = {i: [t for t in txt.split() if t] for i, txt in docs.items()}
    grams: dict[tuple, int] = {}
    for i, ts in toks.items():
        for p in range(max(0, len(ts) - window + 1)):
            g = tuple(ts[p : p + window])
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        dup_w = 0
        for p in range(max(0, len(ts) - window + 1)):
            if grams[tuple(ts[p : p + window])] >= 2:
                dup_w += 1
                covered.update(range(p, p + window))
        clean = " ".join(t for q, t in enumerate(ts) if q not in covered)
        out[i] = (len(ts), dup_w, len(covered), clean)
    return out


def _docs_table():
    rep = "alpha beta gamma delta"  # the planted duplicated 4-gram
    docs = {
        0: f"one two three {rep} four five six",
        1: f"zero {rep} nine eight seven",
        # within-doc duplication only:
        2: "p q r s T U V W x y p q r s T U V W",
        3: "short doc",  # < window tokens: no windows
        4: "",  # empty
        5: "unique tokens only here nothing repeats anywhere today",
        # fully duplicated doc (== doc 6b below)
        6: "full dup doc body here exactly",
        7: "full dup doc body here exactly",
    }
    return docs


def _run(mode: str, docs: dict[int, str]):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), type=pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)]),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = (
        substring_dedup(ds, window=W, mode=mode)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_substring_dedup_matches_bruteforce(ray_session, mode):
    docs = _docs_table()
    out = _run(mode, docs)
    exp = brute(docs)
    assert list(out.doc_id) == sorted(docs)
    for _, r in out.iterrows():
        n, dw, cov, clean = exp[r.doc_id]
        assert r.n_tokens == n, (r.doc_id, r.n_tokens, n)
        assert r.dup_windows == dw, (r.doc_id, r.dup_windows, dw)
        assert r.dup_covered == cov, (r.doc_id, r.dup_covered, cov)
        assert r.clean_text == clean, (r.doc_id, r.clean_text, clean)


def test_substring_modes_identical(ray_session):
    # bigger random corpus with planted cross-doc and within-doc dups
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    docs = {}
    for i in range(300):
        words = list(rng.choice(vocab, size=rng.integers(2, 40)))
        docs[i] = " ".join(words)
    plant = "red green blue cyan magenta"
    for i in range(0, 300, 17):
        docs[i] = docs[i] + " " + plant
    a = _run("broadcast", docs)
    b = _run("distributed", docs)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # the planted 5-token run (two 4-gram windows) is flagged everywhere
    planted = a[a.doc_id % 17 == 0]
    assert (planted.dup_windows >= 2).all()


def test_substring_whitespace_normalization(ray_session):
    # tabs/newlines tokenize like spaces; clean_text re-joins with ' '
    docs = {0: "a\tb\nc d e f g h", 1: "a b c d x y z q"}
    out = _run("broadcast", docs)
    exp = brute(docs)
    for _, r in out.iterrows():
        assert r.clean_text == exp[r.doc_id][3]
    assert (out.dup_windows > 0).any()  # 'a b c d' duplicated


def test_substring_dedup_checkpointed_resume(ray_session, tmp_path):
    """Instance stage checkpoints per shard; resume after losing parts
    is identical; output matches the non-checkpointed distributed plan."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from ddsketch_ray.functions.substring import (
        substring_dedup,
        substring_dedup_checkpointed,
    )

    docs = _docs_table()
    # extend with a random tail so shards are non-trivial
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(150)]
    for i in range(8, 80):
        docs[i] = " ".join(rng.choice(vocab, size=rng.integers(2, 30)))
    ids = sorted(docs)
    files = []
    per = max(1, len(ids) // 6)
    for i in range(0, len(ids), per):
        f = str(tmp_path / f"docs-{i:04d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids[i : i + per], type=pa.int64()),
                    "text": pa.array([docs[j] for j in ids[i : i + per]]),
                }
            ),
            f,
        )
        files.append(f)

    out1, job = substring_dedup_checkpointed(
        files, ckpt_dir=str(tmp_path / "ckpt"), run_id="s1", window=W, concurrency=2
    )
    df1 = out1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert job.pending_partitions() == []

    ref = (
        substring_dedup(rd.read_parquet(files), window=W, mode="distributed")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(df1, ref)
    assert (df1.dup_windows > 0).any()

    # lose two instance parts -> resume recomputes only those, output identical
    os.remove(job._part_path(1))
    os.remove(job._part_path(3))
    out2, job2 = substring_dedup_checkpointed(
        files, ckpt_dir=str(tmp_path / "ckpt"), run_id="s1", window=W, concurrency=2
    )
    df2 = out2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df2, df1)
