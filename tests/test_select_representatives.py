"""select_representatives: quality-aware dedup survivor selection.

Oracle = pandas brute force (max score per cluster, ties → min id).
Exercises the cross-block carry walk with adversarial single-cluster
inputs spanning many blocks, plus the fail-fast duplicate/missing-score
contracts.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.dedup import select_representatives


def _brute(assign: pd.DataFrame, scores: pd.DataFrame) -> pd.DataFrame:
    j = assign.merge(scores, on="doc_id")
    j = j.sort_values(["rep", "score", "doc_id"], ascending=[True, False, True])
    win = j.groupby("rep", sort=False).first()["doc_id"].rename("winner")
    out = assign.merge(win, on="rep")
    return (
        pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "rep": out["winner"].astype(np.int64),
                "is_survivor": out["doc_id"] == out["winner"],
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _run(assign: pd.DataFrame, scores: pd.DataFrame, blocks: int = 8) -> pd.DataFrame:
    a = rd.from_arrow(pa.Table.from_pandas(assign)).repartition(blocks)
    s = rd.from_arrow(pa.Table.from_pandas(scores)).repartition(blocks)
    out = select_representatives(a, s, num_buckets=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_clusters_match_brute_force(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    cluster = rng.integers(0, 60, n)
    rep = pd.Series(ids).groupby(cluster).transform("min").to_numpy()
    assign = pd.DataFrame({"doc_id": ids, "rep": rep.astype(np.int64)})
    # small score range forces ties → min-id tie-break must decide
    scores = pd.DataFrame(
        {"doc_id": ids, "score": rng.integers(0, 5, n).astype(np.int64)}
    )
    got = _run(assign, scores)
    want = _brute(assign, scores)
    pd.testing.assert_frame_equal(got, want)
    # same cluster partition as the input, only the labels moved
    gmap = got.set_index("doc_id")["rep"]
    assert (
        assign.groupby("rep")["doc_id"].transform(lambda s: gmap[s].nunique()) == 1
    ).all()


def test_one_giant_cluster_spans_every_block(ray_session):
    n = 400
    ids = np.arange(n, dtype=np.int64)
    assign = pd.DataFrame({"doc_id": ids, "rep": np.zeros(n, dtype=np.int64)})
    scores = pd.DataFrame({"doc_id": ids, "score": ids})  # best = last id
    got = _run(assign, scores, blocks=16)
    assert (got["rep"] == n - 1).all()
    assert got["is_survivor"].sum() == 1
    assert bool(got.loc[got["doc_id"] == n - 1, "is_survivor"].iloc[0])


def test_singletons_keep_themselves(ray_session):
    ids = np.arange(50, dtype=np.int64)
    assign = pd.DataFrame({"doc_id": ids, "rep": ids})
    scores = pd.DataFrame({"doc_id": ids, "score": np.zeros(50, dtype=np.int64)})
    got = _run(assign, scores)
    assert (got["rep"] == got["doc_id"]).all()
    assert got["is_survivor"].all()


def test_preattached_scores_skip_join_same_result(ray_session):
    rng = np.random.default_rng(7)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    cluster = rng.integers(0, 40, n)
    rep = pd.Series(ids).groupby(cluster).transform("min").to_numpy()
    assign = pd.DataFrame({"doc_id": ids, "rep": rep.astype(np.int64)})
    scores = pd.DataFrame(
        {"doc_id": ids, "score": rng.integers(0, 4, n).astype(np.int64)}
    )
    joined = rd.from_arrow(
        pa.Table.from_pandas(assign.merge(scores, on="doc_id"))
    ).repartition(6)
    got = (
        select_representatives(joined, None, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _brute(assign, scores))


def test_duplicate_score_rows_raise(ray_session):
    ids = np.arange(20, dtype=np.int64)
    assign = pd.DataFrame({"doc_id": ids, "rep": np.zeros(20, dtype=np.int64)})
    scores = pd.DataFrame(
        {
            "doc_id": np.r_[ids, ids[:3]],
            "score": np.zeros(23, dtype=np.int64),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        _run(assign, scores)


def test_missing_score_raises(ray_session):
    ids = np.arange(20, dtype=np.int64)
    assign = pd.DataFrame({"doc_id": ids, "rep": np.zeros(20, dtype=np.int64)})
    scores = pd.DataFrame({"doc_id": ids[:10], "score": ids[:10]})
    with pytest.raises(Exception, match="missing score"):
        _run(assign, scores)
