"""Distributed PageRank (functions/graph.py::pagerank) vs an independent
pure-Python integer reference: bit-equality across block layouts,
dangling-mass redistribution, degenerate graphs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.graph import hash_link_edges, pagerank
from ddsketch_ray.hashing import hash_ints


def pagerank_reference(edges, n, iters=5, damping=(85, 100)):
    """Sequential fixed-point PageRank in unbounded Python ints — the
    independent oracle for the distributed plan's exact integer math."""
    dnum, dden = damping
    r0 = min(1 << 26, (1 << 55) // n)
    base = ((dden - dnum) * r0) // dden
    outdeg = [0] * n
    for s, _ in edges:
        outdeg[s] += 1
    r = [r0] * n
    for _ in range(iters):
        dang = sum(r[v] for v in range(n) if outdeg[v] == 0)
        dshare = dang // n
        s = [0] * n
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = [base + (dnum * (s[v] + dshare)) // dden for v in range(n)]
    return r


def _run(edges, n, iters=5, damping=(85, 100), blocks=4, mode="auto"):
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(blocks)
    if edges:
        e = np.array(edges, dtype=np.int64)
        eds = rd.from_arrow(
            pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
        ).repartition(blocks)
    else:
        eds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
        )
    out = (
        pagerank(eds, nodes, iters=iters, damping=damping, num_buckets=8, mode=mode)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out


def test_cycle_uniform():
    # 0->1->2->0: perfectly symmetric, ranks stay equal every iteration
    out = _run([(0, 1), (1, 2), (2, 0)], 3)
    assert out["node"].tolist() == [0, 1, 2]
    assert out["rank_fp"].nunique() == 1
    ref = pagerank_reference([(0, 1), (1, 2), (2, 0)], 3)
    assert out["rank_fp"].tolist() == ref


def test_star_concentrates():
    # everyone points at 0; 0 points back at 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    out = _run(edges, 6)
    ref = pagerank_reference(edges, 6)
    assert out["rank_fp"].tolist() == ref
    assert out.loc[0, "rank_fp"] == max(ref)


def test_dangling_redistribution():
    # node 2 is dangling: its mass must be shared, not lost
    edges = [(0, 1), (1, 2)]
    out = _run(edges, 3)
    ref = pagerank_reference(edges, 3)
    assert out["rank_fp"].tolist() == ref
    # with redistribution the total mass stays near n*r0 (floor leakage
    # only); without it the dangling chain would drain ~d^5 of the mass
    r0 = min(1 << 26, (1 << 55) // 3)
    assert out["rank_fp"].sum() > 0.98 * 3 * r0


def test_all_dangling_uniform():
    out = _run([], 4)
    ref = pagerank_reference([], 4)
    assert out["rank_fp"].tolist() == ref
    assert out["rank_fp"].nunique() == 1


def test_parallel_edges_and_self_loops():
    edges = [(0, 1), (0, 1), (1, 1), (1, 0), (2, 0)]
    out = _run(edges, 3)
    assert out["rank_fp"].tolist() == pagerank_reference(edges, 3)


def test_random_graph_layout_bit_equality():
    rng = np.random.default_rng(7)
    n = 400
    src = rng.integers(0, n, 1500)
    dst = rng.integers(0, n, 1500)
    edges = list(zip(src.tolist(), dst.tolist()))
    ref = pagerank_reference(edges, n, iters=4, damping=(17, 20))
    for blocks in (1, 7):
        out = _run(edges, n, iters=4, damping=(17, 20), blocks=blocks)
        assert out["rank_fp"].tolist() == ref
    # float rank is the single documented conversion
    r0 = min(1 << 26, (1 << 55) // n)
    np.testing.assert_array_equal(
        out["rank"].to_numpy(), out["rank_fp"].to_numpy() / (float(n) * float(r0))
    )


def test_hash_link_edges_matches_formula():
    n = 50
    ids = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(3)
    got = (
        hash_link_edges(ids, n)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    rows = []
    for v in range(n):
        deg = 0 if v % 7 == 0 else 1 + v % 3
        for j in range(1, deg + 1):
            d = int(
                hash_ints(np.array([v], dtype=np.int64), seed=7777 + j)[0]
                % np.uint64(n)
            )
            rows.append((v, d))
    exp = pd.DataFrame(rows, columns=["src", "dst"]).sort_values(
        ["src", "dst"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_empty_nodes():
    nodes = rd.from_arrow(pa.table({"node": pa.array([], type=pa.int64())}))
    eds = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
        )
    )
    out = pagerank(eds, nodes)
    assert out.count() == 0
    # empty to_pandas() drops the schema (CLAUDE.md); check the Dataset's
    assert out.schema().names == ["node", "rank_fp", "rank"]


def test_damping_validation():
    nodes = rd.from_arrow(pa.table({"node": pa.array([0], type=pa.int64())}))
    eds = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
        )
    )
    with pytest.raises(ValueError):
        pagerank(eds, nodes, damping=(100, 85))
    with pytest.raises(ValueError):
        pagerank(eds, nodes, damping=(850, 1000))


def test_broadcast_shuffle_bit_equality():
    # both plans run the identical integer recurrence -> bit-equal
    rng = np.random.default_rng(11)
    n = 300
    edges = list(zip(rng.integers(0, n, 900).tolist(), rng.integers(0, n, 900).tolist()))
    ref = pagerank_reference(edges, n, iters=3)
    b = _run(edges, n, iters=3, mode="broadcast")
    s = _run(edges, n, iters=3, mode="shuffle")
    assert b["rank_fp"].tolist() == ref
    assert s["rank_fp"].tolist() == ref
    assert b["rank"].tolist() == s["rank"].tolist()


def test_duplicate_node_ids_rejected():
    nodes = rd.from_arrow(pa.table({"node": pa.array([0, 1, 1], type=pa.int64())}))
    eds = rd.from_arrow(
        pa.table({"src": pa.array([0], type=pa.int64()),
                  "dst": pa.array([1], type=pa.int64())})
    )
    with pytest.raises(ValueError, match="exactly once"):
        pagerank(eds, nodes, iters=1, mode="broadcast").to_pandas()


def test_bad_mode_rejected():
    nodes = rd.from_arrow(pa.table({"node": pa.array([0], type=pa.int64())}))
    eds = rd.from_arrow(
        pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    )
    with pytest.raises(ValueError, match="mode"):
        pagerank(eds, nodes, mode="bogus")


def ppr_reference(edges, n, seeds, iters=5, damping=(85, 100)):
    """Sequential personalized-PageRank reference (teleport + dangling
    mass to the seed set), unbounded Python ints."""
    dnum, dden = damping
    r0 = min(1 << 26, (1 << 55) // n)
    ns = len(seeds)
    tele = ((dden - dnum) * n * r0) // (dden * ns)
    outdeg = [0] * n
    for s, _ in edges:
        outdeg[s] += 1
    r = [r0] * n
    for _ in range(iters):
        dang = sum(r[v] for v in range(n) if outdeg[v] == 0)
        dboost = dang // ns
        s = [0] * n
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = [
            (tele if v in seeds else 0)
            + (dnum * (s[v] + (dboost if v in seeds else 0))) // dden
            for v in range(n)
        ]
    return r


def test_personalized_matches_reference_both_plans():
    rng = np.random.default_rng(23)
    n = 250
    edges = list(zip(rng.integers(0, n, 800).tolist(), rng.integers(0, n, 800).tolist()))
    seeds = {v for v in range(n) if v % 9 == 0}
    pred = lambda ids: ids % 9 == 0
    ref = ppr_reference(edges, n, seeds, iters=3)
    for mode in ("broadcast", "shuffle"):
        out = _run_ppr(edges, n, pred, iters=3, mode=mode)
        assert out["rank_fp"].tolist() == ref, mode


def _run_ppr(edges, n, pred, iters=5, mode="auto", blocks=4):
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(blocks)
    e = np.array(edges, dtype=np.int64)
    eds = rd.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    ).repartition(blocks)
    return (
        pagerank(eds, nodes, iters=iters, num_buckets=8, mode=mode, seed_pred=pred)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_personalized_concentrates_on_seed_neighborhood():
    # chain 0->1->2->...->9 plus a far component; seed = {0}
    n = 20
    edges = [(i, i + 1) for i in range(9)] + [(i, i + 1) for i in range(10, 19)]
    out = _run_ppr(edges, n, lambda ids: ids == 0, iters=5)
    ranks = out.set_index("node")["rank_fp"]
    # seed and its chain outrank the unseeded component
    assert ranks[0] == ranks.max()
    assert ranks[1] > ranks[11]


def test_personalized_empty_seed_set_rejected():
    n = 5
    edges = [(0, 1)]
    with pytest.raises(ValueError, match="no nodes"):
        _run_ppr(edges, n, lambda ids: ids < 0, iters=1, mode="broadcast")
    with pytest.raises(ValueError, match="no nodes"):
        _run_ppr(edges, n, lambda ids: ids < 0, iters=1, mode="shuffle")


def test_personalized_all_seeds_equals_standard():
    # S = all nodes: the seeded recurrence's floors coincide with the
    # standard one ((a*n)//(b*n) == a//b), so outputs are bit-equal
    rng = np.random.default_rng(31)
    n = 120
    edges = list(zip(rng.integers(0, n, 400).tolist(), rng.integers(0, n, 400).tolist()))
    std = _run(edges, n, iters=3)
    allseed = _run_ppr(edges, n, lambda ids: np.ones(len(ids), dtype=bool), iters=3)
    assert std["rank_fp"].tolist() == allseed["rank_fp"].tolist()


def test_checkpoint_resume_bit_identical(tmp_path):
    from ddsketch_ray.functions.graph import pagerank_checkpointed

    rng = np.random.default_rng(53)
    n = 200
    edges = list(zip(rng.integers(0, n, 600).tolist(), rng.integers(0, n, 600).tolist()))
    cold = pagerank_reference(edges, n, iters=4)

    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(3)
    e = np.array(edges, dtype=np.int64)
    eds = rd.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    ).repartition(3)

    for mode in ("broadcast", "shuffle"):
        ck = str(tmp_path / f"pr-{mode}")
        first = pagerank_checkpointed(eds, nodes, ck, iters=2, mode=mode, num_buckets=8)
        assert first["resumed_from_iteration"] == 0
        assert first["iterations_run"] == 2
        resumed = pagerank_checkpointed(eds, nodes, ck, iters=4, mode=mode, num_buckets=8)
        assert resumed["resumed_from_iteration"] == 2
        assert resumed["iterations_run"] == 2
        got = resumed["result"].to_pandas().sort_values("node")
        assert got["rank_fp"].tolist() == cold, mode

        # fully-complete checkpoint: zero iterations on re-run
        again = pagerank_checkpointed(eds, nodes, ck, iters=4, mode=mode, num_buckets=8)
        assert again["iterations_run"] == 0
        got = again["result"].to_pandas().sort_values("node")
        assert got["rank_fp"].tolist() == cold, mode

        # parameter mismatch refuses to resume
        with pytest.raises(ValueError, match="refusing to resume"):
            pagerank_checkpointed(
                eds, nodes, ck, iters=4, mode=mode, damping=(17, 20), num_buckets=8
            )


def test_checkpoint_cross_mode_resume(tmp_path):
    # state format is mode-independent: a shuffle-written checkpoint
    # resumes under the broadcast plan bit-identically (and vice versa)
    from ddsketch_ray.functions.graph import pagerank_checkpointed

    rng = np.random.default_rng(59)
    n = 100
    edges = list(zip(rng.integers(0, n, 300).tolist(), rng.integers(0, n, 300).tolist()))
    cold = pagerank_reference(edges, n, iters=3)
    nodes = rd.from_arrow(pa.table({"node": pa.array(np.arange(n, dtype=np.int64))}))
    e = np.array(edges, dtype=np.int64)
    eds = rd.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    )
    ck = str(tmp_path / "pr-x")
    pagerank_checkpointed(eds, nodes, ck, iters=1, mode="shuffle", num_buckets=8)
    out = pagerank_checkpointed(eds, nodes, ck, iters=3, mode="broadcast", num_buckets=8)
    got = out["result"].to_pandas().sort_values("node")
    assert got["rank_fp"].tolist() == cold


def test_checkpoint_personalized_seed_mod(tmp_path):
    from ddsketch_ray.functions.graph import pagerank_checkpointed

    n = 60
    edges = [(i, (i * 7 + 1) % n) for i in range(n)]
    seeds = {v for v in range(n) if v % 9 == 0}
    ref = ppr_reference(edges, n, seeds, iters=3)
    nodes = rd.from_arrow(pa.table({"node": pa.array(np.arange(n, dtype=np.int64))}))
    e = np.array(edges, dtype=np.int64)
    eds = rd.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    )
    ck = str(tmp_path / "ppr")
    pagerank_checkpointed(eds, nodes, ck, iters=1, seed_mod=9, num_buckets=8)
    out = pagerank_checkpointed(eds, nodes, ck, iters=3, seed_mod=9, num_buckets=8)
    got = out["result"].to_pandas().sort_values("node")
    assert got["rank_fp"].tolist() == ref
    # seed_mod is pinned in the lineage metadata
    with pytest.raises(ValueError, match="refusing to resume"):
        pagerank_checkpointed(eds, nodes, ck, iters=3, seed_mod=5, num_buckets=8)
