"""connected_components (functions/graph.py) vs the driver union-find
oracle (functions/dedup.py:cluster_pairs) on adversarial shapes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.dedup import cluster_pairs
from ddsketch_ray.functions.graph import connected_components


def _run_cc(ray, a, b, n_blocks=6, **kw):
    import pandas as pd
    import ray.data as rd

    t = pa.table({"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())})
    ds = rd.from_arrow(t)
    if t.num_rows:
        ds = ds.repartition(n_blocks)
    out = connected_components(ds, src="a", dst="b", **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _oracle(a, b):
    import pandas as pd

    pairs = pd.DataFrame({"a": np.asarray(a, np.int64), "b": np.asarray(b, np.int64)})
    pairs = pairs[pairs.a != pairs.b]
    nodes = np.unique(np.concatenate([pairs.a.to_numpy(), pairs.b.to_numpy()]))
    rep = cluster_pairs(pairs, nodes)
    return {int(k): int(v) for k, v in rep.items()}


def _check(ray, a, b, **kw):
    got = _run_cc(ray, a, b, **kw)
    want = _oracle(a, b)
    assert len(got) == len(want)
    got_map = dict(zip(got["node"], got["component"]))
    assert {int(k): int(v) for k, v in got_map.items()} == want


def test_cc_path_graph(ray_session):
    """Long path = worst-case diameter; star contraction must converge
    by doubling (log rounds), not by walking the path."""
    n = 3000
    rng = np.random.default_rng(7)
    ids = rng.permutation(n * 5)[:n]  # sparse, shuffled node ids
    _check(ray_session, ids[:-1], ids[1:])


def test_cc_random_graph(ray_session):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4000, 6000)
    b = rng.integers(0, 4000, 6000)
    _check(ray_session, a, b)


def test_cc_dups_self_loops_and_nulls(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "a": pa.array([1, 1, 2, 5, 5, None, 9], type=pa.int64()),
            "b": pa.array([2, 2, 1, 5, 6, 3, None], type=pa.int64()),
        }
    )
    out = (
        connected_components(rd.from_arrow(t), src="a", dst="b")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # {1,2} and {5,6}; self loop (5,5) adds nothing; null rows dropped
    assert out["node"].tolist() == [1, 2, 5, 6]
    assert out["component"].tolist() == [1, 1, 5, 5]


def test_cc_empty(ray_session):
    import ray.data as rd

    t = pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    out = connected_components(rd.from_arrow(t), src="a", dst="b")
    assert out.count() == 0
    # (Ray's to_pandas drops columns on empty datasets; the schema is typed)
    assert out.schema().names == ["node", "component"]


def test_cc_star_and_cliques(ray_session):
    """Pre-converged stars plus dense cliques mixed."""
    a, b = [], []
    # star already centered at min
    a += [100] * 50
    b += list(range(101, 151))
    # clique on 8 nodes
    cl = list(range(500, 508))
    for i in range(8):
        for j in range(i + 1, 8):
            a.append(cl[i])
            b.append(cl[j])
    _check(ray_session, a, b)


def test_cc_matches_minhash_pair_clustering(ray_session):
    """The distributed CC over verified minhash pairs must reproduce the
    driver union-find's clusters on the same pair set."""
    rng = np.random.default_rng(3)
    # synthetic near-dup pair set: chains within groups of 2-6 ids
    a, b = [], []
    nid = 0
    for _ in range(200):
        k = int(rng.integers(2, 7))
        ids = nid + np.arange(k)
        nid += k + int(rng.integers(0, 3))
        perm = rng.permutation(k)
        for i in range(k - 1):
            a.append(int(ids[perm[i]]))
            b.append(int(ids[perm[i + 1]]))
    _check(ray_session, a, b)


def test_cc_nonconvergence_guard(ray_session):
    with pytest.raises(RuntimeError):
        _run_cc(ray_session, [1, 2, 3], [2, 3, 4], max_iter=0)
