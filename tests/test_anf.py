"""HyperANF neighborhood function (functions/anf.py) vs an independent
sequential reference: register bit-equality across plans and layouts,
estimator parity with sketches/hll.py, exact BFS sanity."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.anf import (
    _estimate_rows,
    _init_registers,
    neighborhood_function,
    sorted_max_rollup,
)
from ddsketch_ray.sketches.hll import HyperLogLog


def anf_reference(edges, n, radius, p):
    """Sequential HyperANF: same register init, pure-Python max
    propagation, estimator re-derived from first principles (exact
    Fraction-free big-int sum, math.log)."""
    regs = _init_registers(np.arange(n, dtype=np.int64), p)
    # plain Python ints: numpy uint8 scalars would wrap the big-int
    # shifts in the estimator below
    regs = [[int(x) for x in row] for row in regs]
    for _ in range(radius):
        new = [row[:] for row in regs]
        for u, v in edges:
            for j in range(1 << p):
                if regs[v][j] > new[u][j]:
                    new[u][j] = regs[v][j]
        regs = new
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    out = []
    for row in regs:
        s_num = sum(1 << (64 - r) for r in row)
        s = float(s_num) * 2.0**-64
        raw = alpha * m * m / s
        zeros = sum(1 for r in row if r == 0)
        if raw <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        else:
            est = raw
        out.append(int(round(est)))
    return out


def _run(edges, n, radius=3, p=4, mode="auto", blocks=4):
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
    return (
        neighborhood_function(
            eds, nodes, radius=radius, p=p, mode=mode, num_buckets=8
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_estimator_matches_hll_sketch():
    # _estimate_rows must agree with sketches/hll.py::cardinality on the
    # same register contents (it IS the same estimator, vectorized)
    rng = np.random.default_rng(3)
    regs = rng.integers(0, 61, size=(50, 16)).astype(np.uint8)
    got = _estimate_rows(regs)
    for i in range(50):
        sk = HyperLogLog(p=4)
        sk.registers = regs[i].copy()
        assert got[i] == sk.cardinality(), i


def test_singletons_no_edges():
    out = _run([], 5, radius=3)
    # HLL of a single element: small-range 16*ln(16/15) -> rounds to 1
    assert out["nhood_est"].tolist() == [1] * 5


def test_random_graph_matches_reference_both_plans():
    rng = np.random.default_rng(17)
    n = 120
    edges = list(zip(rng.integers(0, n, 400).tolist(), rng.integers(0, n, 400).tolist()))
    ref = anf_reference(edges, n, radius=3, p=4)
    for mode in ("broadcast", "shuffle"):
        out = _run(edges, n, radius=3, p=4, mode=mode)
        assert out["nhood_est"].tolist() == ref, mode


def test_layout_bit_equality():
    rng = np.random.default_rng(29)
    n = 90
    edges = list(zip(rng.integers(0, n, 250).tolist(), rng.integers(0, n, 250).tolist()))
    ref = anf_reference(edges, n, radius=2, p=5)
    for blocks in (1, 7):
        out = _run(edges, n, radius=2, p=5, blocks=blocks)
        assert out["nhood_est"].tolist() == ref, blocks


def test_chain_growth_tracks_exact_bfs():
    # directed chain 0->1->...->29: node v reaches min(radius, 29-v)+1
    # nodes; HLL at m=64 has ~13% error — assert within a loose band
    n = 30
    edges = [(i, i + 1) for i in range(n - 1)]
    out = _run(edges, n, radius=8, p=6)
    for v in range(n):
        exact = min(8, n - 1 - v) + 1
        got = out.loc[v, "nhood_est"]
        assert 0.5 * exact <= got <= 1.8 * exact + 1, (v, exact, got)


def test_radius_zero_is_identity():
    out = _run([(0, 1), (1, 2)], 3, radius=0)
    assert out["nhood_est"].tolist() == [1, 1, 1]


def test_sorted_max_rollup():
    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2, 3], type=pa.int64()),
            "a": pa.array([5, 3, 1, 9, 2, 7], type=pa.int64()),
            "b": pa.array([0, 8, 4, 4, 6, 1], type=pa.int64()),
        }
    )
    out = (
        sorted_max_rollup(rd.from_arrow(t).repartition(3), "k", ["a", "b"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["a"].tolist() == [5, 9, 7]
    assert out["b"].tolist() == [8, 6, 1]


def test_validation():
    nodes = rd.from_arrow(pa.table({"node": pa.array([0], type=pa.int64())}))
    eds = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
        )
    )
    with pytest.raises(ValueError, match="p must"):
        neighborhood_function(eds, nodes, p=3)
    with pytest.raises(ValueError, match="radius"):
        neighborhood_function(eds, nodes, radius=-1)
    with pytest.raises(ValueError, match="mode"):
        neighborhood_function(eds, nodes, mode="bogus")


def ddist_reference(edges, n, max_radius, p):
    """Sequential neighborhood-function totals: Σ_v est_v per radius."""
    out = []
    for r in range(max_radius + 1):
        out.append(sum(anf_reference(edges, n, r, p)))
    return out


def test_distance_distribution_matches_reference_both_plans():
    from ddsketch_ray.functions.anf import distance_distribution

    rng = np.random.default_rng(41)
    n = 80
    edges = list(zip(rng.integers(0, n, 200).tolist(), rng.integers(0, n, 200).tolist()))
    ref = ddist_reference(edges, n, 4, 4)
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(3)
    e = np.array(edges, dtype=np.int64)
    eds = rd.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    ).repartition(3)
    for mode in ("broadcast", "shuffle"):
        t = distance_distribution(eds, nodes, max_radius=4, p=4, mode=mode, num_buckets=8)
        assert t.column("radius").to_pylist() == [0, 1, 2, 3, 4]
        assert t.column("pairs_est").to_pylist() == ref, mode


def test_distance_distribution_fixed_point_repeats():
    from ddsketch_ray.functions.anf import distance_distribution

    # 0 -> 1: fixed point after round 1; totals must repeat (matching
    # the SQL oracle's unrolled rounds), rows stay max_radius + 1
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(2, dtype=np.int64))})
    )
    eds = rd.from_arrow(
        pa.table({"src": pa.array([0], type=pa.int64()),
                  "dst": pa.array([1], type=pa.int64())})
    )
    t = distance_distribution(eds, nodes, max_radius=5, p=4)
    vals = t.column("pairs_est").to_pylist()
    assert len(vals) == 6
    assert vals[1] == vals[2] == vals[5]
    ref = ddist_reference([(0, 1)], 2, 5, 4)
    assert vals == ref
