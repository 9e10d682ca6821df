"""Dyadic-range count-min (sketches/dyadic.py — Cormode & Muthukrishnan
2005 §4.2): decomposition correctness, one-sided range error, merge
bit-equality under arbitrary order, rank monotonicity, tree-descent
quantiles, and the distributed aggregate vs sequential bit-parity."""

import numpy as np
import pytest

from ddsketch_ray.sketches.dyadic import DyadicCountMin, dyadic_decompose


def _node_range(level, prefix):
    return prefix << level, ((prefix + 1) << level) - 1


def test_decompose_exhaustive_small_domain():
    L = 6
    full = 1 << L
    for lo in range(full):
        for hi in range(lo, full):
            nodes = dyadic_decompose(lo, hi, L)
            covered = []
            for level, prefix in nodes:
                a, b = _node_range(level, prefix)
                assert lo <= a <= b <= hi, (lo, hi, nodes)
                covered.append((a, b))
            covered.sort()
            # disjoint and gap-free over [lo, hi]
            assert covered[0][0] == lo and covered[-1][1] == hi
            for (a1, b1), (a2, b2) in zip(covered, covered[1:]):
                assert a2 == b1 + 1, (lo, hi, covered)
            assert len(nodes) <= 2 * L


def test_decompose_full_domain_single_node():
    assert dyadic_decompose(0, (1 << 10) - 1, 10) == [(10, 0)]
    with pytest.raises(ValueError):
        dyadic_decompose(0, 1 << 10, 10)
    with pytest.raises(ValueError):
        dyadic_decompose(-1, 5, 10)


def _data(n=40_000, seed=7, L=14):
    rng = np.random.default_rng(seed)
    # Zipf-ish skew plus a uniform tail, clipped into the domain
    v = np.concatenate(
        [
            rng.zipf(1.3, n // 2).astype(np.int64),
            rng.integers(0, 1 << L, n - n // 2, dtype=np.int64),
        ]
    )
    return np.clip(v, 0, (1 << L) - 1)


def test_range_count_one_sided_and_bounded():
    L = 14
    v = _data(L=L)
    sk = DyadicCountMin(levels=L, width=1024, depth=5, seed=0)
    sk.add_values(v)
    assert sk.n == len(v)
    eps = np.e / 1024
    for lo, hi in [(0, 9), (3, 200), (100, 5000), (0, (1 << L) - 1), (8192, 16383), (7, 7)]:
        true = int(((v >= lo) & (v <= hi)).sum())
        est = sk.range_count(lo, hi)
        assert est >= true, (lo, hi, est, true)
        assert est <= true + 2 * L * eps * sk.n + 1, (lo, hi, est, true)
    # full-domain node is the exact n
    assert sk.range_count(0, (1 << L) - 1) == sk.n


def test_merge_order_independent_bit_equal():
    L = 12
    v = _data(n=20_000, L=L)
    chunks = np.array_split(v, 7)

    def build(order):
        parts = []
        for i in order:
            p = DyadicCountMin(levels=L, width=256, depth=4, seed=3)
            p.add_values(chunks[i])
            parts.append(p)
        acc = parts[0]
        for p in parts[1:]:
            acc.merge(p)
        return acc

    a = build(range(7))
    b = build([4, 0, 6, 2, 5, 1, 3])
    seq = DyadicCountMin(levels=L, width=256, depth=4, seed=3)
    seq.add_values(v)
    assert np.array_equal(a.tables, b.tables)
    assert np.array_equal(a.tables, seq.tables)
    assert a.n == b.n == seq.n

    with pytest.raises(ValueError):
        a.merge(DyadicCountMin(levels=L, width=512, depth=4, seed=3))


def test_rank_monotone_and_quantiles():
    L = 14
    v = _data(L=L)
    sk = DyadicCountMin(levels=L, width=2048, depth=5, seed=0)
    sk.add_values(v)
    ranks = [sk.rank(x) for x in [0, 10, 100, 1000, 10_000, (1 << L) - 1]]
    assert ranks == sorted(ranks)
    assert sk.rank(-5) == 0
    assert ranks[-1] >= sk.n  # never undercounts; top rank covers everything
    sv = np.sort(v)
    eps = np.e / 2048
    for q in (0.5, 0.95, 0.99):
        est = sk.quantile_value(q)
        # value-space tolerance: est's rank must be within the CM count
        # error band of the target rank
        target = int(np.ceil(q * sk.n))
        true_rank_lo = int((sv <= est).sum())  # exact rank of the estimate
        slack = int(2 * L * eps * sk.n) + 1
        assert true_rank_lo >= target - slack
        true_rank_below = int((sv <= est - 1).sum()) if est > 0 else 0
        assert true_rank_below <= target + slack


def test_clamping_and_empty_and_type_guard():
    sk = DyadicCountMin(levels=8, width=64, depth=3, seed=1)
    sk.add_values(np.array([], dtype=np.int64))
    assert sk.n == 0
    assert sk.quantile_value(0.5) == 0
    sk.add_values(np.array([-100, 300, 255, 0], dtype=np.int64))
    assert sk.n == 4
    # -100 clamps to 0, 300 clamps to 255
    assert sk.range_count(0, 0) >= 2
    assert sk.range_count(255, 255) >= 2
    with pytest.raises(TypeError):
        sk.add_values(np.array([1.5, 2.5]))
    with pytest.raises(ValueError):
        DyadicCountMin(levels=8, width=100, depth=3)  # not a power of two


def test_distributed_aggregate_bit_equal(ray_session):
    import ray.data as rd

    from ddsketch_ray.agg import DyadicCMAgg, sketch_from_result

    L = 12
    v = _data(n=30_000, L=L)
    ds = rd.from_arrow(
        __import__("pyarrow").table({"v": v})
    ).repartition(8)
    res = ds.aggregate(DyadicCMAgg(on="v", levels=L, width=512, depth=4, seed=2))
    dist = sketch_from_result(res["dyadic_cm(v)"])
    seq = DyadicCountMin(levels=L, width=512, depth=4, seed=2)
    seq.add_values(v)
    assert dist.n == seq.n
    assert np.array_equal(dist.tables, seq.tables)
    assert dist.range_count(5, 999) == seq.range_count(5, 999)
    assert dist.quantile_value(0.95) == seq.quantile_value(0.95)
