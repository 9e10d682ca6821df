"""DDSketch core conformance tests (reference parity per SURVEY.md §5)."""

from __future__ import annotations

import math
import pickle

import numpy as np
import pytest

from ddsketch_ray.sketches.ddsketch import (
    DDSketch,
    MODE_COLLAPSE,
    MODE_FIRST,
    MODE_LAST,
)
from tests.oracle import REFERENCE_QS, exact_quantile, rel_error


def test_key_function_matches_reference_math():
    # DDS_GetKey (ddsketch.cc:83-103): key = ceil(ln x / ln γ) ± offset
    sk = DDSketch(alpha=0.008)
    g, off = sk.gamma, sk.offset
    assert g == pytest.approx((1 + 0.008) / (1 - 0.008))
    for x in (1.0, 2.0, 901.82, 1e-9, 1e9):
        assert sk.key_for(x) == math.ceil(math.log(x) / math.log(g)) + off
        assert sk.key_for(-x) == -math.ceil(math.log(x) / math.log(g)) - off
    assert sk.key_for(0.0) == 0


def test_key_bucket_boundaries():
    # value exactly γ^k maps to key k (ceil of an integer), γ^k + ε to k+1
    sk = DDSketch(alpha=0.01)
    g, off = sk.gamma, sk.offset
    for k in (1, 5, 100):
        x = g**k
        key = sk.key_for(x)
        # float log may land a hair above/below the integer; allow the
        # reference's own float behavior: ceil(log(g**k)/log(g)) computed
        # identically is the spec
        expect = math.ceil(math.log(x) / sk.ln_gamma) + off
        assert key == expect


def test_zero_and_sign_zones_are_disjoint_and_ordered():
    sk = DDSketch()
    vals = np.array([-50.0, -0.5, -1e-9, 0.0, 1e-9, 0.5, 50.0])
    keys = sk.keys_for(vals)
    assert list(keys) == sorted(keys), "ascending value order == ascending key order"
    assert keys[3] == 0
    assert (keys[:3] < 0).all() and (keys[4:] > 0).all()


def test_nan_inf_dropped_and_counted():
    sk = DDSketch()
    sk.add_array(np.array([1.0, np.nan, np.inf, -np.inf, 2.0]))
    assert sk.n == 2
    assert sk.nan_dropped == 3


def test_point_estimate_is_mid_bucket():
    # DDS_GetRank (ddsketch.cc:116): est = 2γ^k/(γ+1), sign-mirrored
    sk = DDSketch(alpha=0.008)
    k = sk.key_for(100.0)
    est = sk.key_to_estimate(k)
    assert est == pytest.approx(2 * sk.gamma ** (k - sk.offset) / (sk.gamma + 1))
    assert sk.key_to_estimate(-k) == pytest.approx(-est)
    assert sk.key_to_estimate(0) == 0.0
    # the estimate is within α relative error of anything in the bucket
    assert rel_error(est, 100.0) <= sk.alpha + 1e-12


def test_gamma2_collapse_pairs():
    # DDS_Collapse: old pair {2m-1, 2m} → m (ddsketch.cc:863-888)
    sk = DDSketch(alpha=0.008, bin_limit=500)
    off = sk.offset
    sk.bins = {off + 2 * m - 1: 1 for m in range(1, 6)}
    sk.bins.update({off + 2 * m: 10 for m in range(1, 6)})
    sk.bins.update({-(off + 2 * m - 1): 2 for m in range(1, 6)})
    sk.bins.update({-(off + 2 * m): 20 for m in range(1, 6)})
    sk.bins[0] = 7
    sk.n = sum(sk.bins.values())
    old_alpha = sk.alpha
    sk._collapse_gamma2()
    assert sk.alpha == pytest.approx(2 * old_alpha / (1 + old_alpha**2))
    for m in range(1, 6):
        assert sk.bins[off + m] == 11
        assert sk.bins[-(off + m)] == 22
    assert sk.bins[0] == 7
    assert sk.sum_bins() == sk.n


def test_collapse_mode_triggers_and_preserves_count():
    sk = DDSketch(alpha=0.008, bin_limit=32, mode=MODE_COLLAPSE)
    rng = np.random.default_rng(0)
    vals = rng.uniform(10, 4e5, 50_000)
    sk.add_array(vals)
    assert sk.size <= 32
    assert sk.n == 50_000
    assert sk.sum_bins() == 50_000
    assert sk.alpha > 0.008  # escalated


@pytest.mark.parametrize("mode", [MODE_LAST, MODE_FIRST])
def test_extreme_collapse_modes_window_and_bound(mode):
    sk = DDSketch(alpha=0.008, bin_limit=64, mode=mode)
    rng = np.random.default_rng(1)
    # bulk in a handful of buckets + a thin tail on the collapsed side, so
    # the voided quantile range (getErrorBound, main.cpp:1123-1145) is small
    bulk = rng.uniform(100, 110, 49_000)
    tail = rng.uniform(1e4, 4e5, 1_000) if mode == MODE_LAST else rng.uniform(1e-4, 1.0, 1_000)
    vals = np.concatenate([bulk, tail])
    sk.add_array(vals)
    assert sk.size <= 64
    assert sk.alpha == 0.008  # never escalates in these modes
    assert sk.win_min <= sk.win_max  # collapse window recorded
    lo, hi = sk.valid_quantile_range()
    # getErrorBound (main.cpp:1123-1145): inside the valid range the α bound holds
    qs = [q for q in REFERENCE_QS if lo + 1e-9 < q < hi - 1e-9]
    assert qs, "some quantiles must remain valid"
    for q in qs:
        assert rel_error(sk.quantile(q), exact_quantile(vals, q)) <= sk.alpha + 1e-9


def test_quantiles_within_alpha(dist_values):
    name, vals = dist_values
    sk = DDSketch(alpha=0.008, bin_limit=2000)  # no collapse ⇒ pure α bound
    sk.add_array(vals)
    for q in REFERENCE_QS:
        est, exact = sk.quantile(q), exact_quantile(vals, q)
        assert rel_error(est, exact) <= sk.alpha + 1e-9, (name, q, est, exact)


def test_quantiles_within_alpha_after_gamma2_collapse(dist_values):
    name, vals = dist_values
    sk = DDSketch(alpha=0.008, bin_limit=500)
    sk.add_array(vals)
    # after k collapses the bound holds at the escalated alpha
    for q in REFERENCE_QS:
        est, exact = sk.quantile(q), exact_quantile(vals, q)
        assert rel_error(est, exact) <= sk.alpha + 1e-9, (name, q, est, exact)


def test_merge_equals_monolithic(dist_values):
    """testMergeWithRandomValue (main.cpp:467-629): merged shard sketches
    answer like one sketch over the union, within the bound."""
    name, vals = dist_values
    shards = np.array_split(vals, 8)
    parts = []
    for s in shards:
        sk = DDSketch(alpha=0.008, bin_limit=2000)
        sk.add_array(s)
        parts.append(sk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    mono = DDSketch(alpha=0.008, bin_limit=2000)
    mono.add_array(vals)
    assert merged.n == mono.n == vals.size
    # without collapses, bins are bit-identical (same α throughout)
    assert merged.bins == mono.bins
    for q in REFERENCE_QS:
        assert rel_error(merged.quantile(q), exact_quantile(vals, q)) <= 0.008 + 1e-9


def test_merge_mixed_sign_two_distributions():
    # the reference's active experiment: uniform(-50,0) + uniform(10,4e5)
    rng = np.random.default_rng(7)
    a, b = rng.uniform(-50, 0, 100_000), rng.uniform(10, 4e5, 100_000)
    s1 = DDSketch(alpha=0.008, bin_limit=4000)
    s2 = DDSketch(alpha=0.008, bin_limit=4000)
    s1.add_array(a)
    s2.add_array(b)
    s1.merge(s2)
    both = np.concatenate([a, b])
    for q in REFERENCE_QS:
        assert rel_error(s1.quantile(q), exact_quantile(both, q)) <= 0.008 + 1e-9


def test_merge_permutation_invariance():
    rng = np.random.default_rng(3)
    vals = rng.gamma(2, 2, 60_000)
    shards = np.array_split(vals, 6)

    def build(order):
        parts = []
        for i in order:
            sk = DDSketch(alpha=0.008, bin_limit=2000)
            sk.add_array(shards[i])
            parts.append(sk)
        out = parts[0]
        for p in parts[1:]:
            out.merge(p)
        return out

    q_ref = build(range(6)).quantiles(REFERENCE_QS)
    for order in ([5, 4, 3, 2, 1, 0], [2, 0, 4, 1, 5, 3]):
        assert np.allclose(build(order).quantiles(REFERENCE_QS), q_ref)


def test_merge_alpha_equalization():
    # collapse-mode merge equalizes alphas by γ²-collapsing the finer sketch
    rng = np.random.default_rng(9)
    fine = DDSketch(alpha=0.008, bin_limit=5000)
    fine.add_array(rng.uniform(10, 4e5, 50_000))
    coarse = DDSketch(alpha=0.008, bin_limit=5000)
    coarse.add_array(rng.uniform(10, 4e5, 50_000))
    coarse._collapse_gamma2()  # now coarser alpha
    n_total = fine.n + coarse.n
    fine.merge(coarse)
    assert abs(fine.alpha - coarse.alpha) <= 1e-4
    assert fine.n == n_total


def test_last_first_merge_requires_equal_alpha():
    s1 = DDSketch(alpha=0.008, mode=MODE_LAST)
    s2 = DDSketch(alpha=0.02, mode=MODE_LAST)
    with pytest.raises(ValueError):
        s1.merge(s2)


def test_delete_roundtrip():
    # deleteElements (main.cpp:994-1053): insert-all then delete-all → empty
    rng = np.random.default_rng(11)
    vals = rng.normal(2, 3, 30_000)
    sk = DDSketch(alpha=0.008, bin_limit=4000)
    sk.add_array(vals)
    sk.delete_array(vals)
    assert sk.n == 0
    assert sk.size == 0


def test_delete_absent_key_is_noop():
    # reference quirk: absent key → no-op, n NOT decremented (cc:380-388)
    sk = DDSketch()
    sk.add_array(np.array([100.0]))
    sk.delete_array(np.array([1e9]))
    assert sk.n == 1
    assert sk.size == 1


def test_serialization_roundtrip():
    rng = np.random.default_rng(13)
    sk = DDSketch(alpha=0.008, bin_limit=300, mode=MODE_LAST)
    sk.add_array(rng.uniform(-100, 1e5, 40_000))
    row = sk.to_row()
    back = DDSketch.from_row(row)
    assert back.bins == sk.bins
    assert back.n == sk.n
    assert (back.win_min, back.win_max) == (sk.win_min, sk.win_max)
    assert np.allclose(back.quantiles(REFERENCE_QS), sk.quantiles(REFERENCE_QS))
    back2 = pickle.loads(pickle.dumps(sk))
    assert back2.bins == sk.bins


def test_quantile_clamps_q():
    sk = DDSketch()
    sk.add_array(np.arange(1.0, 101.0))
    assert sk.quantile(1.5) == sk.quantile(1.0)  # reference UB at q>1 fixed
    assert sk.quantile(-0.5) == sk.quantile(0.0)


def test_empty_sketch_quantile_nan():
    assert math.isnan(DDSketch().quantile(0.5))


class TestSubtractSketch:
    """Distributed turnstile delete: subtracting a sketch of the delete
    stream must equal replaying the deletes through delete_array
    (DDS_DeleteCollapse semantics, ddsketch.cc:342-392)."""

    def test_subtract_equals_delete_array_plain(self):
        from ddsketch_ray.sketches import DDSketch

        rng = np.random.default_rng(3)
        vals = rng.exponential(100.0, size=20_000)
        dels = vals[::2]
        a = DDSketch(alpha=0.008, bin_limit=2048)
        a.add_array(vals)
        b = a.copy()
        b.delete_array(dels)
        dsk = DDSketch(alpha=0.008, bin_limit=2048)
        dsk.add_array(dels)
        a.subtract_sketch(dsk)
        assert a.bins == b.bins and a.n == b.n

    def test_absent_key_quirk_preserved(self):
        from ddsketch_ray.sketches import DDSketch

        a = DDSketch(alpha=0.008, bin_limit=2048)
        a.add_array(np.array([10.0, 10.0, 20.0]))
        dsk = DDSketch(alpha=0.008, bin_limit=2048)
        dsk.add_array(np.array([10.0, 999999.0]))  # second key absent
        n_before = a.n
        a.subtract_sketch(dsk)
        assert a.n == n_before - 1  # absent-key delete does NOT decrement n

    def test_surplus_deletes_clamp_at_zero(self):
        from ddsketch_ray.sketches import DDSketch

        a = DDSketch(alpha=0.008, bin_limit=2048)
        a.add_array(np.array([5.0, 5.0]))
        dsk = DDSketch(alpha=0.008, bin_limit=2048)
        dsk.add_array(np.array([5.0] * 10))
        a.subtract_sketch(dsk)
        assert a.n == 0 and not a.bins

    def test_subtract_window_modes_match_delete_array(self):
        from ddsketch_ray.sketches import DDSketch

        rng = np.random.default_rng(11)
        vals = rng.gamma(2.0, 2.0, size=50_000) + 0.01
        dels = vals[1::3]
        for mode in ("last", "first"):
            a = DDSketch(alpha=0.01, bin_limit=64, mode=mode)
            a.add_array(vals)
            assert a.win_min <= a.win_max  # collapse actually happened
            b = a.copy()
            # batch delete_array semantics == bucket-wise subtract when the
            # delete sketch did not itself collapse
            dsk = DDSketch(alpha=0.01, bin_limit=1 << 30, mode=mode)
            dsk.add_array(dels)
            b.delete_array(dels)
            a.subtract_sketch(dsk)
            assert a.bins == b.bins and a.n == b.n

    def test_alpha_mismatch_rejected(self):
        from ddsketch_ray.sketches import DDSketch

        a = DDSketch(alpha=0.008)
        d = DDSketch(alpha=0.02)
        with pytest.raises(ValueError):
            a.subtract_sketch(d)


def test_cdf_matches_exact_rank():
    """cdf(v) must equal the exact fraction of items with key <= key(v)
    (exact when no collapse occurred), and be within alpha-bucket
    tolerance of the true empirical CDF."""
    from ddsketch_ray.sketches import DDSketch

    rng = np.random.default_rng(9)
    vals = rng.gamma(3.0, 1000.0, size=50_000)
    sk = DDSketch(alpha=0.008, bin_limit=4096)
    sk.add_array(vals)
    probes = np.array([10.0, 500.0, 2000.0, 5000.0, 50000.0])
    got = sk.cdf(probes)
    keys = sk.keys_for(vals)
    pkeys = sk.keys_for(probes)
    exact = np.array([(keys <= pk).mean() for pk in pkeys])
    assert np.allclose(got, exact, rtol=0, atol=1e-12)
    # bucket-resolution agreement with the true CDF
    true_cdf = np.array([(vals <= p).mean() for p in probes])
    assert np.all(np.abs(got - true_cdf) <= 0.02)
    # inverse relationship: quantile(cdf(v)) ~ v within relative alpha-ish
    mid = sk.quantile(float(got[2]))
    assert abs(mid - 2000.0) / 2000.0 < 0.05


class TestWeightedInsert:
    def test_add_weighted_equals_repeated_unit_inserts(self):
        from ddsketch_ray.sketches import DDSketch

        rng = np.random.default_rng(13)
        vals = rng.lognormal(4.0, 1.0, 400)
        w = rng.integers(0, 7, 400)
        a = DDSketch(alpha=0.008, bin_limit=2048)
        a.add_weighted(vals, w)
        b = DDSketch(alpha=0.008, bin_limit=2048)
        b.add_array(np.repeat(vals, w))
        assert a.bins == b.bins
        assert a.n == b.n
        qs = [0.01, 0.5, 0.95, 0.99]
        assert a.quantiles(qs).tolist() == b.quantiles(qs).tolist()

    def test_add_weighted_validation(self):
        from ddsketch_ray.sketches import DDSketch

        sk = DDSketch(alpha=0.008)
        with pytest.raises(ValueError):
            sk.add_weighted([1.0, 2.0], [1])  # length mismatch
        with pytest.raises(ValueError):
            sk.add_weighted([1.0], [-1])  # negative
        with pytest.raises(ValueError):
            sk.add_weighted([1.0], [1.5])  # non-integral float
        sk.add_weighted([1.0, float("nan")], [2.0, 5.0])  # integral floats ok
        assert sk.n == 2 and sk.nan_dropped == 1

    def test_weighted_agg_matches_driver(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ddsketch_ray.agg import DDSketchWeightedAgg, sketch_from_result
        from ddsketch_ray.sketches import DDSketch

        rng = np.random.default_rng(21)
        vals = rng.lognormal(3.0, 1.0, 1000)
        w = rng.integers(1, 9, 1000)
        t = pa.table({"v": pa.array(vals), "w": pa.array(w.astype(np.int64))})
        ds = rd.from_arrow(t).repartition(6)
        res = ds.aggregate(
            DDSketchWeightedAgg(on="v", weight_col="w", alias_name="sk")
        )
        got = sketch_from_result(res["sk"])
        want = DDSketch(alpha=0.008, bin_limit=2048)
        want.add_weighted(vals, w)
        assert got.bins == want.bins and got.n == want.n
