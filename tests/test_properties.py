"""Property-based tests (hypothesis) — the north rule names merge
associativity/commutativity explicitly; these fuzz the algebra beyond
the fixed-seed cases in test_ddsketch.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from ddsketch_ray.sketches import DDSketch, HyperLogLog, CountMin, BloomFilter
from ddsketch_ray.hashing import splitmix64

finite_doubles = st.floats(
    allow_nan=False,
    allow_infinity=False,
    min_value=-1e12,
    max_value=1e12,
)


def _sketch_of(vals, bin_limit=100_000):
    sk = DDSketch(alpha=0.008, bin_limit=bin_limit)
    sk.add_array(np.array(vals, dtype=np.float64))
    return sk


@settings(max_examples=40, deadline=None)
@given(st.lists(finite_doubles, min_size=0, max_size=200),
       st.lists(finite_doubles, min_size=0, max_size=200))
def test_ddsketch_merge_commutative(a, b):
    ab = _sketch_of(a).merge(_sketch_of(b))
    ba = _sketch_of(b).merge(_sketch_of(a))
    assert ab.bins == ba.bins
    assert ab.n == ba.n


@settings(max_examples=40, deadline=None)
@given(st.lists(finite_doubles, min_size=0, max_size=120),
       st.lists(finite_doubles, min_size=0, max_size=120),
       st.lists(finite_doubles, min_size=0, max_size=120))
def test_ddsketch_merge_associative(a, b, c):
    left = _sketch_of(a).merge(_sketch_of(b)).merge(_sketch_of(c))
    right = _sketch_of(a).merge(_sketch_of(b).merge(_sketch_of(c)))
    assert left.bins == right.bins
    assert left.n == right.n


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=400),
       st.floats(min_value=0.0, max_value=1.0))
def test_ddsketch_quantile_bound(vals, q):
    vals = [v for v in vals if v == 0 or abs(v) > 1e-300]
    if not vals:
        return
    sk = _sketch_of(vals)
    est = sk.quantile(q)
    arr = np.sort(np.array(vals, dtype=np.float64))
    idx = int(np.floor(q * (len(arr) - 1)))
    exact = arr[min(max(idx, 0), len(arr) - 1)]
    if exact == 0:
        assert abs(est) <= 1e-12
    else:
        assert abs((est - exact) / exact) <= sk.alpha + 1e-9


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 62), min_size=0, max_size=500))
def test_hll_merge_equals_union(xs):
    h = splitmix64(np.array(xs, dtype=np.uint64)) if xs else np.empty(0, np.uint64)
    half = len(h) // 2
    a, b = HyperLogLog(p=10), HyperLogLog(p=10)
    a.add_hashed(h[:half])
    b.add_hashed(h[half:])
    mono = HyperLogLog(p=10)
    mono.add_hashed(h)
    assert np.array_equal(a.merge(b).registers, mono.registers)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 62), min_size=0, max_size=300))
def test_cms_bloom_merge_equals_union(xs):
    h = splitmix64(np.array(xs, dtype=np.uint64)) if xs else np.empty(0, np.uint64)
    half = len(h) // 2
    ca, cb, cm = (CountMin(width=64, depth=3) for _ in range(3))
    ca.add_hashed(h[:half]); cb.add_hashed(h[half:]); cm.add_hashed(h)
    assert np.array_equal(ca.merge(cb).table, cm.table)
    ba, bb, bm = (BloomFilter(m=512, k=3) for _ in range(3))
    ba.add_hashed(h[:half]); bb.add_hashed(h[half:]); bm.add_hashed(h)
    assert np.array_equal(ba.merge(bb).words, bm.words)
