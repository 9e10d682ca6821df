"""Moments sketch (sketches/moments.py — Gan et al., VLDB 2018 power
sums + Cornish-Fisher quantiles): exactness of the big-int accumulation,
merge bit-equality under arbitrary order, accuracy bands vs exact
quantiles, and bit-parity of the DuckDB expression mirror."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.sketches.moments import (
    MomentsSketch,
    Z_SCORES,
    cf_quantile_sql,
    mean_std_cf,
    moments_sql_exprs,
)


def _lognormal(n=100_000, seed=11):
    rng = np.random.default_rng(seed)
    return np.clip(rng.lognormal(9.5, 0.5, n).astype(np.int64), 1, (1 << 24) - 1)


def test_power_sums_exact_and_order_independent():
    v = _lognormal(50_000)
    sk = MomentsSketch()
    for chunk in np.array_split(v, 13):
        sk.add_array(chunk)
    vi = v.tolist()
    assert sk.n == len(vi)
    assert sk.s1 == sum(vi)
    assert sk.s2 == sum(x * x for x in vi)
    assert sk.s3 == sum(x**3 for x in vi)
    assert sk.s4 == sum(x**4 for x in vi)
    assert sk.vmin == min(vi) and sk.vmax == max(vi)
    # permuted insertion order -> bit-identical state
    rng = np.random.default_rng(0)
    sk2 = MomentsSketch()
    for chunk in np.array_split(v[rng.permutation(v.size)], 7):
        sk2.add_array(chunk)
    assert sk.to_row() == sk2.to_row()


def test_merge_bit_equality_and_roundtrip():
    v = _lognormal(30_000)
    whole = MomentsSketch()
    whole.add_array(v)
    parts = []
    for chunk in np.array_split(v, 5):
        p = MomentsSketch()
        p.add_array(chunk)
        parts.append(p)
    m = parts[3]
    for p in (parts[0], parts[4], parts[1], parts[2]):
        m.merge(p)
    assert m.to_row() == whole.to_row()
    assert MomentsSketch.from_row(whole.to_row()).to_row() == whole.to_row()


def test_negative_values_and_range_guard():
    sk = MomentsSketch()
    sk.add_array(np.array([-5, -3, 0, 3, 5], dtype=np.int64))
    assert sk.s1 == 0 and sk.s3 == 0
    assert sk.s2 == 2 * (25 + 9) and sk.s4 == 2 * (625 + 81)
    assert sk.vmin == -5 and sk.vmax == 5
    with pytest.raises(ValueError):
        sk.add_array(np.array([1 << 24], dtype=np.int64))


def test_quantile_accuracy_lognormal_and_normal():
    # CF with 4 moments: tight on near-normal, still usable on the
    # skewed lognormal web-ish distribution (bounds chosen from the
    # measured errors with margin; regression guard, not theory)
    v = _lognormal(200_000)
    sk = MomentsSketch()
    sk.add_array(v)
    for q, tol in ((0.5, 0.07), (0.95, 0.04), (0.99, 0.14)):
        exact = float(np.quantile(v, q))
        assert abs(sk.quantile(q) - exact) / exact < tol, q
    rng = np.random.default_rng(5)
    g = np.round(rng.normal(50_000, 5_000, 200_000)).astype(np.int64)
    skg = MomentsSketch()
    skg.add_array(g)
    for q in (0.5, 0.9, 0.95, 0.99):
        exact = float(np.quantile(g, q))
        assert abs(skg.quantile(q) - exact) / exact < 0.01, q


def test_constant_column_and_empty():
    sk = MomentsSketch()
    assert math.isnan(sk.quantile(0.5))
    sk.add_array(np.full(100, 42, dtype=np.int64))
    mo = sk.moments()
    assert mo["std"] == 0.0 and mo["skew"] == 0.0 and mo["kurt"] == 0.0
    assert sk.quantile(0.99) == 42.0  # clamped to [min, max]


def test_sql_mirror_bit_parity():
    v = _lognormal(80_000, seed=3)
    sk = MomentsSketch()
    sk.add_array(v)
    mo = sk.moments()
    e = moments_sql_exprs("")

    def cf(q):
        return cf_quantile_sql(
            e["mean"], e["std"], e["g1"], e["g2"], Z_SCORES[q],
            "CAST(vmin AS DOUBLE)", "CAST(vmax AS DOUBLE)",
        )

    con = duckdb.connect()
    con.register("t", pa.table({"v": v}))
    row = con.execute(
        f"""WITH s AS (SELECT COUNT(*)::BIGINT n, SUM(CAST(v AS HUGEINT)) s1,
        SUM(CAST(v AS HUGEINT)*v) s2, SUM(CAST(v AS HUGEINT)*v*v) s3,
        SUM(CAST(v AS HUGEINT)*v*v*v) s4, MIN(v) vmin, MAX(v) vmax FROM t)
        SELECT {e['mean']}, {e['std']}, {e['g1']}, {e['g2']},
               {cf(0.5)}, {cf(0.95)}, {cf(0.99)} FROM s"""
    ).fetchone()
    py = (mo["mean"], mo["std"], mo["skew"], mo["kurt"],
          sk.quantile(0.5), sk.quantile(0.95), sk.quantile(0.99))
    assert row == py  # bit-for-bit


def test_cf_formula_mirrors_z_table():
    # the Python literal and the SQL literal must parse to the same double
    for q, lit in Z_SCORES.items():
        z = float(lit)
        got = duckdb.sql(f"SELECT CAST({lit} AS DOUBLE)").fetchone()[0]
        assert got == z
    # and mean_std_cf at zero skew/kurt is the plain normal quantile
    assert mean_std_cf(10.0, 2.0, 0.0, 0.0, 1.5) == 10.0 + 2.0 * 1.5


# ------------------------------------------------------- property tests
from hypothesis import given, settings, strategies as st

_vals = st.lists(
    st.integers(min_value=-(1 << 24) + 1, max_value=(1 << 24) - 1),
    min_size=0, max_size=300,
)


@settings(max_examples=60, deadline=None)
@given(_vals, st.integers(min_value=1, max_value=7))
def test_prop_power_sums_exact(vals, nparts):
    sk = MomentsSketch()
    arr = np.array(vals, dtype=np.int64)
    for chunk in np.array_split(arr, nparts):
        sk.add_array(chunk)
    assert sk.n == len(vals)
    assert sk.s1 == sum(vals)
    assert sk.s2 == sum(x * x for x in vals)
    assert sk.s3 == sum(x**3 for x in vals)
    assert sk.s4 == sum(x**4 for x in vals)


@settings(max_examples=40, deadline=None)
@given(_vals, _vals, _vals)
def test_prop_merge_associative_commutative(a, b, c):
    def mk(v):
        sk = MomentsSketch()
        sk.add_array(np.array(v, dtype=np.int64))
        return sk

    left = mk(a).merge(mk(b)).merge(mk(c))
    right = mk(c).merge(mk(b).merge(mk(a)))
    single = mk(a + b + c)
    assert left.to_row() == right.to_row() == single.to_row()
