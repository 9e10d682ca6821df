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


# ---------------------------------------------------------------- joins
# Randomized cross-checks of the two shuffle-join kernels against DuckDB.
# Few examples (each spins a Ray pipeline), but the generator covers the
# edge shapes that broke kernels in review: null keys, duplicate
# timestamps, empty sides, single-key skew, keys missing from one side.


@settings(max_examples=6, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 5),      # distinct keys
    st.integers(1, 60),     # left rows (>=1: Ray empty datasets are schema-less)
    st.integers(1, 60),     # right rows
    st.floats(0.0, 0.3),    # null-key fraction
)
def test_asof_join_sorted_random_vs_duckdb(ray_session, seed, nk, nl, nr, nullfrac):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.joins import asof_join_sorted

    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")

    def frame(n, with_val):
        keys = pd.array(
            [None if rng.random() < nullfrac else int(x) for x in rng.integers(0, nk, n)],
            dtype="Int64",
        )
        df = pd.DataFrame(
            {"k": keys,
             "ts": base + rng.integers(0, 40, n).astype("timedelta64[s]").astype("timedelta64[us]")}
        )
        if with_val:
            df["v"] = np.round(rng.normal(size=len(df)), 6)
        else:
            df["event_id"] = np.arange(len(df), dtype=np.int64)
        return df

    ldf, rdf = frame(nl, False), frame(nr, True)
    # duplicate (k, ts) on the right make the as-of tie-pick ambiguous
    # (both DuckDB and this engine choose arbitrarily) — drop them
    rdf = rdf.drop_duplicates(["k", "ts"])
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    for how, join_sql in (("inner", "ASOF JOIN"), ("left", "ASOF LEFT JOIN")):
        out = (
            asof_join_sorted(
                rd.from_pandas(ldf).repartition(3),
                rd.from_pandas(rdf).repartition(2),
                "k", "ts", ["event_id"], ["v"], how=how,
            )
            .to_pandas()
        )
        if out.empty:
            out = pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                                "v_ref": pd.Series(dtype=np.float64)})
        out = out.sort_values("event_id").reset_index(drop=True)
        want = con.sql(
            f"SELECT l.event_id, r.v FROM l {join_sql} r "
            "ON l.k = r.k AND l.ts > r.ts ORDER BY event_id"
        ).df()
        assert out["event_id"].tolist() == want["event_id"].astype(int).tolist(), (how, seed)
        a = out["v_ref"].to_numpy(dtype=np.float64)
        b = want["v"].to_numpy(dtype=np.float64)
        assert np.array_equal(np.isnan(a), np.isnan(b)), (how, seed)
        assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)]), (how, seed)


@settings(max_examples=6, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 6),      # distinct keys
    st.integers(1, 80),     # left rows (>=1: Ray empty datasets are schema-less)
    st.integers(1, 40),     # right rows
    st.integers(1, 3),      # salt
)
def test_equi_join_shuffle_random_vs_duckdb(ray_session, seed, nk, nl, nr, salt):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.joins import equi_join_shuffle

    rng = np.random.default_rng(seed)
    ldf = pd.DataFrame(
        {
            "k": pd.array(
                [None if rng.random() < 0.15 else int(x) for x in rng.integers(0, nk, nl)],
                dtype="Int64",
            ),
            "lid": np.arange(nl, dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "k": pd.array(
                [None if rng.random() < 0.15 else int(x) for x in rng.integers(0, nk + 2, nr)],
                dtype="Int64",
            ),
            "rv": np.round(rng.normal(size=nr), 6),
        }
    )
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    for how, join_sql in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        out = (
            equi_join_shuffle(
                rd.from_pandas(ldf).repartition(3),
                rd.from_pandas(rdf).repartition(2),
                "k", "k", ["lid"], ["rv"], num_buckets=4, how=how, salt=salt,
            )
            .to_pandas()
        )
        if out.empty:
            out = pd.DataFrame({"k": pd.Series(dtype=np.int64),
                                "lid": pd.Series(dtype=np.int64),
                                "rv": pd.Series(dtype=np.float64)})
        out = out.sort_values(["lid", "rv"]).reset_index(drop=True)
        want = con.sql(
            f"SELECT l.lid, r.rv FROM l {join_sql} r ON l.k = r.k ORDER BY lid, rv"
        ).df()
        assert out["lid"].tolist() == want["lid"].astype(int).tolist(), (how, seed)
        a = out["rv"].to_numpy(dtype=np.float64)
        b = want["rv"].to_numpy(dtype=np.float64)
        assert np.array_equal(np.isnan(a), np.isnan(b)), (how, seed)
        assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)]), (how, seed)
