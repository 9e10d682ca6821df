"""Sketch-driven distribution analytics tests (functions/distribution.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.distribution import (
    grouped_sketches,
    ks_distance,
    percentile_rank,
    range_partition_by_quantiles,
)


def _tbl(values, groups):
    return pa.table(
        {
            "g": pa.array(groups, type=pa.string()),
            "v": pa.array(np.asarray(values, dtype=np.float64)),
        }
    )


def test_ks_identical_distributions_is_zero(ray_session):
    import ray.data as rd

    vals = np.linspace(1.0, 100.0, 500)
    ds = rd.from_arrow(
        _tbl(np.concatenate([vals, vals]), ["a"] * 500 + ["b"] * 500)
    ).repartition(4)
    out = ks_distance(ds, "v", "g", "a", "b")
    assert out["ks"] == 0.0
    assert out["n_a"] == out["n_b"] == 500


def test_ks_disjoint_distributions_is_one(ray_session):
    import ray.data as rd

    a = np.linspace(1.0, 2.0, 300)
    b = np.linspace(1000.0, 2000.0, 200)
    ds = rd.from_arrow(
        _tbl(np.concatenate([a, b]), ["a"] * 300 + ["b"] * 200)
    ).repartition(5)
    out = ks_distance(ds, "v", "g", "a", "b")
    assert out["ks"] == 1.0


def test_ks_matches_bucket_reference_and_layouts(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    a = rng.normal(50, 10, 800)
    b = rng.normal(60, 15, 600)
    tbl = _tbl(np.concatenate([a, b]), ["a"] * 800 + ["b"] * 600)

    got = []
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got.append(ks_distance(ds, "v", "g", "a", "b"))
    assert got[0] == got[1]  # layout invariance (sketch merge assoc.)

    # driver reference over the same sketches' bucket tables
    ds = rd.from_arrow(tbl).repartition(3)
    sks = grouped_sketches(ds, "v", "g")
    keys = sorted(set(sks["a"].bins) | set(sks["b"].bins))
    ca = cb = 0
    best = 0.0
    for k in keys:
        ca += sks["a"].bins.get(k, 0)
        cb += sks["b"].bins.get(k, 0)
        best = max(best, abs(ca / sks["a"].n - cb / sks["b"].n))
    assert got[0]["ks"] == pytest.approx(best, abs=0)

    # KS of N(50,10) vs N(60,15) at these sizes is substantial
    assert 0.15 < got[0]["ks"] < 0.6


def test_ks_missing_group_raises(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl([1.0, 2.0], ["a", "a"]))
    with pytest.raises(ValueError):
        ks_distance(ds, "v", "g", "a", "zzz")


def test_range_partition_balanced_and_invariant(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vals = rng.lognormal(3.0, 1.0, 4000)
    tbl = pa.table({"v": pa.array(vals)})
    outs = []
    for parts in (1, 8):
        ds = rd.from_arrow(tbl).repartition(parts)
        with_pid, cuts = range_partition_by_quantiles(ds, "v", 8)
        df = with_pid.to_pandas()
        outs.append((sorted(df.groupby("pid").size().items()), cuts.tolist()))
        assert list(cuts) == sorted(cuts)
        assert set(df["pid"].unique()) <= set(range(8))
        sizes = df.groupby("pid").size()
        # equal-frequency within sketch accuracy + duplicate-value slack
        assert sizes.min() > 4000 / 8 * 0.7
        assert sizes.max() < 4000 / 8 * 1.3
    assert outs[0] == outs[1]


def test_percentile_rank_matches_driver_cdf(ray_session):
    import ray.data as rd

    from ddsketch_ray.sketches.ddsketch import DDSketch

    rng = np.random.default_rng(4)
    vals = rng.lognormal(2.0, 1.5, 1500)
    tbl = pa.table({"v": pa.array(vals)})
    outs = []
    for parts in (1, 6):
        ds = rd.from_arrow(tbl).repartition(parts)
        df = percentile_rank(ds, "v").to_pandas()
        outs.append(df.sort_values("v").reset_index(drop=True))
    # layout invariance
    assert outs[0].equals(outs[1])
    # matches a driver-side sketch of the same values
    sk = DDSketch(alpha=0.008, bin_limit=2048)
    sk.add_array(vals)
    want = sk.cdf(outs[0]["v"].to_numpy())
    assert np.array_equal(outs[0]["pct_rank"].to_numpy(), want)
    # ranks are sane: monotone in value, ends near 0 and 1
    r = outs[0]["pct_rank"].to_numpy()
    assert (np.diff(r) >= 0).all()
    assert r[0] <= 0.01 and r[-1] == 1.0


def test_percentile_rank_null_and_nan(ray_session):
    import ray.data as rd

    tbl = pa.table({"v": pa.array([1.0, None, float("nan"), 100.0])})
    df = percentile_rank(rd.from_arrow(tbl), "v").to_pandas()
    assert np.isnan(df["pct_rank"][1]) and np.isnan(df["pct_rank"][2])
    assert df["pct_rank"][3] == 1.0


def test_percentile_rank_grouped(ray_session):
    import ray.data as rd

    from ddsketch_ray.sketches.ddsketch import DDSketch

    rng = np.random.default_rng(8)
    va = rng.lognormal(2.0, 1.0, 400)
    vb = rng.lognormal(5.0, 0.5, 300)
    tbl = pa.table(
        {
            "g": pa.array(["a"] * 400 + ["b"] * 300),
            "v": pa.array(np.concatenate([va, vb])),
        }
    )
    ds = rd.from_arrow(tbl).repartition(5)
    df = percentile_rank(ds, "v", group_col="g").to_pandas()
    for grp, vals in (("a", va), ("b", vb)):
        sk = DDSketch(alpha=0.008, bin_limit=2048)
        sk.add_array(vals)
        sub = df[df["g"] == grp]
        want = sk.cdf(sub["v"].to_numpy())
        assert np.array_equal(sub["pct_rank"].to_numpy(), want)
    # group-local normalization: each group's max value ranks 1.0
    assert df.groupby("g")["pct_rank"].max().tolist() == [1.0, 1.0]


def test_range_partition_nulls_get_minus_one(ray_session):
    import ray.data as rd

    tbl = pa.table({"v": pa.array([1.0, None, 5.0, float("nan"), 9.0, 2.0])})
    ds = rd.from_arrow(tbl)
    with_pid, _ = range_partition_by_quantiles(ds, "v", 2)
    pids = with_pid.to_pandas()["pid"].tolist()
    assert pids[1] == -1 and pids[3] == -1
    assert all(p >= 0 for i, p in enumerate(pids) if i not in (1, 3))


def test_grouped_sketch_partials_bit_equal_plans(ray_session):
    """grouped_sketch_partials (two-level small-key plan) must be
    bit-identical to Ray's groupby().aggregate AND to a driver-side
    reference for the exactly-mergeable MomentsSketch."""
    import ray.data as rd

    from ddsketch_ray.agg import MomentsAgg, sketch_from_result
    from ddsketch_ray.functions.distribution import grouped_sketch_partials
    from ddsketch_ray.sketches.moments import MomentsSketch

    rng = np.random.default_rng(3)
    n = 20_000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.integers(-1000, 100_000, n)
    t = pa.table({"g": pa.array(g.tolist(), type=pa.string()),
                  "v": pa.array(v, type=pa.int64())})
    ds = rd.from_arrow(t).repartition(7)

    sks = grouped_sketch_partials(ds, MomentsSketch, "v", "g")
    rows = ds.groupby("g").aggregate(MomentsAgg(on="v", alias_name="mo")).to_pandas()
    via_agg = {r["g"]: sketch_from_result(r["mo"]) for _, r in rows.iterrows()}
    assert set(sks) == {"a", "b", "c"} == set(via_agg)
    for k in sks:
        ref = MomentsSketch()
        ref.add_array(v[g == k])
        assert sks[k].to_row() == ref.to_row() == via_agg[k].to_row()


def test_grouped_sketch_partials_empty_blocks(ray_session):
    import ray.data as rd

    from ddsketch_ray.functions.distribution import grouped_sketch_partials
    from ddsketch_ray.sketches.moments import MomentsSketch

    t = pa.table({"g": pa.array(["x"] * 5, type=pa.string()),
                  "v": pa.array(range(5), type=pa.int64())})
    ds = rd.from_arrow(t).repartition(8)  # most blocks empty
    sks = grouped_sketch_partials(ds, MomentsSketch, "v", "g")
    assert list(sks) == ["x"] and sks["x"].n == 5 and sks["x"].s1 == 10
