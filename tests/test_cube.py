"""Sketch cube (functions/cube.py): cube answers must EQUAL direct
raw-data builds by merge algebra — HLL register-identical, DDSketch
bucket-identical (no collapse) — plus slice pruning, grouped merge,
rolling windows, and the O(blocks) query path."""

import os
import pickle

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.cube import (
    grouped_cube_merge,
    query_sketch_cube,
    read_cube_manifest,
    rolling_cube_merge,
    write_sketch_cube,
)


def _events_tbl(n=20_000, seed=4):
    rng = np.random.default_rng(seed)
    day_idx = rng.integers(0, 20, n)
    days = np.array([str(np.datetime64("2024-01-01") + d) for d in range(20)])
    return pa.table(
        {
            "etype": rng.choice(["a", "b", "c"], n),
            "day": days[day_idx],
            "user": rng.integers(0, 3000, n),
            "val": rng.uniform(0.1, 500.0, n),
        }
    )


@pytest.fixture(scope="module")
def cube_dirs(ray_session, tmp_path_factory):
    import ray.data as rd

    from ddsketch_ray.agg import DDSketchAgg, HLLAgg

    tbl = _events_tbl()
    ds = rd.from_arrow(tbl).repartition(6)
    hll_dir = str(tmp_path_factory.mktemp("cube") / "hll")
    dds_dir = str(tmp_path_factory.mktemp("cube") / "dds")
    m1 = write_sketch_cube(
        ds, ["etype", "day"], HLLAgg(on="user", raw=True, alias_name="cell"), hll_dir
    )
    m2 = write_sketch_cube(
        ds,
        ["etype", "day"],
        DDSketchAgg(on="val", qs=None, alpha=0.01, bin_limit=4096, alias_name="cell"),
        dds_dir,
    )
    return tbl, hll_dir, dds_dir, m1, m2


def test_manifest_and_cell_count(cube_dirs):
    tbl, hll_dir, dds_dir, m1, m2 = cube_dirs
    import pandas as pd

    df = tbl.to_pandas()
    n_cells = df.groupby(["etype", "day"]).ngroups
    assert m1["n_cells"] == n_cells == m2["n_cells"]
    assert read_cube_manifest(hll_dir)["dims"] == ["etype", "day"]


def test_hll_cube_equals_direct(cube_dirs, ray_session):
    tbl, hll_dir, _, _, _ = cube_dirs
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HyperLogLog

    merged = query_sketch_cube(hll_dir)
    direct = HyperLogLog(p=14)
    direct.add_hashed(hash_ints(tbl.column("user").to_numpy().astype(np.int64)))
    assert np.array_equal(merged.registers, direct.registers)
    assert merged.cardinality() == direct.cardinality()


def test_slice_prunes_and_equals_direct(cube_dirs):
    tbl, hll_dir, _, _, _ = cube_dirs
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HyperLogLog

    df = tbl.to_pandas()
    sel = df[df["etype"] == "b"]
    merged = query_sketch_cube(hll_dir, where={"etype": "b"})
    direct = HyperLogLog(p=14)
    direct.add_hashed(hash_ints(sel["user"].to_numpy().astype(np.int64)))
    assert np.array_equal(merged.registers, direct.registers)
    # no-match slice
    assert query_sketch_cube(hll_dir, where={"etype": "zzz"}) is None


def test_dds_cube_equals_direct(cube_dirs):
    tbl, _, dds_dir, _, _ = cube_dirs
    from ddsketch_ray.sketches import DDSketch

    merged = query_sketch_cube(dds_dir)
    direct = DDSketch(alpha=0.01, bin_limit=4096)
    direct.add_array(tbl.column("val").to_numpy())
    assert merged.size == direct.size
    assert merged.bins == direct.bins
    for q in (0.5, 0.95, 0.99):
        assert merged.quantile(q) == direct.quantile(q)


def test_grouped_merge_equals_per_group_direct(cube_dirs):
    tbl, hll_dir, _, _, _ = cube_dirs
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HyperLogLog

    groups = grouped_cube_merge(hll_dir, ["etype"])
    df = tbl.to_pandas()
    assert set(groups) == {("a",), ("b",), ("c",)}
    for (et,), sk in groups.items():
        direct = HyperLogLog(p=14)
        direct.add_hashed(
            hash_ints(df.loc[df["etype"] == et, "user"].to_numpy().astype(np.int64))
        )
        assert np.array_equal(sk.registers, direct.registers)


def test_rolling_window_equals_direct(cube_dirs):
    tbl, hll_dir, _, _, _ = cube_dirs
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HyperLogLog

    window = 7
    rolled = rolling_cube_merge(hll_dir, "day", window=window)
    df = tbl.to_pandas()
    days = sorted(df["day"].unique())
    assert sorted(rolled) == days
    for d in days:
        lo = str(np.datetime64(d) - np.timedelta64(window - 1, "D"))
        sel = df[(df["day"] >= lo) & (df["day"] <= d)]
        direct = HyperLogLog(p=14)
        direct.add_hashed(hash_ints(sel["user"].to_numpy().astype(np.int64)))
        assert np.array_equal(rolled[d].registers, direct.registers), d


def test_validation(ray_session, tmp_path):
    import ray.data as rd

    from ddsketch_ray.agg import HLLAgg

    ds = rd.from_arrow(pa.table({"a": ["x"], "u": [1]}))
    with pytest.raises(ValueError):
        write_sketch_cube(ds, [], HLLAgg(on="u", raw=True), str(tmp_path / "c"))
