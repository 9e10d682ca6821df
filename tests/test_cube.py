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


def test_append_equals_union(cube_dirs, ray_session, tmp_path):
    import ray.data as rd

    from ddsketch_ray.agg import HLLAgg
    from ddsketch_ray.functions.cube import append_to_sketch_cube, write_sketch_cube
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HyperLogLog

    base = _events_tbl(n=8000, seed=1)
    extra = _events_tbl(n=6000, seed=2)
    d = str(tmp_path / "appendcube")
    agg = lambda: HLLAgg(on="user", raw=True, alias_name="cell")  # noqa: E731
    write_sketch_cube(rd.from_arrow(base).repartition(4), ["etype"], agg(), d)
    m = append_to_sketch_cube(rd.from_arrow(extra).repartition(3), agg(), d)
    assert m["n_cells"] >= 3
    groups = grouped_cube_merge(d, ["etype"])
    both = pa.concat_tables([base, extra]).to_pandas()
    for (et,), sk in groups.items():
        direct = HyperLogLog(p=14)
        direct.add_hashed(
            hash_ints(both.loc[both["etype"] == et, "user"].to_numpy().astype(np.int64))
        )
        assert np.array_equal(sk.registers, direct.registers), et


def test_cell_map_job_cold_equals_resumed(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ddsketch_ray.agg import drop_nulls, hash_any_column
    from ddsketch_ray.functions.cube import (
        CellMap,
        build_cell_map,
        write_cube_from_map,
    )
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HyperLogLog
    from ddsketch_ray.state import CheckpointedSketchJob

    tbl = _events_tbl(n=9000, seed=8)
    files = []
    for i in range(3):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(tbl.slice(i * 3000, 3000), p)
        files.append(p)

    make = lambda: HyperLogLog(p=14)  # noqa: E731

    def add(sk, t, idx):
        c = drop_nulls(t.column("user").take(idx), True)
        sk.add_hashed(hash_any_column(c, True))

    def build(t):
        return build_cell_map(t, ["etype"], make, add)

    def run(out):
        job = CheckpointedSketchJob(
            files, build, columns=["etype", "user"],
            ckpt_dir=str(tmp_path / "ckpt"), run_id="cube-r",
        )
        pending = len(job.pending_partitions())
        cmap = job.run(concurrency=2)
        write_cube_from_map(cmap, ["etype"], out)
        return pending

    p1 = run(str(tmp_path / "cube1"))
    p2 = run(str(tmp_path / "cube2"))
    assert p1 == 3 and p2 == 0  # second run resumes fully
    t1 = pq.read_table(str(tmp_path / "cube1" / "cells-00000.parquet"))
    t2 = pq.read_table(str(tmp_path / "cube2" / "cells-00000.parquet"))
    assert t1.equals(t2)
    # and the cube equals a direct build
    df = tbl.to_pandas()
    groups = grouped_cube_merge(str(tmp_path / "cube1"), ["etype"])
    for (et,), sk in groups.items():
        direct = HyperLogLog(p=14)
        direct.add_hashed(
            hash_ints(df.loc[df["etype"] == et, "user"].to_numpy().astype(np.int64))
        )
        assert np.array_equal(sk.registers, direct.registers)


def test_cell_map_merge_order_independent():
    from ddsketch_ray.functions.cube import CellMap
    from ddsketch_ray.sketches import HyperLogLog
    from ddsketch_ray.hashing import hash_ints

    def mk(vals):
        sk = HyperLogLog(p=10)
        sk.add_hashed(hash_ints(np.asarray(vals, dtype=np.int64)))
        return sk

    a = CellMap({("x",): mk([1, 2]), ("y",): mk([3])})
    b = CellMap({("x",): mk([2, 5]), ("z",): mk([9])})
    ab = CellMap({k: mk_v for k, mk_v in a.cells.items()})
    import pickle

    a2 = pickle.loads(pickle.dumps(a))
    b2 = pickle.loads(pickle.dumps(b))
    m1 = a2.merge(b2)
    m2 = pickle.loads(pickle.dumps(b)).merge(pickle.loads(pickle.dumps(a)))
    assert m1.size == m2.size == 3
    for k in m1.cells:
        assert np.array_equal(m1.cells[k].registers, m2.cells[k].registers)


def test_partials_plan_equals_groupby_plan(cube_dirs, ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ddsketch_ray.functions.cube import (
        dds_cell,
        hll_cell,
        write_sketch_cube_partials,
    )

    tbl, hll_dir, dds_dir, _, _ = cube_dirs
    ds = rd.from_arrow(tbl).repartition(6)
    d1 = str(tmp_path / "p_hll")
    write_sketch_cube_partials(ds, ["etype", "day"], *hll_cell("user"), out_dir=d1)
    d2 = str(tmp_path / "p_dds")
    write_sketch_cube_partials(
        ds, ["etype", "day"], *dds_cell("val", alpha=0.01, bin_limit=4096), out_dir=d2
    )
    for part_dir, gb_dir in [(d1, hll_dir), (d2, dds_dir)]:
        a = grouped_cube_merge(part_dir, ["etype", "day"])
        b = grouped_cube_merge(gb_dir, ["etype", "day"])
        assert set(a) == set(b)
        for k in a:
            sa, sb = a[k], b[k]
            if hasattr(sa, "registers"):
                assert np.array_equal(sa.registers, sb.registers), k
            else:
                assert sa.bins == sb.bins, k


def test_dyadic_cube_equals_direct_per_group(ray_session, tmp_path):
    """dyadic_cell cube: per-group cells must be BIT-IDENTICAL (per-level
    CM tables) to direct builds over each group's rows — merge is exact
    table addition — and range counts served from the cube must equal
    the direct sketch's."""
    import ray.data as rd

    from ddsketch_ray.functions.cube import (
        dyadic_cell,
        grouped_cube_merge,
        write_sketch_cube_partials,
    )
    from ddsketch_ray.sketches import DyadicCountMin

    tbl = _events_tbl()
    cents = np.rint(tbl.column("val").to_numpy() * 100.0).astype(np.int64)
    tbl = tbl.append_column("cents", pa.array(cents, pa.int64()))
    ds = rd.from_arrow(tbl).repartition(6)
    d = str(tmp_path / "dcm")
    write_sketch_cube_partials(
        ds, ["etype", "day"], *dyadic_cell("cents", levels=16, width=256, depth=3), out_dir=d
    )
    groups = grouped_cube_merge(d, ["etype"])
    df = tbl.to_pandas()
    assert set(groups) == {("a",), ("b",), ("c",)}
    for (et,), sk in groups.items():
        direct = DyadicCountMin(levels=16, width=256, depth=3)
        direct.add_values(df.loc[df["etype"] == et, "cents"].to_numpy())
        assert sk.n == direct.n
        assert np.array_equal(sk.tables, direct.tables)
        for lo, hi in [(0, 999), (1000, 9999), (123, 45678)]:
            assert sk.range_count(lo, hi) == direct.range_count(lo, hi)
