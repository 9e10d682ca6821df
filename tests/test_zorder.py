"""Z-order layout (sources/zorder.py): exact results on every query
shape, pruning on the non-prefix column, null and constant-column
edges."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ddsketch_ray.sources.zorder import read_zorder_box, write_zorder, zorder_key_batch


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 120_000
    a = rng.integers(0, 10_000, n)
    b = rng.integers(0, 10_000, n)
    tbl = pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = str(tmp_path_factory.mktemp("z") / "lay")
    write_zorder(rd.from_arrow(tbl).repartition(8), out, ["a", "b"], row_group_size=4096)
    return out, tbl.to_pandas()


def test_box_queries_exact(layout):
    out, df = layout
    for box in (
        {"a": (100, 400), "b": (9_000, 9_500)},
        {"b": (250, 300)},
        {"a": (0, 10_000)},
        {"a": (5, 5)},
    ):
        got = read_zorder_box(out, box).to_pandas().sort_values("v").reset_index(drop=True)
        m = np.ones(len(df), dtype=bool)
        for c, (lo, hi) in box.items():
            m &= (df[c] >= lo) & (df[c] <= hi)
        want = df[m].sort_values("v").reset_index(drop=True)
        assert got.equals(want)


def test_second_column_prunes(layout):
    out, _ = layout
    box = {"b": (250, 300)}  # ~0.5% of the b axis
    tot = hit = 0
    for f in sorted(glob.glob(out + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            tot += 1
            st = md.row_group(g).column(names["b"]).statistics
            if not (st.max < 250 or st.min > 300):
                hit += 1
    assert tot > 10 and hit < tot / 2  # a b-only predicate really prunes


def test_nulls_and_constant_column(ray_session, tmp_path):
    import ray.data as rd

    tbl = pa.table(
        {
            "a": pa.array([1, None, 3, 4, None, 6], pa.int64()),
            "b": pa.array([7] * 6, pa.int64()),  # zero span
            "v": pa.array(range(6), pa.int64()),
        }
    )
    out = str(tmp_path / "zn")
    write_zorder(rd.from_arrow(tbl), out, ["a", "b"])
    got = read_zorder_box(out, {"a": (1, 4)}).to_pandas()
    assert sorted(got["v"].tolist()) == [0, 2, 3]  # nulls dropped exactly
    # morton key kernel: interleave really separates axes
    z = zorder_key_batch(
        pa.table({"a": pa.array([0, 3], pa.int64()), "b": pa.array([0, 3], pa.int64())}),
        ["a", "b"],
        {"a": (0.0, 3.0), "b": (0.0, 3.0)},
        bits=2,
    )
    assert z.tolist() == [0, 15]


def test_timestamp_column(ray_session, tmp_path):
    import ray.data as rd

    ts = pa.array(
        np.arange(0, 6_000_000_000, 1_000_000_000, dtype=np.int64).view("datetime64[us]"),
        type=pa.timestamp("us"),
    )
    tbl = pa.table({"ts": ts, "v": pa.array(range(6), pa.int64())})
    out = str(tmp_path / "zt")
    write_zorder(rd.from_arrow(tbl), out, ["ts", "v"])
    got = read_zorder_box(
        out, {"ts": (np.datetime64(1_000_000_000, "us"), np.datetime64(3_000_000_000, "us"))}
    ).to_pandas()
    assert sorted(got["v"].tolist()) == [1, 2, 3]


def test_wide_key_auto_reduces_bits(ray_session, tmp_path):
    """5 z columns × default 16 bits would overflow the 64-bit Morton
    key — the writer must clamp resolution, not wrap silently."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    cols = {f"c{i}": pa.array(rng.integers(0, 1000, 5000), type=pa.int64()) for i in range(5)}
    cols["v"] = pa.array(np.arange(5000, dtype=np.int64))
    tbl = pa.table(cols)
    out = str(tmp_path / "zw")
    meta = write_zorder(rd.from_arrow(tbl).repartition(4), out, [f"c{i}" for i in range(5)])
    assert meta["bits"] == 12  # 64 // 5
    box = {"c0": (100, 200), "c3": (500, 600)}
    got = read_zorder_box(out, box).to_pandas()
    df = tbl.to_pandas()
    m = (df["c0"] >= 100) & (df["c0"] <= 200) & (df["c3"] >= 500) & (df["c3"] <= 600)
    assert sorted(got["v"].tolist()) == sorted(df[m]["v"].tolist())
