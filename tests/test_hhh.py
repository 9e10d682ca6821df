"""Hierarchical heavy hitters (functions/analytics.py::
hierarchical_heavy_hitters — exact discounted variant of Cormode et al.
VLDB 2003): hand-checked example, the coverage guarantee, discount
accounting, weighted mass, layout invariance, and input validation."""

import math

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.analytics import hierarchical_heavy_hitters


def _ds(tbl, blocks=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


def test_hand_example(ray_session):
    # 10 rows, phi=0.3 -> T=3.
    # leaves: a/x=4 (HHH), a/y=2, b/x=3 (HHH), b/y=1
    # level1: a cnt=6 disc=2 (not HHH), b cnt=4 disc=1 (not HHH)
    # root: cnt=10 disc=3 (HHH, path "")
    tbl = pa.table(
        {
            "g": list("aaaaaabbbb"),
            "s": ["x", "x", "x", "x", "y", "y", "x", "x", "x", "y"],
        }
    )
    out = hierarchical_heavy_hitters(_ds(tbl), ["g", "s"], phi=0.3)
    rows = list(out.itertuples(index=False, name=None))
    assert rows == [
        (0, "", 10, 3),
        (2, "a/x", 4, 4),
        (2, "b/x", 3, 3),
    ]


def _rand_table(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.choice([f"g{i}" for i in range(8)], n, p=None)
    s = rng.choice([f"s{i}" for i in range(15)], n)
    w = rng.integers(1, 5, n).astype(np.int64)
    return pa.table({"g": g, "s": s, "w": w})


def test_coverage_and_accounting(ray_session):
    tbl = _rand_table()
    n = tbl.num_rows
    phi = 0.04
    t = max(1, math.ceil(phi * n))
    out = hierarchical_heavy_hitters(_ds(tbl), ["g", "s"], phi=phi)
    assert (out["disc"] >= t).all()
    # discounted masses are disjoint: they can never exceed N
    assert out["disc"].sum() <= n
    # coverage: every prefix with TRUE count >= T has an HHH
    # descendant-or-self (leaf with count>=T, or the (g,) node, or root)
    import pandas as pd

    df = tbl.to_pandas()
    leaf = df.groupby(["g", "s"]).size()
    lvl1 = df.groupby("g").size()
    hhh_paths = set(zip(out["level"], out["path"]))
    leaf_hhh_prefixes = {
        p.split("/")[0] for lv, p in hhh_paths if lv == 2
    }
    for g, cnt in lvl1.items():
        if cnt >= t:
            assert (
                (1, g) in hhh_paths
                or g in leaf_hhh_prefixes
                or (0, "") in hhh_paths
            ), g
    for (g, s), cnt in leaf.items():
        if cnt >= t:
            assert (2, f"{g}/{s}") in hhh_paths


def test_weighted_mass(ray_session):
    tbl = _rand_table(seed=9)
    phi = 0.05
    out_w = hierarchical_heavy_hitters(
        _ds(tbl), ["g", "s"], phi=phi, weight_col="w"
    )
    # reference: explode rows by weight and run the count variant
    df = tbl.to_pandas()
    exploded = df.loc[df.index.repeat(df["w"])].reset_index(drop=True)
    out_c = hierarchical_heavy_hitters(
        _ds(pa.Table.from_pandas(exploded[["g", "s"]])), ["g", "s"], phi=phi
    )
    assert out_w.equals(out_c)


def test_layout_invariance(ray_session):
    tbl = _rand_table(seed=5)
    a = hierarchical_heavy_hitters(_ds(tbl, blocks=2), ["g", "s"], phi=0.03)
    b = hierarchical_heavy_hitters(_ds(tbl, blocks=11), ["g", "s"], phi=0.03)
    assert a.equals(b)


def test_single_level_and_validation(ray_session):
    tbl = pa.table({"g": ["a"] * 7 + ["b"] * 3})
    out = hierarchical_heavy_hitters(_ds(tbl), ["g"], phi=0.5)
    # T=5: a (7) is HHH; root disc = 3 < 5
    assert list(out.itertuples(index=False, name=None)) == [(1, "a", 7, 7)]
    with pytest.raises(ValueError):
        hierarchical_heavy_hitters(_ds(tbl), [], phi=0.5)
    with pytest.raises(ValueError):
        hierarchical_heavy_hitters(_ds(tbl), ["g"], phi=0.0)
    null_tbl = pa.table({"g": ["a", None, "b"]})
    with pytest.raises(ValueError):
        hierarchical_heavy_hitters(_ds(null_tbl), ["g"], phi=0.5)
