"""grouped_distinct_exact — exact per-key COUNT(DISTINCT) oracle tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ddsketch_ray.functions.analytics import grouped_distinct_exact


def _check(ray_session, df: pd.DataFrame, blocks: int):
    import ray.data as rd

    want = (
        df.dropna()
        .groupby("k")["v"]
        .nunique()
        .reset_index()
        .rename(columns={"v": "nd"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = (
        grouped_distinct_exact(rd.from_pandas(df).repartition(blocks), "k", "v", alias="nd")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["nd"].to_numpy() == want["nd"].to_numpy().astype(np.int64)).all()


@pytest.mark.parametrize(
    "nk,nv,n,blocks",
    [(5, 3, 1000, 7), (200, 10, 5000, 13), (1, 1, 50, 9), (997, 400, 20000, 4)],
)
def test_matches_pandas_nunique(ray_session, nk, nv, n, blocks):
    rng = np.random.default_rng(nk * 1000 + blocks)
    v = rng.integers(0, nv, n).astype(np.float64)
    v[rng.random(n) < 0.05] = np.nan  # NaN dropped (COUNT(DISTINCT) semantics)
    _check(ray_session, pd.DataFrame({"k": rng.integers(0, nk, n), "v": v}), blocks)


def test_string_values_and_single_pair_spanning_blocks(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 3000),
            "v": np.array(["s%d" % x for x in rng.integers(0, 15, 3000)], dtype=object),
        }
    )
    _check(ray_session, df, 11)
    # one (key, value) pair filling many blocks must still count once
    one = pd.DataFrame({"k": np.zeros(500, np.int64), "v": np.full(500, "same", object)})
    _check(ray_session, one, 8)


def test_layout_invariance(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 300, 8000), "v": rng.integers(0, 30, 8000)})
    outs = []
    for blocks in (1, 6, 17):
        outs.append(
            grouped_distinct_exact(rd.from_pandas(df).repartition(blocks), "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
