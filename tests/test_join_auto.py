"""join_auto: the measured join planner must pick the right plan AND
produce output identical (as a sorted multiset) to the reference
equi_join_shuffle plan on every branch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.joins import equi_join_shuffle, join_auto


def _mk(df: pd.DataFrame, blocks: int = 4):
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .astype({c: "float64" for c in df.columns if df[c].dtype.kind == "f"})
    )


def _check_equal(got_ds, left, right, how):
    want = (
        equi_join_shuffle(
            _mk(left), _mk(right), "k", "k", ["lv"], ["rv"], num_buckets=8, how=how
        )
        .to_pandas()
    )
    got = got_ds.to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(_sorted(got[want.columns.tolist()]), _sorted(want))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_small_unique_right_picks_broadcast(ray_session, how):
    left = pd.DataFrame({"k": np.arange(200, dtype=np.int64) % 50, "lv": np.arange(200, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(40, dtype=np.int64), "rv": np.arange(40, dtype=np.int64) * 10})
    out, plan = join_auto(
        _mk(left), _mk(right), "k", "k", ["lv"], ["rv"], how=how,
        num_buckets=8, explain=True,
    )
    assert plan["plan"] == "broadcast"
    _check_equal(out, left, right, how)


def test_duplicate_right_keys_fall_through_to_shuffle(ray_session):
    # ratio below the bloom gate (20 < 8×4) so the dup-key fall-through
    # lands on the general shuffle plan
    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64) % 10, "lv": np.arange(20, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([0, 0, 1, 2], dtype=np.int64), "rv": np.array([1, 2, 3, 4], dtype=np.int64)})
    out, plan = join_auto(
        _mk(left), _mk(right), "k", "k", ["lv"], ["rv"],
        num_buckets=8, explain=True,
    )
    assert plan["plan"] == "shuffle"
    assert plan.get("right_keys_unique") is False
    _check_equal(out, left, right, "inner")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_probe_heavy_ratio_picks_bloom(ray_session, how):
    left = pd.DataFrame({"k": np.arange(2000, dtype=np.int64) % 400, "lv": np.arange(2000, dtype=np.int64)})
    # duplicate right keys (so broadcast is ineligible) and tiny vs left
    right = pd.DataFrame({"k": np.array([1, 1, 2, 3], dtype=np.int64), "rv": np.array([7, 8, 9, 10], dtype=np.int64)})
    out, plan = join_auto(
        _mk(left), _mk(right), "k", "k", ["lv"], ["rv"], how=how,
        num_buckets=8, broadcast_limit_rows=2, explain=True,
    )
    assert plan["plan"] == "bloom"
    _check_equal(out, left, right, how)


def test_hot_key_engages_salt(ray_session):
    n = 4000
    k = np.zeros(n, dtype=np.int64)  # 60% of rows on key 0
    k[int(n * 0.6):] = np.arange(1, n - int(n * 0.6) + 1, dtype=np.int64)
    left = pd.DataFrame({"k": k, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 3000, dtype=np.int64), "rv": np.arange(3000, dtype=np.int64)})
    out, plan = join_auto(
        _mk(left), _mk(right), "k", "k", ["lv"], ["rv"],
        num_buckets=8, broadcast_limit_rows=10, explain=True,
    )
    assert plan["plan"] == "shuffle"
    assert plan["salt"] > 1
    _check_equal(out, left, right, "inner")


def test_size_hints_skip_count(ray_session):
    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64) % 20, "lv": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(20, dtype=np.int64), "rv": np.arange(20, dtype=np.int64)})
    out, plan = join_auto(
        _mk(left), _mk(right), "k", "k", ["lv"], ["rv"],
        num_buckets=8, n_left=100, n_right=20, explain=True,
    )
    assert plan["plan"] == "broadcast"
    assert plan["n_left"] == 100 and plan["n_right"] == 20
    _check_equal(out, left, right, "inner")


def test_auto_num_buckets_sized_to_cluster(ray_session):
    import ray

    left = pd.DataFrame({"k": np.arange(30, dtype=np.int64) % 10, "lv": np.arange(30, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([0, 0, 1], dtype=np.int64), "rv": np.array([1, 2, 3], dtype=np.int64)})
    out, plan = join_auto(
        _mk(left), _mk(right), "k", "k", ["lv"], ["rv"],
        broadcast_limit_rows=0, explain=True,
    )
    assert plan["num_buckets"] == max(16, 4 * int(ray.cluster_resources().get("CPU", 8)))
    _check_equal(out, left, right, "inner")
