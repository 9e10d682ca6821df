import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.joins import semi_join_shuffle


def _mk(df, blocks):
    return rd.from_pandas(df).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 5])
@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_matches_pandas(ray_session, blocks, anti):
    rng = np.random.default_rng(2)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 300, 2000).astype(np.int64),
            "v": rng.integers(0, 100, 2000).astype(np.int64),
        }
    )
    right = pd.DataFrame({"rk": rng.integers(150, 450, 1500).astype(np.int64)})
    out = (
        semi_join_shuffle(_mk(left, blocks), _mk(right, blocks), "k", "rk", ["v"],
                          anti=anti, num_buckets=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    member = left["k"].isin(set(right["rk"]))
    want = left[~member if anti else member].sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_null_keys_exists_semantics(ray_session):
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, None, 2], pa.int64()), "v": pa.array([10, 20, 30], pa.int64())})
    )
    right = rd.from_arrow(pa.table({"rk": pa.array([1, None], pa.int64())}))
    semi = semi_join_shuffle(left, right, "k", "rk", ["v"]).to_pandas()
    assert semi["v"].tolist() == [10]  # null never matches
    anti = semi_join_shuffle(left, right, "k", "rk", ["v"], anti=True).to_pandas()
    assert sorted(anti["v"].tolist()) == [20, 30]  # null kept by NOT EXISTS


def test_string_keys(ray_session):
    left = rd.from_items([{"k": w, "v": i} for i, w in enumerate(["a", "b", "c", "d"])])
    right = rd.from_items([{"rk": w} for w in ["b", "d", "zz"]])
    out = semi_join_shuffle(left, right, "k", "rk", ["v"]).to_pandas()
    assert sorted(out["k"].tolist()) == ["b", "d"]


def test_key_type_mismatch_raises(ray_session):
    left = rd.from_items([{"k": 1, "v": 2}])
    right = rd.from_items([{"rk": "x"}])
    with pytest.raises(ValueError):
        semi_join_shuffle(left, right, "k", "rk", ["v"])
