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


# ---- semi_join_bloom: exact output, Bloom-pruned shuffle ----


@pytest.mark.parametrize("anti", [False, True])
def test_bloom_semi_matches_shuffle_plan(ray_session, anti):
    from ddsketch_ray.functions.joins import semi_join_bloom

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5000, 20_000).astype(np.int64),
            "v": np.arange(20_000, dtype=np.int64),
        }
    )
    right = pd.DataFrame({"rk": rng.choice(10_000, 400, replace=False).astype(np.int64)})
    got = (
        semi_join_bloom(_mk(left, 7), _mk(right, 3), "k", "rk", ["v"], anti=anti)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        semi_join_shuffle(_mk(left, 7), _mk(right, 3), "k", "rk", ["v"], anti=anti)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bloom_semi_null_and_fp_exactness(ray_session):
    """A deliberately tiny, saturated filter (m floor, 100% maybe rate)
    must still give EXACT output — the verify stage owns correctness,
    the filter only prunes. Nulls follow EXISTS semantics."""
    from ddsketch_ray.functions.joins import semi_join_bloom

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, None, 2, 3, 4], pa.int64()),
                "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(pa.table({"rk": pa.array([1, 4, None], pa.int64())}))
    semi = semi_join_bloom(left, right, "k", "rk", ["v"], capacity=64, fp_rate=0.5).to_pandas()
    assert sorted(semi["v"].tolist()) == [10, 50]
    anti = semi_join_bloom(
        left, right, "k", "rk", ["v"], anti=True, capacity=64, fp_rate=0.5
    ).to_pandas()
    assert sorted(anti["v"].tolist()) == [20, 30, 40]  # null kept by NOT EXISTS


def test_bloom_semi_prunes_shuffle_input(ray_session):
    """The maybe set entering the verify shuffle must be a small
    superset of the true matches (no false negatives, few false
    positives at fp_rate=1e-3)."""
    import ray

    from ddsketch_ray.agg import BloomAgg, hash_any_column, sketch_from_result

    rng = np.random.default_rng(9)
    lk = rng.integers(0, 1_000_000, 100_000).astype(np.int64)
    rk = rng.choice(1_000_000, 5_000, replace=False).astype(np.int64)
    right = rd.from_arrow(pa.table({"rk": pa.array(rk)}))
    bloom = sketch_from_result(
        right.aggregate(
            BloomAgg(on="rk", capacity=5_000, fp_rate=0.001, seed=101, alias_name="bf")
        )["bf"]
    )
    maybe = bloom.contains_hashed(hash_any_column(lk, is_arrow=False, seed=101))
    true_match = np.isin(lk, rk)
    assert (maybe | ~true_match).all()  # no false negative
    n_fp = int((maybe & ~true_match).sum())
    assert n_fp <= int(0.01 * (~true_match).sum())  # well under 1%


@pytest.mark.parametrize("how", ["inner", "left"])
def test_bloom_equi_join_matches_shuffle_plan(ray_session, how):
    from ddsketch_ray.functions.joins import equi_join_bloom, equi_join_shuffle

    rng = np.random.default_rng(11)
    lk = [None if i % 97 == 0 else int(v) for i, v in enumerate(rng.integers(0, 3000, 8000))]
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk, pa.int64()), "v": pa.array(np.arange(8000, dtype=np.int64))})
    ).repartition(5)
    rk = rng.choice(6000, 500, replace=False).astype(np.int64)
    right = rd.from_arrow(
        pa.table({"rk": pa.array(rk), "payload": pa.array([f"p{x}" for x in rk])})
    ).repartition(3)
    got = (
        equi_join_bloom(left, right, "k", "rk", ["v"], ["payload"], how=how)
        .to_pandas()
        .sort_values(["k", "v"], na_position="first")
        .reset_index(drop=True)
    )
    want = (
        equi_join_shuffle(left, right, "k", "rk", ["v"], ["payload"], how=how)
        .to_pandas()
        .sort_values(["k", "v"], na_position="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    if how == "left":
        # null-key rows survive with null payload; definite non-members
        # took the shuffle-free route and still null-fill identically
        assert got["k"].isna().sum() > 0
        assert got.loc[got["k"].isna(), "payload"].isna().all()


def test_skew_join_auto_salt(ray_session):
    """equi_join_skew: MG pre-pass picks salt>1 under a hot key and 1
    under uniform keys; output bit-equal to the unsalted plan."""
    from ddsketch_ray.agg import MisraGriesAgg, sketch_from_result
    from ddsketch_ray.functions.joins import (
        _salt_for,
        equi_join_shuffle,
        equi_join_skew,
    )

    rng = np.random.default_rng(21)
    k = rng.integers(0, 4000, 30_000).astype(np.int64)
    k[: 9_000] = 42  # 30% hot key
    left = rd.from_arrow(
        pa.table({"k": pa.array(k), "v": pa.array(np.arange(30_000, dtype=np.int64))})
    ).repartition(6)
    rk = np.unique(np.r_[rng.choice(8000, 600, replace=False), 42]).astype(np.int64)
    right = rd.from_arrow(
        pa.table({"rk": pa.array(rk), "payload": pa.array([f"p{x}" for x in rk])})
    ).repartition(3)

    mg = sketch_from_result(
        left.aggregate(MisraGriesAgg(on="k", k=64, alias_name="mg"))["mg"]
    )
    assert _salt_for(mg, 64, 16, 2.0) > 1  # hot key detected
    got = (
        equi_join_skew(left, right, "k", "rk", ["v"], ["payload"], num_buckets=16)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    want = (
        equi_join_shuffle(left, right, "k", "rk", ["v"], ["payload"], num_buckets=16)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # uniform keys: the pre-pass must NOT engage replication
    uk = rng.permutation(np.arange(30_000)).astype(np.int64)
    uleft = rd.from_arrow(pa.table({"k": pa.array(uk), "v": pa.array(uk)})).repartition(6)
    mg_u = sketch_from_result(
        uleft.aggregate(MisraGriesAgg(on="k", k=64, alias_name="mg"))["mg"]
    )
    assert _salt_for(mg_u, 64, 16, 2.0) == 1
