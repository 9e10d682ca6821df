import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ddsketch_ray.agg import hash_any_column
from ddsketch_ray.sources.sinks import read_bucket, write_bucketed


def test_write_bucketed_roundtrip(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 10_000, 5000).astype(np.int64),
            "v": rng.integers(0, 100, 5000).astype(np.int64),
        }
    )
    out = str(tmp_path / "bucketed")
    write_bucketed(rd.from_pandas(df).repartition(4), out, "k", num_buckets=8)
    # every row lands in the bucket its key hash dictates; union of
    # buckets == input
    h = hash_any_column(df["k"].to_numpy(), False, seed=0) % np.uint64(8)
    frames = []
    for b in range(8):
        part = read_bucket(out, b).to_pandas()
        assert (hash_any_column(part["k"].to_numpy(), False, seed=0) % np.uint64(8) == b).all()
        frames.append(part)
    got = pd.concat(frames)[["k", "v"]].sort_values(["k", "v"]).reset_index(drop=True)
    want = df.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # co-located join property: same-key rows of two tables bucketed with
    # the same (key, seed) land in the same bucket id by construction


def test_join_bucketed_zero_shuffle(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, 3000).astype(np.int64),
         "v": rng.integers(0, 100, 3000).astype(np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.arange(200, 700, dtype=np.int64),
         "w": rng.integers(0, 9, 500).astype(np.int64)}
    )
    from ddsketch_ray.sources.sinks import join_bucketed

    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_pandas(left).repartition(3), ld, "k", num_buckets=8)
    write_bucketed(rd.from_pandas(right).repartition(2), rd_, "k", num_buckets=8)
    out = (
        join_bucketed(ld, rd_, "k", ["v"], ["w"], num_buckets=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_join_bucketed_left_and_empty_buckets(ray_session, tmp_path):
    from ddsketch_ray.sources.sinks import join_bucketed

    left = pd.DataFrame({"k": np.arange(40, dtype=np.int64), "v": np.arange(40, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 10, dtype=np.int64), "w": np.arange(10, dtype=np.int64)})
    ld, rd_ = str(tmp_path / "l2"), str(tmp_path / "r2")
    # many buckets: several right buckets are empty
    write_bucketed(rd.from_pandas(left).repartition(2), ld, "k", num_buckets=16)
    write_bucketed(rd.from_pandas(right), rd_, "k", num_buckets=16)
    out = (
        join_bucketed(ld, rd_, "k", ["v"], ["w"], num_buckets=16, how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k", how="left").sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == want["k"].tolist()
    got_w = out["w"].fillna(-1).astype(np.int64).tolist()
    want_w = want["w"].fillna(-1).astype(np.int64).tolist()
    assert got_w == want_w


def test_write_range_partitioned_prunes_and_roundtrips(ray_session, tmp_path):
    from ddsketch_ray.sources.sinks import read_value_range, write_range_partitioned

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"v": rng.uniform(0, 1000, 20_000), "i": np.arange(20_000, dtype=np.int64)})
    out = str(tmp_path / "ranged")
    cuts = write_range_partitioned(rd.from_pandas(df).repartition(4), out, "v", num_partitions=8)
    assert len(cuts) == 7 and (np.diff(cuts) > 0).all()
    # pruned read returns a superset of the exact range, and filtering it
    # yields exactly the right rows
    part = read_value_range(out, cuts, 200.0, 300.0, columns=["v", "i"]).to_pandas()
    want = df[(df.v >= 200.0) & (df.v < 300.0)]
    got = part[(part.v >= 200.0) & (part.v < 300.0)]
    assert sorted(got["i"].tolist()) == sorted(want["i"].tolist())
    # pruning is real: far fewer rows read than the full table
    assert len(part) < len(df) * 0.5
    # full union of partitions == input
    full = read_value_range(out, cuts, -1e9, 1e9).to_pandas()
    assert len(full) == len(df)


def test_read_value_range_outside_data(ray_session, tmp_path):
    from ddsketch_ray.sources.sinks import read_value_range, write_range_partitioned

    df = pd.DataFrame({"v": np.linspace(0, 100, 2000), "i": np.arange(2000, dtype=np.int64)})
    out = str(tmp_path / "r3")
    cuts = write_range_partitioned(rd.from_pandas(df).repartition(2), out, "v", num_partitions=4)
    # a beyond-max range still reads the (unbounded-above) top partition
    # — and ONLY that one; the exact filter then yields nothing
    part = read_value_range(out, cuts, 1e6, 2e6).to_pandas()
    assert 0 < len(part) < len(df) / 2
    assert (part["v"] > cuts[-1]).all() or len(part) == 0
    assert len(part[(part.v >= 1e6) & (part.v < 2e6)]) == 0


def test_layout_manifest_auto_and_mismatch(ray_session, tmp_path):
    from ddsketch_ray.sources.sinks import join_bucketed, layout_manifest

    left = pd.DataFrame({"k": np.arange(60, dtype=np.int64), "v": np.arange(60, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(30, dtype=np.int64), "w": np.arange(30, dtype=np.int64)})
    ld, rd_ = str(tmp_path / "ml"), str(tmp_path / "mr")
    write_bucketed(rd.from_pandas(left), ld, "k", num_buckets=8)
    write_bucketed(rd.from_pandas(right), rd_, "k", num_buckets=8)

    man = layout_manifest(ld)
    assert man == {
        "kind": "bucketed", "key_col": "k", "num_buckets": 8,
        "seed": 0, "sort_by_bucket": True,
    }

    # num_buckets=None reads the manifest
    out = (
        join_bucketed(ld, rd_, "k", ["v"], ["w"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)

    # explicit num_buckets disagreeing with the manifest raises
    with pytest.raises(ValueError, match="num_buckets"):
        join_bucketed(ld, rd_, "k", ["v"], ["w"], num_buckets=4)

    # incompatible layouts (different seed) raise instead of silently
    # dropping matches
    rd2 = str(tmp_path / "mr2")
    write_bucketed(rd.from_pandas(right), rd2, "k", num_buckets=8, seed=1)
    with pytest.raises(ValueError, match="incompatible"):
        join_bucketed(ld, rd2, "k", ["v"], ["w"])

    # pre-manifest layout (manifest removed): num_buckets=None refuses,
    # explicit value still works
    import os

    os.remove(os.path.join(ld, "_layout.json"))
    os.remove(os.path.join(rd_, "_layout.json"))
    with pytest.raises(ValueError, match="manifest"):
        join_bucketed(ld, rd_, "k", ["v"], ["w"])
    out2 = (
        join_bucketed(ld, rd_, "k", ["v"], ["w"], num_buckets=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out2, want)
