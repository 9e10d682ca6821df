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
