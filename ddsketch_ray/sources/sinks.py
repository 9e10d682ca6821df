"""Layout-aware Parquet sinks.

``write_bucketed`` — hash-bucketed, hive-partitioned output: the layout
that lets every FUTURE equi-join / dedup / groupby on the same key skip
its shuffle (read bucket=i of both tables → co-located keys). At 100 TB
the cheapest shuffle is the one a previous job already paid for; this
sink is how a pipeline persists that work. One pure map adds the bucket
column (SplitMix64, the repo-wide hash family — the SAME bucketing
``equi_join_shuffle`` / ``semi_join_shuffle`` compute internally), then
``write_parquet(partition_cols=["bucket"])`` writes one directory per
bucket (resumable: a re-run can skip complete bucket directories).

Reference scope: gmorleo/DDSketch has a CSV sink only (SURVEY.md §2.3
"Sources/sinks"); this is north-rule scale coverage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_bucket_column(
    batch: pa.Table, key_col: str, num_buckets: int, seed: int = 0, out_col: str = "bucket"
) -> pa.Table:
    from ddsketch_ray.agg import hash_any_column

    b = (
        hash_any_column(batch.column(key_col), is_arrow=True, seed=seed)
        % np.uint64(num_buckets)
    ).astype(np.int64)
    return batch.append_column(out_col, pa.array(b))


def write_bucketed(
    ds, out_dir: str, key_col: str, num_buckets: int = 64, seed: int = 0
) -> None:
    """Write ``ds`` hash-bucketed by ``key_col`` into
    ``out_dir/bucket=i/`` hive directories. Streaming end-to-end (the
    bucket column is a pure map; no shuffle — rows stay in their blocks,
    each output file covers the buckets present in its block; readers
    prune by directory)."""
    bucketed = ds.map_batches(
        lambda t: add_bucket_column(t, key_col, num_buckets, seed),
        batch_format="pyarrow",
        batch_size=None,
    )
    bucketed.write_parquet(out_dir, partition_cols=["bucket"])


def read_bucket(out_dir: str, bucket: int, columns=None):
    """Read one bucket directory of a ``write_bucketed`` table — the
    co-located-join read path (read bucket i of two tables bucketed on
    the same key+seed and join block-locally, zero shuffle)."""
    import ray.data as rd

    return rd.read_parquet(f"{out_dir}/bucket={bucket}", columns=columns)
