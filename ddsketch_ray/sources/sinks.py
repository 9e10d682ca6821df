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
    ds, out_dir: str, key_col: str, num_buckets: int = 64, seed: int = 0,
    sort_by_bucket: bool = True,
) -> None:
    """Write ``ds`` hash-bucketed by ``key_col`` into
    ``out_dir/bucket=i/`` hive directories.

    Default (``sort_by_bucket=True``): ONE sort on the bucket column
    before the hive write, so the layout is ~(blocks + buckets) files.
    The unsorted streaming write emits up to blocks × buckets files —
    measured 14,336 at a 1M-doc MinHash index / 8,234 at the 5M-row
    bjoin tables — and per-file open/metadata overhead then dominates
    every re-read (index lookup 79.8 s → 9.1 s sorted; bucketed join
    0.71 s → 0.31 s; the sorted WRITE was also faster, 4.6 s vs 6.4 s,
    because file creation isn't free either). The sort is the one-time
    shuffle this layout exists to amortize. ``sort_by_bucket=False``
    keeps the zero-shuffle streaming write for one-shot layouts or
    inputs too hot to sort."""
    bucketed = ds.map_batches(
        lambda t: add_bucket_column(t, key_col, num_buckets, seed),
        batch_format="pyarrow",
        batch_size=None,
    )
    if sort_by_bucket:
        bucketed = bucketed.sort("bucket")
    bucketed.write_parquet(out_dir, partition_cols=["bucket"])
    _write_layout_manifest(
        out_dir,
        {
            "kind": "bucketed",
            "key_col": key_col,
            "num_buckets": int(num_buckets),
            "seed": int(seed),
            "sort_by_bucket": bool(sort_by_bucket),
        },
    )


def _write_layout_manifest(out_dir: str, meta: dict) -> None:
    """``_layout.json`` beside the hive dirs: the bucketing parameters a
    future reader/joiner needs. The leading underscore keeps Arrow/Ray
    parquet discovery away (default ``ignore_prefixes`` = ['.', '_'])."""
    import json
    import os

    tmp = os.path.join(out_dir, "_layout.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "_layout.json"))


def layout_manifest(out_dir: str) -> dict | None:
    """The ``_layout.json`` of a persisted layout, or None for layouts
    written before manifests existed (callers then pass parameters
    explicitly, the old contract)."""
    import json
    import os

    p = os.path.join(out_dir, "_layout.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_bucket(out_dir: str, bucket: int, columns=None):
    """Read one bucket directory of a ``write_bucketed`` table — the
    co-located-join read path (read bucket i of two tables bucketed on
    the same key+seed and join block-locally, zero shuffle)."""
    import ray.data as rd

    return rd.read_parquet(f"{out_dir}/bucket={bucket}", columns=columns)


def join_bucketed(
    left_dir: str,
    right_dir: str,
    key_col: str,
    left_cols,
    right_cols,
    num_buckets: int | None = None,
    how: str = "inner",
):
    """ZERO-SHUFFLE equi-join of two ``write_bucketed`` tables that were
    bucketed on the same key family (same num_buckets + seed): bucket i
    of the left can only match bucket i of the right, so the whole join
    is ``num_buckets`` independent tasks, each reading its two bucket
    directories and running one local Arrow hash join — the co-located
    join the sink exists to enable. No tagged union, no groupby, no
    wide movement of either table; parallelism = num_buckets.

    Memory contract: one task holds ONE bucket of each side — size
    num_buckets at write time so table_bytes/num_buckets fits a worker
    heap (the same sizing rule as ``equi_join_shuffle``'s buckets); a
    hot key concentrates in one bucket, so skewed keys need the salted
    shuffle join instead.

    Left/right column names must not clash (project/rename before
    writing). Returns a Dataset (key_col, *left_cols, *right_cols).

    Layout compatibility is VALIDATED from the ``_layout.json``
    manifests ``write_bucketed`` leaves behind: mismatched num_buckets
    or seed co-locates DIFFERENT keys per bucket and silently drops
    matches — the worst failure mode a layout join has — so any
    disagreement between manifests (or with an explicit
    ``num_buckets``) raises. ``num_buckets=None`` reads it from the
    manifests; pre-manifest layouts must pass it explicitly."""
    import pyarrow.parquet as pq
    import ray.data as rd

    left_cols, right_cols = list(left_cols), list(right_cols)
    clash = set(left_cols) & set(right_cols)
    if clash:
        raise ValueError(f"column name clash: {sorted(clash)}")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")

    lman, rman = layout_manifest(left_dir), layout_manifest(right_dir)
    for side, man in (("left", lman), ("right", rman)):
        if man is None:
            continue
        if man.get("kind") != "bucketed":
            raise ValueError(f"{side} layout is {man.get('kind')!r}, not bucketed")
        if num_buckets is not None and man["num_buckets"] != num_buckets:
            raise ValueError(
                f"{side} layout has num_buckets={man['num_buckets']}, "
                f"caller passed {num_buckets}"
            )
    if lman is not None and rman is not None:
        if (lman["num_buckets"], lman["seed"]) != (rman["num_buckets"], rman["seed"]):
            raise ValueError(
                "incompatible bucketed layouts: "
                f"left (num_buckets={lman['num_buckets']}, seed={lman['seed']}) vs "
                f"right (num_buckets={rman['num_buckets']}, seed={rman['seed']}) — "
                "bucket i would hold different key sets; rewrite one side"
            )
    if num_buckets is None:
        man = lman or rman
        if man is None:
            raise ValueError(
                "num_buckets=None needs a _layout.json manifest on at least "
                "one side (layouts written before manifests existed must "
                "pass num_buckets explicitly)"
            )
        num_buckets = int(man["num_buckets"])
    join_type = "inner" if how == "inner" else "left outer"

    # right-side schema read once driver-side so a missing (empty)
    # bucket directory can be joined as a typed empty table
    import glob as _glob

    rfiles = _glob.glob(f"{right_dir}/bucket=*/*.parquet")
    lfiles = _glob.glob(f"{left_dir}/bucket=*/*.parquet")
    if not rfiles or not lfiles:
        raise ValueError(f"no bucket files under {right_dir if not rfiles else left_dir}")
    rschema = pq.read_schema(rfiles[0])
    lschema = pq.read_schema(lfiles[0])

    def _type(c):
        return (lschema if c in lschema.names else rschema).field(c).type

    empty_out = pa.table(
        {c: pa.array([], _type(c)) for c in [key_col] + left_cols + right_cols}
    )

    def one_bucket(t: pa.Table) -> pa.Table:
        import os

        outs = []
        for b in t.column("id").to_pylist():
            lpath = f"{left_dir}/bucket={b}"
            if not os.path.isdir(lpath):  # empty bucket writes no dir
                continue
            lt = pq.read_table(lpath, columns=[key_col] + left_cols)
            rpath = f"{right_dir}/bucket={b}"
            if os.path.isdir(rpath):
                rt = pq.read_table(rpath, columns=[key_col] + right_cols)
            elif how == "inner":
                continue  # no right rows -> no matches in this bucket
            else:
                rt = pa.table(
                    {c: pa.array([], rschema.field(c).type) for c in [key_col] + right_cols}
                )
            j = lt.join(rt, keys=key_col, join_type=join_type)
            outs.append(j.select([key_col] + left_cols + right_cols))
        if not outs:
            return empty_out
        return pa.concat_tables(outs).cast(empty_out.schema)

    return rd.range(num_buckets, override_num_blocks=num_buckets).map_batches(
        one_bucket, batch_format="pyarrow", batch_size=None
    )


def write_jsonl(ds, out_dir: str) -> None:
    """Line-delimited JSON sink — the interchange format text corpora
    are exchanged in. Ray-native ``write_json`` (block-parallel, one
    shard per block, pandas orient="records" lines under the hood);
    pair with ``readers.read_jsonl`` for a schema-conformed round
    trip."""
    ds.write_json(out_dir)


def write_range_partitioned(ds, out_dir: str, value_col: str, num_partitions: int = 16):
    """Equal-frequency RANGE-partitioned hive layout — the sorted-layout
    counterpart of ``write_bucketed``: one DDSketch pass picks P−1
    quantile cuts, a pure map assigns ``pid = #{cut ≤ v}``, and
    ``write_parquet(partition_cols=["pid"])`` writes one directory per
    value range. Readers of a value/range predicate prune to the
    matching pid directories (zone-map pruning by construction);
    partitions are balanced within the sketch's α. The input is scanned
    twice (sketch pass + write). Returns the cut points."""
    from ddsketch_ray.functions.distribution import range_partition_by_quantiles

    withpid, cuts = range_partition_by_quantiles(ds, value_col, num_partitions)
    # sort by pid before the hive write — same ~(blocks + partitions)
    # file-count contract as write_bucketed's sorted default (unsorted,
    # each block splits into every pid directory)
    withpid.sort("pid").write_parquet(out_dir, partition_cols=["pid"])
    return cuts


def read_value_range(out_dir: str, cuts, lo: float, hi: float, columns=None):
    """Pruned read of a ``write_range_partitioned`` table: only the pid
    directories whose value range intersects [lo, hi) are opened."""
    import numpy as np
    import ray.data as rd

    cuts = np.asarray(cuts, dtype=np.float64)
    first = int(np.searchsorted(cuts, lo, side="right"))
    last = int(np.searchsorted(cuts, hi, side="left"))
    import glob as _glob

    files = []
    for p in range(first, last + 1):
        files.extend(sorted(_glob.glob(f"{out_dir}/pid={p}/*.parquet")))
    if not files:  # range beyond the data: typed empty via any one file
        any_file = sorted(_glob.glob(f"{out_dir}/pid=*/*.parquet"))
        if not any_file:
            raise ValueError(f"no bucket files under {out_dir}")
        return rd.read_parquet(any_file[:1], columns=columns).limit(0)
    return rd.read_parquet(files, columns=columns)
