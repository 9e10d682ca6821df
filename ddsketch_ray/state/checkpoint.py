"""Per-partition checkpointed sketch jobs with lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics" (BASELINE.json). The reference has no notion of this
(SURVEY.md §4); the design here is the partition-manifest layout:

    {ckpt_dir}/{run_id}/part-{i:05d}.parquet      one row per partition:
        part_id:int64, sketch:binary (pickled MergeableSketch),
        input_files:string (json list), row_count:int64, byte_count:int64,
        wall_s:float64

- A partition = a fixed slice of the input file list (deterministic for a
  given run_id), so re-running the job recomputes only the partitions whose
  part file is missing. Writes are atomic (tmp file + rename) — a killed
  run never leaves a half-written part.
- Final answer = merge of all part sketches; idempotent because sketch
  merge is associative (the same property that makes Ray's aggregate
  tree-reduction correct).
- The fan-out itself is a Ray Data pipeline: Dataset of partition specs →
  actor-pool map_batches (stateful workers read their files with pruned
  columns via pyarrow, build the partial sketch, write the part file).
  On a multi-node cluster the same layout works with any shared filesystem
  or object store URI.
"""

from __future__ import annotations

import json
import os
import pickle
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_PART_SCHEMA = pa.schema(
    [
        ("part_id", pa.int64()),
        ("sketch", pa.binary()),
        ("input_files", pa.string()),
        ("row_count", pa.int64()),
        ("byte_count", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


class CheckpointedSketchJob:
    """Resumable distributed sketch build over a list of parquet files.

    build_fn: picklable ``(pa.Table) -> MergeableSketch`` producing a
    partial sketch from one table chunk (partials are merged per
    partition, then across partitions).
    columns: column projection pushed into the parquet read.
    """

    def __init__(
        self,
        input_files: list[str],
        build_fn,
        columns: list[str] | None,
        ckpt_dir: str,
        run_id: str | None = None,
        files_per_partition: int = 1,
    ):
        self.input_files = sorted(input_files)
        self.build_fn = build_fn
        self.columns = columns
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.dir = os.path.join(ckpt_dir, self.run_id)
        self.partitions = [
            self.input_files[i : i + files_per_partition]
            for i in range(0, len(self.input_files), files_per_partition)
        ]

    def _part_path(self, part_id: int) -> str:
        return os.path.join(self.dir, f"part-{part_id:05d}.parquet")

    def pending_partitions(self) -> list[int]:
        """Partitions with no part file OR whose stored lineage does not
        match the current partition spec (the input file list may have
        changed between runs — a stale part must be recomputed, not
        silently reused under the same index)."""
        pending = []
        for i in range(len(self.partitions)):
            path = self._part_path(i)
            if not os.path.exists(path):
                pending.append(i)
                continue
            try:
                stored = pq.read_table(path, columns=["input_files"]).column(
                    "input_files"
                )[0].as_py()
            except Exception:
                pending.append(i)  # unreadable part: recompute
                continue
            if stored != json.dumps(self.partitions[i]):
                pending.append(i)
        return pending

    def run(self, concurrency: int = 4) -> object:
        """Process pending partitions (skipping checkpointed ones), then
        merge all part sketches. Returns the merged sketch."""
        import ray.data as rd

        os.makedirs(self.dir, exist_ok=True)
        pending = self.pending_partitions()
        if pending:
            specs = [
                {"part_id": i, "files": json.dumps(self.partitions[i])} for i in pending
            ]
            build_fn, columns, part_path = self.build_fn, self.columns, self._part_path

            class PartitionWorker:
                """Actor-pool stage: one partition per __call__ row."""

                def __call__(self, batch: pa.Table) -> pa.Table:
                    rows = []
                    for part_id, files_json in zip(
                        batch.column("part_id").to_pylist(),
                        batch.column("files").to_pylist(),
                    ):
                        t0 = time.perf_counter()
                        files = json.loads(files_json)
                        sketch = None
                        n_rows = 0
                        n_bytes = 0
                        for f in files:
                            pf = pq.ParquetFile(f)
                            for rg in pf.iter_batches(columns=columns):
                                tbl = pa.Table.from_batches([rg])
                                part = build_fn(tbl)
                                sketch = part if sketch is None else sketch.merge(part)
                                n_rows += tbl.num_rows
                                n_bytes += tbl.nbytes
                        wall = time.perf_counter() - t0
                        out = pa.table(
                            {
                                "part_id": [part_id],
                                "sketch": [b"" if sketch is None else pickle.dumps(sketch, protocol=pickle.HIGHEST_PROTOCOL)],
                                "input_files": [json.dumps(files)],
                                "row_count": [n_rows],
                                "byte_count": [n_bytes],
                                "wall_s": [wall],
                            },
                            schema=_PART_SCHEMA,
                        )
                        tmp = part_path(part_id) + f".tmp-{uuid.uuid4().hex[:8]}"
                        pq.write_table(out, tmp)
                        os.replace(tmp, part_path(part_id))  # atomic
                        rows.append(
                            {
                                "part_id": part_id,
                                "row_count": n_rows,
                                "byte_count": n_bytes,
                                "wall_s": wall,
                            }
                        )
                    return pa.table(
                        {
                            "part_id": [r["part_id"] for r in rows],
                            "row_count": [r["row_count"] for r in rows],
                            "byte_count": [r["byte_count"] for r in rows],
                            "wall_s": [r["wall_s"] for r in rows],
                        }
                    )

            (
                rd.from_items(specs)
                .map_batches(
                    PartitionWorker,
                    batch_format="pyarrow",
                    batch_size=1,
                    concurrency=min(concurrency, max(1, len(specs))),
                )
                .materialize()  # small manifest rows only — the sketches are on disk
            )
        return self.merged_sketch()

    def merged_sketch(self) -> object:
        # merge only THIS job's partition ids — orphan part files from an
        # older layout with more partitions must not leak into the result
        return load_merged_sketches(
            self.dir, files=[self._part_path(i) for i in range(len(self.partitions))]
        )

    def manifest(self) -> pa.Table:
        """Lineage + metrics across this job's completed partitions."""
        files = [
            self._part_path(i)
            for i in range(len(self.partitions))
            if os.path.exists(self._part_path(i))
        ]
        tables = [
            pq.read_table(f, columns=["part_id", "input_files", "row_count", "byte_count", "wall_s"])
            for f in files
        ]
        return pa.concat_tables(tables)


def load_merged_sketches(part_dir: str, files: list[str] | None = None) -> object:
    """Merge part sketches (associative reduce on the driver; part
    sketches are KBs, so thousands of partitions merge in seconds).
    ``files`` restricts to a specific part list (a job's own ids)."""
    if files is None:
        files = sorted(
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
    else:
        files = [f for f in files if os.path.exists(f)]
    if not files:
        raise FileNotFoundError(f"no part files in {part_dir}")
    merged = None
    for f in files:
        blob = pq.read_table(f, columns=["sketch"]).column("sketch")[0].as_py()
        sk = pickle.loads(blob) if blob else None
        if sk is None:  # empty partition (zero input rows) — valid, skip
            continue
        merged = sk if merged is None else merged.merge(sk)
    if merged is None:
        raise ValueError(f"every partition in {part_dir} was empty")
    return merged


class CheckpointedMapJob:
    """Resumable per-partition MAP over parquet files: each partition's
    OUTPUT rows are written as their own parquet part (the resumable-
    output layout: one file per input shard, never one giant file), so
    a killed run recomputes only missing/stale partitions and downstream
    stages read the part files as a Dataset.

    Complements CheckpointedSketchJob (sketch-valued parts): this is for
    row-valued stages — e.g. the MinHash signature stage of a 1M+ doc
    dedup, where recomputing signatures dominates the pipeline cost.

    map_fn: picklable ``(pa.Table) -> pa.Table`` applied per input chunk;
    chunk outputs are concatenated into the partition's part file.
    Lineage {input_files, row_count, byte_count, wall_s} lives in each
    part's parquet key-value metadata; validity = part exists AND its
    stored input list matches the current partition spec.
    """

    def __init__(
        self,
        input_files: list[str],
        map_fn,
        columns: list[str] | None,
        ckpt_dir: str,
        run_id: str | None = None,
        files_per_partition: int = 1,
    ):
        self.input_files = sorted(input_files)
        self.map_fn = map_fn
        self.columns = columns
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.dir = os.path.join(ckpt_dir, self.run_id)
        self.partitions = [
            self.input_files[i : i + files_per_partition]
            for i in range(0, len(self.input_files), files_per_partition)
        ]

    def _part_path(self, part_id: int) -> str:
        return os.path.join(self.dir, f"map-part-{part_id:05d}.parquet")

    def output_files(self) -> list[str]:
        return [self._part_path(i) for i in range(len(self.partitions))]

    def pending_partitions(self) -> list[int]:
        pending = []
        for i in range(len(self.partitions)):
            path = self._part_path(i)
            if not os.path.exists(path):
                pending.append(i)
                continue
            try:
                meta = pq.read_schema(path).metadata or {}
                stored = meta.get(b"lineage_input_files", b"").decode()
            except Exception:
                pending.append(i)  # unreadable part: recompute
                continue
            if stored != json.dumps(self.partitions[i]):
                pending.append(i)
        return pending

    def run(self, concurrency: int = 4) -> list[str]:
        """Process pending partitions, return the full output file list."""
        import ray.data as rd

        os.makedirs(self.dir, exist_ok=True)
        pending = self.pending_partitions()
        if pending:
            specs = [
                {"part_id": i, "files": json.dumps(self.partitions[i])} for i in pending
            ]
            map_fn, columns, part_path = self.map_fn, self.columns, self._part_path

            class MapPartitionWorker:
                def __call__(self, batch: pa.Table) -> pa.Table:
                    rows = []
                    for part_id, files_json in zip(
                        batch.column("part_id").to_pylist(),
                        batch.column("files").to_pylist(),
                    ):
                        t0 = time.perf_counter()
                        files = json.loads(files_json)
                        outs = []
                        n_rows = 0
                        n_bytes = 0
                        empty_src = None
                        for f in files:
                            pf = pq.ParquetFile(f)
                            if empty_src is None:
                                empty_src = pf.schema_arrow
                            for rg in pf.iter_batches(columns=columns):
                                tbl = pa.Table.from_batches([rg])
                                outs.append(map_fn(tbl))
                                n_rows += tbl.num_rows
                                n_bytes += tbl.nbytes
                        if not outs:  # zero-row partition: still a valid part
                            sel = [f for f in (columns or empty_src.names)]
                            outs.append(
                                map_fn(pa.schema(
                                    [empty_src.field(c) for c in sel]
                                ).empty_table())
                            )
                        out = pa.concat_tables(outs)
                        wall = time.perf_counter() - t0
                        out = out.replace_schema_metadata(
                            {
                                b"lineage_input_files": json.dumps(files).encode(),
                                b"lineage_row_count": str(n_rows).encode(),
                                b"lineage_byte_count": str(n_bytes).encode(),
                                b"lineage_wall_s": f"{wall:.6f}".encode(),
                            }
                        )
                        tmp = part_path(part_id) + f".tmp-{uuid.uuid4().hex[:8]}"
                        pq.write_table(out, tmp)
                        os.replace(tmp, part_path(part_id))  # atomic
                        rows.append((part_id, n_rows, wall))
                    return pa.table(
                        {
                            "part_id": pa.array([r[0] for r in rows], type=pa.int64()),
                            "row_count": pa.array([r[1] for r in rows], type=pa.int64()),
                            "wall_s": pa.array([r[2] for r in rows], type=pa.float64()),
                        }
                    )

            (
                rd.from_items(specs)
                .map_batches(
                    MapPartitionWorker,
                    batch_format="pyarrow",
                    batch_size=1,
                    concurrency=min(concurrency, max(1, len(specs))),
                )
                .materialize()  # tiny manifest rows; outputs are on disk
            )
        return self.output_files()

    def manifest(self) -> list[dict]:
        """Lineage + metrics for completed partitions (from part file
        metadata — no data rows are read)."""
        out = []
        for i in range(len(self.partitions)):
            path = self._part_path(i)
            if not os.path.exists(path):
                continue
            meta = pq.read_schema(path).metadata or {}
            out.append(
                {
                    "part_id": i,
                    "input_files": json.loads(meta.get(b"lineage_input_files", b"[]")),
                    "row_count": int(meta.get(b"lineage_row_count", b"0")),
                    "byte_count": int(meta.get(b"lineage_byte_count", b"0")),
                    "wall_s": float(meta.get(b"lineage_wall_s", b"0")),
                }
            )
        return out
