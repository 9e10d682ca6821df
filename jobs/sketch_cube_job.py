#!/usr/bin/env python
"""Checkpointed sketch-CUBE build — ``ray job submit``-able.

Builds a (dims × sketch) cube (functions/cube.py) over a parquet corpus
with per-partition checkpoints + lineage (state/checkpoint.py): each
partition's CellMap (a mergeable map of per-cell sketches) is a part
file; re-running with the same --run-id recomputes only missing parts,
and the final cube written to --out is identical cold or resumed
(per-cell merges are associative + commutative).

    python jobs/sketch_cube_job.py \
        --input '/root/testdata/sf0.01/events.parquet' \
        --dims event_type --value-col user_id --kind hll \
        --ckpt-dir /tmp/ckpt --out /tmp/cube --local-cpus 8

Kinds: hll (distinct of --value-col per cell, p=14),
dds (DDSketch of a numeric --value-col per cell).
Query the resulting layout with functions/cube.py
(query_sketch_cube / grouped_cube_merge / rolling_cube_merge).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="glob of parquet files")
    ap.add_argument("--dims", required=True, help="comma-separated dim columns")
    ap.add_argument("--value-col", required=True)
    ap.add_argument("--kind", default="hll", choices=["hll", "dds"])
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", required=True, help="cube output directory")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--alpha", type=float, default=0.008)
    ap.add_argument("--bin-limit", type=int, default=4096)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--local-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus, **kwargs)
        else:
            ray.init(**kwargs)

    from ddsketch_ray.agg import drop_nulls, hash_any_column
    from ddsketch_ray.functions.cube import build_cell_map, write_cube_from_map
    from ddsketch_ray.sketches import DDSketch, HyperLogLog
    from ddsketch_ray.state import CheckpointedSketchJob

    dims = [d for d in args.dims.split(",") if d]
    col = args.value_col
    kind, alpha, bin_limit, p = args.kind, args.alpha, args.bin_limit, args.hll_p

    if kind == "hll":
        make = lambda: HyperLogLog(p=p)  # noqa: E731

        def add(sk, tbl, idx):
            c = drop_nulls(tbl.column(col).take(idx), True)
            sk.add_hashed(hash_any_column(c, True))

    else:
        make = lambda: DDSketch(alpha=alpha, bin_limit=bin_limit)  # noqa: E731

        def add(sk, tbl, idx):
            sk.add_array(tbl.column(col).take(idx).to_numpy(zero_copy_only=False))

    def build(tbl):
        return build_cell_map(tbl, dims, make, add)

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    job = CheckpointedSketchJob(
        files,
        build,
        columns=dims + [col],
        ckpt_dir=args.ckpt_dir,
        run_id=args.run_id,
        files_per_partition=args.files_per_partition,
    )
    pending = job.pending_partitions()
    print(
        f"run_id={job.run_id}: {len(job.partitions)} partitions, "
        f"{len(pending)} pending (rest checkpointed)",
        file=sys.stderr,
    )
    t0 = time.perf_counter()
    cmap = job.run(concurrency=args.concurrency)
    manifest = write_cube_from_map(cmap, dims, args.out)
    wall = time.perf_counter() - t0

    man = job.manifest().to_pandas()
    recomputed = man[man["part_id"].isin(pending)]
    result = {
        "run_id": job.run_id,
        "rows": int(man["row_count"].sum()),
        "partitions": len(man),
        "recomputed_partitions": len(pending),
        "recomputed_rows": int(recomputed["row_count"].sum()),
        "wall_s": round(wall, 3),
        "rows_per_sec": round(int(recomputed["row_count"].sum()) / max(wall, 1e-9), 1),
        "cube_dir": args.out,
        "n_cells": manifest["n_cells"],
        "kind": kind,
        "dims": dims,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
