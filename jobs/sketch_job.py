#!/usr/bin/env python
"""Production driver for checkpointed sketch jobs — ``ray job submit``-able.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/sketch_job.py \
            --input '/data/webpages/*.parquet' \
            --column text_len --ckpt-dir /shared/ckpt --run-id crawl-2025w07 \
            --alpha 0.008 --files-per-partition 4 --concurrency 64

Locally (this sandbox) the same script runs against a local session:
``python jobs/sketch_job.py --input ... --local-cpus 8``.

Resumability: re-running with the same --run-id skips every partition
whose part file already exists (state/checkpoint.py); the final merge is
associative, so a resumed run produces the identical sketch. Metrics and
lineage (input files, row/byte counts, wall seconds per partition) are
printed from the manifest and live next to the part files.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

# repo root importable when invoked as `python jobs/sketch_job.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="glob of parquet files")
    ap.add_argument("--column", default="value", help="numeric column to sketch")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--alpha", type=float, default=0.008)
    ap.add_argument("--bin-limit", type=int, default=4096)
    ap.add_argument("--mode", default="collapse", choices=["collapse", "last", "first"])
    ap.add_argument("--qs", default="0.5,0.95,0.99")
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="init a local session with this many CPUs (omit under ray job submit)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus, **kwargs)
        else:
            ray.init(**kwargs)  # under `ray job submit` this joins the cluster

    from ddsketch_ray.sketches import DDSketch
    from ddsketch_ray.state import CheckpointedSketchJob

    column, alpha, bin_limit, mode = args.column, args.alpha, args.bin_limit, args.mode

    def build(tbl):
        sk = DDSketch(alpha=alpha, bin_limit=bin_limit, mode=mode)
        sk.add_array(tbl.column(column).to_numpy(zero_copy_only=False))
        return sk

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    job = CheckpointedSketchJob(
        files,
        build,
        columns=[column],
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
    sketch = job.run(concurrency=args.concurrency)
    wall = time.perf_counter() - t0

    man = job.manifest().to_pandas()
    qs = [float(q) for q in args.qs.split(",")]
    recomputed = man[man["part_id"].isin(pending)]
    result = {
        "run_id": job.run_id,
        "rows": int(man["row_count"].sum()),
        "bytes": int(man["byte_count"].sum()),
        "partitions": len(man),
        "recomputed_partitions": len(pending),
        "recomputed_rows": int(recomputed["row_count"].sum()),
        "wall_s": round(wall, 3),
        # throughput over THIS run's recomputed work only (a pure-resume
        # run merging cached parts would otherwise report absurd rates)
        "rows_per_sec": round(int(recomputed["row_count"].sum()) / max(wall, 1e-9), 1),
        "quantiles": {str(q): float(v) for q, v in zip(qs, sketch.quantiles(qs))},
        "sketch_bins": sketch.size,
        "alpha_effective": sketch.alpha,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
