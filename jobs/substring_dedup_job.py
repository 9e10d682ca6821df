#!/usr/bin/env python
"""Production driver for checkpointed duplicated-substring removal —
``ray job submit``-able.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/substring_dedup_job.py \
            --input '/data/documents/*.parquet' \
            --ckpt-dir /shared/ckpt --run-id substr-2025w07 \
            --out /data/documents_substring_clean \
            --files-per-partition 4 --concurrency 64

Locally: ``python jobs/substring_dedup_job.py --input ... --local-cpus 8``.

The window-instance stage (the dominant cost — tokenize + xxhash every
token, one (whash, doc, pos) row per 8-token window) checkpoints one
parquet part per input partition (state/checkpoint.py:
CheckpointedMapJob, atomic writes, lineage in file metadata).
Re-running with the same --run-id recomputes only missing/stale parts;
the count/semi-join/span/clean phases stream from the parts. Output:
partitioned parquet of (doc_id, n_tokens, dup_windows, dup_covered,
clean_text) — one directory, many files, resumable downstream.
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
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--out", default=None, help="write the cleaned report parquet here")
    ap.add_argument("--window", type=int, default=8, help="duplicated-span token window")
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--num-buckets", type=int, default=64)
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

    from ddsketch_ray.functions.substring import substring_dedup_checkpointed

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    out, job = substring_dedup_checkpointed(
        files,
        ckpt_dir=args.ckpt_dir,
        run_id=args.run_id,
        id_col=args.id_col,
        text_col=args.text_col,
        window=args.window,
        concurrency=args.concurrency,
        files_per_partition=args.files_per_partition,
        num_buckets=args.num_buckets,
    )
    if args.out:
        out.write_parquet(args.out)  # streaming sink, one file per block
        import ray.data as rd

        stats_ds = rd.read_parquet(args.out, columns=["dup_covered", "n_tokens"])
    else:
        stats_ds = out
    n_rows = stats_ds.count()
    covered = int(stats_ds.sum("dup_covered"))
    total_tokens = int(stats_ds.sum("n_tokens"))
    wall = time.perf_counter() - t0

    man = job.manifest()
    result = {
        "run_id": job.run_id,
        "rows": n_rows,
        "tokens": total_tokens,
        "dup_covered_tokens": covered,
        "dup_token_frac": round(covered / max(total_tokens, 1), 4),
        "partitions": len(job.partitions),
        "completed_partitions": len(man),
        "input_rows": sum(m["row_count"] for m in man),
        "wall_s": round(wall, 3),
        "rows_per_sec": round(n_rows / max(wall, 1e-9), 1),
        "out": args.out,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
