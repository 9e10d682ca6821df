#!/usr/bin/env python
"""Production driver for resumable training-corpus preparation —
``ray job submit``-able.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/corpus_prep_job.py \
            --input '/data/documents/*.parquet' \
            --ckpt-dir /shared/ckpt --run-id prep-2025w07 \
            --out /data/train_corpus --files-per-partition 4 \
            --concurrency 64

Locally: ``python jobs/corpus_prep_job.py --input ... --local-cpus 8``.

Pipeline (pipelines/corpus_prep.py): per-shard split + PII redaction +
token gate + content hash, checkpointed one parquet part per input
partition (atomic writes, lineage in metadata — re-running with the
same --run-id recomputes only missing/stale parts); then a global
min-id exact dedup emitting survivor rows; then a split-partitioned
parquet write (out/split=train/..., many files — resumable downstream).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="glob of parquet files")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--out", default=None, help="partitioned corpus output dir")
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
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

    from ddsketch_ray.pipelines.corpus_prep import corpus_prep_job

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    summary, _job = corpus_prep_job(
        files,
        ckpt_dir=args.ckpt_dir,
        out_dir=args.out,
        run_id=args.run_id,
        id_col=args.id_col,
        text_col=args.text_col,
        lang_col=args.lang_col,
        min_tokens=args.min_tokens,
        seed=args.seed,
        files_per_partition=args.files_per_partition,
        concurrency=args.concurrency,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
