#!/usr/bin/env python
"""Production driver for the END-TO-END pretraining-corpus chain —
``ray job submit``-able. Composes prep → substring dedup → MinHash
dedup → mixture resample → tokenize-pack as ONE resumable job
(pipelines/pretrain_corpus.py: stage-level lineage markers over each
stage's own per-partition checkpoints; a resumed run's pack manifest is
bit-identical to a cold run's).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/pretrain_corpus_job.py \
            --input '/data/documents/*.parquet' \
            --ckpt-dir /shared/ckpt --run-id corpus-2025w07 \
            --out /data/pretrain_corpus \
            --mixture en:70,zh:20,es:10 \
            --files-per-partition 4 --concurrency 64

Locally: ``python jobs/pretrain_corpus_job.py --input ... --local-cpus 8``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_mixture(s: str | None):
    if not s:
        return None
    out = []
    for part in s.split(","):
        g, w = part.split(":")
        out.append((g, int(w)))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="glob of parquet files")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", required=True, help="stage outputs root")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--mixture", default=None,
                    help="lang:weight,... target mixture (omit to keep all)")
    ap.add_argument("--num-merges", type=int, default=30)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--seqs-per-shard", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--validate-rules", default=None,
                    help="JSON list of validate_table rules; the job aborts "
                         "before stage 1 when any count exceeds --max-violations")
    ap.add_argument("--max-violations", type=int, default=0)
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

    from ddsketch_ray.pipelines.pretrain_corpus import pretrain_corpus_job

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    summary = pretrain_corpus_job(
        files,
        ckpt_dir=args.ckpt_dir,
        out_dir=args.out,
        run_id=args.run_id,
        id_col=args.id_col,
        text_col=args.text_col,
        lang_col=args.lang_col,
        min_tokens=args.min_tokens,
        window=args.window,
        mixture=_parse_mixture(args.mixture),
        num_merges=args.num_merges,
        seq_len=args.seq_len,
        seqs_per_shard=args.seqs_per_shard,
        seed=args.seed,
        concurrency=args.concurrency,
        files_per_partition=args.files_per_partition,
        num_buckets=args.num_buckets,
        validate_rules=json.loads(args.validate_rules) if args.validate_rules else None,
        max_violations=args.max_violations,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
