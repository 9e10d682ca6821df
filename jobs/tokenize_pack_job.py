#!/usr/bin/env python
"""Production driver for the tokenize-and-pack pipeline — ``ray job
submit``-able.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/tokenize_pack_job.py \
            --input '/data/documents_dedup/*.parquet' \
            --ckpt-dir /shared/ckpt --run-id tokpack-2025w07 \
            --out /data/token_shards \
            --num-merges 30000 --seq-len 2048 --concurrency 64

Locally: ``python jobs/tokenize_pack_job.py --input ... --local-cpus 8``.

Stages (see pipelines/tokenize_pack.py): BPE training checkpoints its
merge list (lineage-checked JSON); the encode stage — the dominant
cost — checkpoints one parquet part per input shard; the pack/manifest
phase recomputes from the parts (cheap: two narrow sorts). Re-running
with the same --run-id skips finished work. Output: parquet manifest
hive-partitioned by sequence-range shard — the artifact a training
loader consumes.
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
    ap.add_argument("--out", default=None, help="write the hive-partitioned manifest here")
    ap.add_argument("--num-merges", type=int, default=30)
    ap.add_argument("--max-word-vocab", type=int, default=None)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--seqs-per-shard", type=int, default=1024)
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

    from ddsketch_ray.pipelines.tokenize_pack import tokenize_pack

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    manifest, info = tokenize_pack(
        files,
        ckpt_dir=args.ckpt_dir,
        run_id=args.run_id,
        text_col=args.text_col,
        id_col=args.id_col,
        num_merges=args.num_merges,
        max_word_vocab=args.max_word_vocab,
        seq_len=args.seq_len,
        seqs_per_shard=args.seqs_per_shard,
        out_dir=args.out,
        concurrency=args.concurrency,
        files_per_partition=args.files_per_partition,
    )
    if args.out:
        import ray.data as rd

        stats_ds = rd.read_parquet(args.out, columns=["take_n"])
    else:
        stats_ds = manifest
    n_rows = stats_ds.count()
    total_tokens = int(stats_ds.sum("take_n")) if n_rows else 0
    wall = time.perf_counter() - t0

    enc_rows = sum(m["row_count"] for m in info["encode_manifest"])
    result = {
        "run_id": info["run_id"],
        "manifest_rows": n_rows,
        "total_tokens": total_tokens,
        "n_sequences": (total_tokens + args.seq_len - 1) // args.seq_len,
        "docs_encoded": enc_rows,
        "n_merges": info["n_merges"],
        "merges_resumed": info["merges_resumed"],
        "encode_partitions": info["encode_partitions"],
        "encode_recomputed": info["encode_recomputed"],
        "wall_s": round(wall, 3),
        "docs_per_sec": round(enc_rows / max(wall, 1e-9), 1),
        "out": args.out,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
