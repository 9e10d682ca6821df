#!/usr/bin/env python
"""Production driver for checkpointed MinHash-LSH dedup — ``ray job
submit``-able.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/dedup_job.py \
            --input '/data/documents/*.parquet' \
            --ckpt-dir /shared/ckpt --run-id dedup-2025w07 \
            --out /data/documents_dedup_assignments \
            --files-per-partition 4 --concurrency 64

Locally: ``python jobs/dedup_job.py --input ... --local-cpus 8``.

The signature stage (the dominant cost — shingling + 128-permutation
MinHash over every byte of text) checkpoints one parquet part per input
partition (state/checkpoint.py:CheckpointedMapJob, atomic writes,
lineage in file metadata). Re-running with the same --run-id recomputes
only missing/stale parts; the LSH/verify/emit phase streams from the
parts. Output: partitioned parquet of (doc_id, rep, is_survivor) — one
directory, many files, resumable downstream.
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
    ap.add_argument("--out", default=None, help="write assignments parquet here")
    ap.add_argument("--k-shingle", type=int, default=5)
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--jaccard-threshold", type=float, default=0.7)
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--mode", default="auto", choices=["auto", "driver", "distributed"],
                    help="LSH phase plan: auto size-gates driver vs fully distributed")
    ap.add_argument("--driver-threshold", type=int, default=2_000_000,
                    help="auto mode: band-row count above which the distributed plan runs")
    ap.add_argument("--keep-best-col", default=None,
                    help="re-label each cluster with its highest-scoring member "
                         "(ties -> smallest id); names an INTEGER column of the input")
    ap.add_argument("--keep-best-tokens", action="store_true",
                    help="re-label each cluster with its longest member "
                         "(ASCII-whitespace token count of --text-col)")
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="init a local session with this many CPUs (omit under ray job submit)")
    args = ap.parse_args()
    if args.keep_best_col and args.keep_best_tokens:
        print("--keep-best-col and --keep-best-tokens are exclusive", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus, **kwargs)
        else:
            ray.init(**kwargs)  # under `ray job submit` this joins the cluster

    from ddsketch_ray.functions.dedup import minhash_dedup_checkpointed

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    out, job = minhash_dedup_checkpointed(
        files,
        ckpt_dir=args.ckpt_dir,
        run_id=args.run_id,
        text_col=args.text_col,
        id_col=args.id_col,
        k_shingle=args.k_shingle,
        num_perm=args.num_perm,
        bands=args.bands,
        jaccard_threshold=args.jaccard_threshold,
        concurrency=args.concurrency,
        files_per_partition=args.files_per_partition,
        mode=args.mode,
        driver_threshold=args.driver_threshold,
    )
    if args.keep_best_col or args.keep_best_tokens:
        # post-stage: deterministic re-selection over the (id, rep) rows —
        # composes with resume because it is a pure function of the
        # checkpointed assignments + the input scores
        import ray.data as rd

        from ddsketch_ray.functions.dedup import select_representatives
        from ddsketch_ray.sources.readers import strip_schema_metadata

        if args.keep_best_tokens:
            from ddsketch_ray.functions.text import token_count_batch

            docs = strip_schema_metadata(
                rd.read_parquet(files, columns=[args.id_col, args.text_col])
            )
            scores = docs.map_batches(
                lambda t: token_count_batch(t, text_col=args.text_col)
                .select([args.id_col, "n_tokens"])
                .rename_columns([args.id_col, "score"]),
                batch_format="pyarrow",
                batch_size=None,
            )
        else:
            docs = strip_schema_metadata(
                rd.read_parquet(files, columns=[args.id_col, args.keep_best_col])
            )
            scores = docs.map_batches(
                lambda t: t.rename_columns([args.id_col, "score"]),
                batch_format="pyarrow",
                batch_size=None,
            )
        out = select_representatives(out, scores, id_col=args.id_col)

    if args.out:
        out.write_parquet(args.out)  # streaming sink, one file per block
        import ray.data as rd

        stats_ds = rd.read_parquet(args.out, columns=["is_survivor"])
    else:
        stats_ds = out
    n_rows = stats_ds.count()
    n_dups = n_rows - int(stats_ds.sum("is_survivor"))
    wall = time.perf_counter() - t0

    man = job.manifest()
    result = {
        "run_id": job.run_id,
        "rows": n_rows,
        "duplicates": n_dups,
        "partitions": len(job.partitions),
        "completed_partitions": len(man),
        "signature_rows": sum(m["row_count"] for m in man),
        "wall_s": round(wall, 3),
        "rows_per_sec": round(n_rows / max(wall, 1e-9), 1),
        "out": args.out,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
