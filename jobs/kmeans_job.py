#!/usr/bin/env python
"""Production driver for resumable distributed k-means — ``ray job
submit``-able, the iterative-algorithm counterpart of
``jobs/sketch_job.py`` (which checkpoints per PARTITION; an iterative
fit checkpoints its state vector per ITERATION instead).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/kmeans_job.py \
            --input '/data/embeddings/*.parquet' \
            --ckpt-dir /shared/ckpt/kmeans-2025w07 \
            --k 4096 --iters 20

Locally (this sandbox): ``python jobs/kmeans_job.py --input ...
--ckpt-dir /tmp/km --local-cpus 8``.

Resumability: every Lloyd iteration lands atomically as
``centroids-{i:04d}.parquet`` with lineage metadata (k, seed,
frac_bits, input description, inertia, wall_s). A killed run re-started
with the same --ckpt-dir continues from the last complete iteration and
— because each iteration is a pure function of (input multiset,
centroids) and accumulation is fixed-point integer — produces the
BIT-IDENTICAL result a cold run would. Parameter mismatches against the
stored metadata abort instead of silently diverging.
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
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frac-bits", type=int, default=20)
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
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ddsketch_ray import tune_for_sketch_pipelines
    from ddsketch_ray.functions.cluster import kmeans_fit_checkpointed

    tune_for_sketch_pipelines()

    t0 = time.perf_counter()
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.vec_col])
    fit = kmeans_fit_checkpointed(
        ds,
        args.ckpt_dir,
        vec_col=args.vec_col,
        id_col=args.id_col,
        k=args.k,
        iters=args.iters,
        seed=args.seed,
        frac_bits=args.frac_bits,
        input_desc=args.input,
    )
    print(
        json.dumps(
            {
                "k": args.k,
                "iters": args.iters,
                "resumed_from_iteration": fit["resumed_from_iteration"],
                "iterations_run": fit["iterations_run"],
                "inertia": fit["inertia"],
                "counts": fit["counts"].tolist(),
                "wall_s": round(time.perf_counter() - t0, 2),
                "ckpt_dir": args.ckpt_dir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
