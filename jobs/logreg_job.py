#!/usr/bin/env python
"""Production driver for resumable distributed logistic regression —
``ray job submit``-able, the model-training counterpart of
``jobs/kmeans_job.py`` (per-ITERATION weight checkpoints).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/logreg_job.py \
            --input '/data/features/*.parquet' \
            --features punct_ratio,digit_ratio,stopword_ratio \
            --label is_en \
            --ckpt-dir /shared/ckpt/quality-clf-2025w07 \
            --iters 50 --lr 0.5

Locally: ``python jobs/logreg_job.py --input ... --ckpt-dir /tmp/lr
--local-cpus 8``.

Resumability: after every gradient step the weight vector lands
atomically as ``weights-{i:04d}.parquet`` with lineage metadata
(features, label, lr, frac_bits, input description). A killed run
re-started with the same --ckpt-dir continues from the last complete
iteration and — fixed-point integer gradient accumulation — produces
the BIT-IDENTICAL model a cold run would. Parameter mismatches against
the stored metadata abort instead of silently diverging.
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
    ap.add_argument("--features", required=True, help="comma-separated feature columns")
    ap.add_argument("--label", required=True, help="0/1 label column")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--lr", type=float, default=0.1)
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
    from ddsketch_ray.functions.ml import logreg_fit_checkpointed

    tune_for_sketch_pipelines()

    t0 = time.perf_counter()
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2
    feats = [c.strip() for c in args.features.split(",") if c.strip()]
    ds = rd.read_parquet(files, columns=feats + [args.label])
    fit = logreg_fit_checkpointed(
        ds,
        args.ckpt_dir,
        feats,
        args.label,
        iters=args.iters,
        lr=args.lr,
        frac_bits=args.frac_bits,
        input_desc=args.input,
    )
    print(
        json.dumps(
            {
                "features": feats,
                "iters": args.iters,
                "resumed_from_iteration": fit["resumed_from_iteration"],
                "iterations_run": fit["iterations_run"],
                "n": fit["n"],
                "loss": round(fit["loss"], 6),
                "weights": [round(float(x), 6) for x in fit["weights"]],
                "bias": round(fit["bias"], 6),
                "wall_s": round(time.perf_counter() - t0, 2),
                "ckpt_dir": args.ckpt_dir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
