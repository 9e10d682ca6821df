#!/usr/bin/env python
"""Resumable compaction of a hive-bucketed layout — ``ray job
submit``-able maintenance pass (sources/compact.py).

Rewrites every ``key=value`` bucket directory under --root as ONE
parquet file sorted by --sort-cols, without changing any row: the
periodic job that keeps an append-grown serving layout (text index,
MinHash index, IVF lists, cube cells) at ~one file per bucket. Each
bucket is an independent Ray task following the crash-safe
merge → checkpoint → swap protocol; re-running with the same
--ckpt/--run-id skips finished buckets and finishes interrupted ones
(no loss, no duplication — proven by tests/test_compact.py).

    python jobs/compact_layout_job.py \
        --root /tmp/text_index --sort-cols tok \
        --ckpt /tmp/ckpt/compact.json --local-cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="layout root (contains key=value dirs)")
    ap.add_argument("--sort-cols", required=True, help="comma-separated within-bucket sort key")
    ap.add_argument("--ckpt", required=True, help="checkpoint json path")
    ap.add_argument("--run-id", default="r0")
    ap.add_argument("--parallelism", type=int, default=8)
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

    from ddsketch_ray.sources.compact import compact_bucketed_layout

    os.makedirs(os.path.dirname(os.path.abspath(args.ckpt)), exist_ok=True)
    t0 = time.time()
    stats = compact_bucketed_layout(
        args.root,
        [c for c in args.sort_cols.split(",") if c],
        ckpt_path=args.ckpt,
        run_id=args.run_id,
        parallelism=args.parallelism,
    )
    stats["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
