#!/usr/bin/env python
"""Production driver for resumable distributed PageRank — ``ray job
submit``-able, the graph-analytics counterpart of
``jobs/kmeans_job.py`` (per-ITERATION state checkpoints with lineage
metadata; map-style jobs checkpoint per partition instead).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/pagerank_job.py \
            --edges-input '/data/linkgraph/edges/*.parquet' \
            --nodes-input '/data/linkgraph/nodes/*.parquet' \
            --ckpt-dir /shared/ckpt/pr-2025w07 \
            --iters 20 --out /data/linkgraph/ranks

Locally (this sandbox): ``python jobs/pagerank_job.py --edges-input ...
--nodes-input ... --ckpt-dir /tmp/pr --local-cpus 8``.

Resumability (functions/graph.py::pagerank_checkpointed): every
iteration lands as ``rank-{i:04d}/`` (parquet state + a ``meta.json``
completion marker written last). A killed run re-started with the same
--ckpt-dir continues from the last complete iteration and — because
each round is a pure fixed-point-integer function of the rank rows —
produces the BIT-IDENTICAL result a cold run would, on either plan
(the state format is mode-independent). Parameter mismatches against
the stored metadata abort instead of silently diverging. Personalized
PageRank via --seed-mod (seeds = node % seed_mod == 0), pinned in the
lineage metadata.
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
    ap.add_argument("--edges-input", required=True, help="glob of edge parquet files")
    ap.add_argument("--nodes-input", required=True, help="glob of node parquet files")
    ap.add_argument("--src-col", default="src")
    ap.add_argument("--dst-col", default="dst")
    ap.add_argument("--node-col", default="node")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--damping-num", type=int, default=85)
    ap.add_argument("--damping-den", type=int, default=100)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--mode", default="auto", choices=["auto", "broadcast", "shuffle"])
    ap.add_argument("--seed-mod", type=int, default=None,
                    help="personalized PageRank: seeds = node %% seed_mod == 0")
    ap.add_argument("--out", default=None,
                    help="optional output dir for the final (node, rank_fp, rank) parquet")
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
    from ddsketch_ray.functions.graph import pagerank_checkpointed

    tune_for_sketch_pipelines()

    t0 = time.perf_counter()
    efiles = sorted(glob.glob(args.edges_input))
    nfiles = sorted(glob.glob(args.nodes_input))
    if not efiles:
        print(f"no edge files match {args.edges_input!r}", file=sys.stderr)
        return 2
    if not nfiles:
        print(f"no node files match {args.nodes_input!r}", file=sys.stderr)
        return 2
    edges = rd.read_parquet(efiles, columns=[args.src_col, args.dst_col])
    nodes = rd.read_parquet(nfiles, columns=[args.node_col])
    fit = pagerank_checkpointed(
        edges,
        nodes,
        args.ckpt_dir,
        node_col=args.node_col,
        src_col=args.src_col,
        dst_col=args.dst_col,
        iters=args.iters,
        damping=(args.damping_num, args.damping_den),
        num_buckets=args.num_buckets,
        mode=args.mode,
        seed_mod=args.seed_mod,
        input_desc=f"{args.edges_input}|{args.nodes_input}",
    )
    result = fit["result"]
    if args.out:
        result = result.materialize()
        result.write_parquet(args.out)
    # O(blocks)-driver sanity: total fixed-point mass (conserved up to
    # the documented floor leakage)
    mass = int(
        sum(
            int(x)
            for b in result.map_batches(
                lambda df: {"p": [int(df["rank_fp"].sum())]}, batch_format="pandas"
            ).iter_batches(batch_format="pandas")
            for x in b["p"]  # iter_batches coalesces partial rows
        )
    )
    print(
        json.dumps(
            {
                "iters": args.iters,
                "resumed_from_iteration": fit["resumed_from_iteration"],
                "iterations_run": fit["iterations_run"],
                "total_rank_fp": mass,
                "wall_s": round(time.perf_counter() - t0, 2),
                "ckpt_dir": args.ckpt_dir,
                "out": args.out,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
