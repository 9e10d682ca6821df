#!/usr/bin/env python
"""Resumable two-pass EXACT frequent-items job — ``ray job submit``-able.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/frequent_items_job.py \
            --input '/data/webpages/*.parquet' \
            --column host --phi 0.001 --ckpt-dir /shared/ckpt \
            --run-id crawl-2025w07 --files-per-partition 4 --concurrency 64

Locally (this sandbox): ``python jobs/frequent_items_job.py --input ...
--local-cpus 8``.

Both passes ride state/checkpoint.py's per-partition checkpoints:

- pass 1 (``<run-id>-mg``): one Misra-Gries summary per partition
  (sketches/mg.py — deterministic superset of every value with weight
  > n/(k+1)); part merges are deterministic in partition order, so a
  resumed run reaches the bit-identical summary state.
- pass 2 (``<run-id>-cnt-<digest>``): exact counts of the ≤k pass-1
  candidates per partition (sketches/mg.py::CandidateCounts — merge is
  integer addition, bit-identical any order). The digest covers the
  candidate list, n, φ and k, so a pass-1 change (different inputs)
  automatically invalidates pass-2 parts instead of silently reusing
  stale counts.

Output: the EXACT set of values with total count ≥ ceil(φ·n), with
exact counts — resumed ≡ cold bit-for-bit. Lineage + per-partition
metrics print from both manifests.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import math
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_job(
    files: list[str],
    column: str,
    phi: float,
    ckpt_dir: str,
    run_id: str | None = None,
    k: int | None = None,
    files_per_partition: int = 1,
    concurrency: int = 8,
) -> dict:
    """The job body (Ray must already be initialized — main() owns the
    session; tests call this under their fixture)."""
    from ddsketch_ray.sketches.mg import CandidateCounts, MisraGries
    from ddsketch_ray.state import CheckpointedSketchJob

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    k_min = math.ceil(1.0 / phi)
    if k is None:
        k = 2 * k_min
    if k < k_min:
        raise ValueError(f"k={k} < ceil(1/phi)={k_min}: superset guarantee lost")
    run_id = run_id or uuid.uuid4().hex[:12]
    kk = k

    def build_mg(tbl):
        sk = MisraGries(k=kk)
        col = tbl.column(column).drop_null()
        sk.add_array(col.to_numpy(zero_copy_only=False))
        return sk

    t0 = time.perf_counter()
    job1 = CheckpointedSketchJob(
        files, build_mg, columns=[column], ckpt_dir=ckpt_dir,
        run_id=f"{run_id}-mg", files_per_partition=files_per_partition,
    )
    pend1 = job1.pending_partitions()
    mg = job1.run(concurrency=concurrency)
    cand = mg.candidates()
    n = mg.n
    threshold = math.ceil(phi * n)

    # pass-2 lineage: any change in the pass-1 outcome or the thresholding
    # parameters re-keys (and therefore invalidates) the count checkpoints
    digest = hashlib.sha256(
        json.dumps(
            {"cand": [str(v) for v in cand.tolist()], "n": n, "phi": phi, "k": k}
        ).encode()
    ).hexdigest()[:12]

    def build_counts(tbl):
        cc = CandidateCounts(cand)
        col = tbl.column(column).drop_null()
        cc.add_array(col.to_numpy(zero_copy_only=False))
        return cc

    job2 = CheckpointedSketchJob(
        files, build_counts, columns=[column], ckpt_dir=ckpt_dir,
        run_id=f"{run_id}-cnt-{digest}", files_per_partition=files_per_partition,
    )
    pend2 = job2.pending_partitions()
    cc = job2.run(concurrency=concurrency)
    wall = time.perf_counter() - t0
    if cc.n != n:
        raise RuntimeError(
            f"pass-2 total weight {cc.n} != pass-1 {n} (input changed mid-run?)"
        )

    keep = cc.counts >= threshold
    items = [
        (str(v), int(c))
        for v, c in zip(cand[keep].tolist(), cc.counts[keep].tolist())
    ]
    items.sort(key=lambda r: (-r[1], r[0]))

    man1 = job1.manifest().to_pandas()
    return {
        "run_id": run_id,
        "rows": int(man1["row_count"].sum()),
        "partitions": len(man1),
        "recomputed_partitions_pass1": len(pend1),
        "recomputed_partitions_pass2": len(pend2),
        "wall_s": round(wall, 3),
        "rows_per_sec": round(
            int(man1[man1["part_id"].isin(pend1)]["row_count"].sum()) / max(wall, 1e-9), 1
        ),
        "n": n,
        "phi": phi,
        "threshold": threshold,
        "k": k,
        "mg_offset": mg.offset,
        "n_frequent": len(items),
        "frequent": [{"item": v, "cnt": c} for v, c in items],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="glob of parquet files")
    ap.add_argument("--column", required=True, help="key column to count")
    ap.add_argument("--phi", type=float, required=True, help="frequency threshold in (0,1]")
    ap.add_argument("--k", type=int, default=None,
                    help="MG counters (default 2*ceil(1/phi); must be >= ceil(1/phi))")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run-id", default=None)
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

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2
    try:
        result = run_job(
            files,
            args.column,
            args.phi,
            args.ckpt_dir,
            run_id=args.run_id,
            k=args.k,
            files_per_partition=args.files_per_partition,
            concurrency=args.concurrency,
        )
    except (ValueError, RuntimeError) as e:
        print(str(e), file=sys.stderr)
        return 2
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
