#!/usr/bin/env python
"""Data-quality validation CLI (functions/validate.py) — ``ray job
submit``-able: run a JSON rule list over a parquet corpus, print the
per-rule violation counts as one JSON line, optionally persist the
report, exit non-zero when any rule exceeds --max-violations (the
fail-fast contract pretrain_corpus_job's stage 0 uses).

    python jobs/validate_job.py \
        --input '/root/testdata/sf0.01/orders.parquet' \
        --rules '[{"rule": "not_null", "col": "o_custkey"},
                  {"rule": "unique", "col": "o_orderkey"}]' \
        --local-cpus 8

``ref`` rules take their reference table inline:
``{"rule": "ref", "col": "fk", "ref_col": "k", "ref_input": "glob"}``.
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
    ap.add_argument("--rules", required=True, help="JSON list of rules")
    ap.add_argument("--max-violations", type=int, default=0)
    ap.add_argument("--report", default=None, help="write the report parquet here")
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

    import pyarrow.parquet as pq
    import ray.data as rd

    from ddsketch_ray.functions.validate import validate_table

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no files match {args.input}", file=sys.stderr)
        return 2
    rules = json.loads(args.rules)
    refs = {}
    for i, r in enumerate(rules):
        ref_glob = r.pop("ref_input", None)
        if ref_glob:
            refs[i] = rd.read_parquet(sorted(glob.glob(ref_glob)))
    rep = validate_table(rd.read_parquet(files), rules, refs=refs)
    if args.report:
        pq.write_table(rep, args.report)
    counts = {
        f"{r}:{c}": int(n)
        for r, c, n in zip(
            rep.column("rule").to_pylist(),
            rep.column("col").to_pylist(),
            rep.column("n_violations").to_pylist(),
        )
    }
    failed = {k: v for k, v in counts.items() if v > args.max_violations}
    print(json.dumps({"rule_counts": counts, "failed": failed,
                      "ok": not failed}))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
