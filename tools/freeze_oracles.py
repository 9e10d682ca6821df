"""Generate frozen determinism oracles for the approximate-sketch gate
queries (VERDICT r1 item 6).

Approximate sketches (HLL, CMS, Bloom, MinHash/SimHash clustering,
sign-LSH top-k, the fixed fake codec, the deterministic synth report)
cannot be recomputed by an independent SQL query — but with fixed seeds
their distributed output is a pure function of the input data, so the
correct value can be computed ONCE and frozen as a `VALUES` table (the
same strategy the bit-parity harness uses for DDSketch). The check the
frozen oracle performs is bit-level determinism of the distributed
computation at sf0.01: merge-order independence, seed stability, and no
driver/cluster divergence.

t-digest/KLL gate queries are freezable since round 3: they run the
deterministic plan (pipelines/deterministic.py — pid-partitioned,
sorted insert, fixed driver merge order), so their output is a pure
function of the input multiset. Accuracy stays covered by the
rank-error pytest oracles. Any query whose output still varies
run-to-run is REFUSED by the two-session verification below.

Usage: python tools/freeze_oracles.py   (writes frozen_oracles.py at the
repo root; __ray_entry__.oracle_sql() merges it in). Determinism is
re-verified on every run by executing each query in two fresh Ray
sessions via subprocesses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

# queries verified deterministic across fresh Ray sessions (merge-order-
# independent sketch algebra or pure per-row functions)
FREEZE = [
    # hll_distinct_custkeys / hll_users_by_event_type: converted to REAL
    # recomputed-SQL oracles in round 4 (splitmix hash + bin() clz +
    # exact HUGEINT dyadic register sum — the engine's estimator now
    # sums 2^-reg as a big integer so SQL's unordered SUM replays it)
    # cms_top_event_types: converted in round 4 (hash_fn="poly" byte
    # polynomial + double-hashed bucket totals + min-over-rows in SQL)
    # bloom_customer_membership: converted in round 4 (sizing + k probe
    # positions + bit membership replayed in HUGEINT SQL)
    "minhash_dedup_documents",
    "minhash_dedup_distributed_documents",
    # minhash_index_lookup_documents: converted in round 5 — the gate
    # query's index is built with token_hash="poly", and the ENTIRE
    # lookup (ingest derivation, signatures, band candidates, verify,
    # best match) is recomputed in DuckDB (_minhash_index_oracle)
    "simhash_dedup_documents",
    "simhash_dedup_distributed_documents",
    # lang_id_documents: converted to a REAL recomputed-SQL oracle in
    # round 5 — profiles are exact integer token counts with a
    # total-ordered top-64 tie-break, scoring is one integer dot product
    # + one mirrored float division (__ray_entry__._lang_id_sql)
    # doc_fingerprints: converted to a REAL recomputed-SQL oracle in
    # round 4 (poly hash family + rotate/xor/finalize replay)
    # lsh_topk_embeddings / ivf_topk_embeddings: converted to REAL
    # recomputed-SQL oracles in round 5 (Box-Muller plane regeneration /
    # full spherical-k-means training replay with unrolled init dedup +
    # 5 Lloyd rounds — see __ray_entry__._lsh_topk_sql/_ivf_topk_sql)
    "webpages_report",
    # media_decode_report / video_frames_report: converted in round 5 —
    # the DDSM fake-codec byte streams are splitmix-regenerable in SQL
    # and byte sums are exact integers (order-independent means)
    # logreg_quality_lang: converted to a REAL recomputed-SQL oracle in
    # round 4 (20 unrolled GD rounds, fixed-point gradient replay)
    "tdigest_quantiles_price",
    "kll_quantiles_price",
    "tdigest_quantiles_by_event_type",
    # kmeans_embeddings: converted to a REAL recomputed-SQL oracle in
    # round 4 (splitmix init + 5 unrolled Lloyd rounds replay)
    # bpe_merges_docs / bpe_token_counts_docs: converted to REAL
    # recomputed-SQL oracles in round 4 (unrolled 30-round training
    # replay in DuckDB — see __ray_entry__._bpe_sql_ctes)
    "host_stats_webpages",
    "paragraph_dedup_webpages",
    "boilerplate_paras_webpages",
]

_RUNNER = r"""
import sys, json
import ray, pandas as pd, numpy as np
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
import __ray_entry__ as E
out = {}
for name in %(names)r:
    df = E.queries()[name](%(sf)r)
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    out[name] = {
        "columns": cols,
        "dtypes": [str(df[c].dtype) for c in cols],
        "rows": [
            [None if pd.isna(v) else (v.item() if hasattr(v, "item") else v)
             for v in row]
            for row in df.itertuples(index=False, name=None)
        ],
    }
print("FREEZE_JSON:" + json.dumps(out))
ray.shutdown()
"""


def run_once(ncpu: int) -> dict:
    code = _RUNNER % {"repo": REPO, "names": FREEZE, "sf": SF}
    res = subprocess.run(
        [sys.executable, "-c", code, str(ncpu)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in res.stdout.splitlines():
        if line.startswith("FREEZE_JSON:"):
            return json.loads(line[len("FREEZE_JSON:"):])
    raise RuntimeError(f"runner produced no payload:\n{res.stderr[-2000:]}")


def sql_literal(v, dtype: str) -> str:
    if v is None:
        return "NULL"
    if dtype == "bool" or isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if dtype.startswith(("int", "uint")):
        return f"{int(v)}::BIGINT"
    if dtype.startswith("float"):
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):  # non-finite
            return f"CAST('{f}' AS DOUBLE)"  # 'nan'/'inf'/'-inf' parse
        return f"CAST({f!r} AS DOUBLE)"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def to_sql(name: str, payload: dict) -> str:
    cols, dtypes, rows = payload["columns"], payload["dtypes"], payload["rows"]
    if not rows:
        # VALUES with no tuples is invalid SQL — an empty expected
        # result freezes as a WHERE FALSE projection instead
        collist = ", ".join(f"NULL AS \"{c}\"" for c in cols)
        return f"SELECT {collist} WHERE FALSE"
    tuples = ",".join(
        "(" + ",".join(sql_literal(v, t) for v, t in zip(row, dtypes)) + ")"
        for row in rows
    )
    collist = ", ".join(f'"{c}"' for c in cols)
    header = (
        f"-- frozen determinism oracle for {name}: the fixed-seed expected\n"
        f"-- output at sf0.01, computed once and re-verified deterministic\n"
        f"-- across fresh Ray sessions (tools/freeze_oracles.py). Checks\n"
        f"-- merge-order independence + seed stability of the sketch, which\n"
        f"-- no independent SQL recompute can express.\n"
    )
    return header + f"SELECT * FROM (VALUES {tuples}) AS t({collist})"


def main() -> None:
    print("pass 1 (8 cpus)...", file=sys.stderr)
    a = run_once(8)
    print("pass 2 (6 cpus)...", file=sys.stderr)
    b = run_once(6)
    bad = [n for n in FREEZE if a[n] != b[n]]
    if bad:
        raise SystemExit(f"REFUSING to freeze non-deterministic queries: {bad}")
    frozen = {n: to_sql(n, a[n]) for n in FREEZE}
    out_path = os.path.join(REPO, "frozen_oracles.py")
    with open(out_path, "w") as f:
        f.write(
            '"""GENERATED by tools/freeze_oracles.py — do not edit.\n\n'
            "Frozen determinism oracles (sf0.01) for approximate-sketch gate\n"
            'queries; see the generator docstring for the methodology."""\n\n'
            "FROZEN_ORACLES = " + json.dumps(frozen, indent=0) + "\n"
        )
    print(f"wrote {out_path} with {len(frozen)} oracles", file=sys.stderr)


if __name__ == "__main__":
    main()
