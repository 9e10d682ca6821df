"""Driver-style correctness gate: run every queries() entry at sf0.01 and
compare against oracle_sql() via DuckDB (row-count + columns + sorted
value equality)."""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd, duckdb, ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

def compare(name, ray_df, sql):
    want = con.sql(sql).df()
    a, b = normalize(ray_df), normalize(want)
    if list(a.columns) != list(b.columns):
        return f"COLS MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT ray={len(a)} sql={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            if not ok:
                bad = np.where(av.astype(float) != bv.astype(float))[0][:3]
                return f"VALUES col={c} first-bad rows {bad.tolist()}: ray={av[bad]} sql={bv[bad]}"
        else:
            if not (av == bv).all():
                bad = np.where(av != bv)[0][:3]
                return f"VALUES col={c} rows {bad.tolist()}: ray={av[bad]} sql={bv[bad]}"
    return None

t0=time.time()
df = E.entry()
print(f"entry(): {len(df)} rows in {time.time()-t0:.1f}s  schema={list(df.columns)}")
print(df.to_string(max_rows=6))

oracles = E.oracle_sql()
results = {}
only = sys.argv[1:]  # optional substring filters: run matching queries only
for name, fn in E.queries().items():
    if only and not any(s in name for s in only):
        continue
    t0 = time.time()
    try:
        out = fn(SF)
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        dt = time.time()-t0
        if name in oracles:
            err = compare(name, out, oracles[name])
            status = "OK" if err is None else f"FAIL: {err}"
        else:
            status = f"rows-only ({len(out)} rows)"
        results[name] = status
        print(f"{name:32s} {dt:6.1f}s  {status}")
    except Exception as e:
        traceback.print_exc()
        results[name] = f"ERROR {e}"
        print(f"{name:32s} ERROR {e}")

fails = {k: v for k, v in results.items() if v.startswith(("FAIL", "ERROR"))}
print(f"\n{len(results)-len(fails)}/{len(results)} clean; failures: {list(fails) or 'none'}")
ray.shutdown()
