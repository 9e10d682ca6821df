"""Round-3 stress runs (recorded in BASELINE.md):

1. ``dedup1m``    — 1M-doc checkpointed MinHash dedup + kill/resume
2. ``sessions1m`` — session_counts sort plan at 1M users / 5M events
                    (``--compare-mapgroups`` also times the per-key
                    map_groups plan it replaced, same input)
3. ``asof``       — broadcast as-of join, 50k-key dim × 2M-row big side
                    (the shape the old per-key-mask kernel choked on)

Usage: python tools/stress_r3.py [dedup1m] [sessions1m] [asof]
       [--compare-mapgroups] [--cpus N]
Corpora are deterministic and cached under /tmp.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = 32
for i, a in enumerate(sys.argv):
    if a == "--cpus":
        CPUS = int(sys.argv[i + 1])

DEDUP_DIR = "/tmp/ddsr_stress_dedup1m_32"
EVENTS_DIR = "/tmp/ddsr_stress_events1m"
N_DOCS = 1_000_000
# one partition per CPU: 16 shards left half a 32-CPU box idle in the
# signature stage (measured r3) — partition count should be >= CPUs
N_FILES = 32
N_EVENTS = 5_000_000
N_USERS = 1_000_000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_docs() -> list[str]:
    """1M deterministic ~60-word docs, 5% near-dup pairs (id 20k+19
    copies 20k+18 with one word changed), N_FILES parquet shards."""
    marker = os.path.join(DEDUP_DIR, ".complete")
    if os.path.exists(marker):
        return sorted(
            os.path.join(DEDUP_DIR, f) for f in os.listdir(DEDUP_DIR) if f.endswith(".parquet")
        )
    import ray.data as rd

    from ddsketch_ray.hashing import splitmix64

    shutil.rmtree(DEDUP_DIR, ignore_errors=True)
    os.makedirs(DEDUP_DIR)
    vocab = np.array([f"word{i:04d}" for i in range(5000)])

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        base = np.where(ids % 20 == 19, ids - 1, ids)  # dup pairs share a base
        w = 60
        seeds = (base[:, None] * np.int64(w) + np.arange(w)[None, :]).astype(np.uint64)
        widx = (splitmix64(seeds.ravel()) % np.uint64(len(vocab))).astype(np.int64)
        words = vocab[widx].reshape(len(ids), w)
        words[ids % 20 == 19, -1] = "CHANGED"  # near-dup, not exact
        texts = np.array([" ".join(r) for r in words], dtype=object)
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, type=pa.string())})

    ds = rd.range(N_DOCS, override_num_blocks=N_FILES).map_batches(
        lambda b: gen(b), batch_format="pyarrow", batch_size=None
    )
    ds.write_parquet(DEDUP_DIR, min_rows_per_file=N_DOCS // N_FILES)
    open(marker, "w").write("ok")
    return sorted(
        os.path.join(DEDUP_DIR, f) for f in os.listdir(DEDUP_DIR) if f.endswith(".parquet")
    )


def stress_dedup1m() -> dict:
    from ddsketch_ray.functions.dedup import minhash_dedup_checkpointed

    files = ensure_docs()
    ckpt = "/tmp/ddsr_stress_dedup1m_ckpt32"
    shutil.rmtree(ckpt, ignore_errors=True)

    t0 = time.perf_counter()
    out, job = minhash_dedup_checkpointed(
        files, ckpt_dir=ckpt, run_id="r3", concurrency=CPUS, files_per_partition=1
    )
    df = out.to_pandas()
    cold = time.perf_counter() - t0
    n_dups = int((~df["is_survivor"]).sum())
    log(f"dedup1m cold: {cold:.1f}s ({N_DOCS/cold:.0f} docs/s), {n_dups} non-survivors")

    # kill/resume: lose 6 of the 32 signature parts, rerun same run_id
    for i in (2, 7, 11, 19, 26, 30):
        os.remove(job._part_path(i))
    t0 = time.perf_counter()
    out2, job2 = minhash_dedup_checkpointed(
        files, ckpt_dir=ckpt, run_id="r3", concurrency=CPUS, files_per_partition=1
    )
    df2 = out2.to_pandas()
    resume = time.perf_counter() - t0
    assert len(df2) == len(df) and int((~df2["is_survivor"]).sum()) == n_dups
    log(f"dedup1m resume (6/32 parts lost): {resume:.1f}s")
    return {
        "docs": N_DOCS,
        "cold_sec": round(cold, 1),
        "cold_docs_per_sec": round(N_DOCS / cold),
        "resume_sec": round(resume, 1), "resume_parts_lost": 6,
        "non_survivors": n_dups,
        "parts": len(files),
    }


def ensure_events() -> str:
    marker = os.path.join(EVENTS_DIR, ".complete")
    if os.path.exists(marker):
        return EVENTS_DIR
    import ray.data as rd

    from ddsketch_ray.hashing import splitmix64

    shutil.rmtree(EVENTS_DIR, ignore_errors=True)
    os.makedirs(EVENTS_DIR)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.uint64)
        uid = (splitmix64(ids) % np.uint64(N_USERS)).astype(np.int64)
        ts = (splitmix64(ids ^ np.uint64(0x9E37)) % np.uint64(30 * 86400 * 1_000_000)).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": pa.array(uid),
                "ts": pa.array(ts.view("datetime64[us]"), type=pa.timestamp("us")),
            }
        )

    rd.range(N_EVENTS, override_num_blocks=CPUS * 4).map_batches(
        lambda b: gen(b), batch_format="pyarrow", batch_size=None
    ).write_parquet(EVENTS_DIR, min_rows_per_file=N_EVENTS // 32)
    open(marker, "w").write("ok")
    return EVENTS_DIR


def stress_sessions1m(compare: bool) -> dict:
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.windows import session_counts

    path = ensure_events()
    gap = 30 * 60 * 1_000_000

    def read():
        return rd.read_parquet(path, columns=["user_id", "ts"])

    session_counts(read(), gap_us=gap).materialize()  # warm
    t0 = time.perf_counter()
    out = session_counts(read(), gap_us=gap).materialize()
    sort_sec = time.perf_counter() - t0
    n_users = out.count()
    log(f"sessions1m sort-plan: {sort_sec:.1f}s over {N_EVENTS} events / {n_users} users")
    res = {
        "events": N_EVENTS,
        "users": int(n_users),
        "sort_plan_sec": round(sort_sec, 1),
        "events_per_sec": round(N_EVENTS / sort_sec),
    }
    if compare:
        def per_key(g: pd.DataFrame) -> pd.DataFrame:  # the replaced r2 plan
            ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
            n = 0 if ts.size == 0 else 1 + int((np.diff(ts) > gap).sum())
            return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "n_sessions": [np.int64(n)]})

        t0 = time.perf_counter()
        old = read().groupby("user_id").map_groups(per_key, batch_format="pandas").materialize()
        mg_sec = time.perf_counter() - t0
        assert old.count() == n_users
        log(f"sessions1m map_groups: {mg_sec:.1f}s ({mg_sec/sort_sec:.1f}x slower)")
        res["map_groups_sec"] = round(mg_sec, 1)
        res["speedup"] = round(mg_sec / sort_sec, 1)
    return res


def stress_asof() -> dict:
    import ray.data as rd

    from ddsketch_ray.functions.joins import asof_join_broadcast
    from ddsketch_ray.hashing import splitmix64

    K, PER_KEY, N_BIG = 50_000, 4, 2_000_000
    dim = pa.table(
        {
            "k": pa.array(np.repeat(np.arange(K, dtype=np.int64), PER_KEY)),
            "ts": pa.array(
                np.tile((np.arange(PER_KEY, dtype=np.int64) * 3_600_000_000), K).view(
                    "datetime64[us]"
                ),
                type=pa.timestamp("us"),
            ),
            "v": pa.array(np.arange(K * PER_KEY, dtype=np.float64)),
        }
    )

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.uint64)
        return pa.table(
            {
                "k": pa.array((splitmix64(ids) % np.uint64(K + 1000)).astype(np.int64)),
                "ts": pa.array(
                    (splitmix64(ids ^ np.uint64(7)) % np.uint64(PER_KEY * 3_600_000_000))
                    .astype(np.int64)
                    .view("datetime64[us]"),
                    type=pa.timestamp("us"),
                ),
            }
        )

    big = rd.range(N_BIG, override_num_blocks=CPUS * 2).map_batches(
        lambda b: gen(b), batch_format="pyarrow", batch_size=None
    ).materialize()
    asof_join_broadcast(big, dim, "k", "ts", ["v"]).materialize()  # warm
    t0 = time.perf_counter()
    out = asof_join_broadcast(big, dim, "k", "ts", ["v"]).materialize()
    dt = time.perf_counter() - t0
    log(f"asof 50k-key dim x 2M rows: {dt:.1f}s, {out.count()} matches")
    return {
        "dim_keys": K,
        "dim_rows": K * PER_KEY,
        "big_rows": N_BIG,
        "sec": round(dt, 2),
        "rows_per_sec": round(N_BIG / dt),
        "matches": int(out.count()),
    }


FUNNEL_DIR = "/tmp/ddsr_stress_funnel5m"


def ensure_funnel_events() -> str:
    """5M deterministic events over 1M users with an event_type column
    (view 40% / click 25% / purchase 10% / noise 25%)."""
    marker = os.path.join(FUNNEL_DIR, ".complete")
    if os.path.exists(marker):
        return FUNNEL_DIR
    import ray.data as rd

    from ddsketch_ray.hashing import splitmix64

    shutil.rmtree(FUNNEL_DIR, ignore_errors=True)
    os.makedirs(FUNNEL_DIR)
    types = np.array(["view", "click", "purchase", "noise"], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.uint64)
        uid = (splitmix64(ids) % np.uint64(N_USERS)).astype(np.int64)
        ts = (splitmix64(ids ^ np.uint64(0x517C)) % np.uint64(30 * 86400 * 1_000_000)).astype(
            np.int64
        )
        r = (splitmix64(ids ^ np.uint64(0xF0F0)) % np.uint64(100)).astype(np.int64)
        tid = np.select([r < 40, r < 65, r < 75], [0, 1, 2], default=3)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "ts": pa.array(ts.view("datetime64[us]"), type=pa.timestamp("us")),
                "event_type": pa.array(types[tid].tolist(), pa.string()),
            }
        )

    rd.range(N_EVENTS, override_num_blocks=CPUS * 4).map_batches(
        lambda b: gen(b), batch_format="pyarrow", batch_size=None
    ).write_parquet(FUNNEL_DIR, min_rows_per_file=N_EVENTS // 32)
    open(marker, "w").write("ok")
    return FUNNEL_DIR


def stress_funnel5m() -> dict:
    import ray.data as rd

    from ddsketch_ray.functions.windows import funnel_counts

    path = ensure_funnel_events()
    best = None
    out = None
    for _ in range(2):
        t0 = time.perf_counter()
        ds = rd.read_parquet(path, columns=["user_id", "ts", "event_type"])
        out = funnel_counts(ds, "user_id", "ts", "event_type", ["view", "click", "purchase"])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        log(f"funnel5m: {dt:.2f}s ({N_EVENTS/dt:,.0f} events/s)")
    return {
        "wall_s_best": round(best, 2),
        "events_per_s": round(N_EVENTS / best),
        "n_keys": out.column("n_keys").to_pylist(),
    }


def stress_pkq5m() -> dict:
    """Exact per-key median at 1M keys / 5M rows
    (functions/analytics.py:grouped_quantile_exact — the sort plan the
    sketch-per-group path cannot reach at this key cardinality)."""
    import ray.data as rd

    from ddsketch_ray.functions.analytics import grouped_quantile_exact
    from ddsketch_ray.hashing import splitmix64

    path = ensure_funnel_events()  # 5M rows / 1M users; derive a value col

    def add_value(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        v = (splitmix64(ts.astype(np.uint64)) % np.uint64(1_000_000)).astype(
            np.float64
        ) / 100.0
        return pa.table({"user_id": t.column("user_id"), "value": pa.array(v)})

    best = None
    n_keys = 0
    for _ in range(2):
        t0 = time.perf_counter()
        ds = rd.read_parquet(path, columns=["user_id", "ts"]).map_batches(
            add_value, batch_format="pyarrow", batch_size=None
        )
        out = grouped_quantile_exact(ds, "user_id", "value", 0.5, alias="median")
        n_keys = out.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        log(f"pkq5m: {dt:.2f}s ({N_EVENTS/dt:,.0f} rows/s, {n_keys} keys)")
    return {"wall_s_best": round(best, 2), "rows_per_s": round(N_EVENTS / best), "n_keys": int(n_keys)}


def stress_pack5m() -> dict:
    """Sequence packing at 5M docs (functions/pack.py): one sort +
    in-block cumsum + O(blocks) driver offsets; validates total rows."""
    import ray.data as rd

    from ddsketch_ray.functions.pack import pack_sequences
    from ddsketch_ray.hashing import splitmix64

    N = 5_000_000

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        n = (splitmix64(ids.astype(np.uint64)) % np.uint64(2000)).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)), "n_tokens": pa.array(n)}
        )

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        ds = rd.range(N, override_num_blocks=4 * CPUS).map_batches(
            gen, batch_format="pyarrow", batch_size=None
        )
        out = pack_sequences(ds, "doc_id", "n_tokens", seq_len=2048)
        total = out.count()
        dt = time.perf_counter() - t0
        assert total == N, total
        best = dt if best is None else min(best, dt)
        log(f"pack5m: {dt:.2f}s ({N/dt:,.0f} docs/s)")
    return {"wall_s_best": round(best, 2), "docs_per_s": round(N / best)}


def stress_mixture5m() -> dict:
    """Target-mixture resample at 5M docs / 5 skewed groups
    (functions/sampling.py): counting rollup + pure hash filter."""
    import ray.data as rd

    from ddsketch_ray.functions.sampling import resample_to_mixture
    from ddsketch_ray.hashing import splitmix64

    N = 5_000_000
    LABELS = np.array(["en", "de", "fr", "es", "zh"])
    CUTS = np.array([60, 80, 90, 97, 100])

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        b = (splitmix64((ids + 17).astype(np.uint64)) % np.uint64(100)).astype(np.int64)
        g = LABELS[np.searchsorted(CUTS, b, side="right")]
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)), "lang": pa.array(g)}
        )

    best = None
    kept = 0
    for _ in range(2):
        t0 = time.perf_counter()
        ds = rd.range(N, override_num_blocks=4 * CPUS).map_batches(
            gen, batch_format="pyarrow", batch_size=None
        )
        kept = resample_to_mixture(
            ds, "doc_id", "lang", [("en", 2), ("de", 1), ("fr", 1)]
        ).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        log(f"mixture5m: {dt:.2f}s ({N/dt:,.0f} docs/s, kept {kept})")
    return {"wall_s_best": round(best, 2), "docs_per_s": round(N / best), "n_kept": int(kept)}


def stress_semi5m() -> dict:
    """Big-big anti join at 5M probe rows × 2M distinct right keys
    (functions/joins.py::semi_join_shuffle)."""
    import ray.data as rd

    from ddsketch_ray.functions.joins import semi_join_shuffle
    from ddsketch_ray.hashing import splitmix64

    N, M = 5_000_000, 2_000_000

    def gen_left(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        k = (splitmix64(ids.astype(np.uint64)) % np.uint64(3_000_000)).astype(np.int64)
        return pa.table({"k": pa.array(k), "v": pa.array(ids.astype(np.int64))})

    def gen_right(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        return pa.table({"rk": pa.array(ids.astype(np.int64))})

    best = None
    kept = 0
    for _ in range(2):
        t0 = time.perf_counter()
        left = rd.range(N, override_num_blocks=4 * CPUS).map_batches(
            gen_left, batch_format="pyarrow", batch_size=None
        )
        right = rd.range(M, override_num_blocks=4 * CPUS).map_batches(
            gen_right, batch_format="pyarrow", batch_size=None
        )
        kept = semi_join_shuffle(
            left, right, "k", "rk", ["v"], anti=True, num_buckets=4 * CPUS
        ).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        log(f"semi5m: {dt:.2f}s ({N/dt:,.0f} probe rows/s, kept {kept})")
    return {"wall_s_best": round(best, 2), "rows_per_s": round(N / best), "n_kept": int(kept)}


def stress_rank5m() -> dict:
    """Global ROW_NUMBER at 5M rows with heavy duplicate values
    (functions/pack.py::global_rank)."""
    import ray.data as rd

    from ddsketch_ray.functions.pack import global_rank
    from ddsketch_ray.hashing import splitmix64

    N = 5_000_000

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        v = (splitmix64(ids.astype(np.uint64)) % np.uint64(1000)).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)), "score": pa.array(v)})

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        ds = rd.range(N, override_num_blocks=4 * CPUS).map_batches(
            gen, batch_format="pyarrow", batch_size=None
        )
        total = global_rank(ds, "score", "doc_id", descending=True).count()
        dt = time.perf_counter() - t0
        assert total == N, total
        best = dt if best is None else min(best, dt)
        log(f"rank5m: {dt:.2f}s ({N/dt:,.0f} rows/s)")
    return {"wall_s_best": round(best, 2), "rows_per_s": round(N / best)}


def stress_bjoin5m() -> dict:
    """Pre-bucketed co-located join vs shuffle join, 5M×1M rows: the
    amortize-the-shuffle-once story with numbers."""
    import ray.data as rd

    from ddsketch_ray.functions.joins import equi_join_shuffle
    from ddsketch_ray.hashing import splitmix64
    from ddsketch_ray.sources.sinks import join_bucketed, write_bucketed

    N, M = 5_000_000, 1_000_000
    ldir, rdir = "/tmp/ddsr_bjoin_l", "/tmp/ddsr_bjoin_r"

    def gen_left(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        k = (splitmix64(ids.astype(np.uint64)) % np.uint64(M)).astype(np.int64)
        return pa.table({"k": pa.array(k), "v": pa.array(ids.astype(np.int64))})

    def gen_right(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        return pa.table({"k": pa.array(ids.astype(np.int64)),
                         "w": pa.array((ids % 97).astype(np.int64))})

    left = rd.range(N, override_num_blocks=4 * CPUS).map_batches(
        gen_left, batch_format="pyarrow", batch_size=None)
    right = rd.range(M, override_num_blocks=4 * CPUS).map_batches(
        gen_right, batch_format="pyarrow", batch_size=None)

    t0 = time.perf_counter()
    shutil.rmtree(ldir, ignore_errors=True); shutil.rmtree(rdir, ignore_errors=True)
    write_bucketed(left, ldir, "k", num_buckets=4 * CPUS)
    write_bucketed(right, rdir, "k", num_buckets=4 * CPUS)
    t_write = time.perf_counter() - t0

    best_b = None
    n_b = 0
    for _ in range(2):
        t0 = time.perf_counter()
        n_b = join_bucketed(ldir, rdir, "k", ["v"], ["w"], 4 * CPUS).count()
        dt = time.perf_counter() - t0
        best_b = dt if best_b is None else min(best_b, dt)
        log(f"bjoin5m bucketed: {dt:.2f}s ({N/dt:,.0f} rows/s)")

    best_s = None
    for _ in range(2):
        t0 = time.perf_counter()
        # equi_join_shuffle wants distinct key column names; re-tag right
        right2 = right.map_batches(
            lambda t: pa.table({"rk": t.column("k"), "w": t.column("w")}),
            batch_format="pyarrow", batch_size=None)
        n_s = equi_join_shuffle(left, right2, "k", "rk", ["v"], ["w"],
                                num_buckets=4 * CPUS).count()
        dt = time.perf_counter() - t0
        assert n_s == n_b, (n_s, n_b)
        best_s = dt if best_s is None else min(best_s, dt)
        log(f"bjoin5m shuffle: {dt:.2f}s ({N/dt:,.0f} rows/s)")
    return {
        "write_s": round(t_write, 2),
        "bucketed_join_s_best": round(best_b, 2),
        "shuffle_join_s_best": round(best_s, 2),
        "speedup": round(best_s / best_b, 2),
        "n_joined": int(n_b),
    }


def stress_dsir600k() -> dict:
    """DSIR importance weighting over the 600k-page disk corpus
    (target = lang == 'de' pages): two count rollups + scoring join."""
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    from ddsketch_ray.functions.selection import unigram_importance

    path = bench.ensure_corpus(600_000)
    best = None
    n = 0
    for _ in range(2):
        t0 = time.perf_counter()
        from ddsketch_ray.hashing import hash_strings

        raw = rd.read_parquet(path, columns=["url", "text"]).map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.array(
                        hash_strings(t.column("url")).view(np.int64)
                    ),
                    "text": t.column("text"),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        target = rd.read_parquet(path, columns=["lang", "text"]).map_batches(
            lambda t: pa.table(
                {"text": t.filter(pa.compute.equal(t.column("lang"), "de")).column("text")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        n = unigram_importance(raw, target).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        log(f"dsir600k: {dt:.2f}s ({600_000/dt:,.0f} docs/s)")
    return {"wall_s_best": round(best, 2), "docs_per_s": round(600_000 / best), "n": int(n)}


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=CPUS,
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={"env_vars": {"POLARS_MAX_THREADS": "1"}},
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ddsketch_ray import tune_for_sketch_pipelines

    tune_for_sketch_pipelines()

    which = [a for a in sys.argv[1:] if not a.startswith("--") and not a.isdigit()]
    compare = "--compare-mapgroups" in sys.argv
    results = {}
    if not which or "dedup1m" in which:
        results["dedup1m"] = stress_dedup1m()
    if not which or "sessions1m" in which:
        results["sessions1m"] = stress_sessions1m(compare)
    if not which or "asof" in which:
        results["asof_highcard"] = stress_asof()
    if "funnel5m" in which:
        results["funnel5m"] = stress_funnel5m()
    if "pkq5m" in which:
        results["pkq5m"] = stress_pkq5m()
    if "pack5m" in which:
        results["pack5m"] = stress_pack5m()
    if "mixture5m" in which:
        results["mixture5m"] = stress_mixture5m()
    if "semi5m" in which:
        results["semi5m"] = stress_semi5m()
    if "rank5m" in which:
        results["rank5m"] = stress_rank5m()
    if "bjoin5m" in which:
        results["bjoin5m"] = stress_bjoin5m()
    if "dsir600k" in which:
        results["dsir600k"] = stress_dsir600k()
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
