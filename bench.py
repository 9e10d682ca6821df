"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "webpages_docs_per_sec": ...}

``--scaling``: runs the same bench in two fresh processes at
two CPU counts (default 4 and 16; GRAFT_SCALE_LO/HI — the sandbox stand-in for N → 4N nodes) and
reports both throughputs plus scaling efficiency.

All progress goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WEBPAGES_N = int(os.environ.get("GRAFT_WEBPAGES_N", "300000"))
READ_N = int(os.environ.get("GRAFT_READ_N", "600000"))  # corpus cached on disk


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_webpages(n: int) -> dict:
    """North-star workload: deterministic page generation → extraction →
    multi-sketch aggregate (quantiles over text/html lengths, HLL urls,
    CMS langs). Returns {sec, docs_per_sec, report}."""
    from ddsketch_ray.pipelines import webpages_sketch_report
    from ddsketch_ray.synth import generate_page_features

    t0 = time.perf_counter()
    ds = generate_page_features(n, seed=42, override_num_blocks=max(NUM_CPUS * 4, 16))
    report = webpages_sketch_report(ds)
    dt = time.perf_counter() - t0
    assert report["rows"] == n
    return {"sec": dt, "docs_per_sec": n / dt, "report": report}


_CORPUS_DIR = os.environ.get("GRAFT_CORPUS_DIR", "/tmp/ddsr_bench_corpus")


def ensure_corpus(n: int) -> str:
    """Write the deterministic page corpus once; reused across bench runs
    and scaling legs (generation is ingest simulation, not the engine)."""
    marker = os.path.join(_CORPUS_DIR, f".complete-{n}")
    if os.path.exists(marker):
        return _CORPUS_DIR
    import shutil

    from ddsketch_ray.synth import generate_webpages

    shutil.rmtree(_CORPUS_DIR, ignore_errors=True)
    ds = generate_webpages(n, seed=42, override_num_blocks=max(NUM_CPUS * 2, 16))
    ds.write_parquet(_CORPUS_DIR, min_rows_per_file=max(n // 32, 1000))
    with open(marker, "w") as f:
        f.write("ok")
    return _CORPUS_DIR


def bench_read_webpages(n: int) -> dict:
    """Production-shaped headline: read parquet (pruned to `text`) →
    text-length derive → 6-sketch aggregate. No generation in the timed
    path; column pruning keeps html bytes on disk."""
    import pyarrow.compute as pc
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import DDSketchAgg, HLLAgg, HeavyHittersAgg

    path = ensure_corpus(n)
    t0 = time.perf_counter()
    ds = rd.read_parquet(path, columns=["url", "lang", "text"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "lang": b.column("lang"),
                "text_len": pc.cast(pc.binary_length(b.column("text")), pa.int64()),
            }
        )

    res = ds.map_batches(derive, batch_format="pyarrow", batch_size=None).aggregate(
        DDSketchAgg(on="text_len", qs=[0.5, 0.95, 0.99], alias_name="q"),
        HLLAgg(on="url", alias_name="u"),
        HeavyHittersAgg(on="lang", alias_name="l"),
    )
    dt = time.perf_counter() - t0
    return {"sec": dt, "docs_per_sec": n / dt}


def bench_lineitem_sketches() -> float:
    from ddsketch_ray.agg import DDSketchAgg, HLLAgg, KLLAgg, TDigestAgg
    import ray.data as rd

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice", "l_orderkey"])
    ds.aggregate(
        DDSketchAgg(on="l_extendedprice", qs=[0.5, 0.95, 0.99], alias_name="dds"),
        TDigestAgg(on="l_extendedprice", qs=[0.5], alias_name="td"),
        KLLAgg(on="l_extendedprice", qs=[0.5], alias_name="kll"),
        HLLAgg(on="l_orderkey", alias_name="hll"),
    )
    return time.perf_counter() - t0


def bench_grouped_quantiles() -> float:
    from ddsketch_ray.pipelines import quantiles_by_group
    import ray.data as rd

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    quantiles_by_group(ds, "value", "event_type", qs=(0.5, 0.95, 0.99)).to_pandas()
    return time.perf_counter() - t0


def bench_minhash_dedup() -> float:
    from ddsketch_ray.functions.dedup import minhash_dedup
    import ray.data as rd

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    minhash_dedup(ds).materialize()  # consume the lazy assignment emit
    return time.perf_counter() - t0


def bench_pack() -> float:
    """Sequence packing over the sf documents table (prefix scan +
    manifest explode, functions/pack.py)."""
    import ray.data as rd

    from ddsketch_ray.functions.pack import pack_manifest
    from ddsketch_ray.functions.text import token_count_batch

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    toks = ds.map_batches(
        lambda b: token_count_batch(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    pack_manifest(toks, "doc_id", "n_tokens", seq_len=2048).count()
    return time.perf_counter() - t0


def bench_mixture() -> float:
    """Token-weighted mixture resample over the sf documents table
    (functions/sampling.py::resample_to_mixture)."""
    import ray.data as rd

    from ddsketch_ray.functions.sampling import resample_to_mixture
    from ddsketch_ray.functions.text import token_count_batch

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "text"])
    toks = ds.map_batches(
        lambda b: token_count_batch(b).select(["doc_id", "lang", "n_tokens"]),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    resample_to_mixture(
        toks, "doc_id", "lang", [("en", 2), ("de", 1), ("fr", 1)], weight_col="n_tokens"
    ).count()
    return time.perf_counter() - t0


def bench_ann() -> float:
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ddsketch_ray.functions.ann import brute_force_topk

    t0 = time.perf_counter()
    qt = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), 100))
    queries = {
        "ids": qt.column("vec_id").to_numpy(),
        "mat": np.stack([np.asarray(e, dtype=np.float64) for e in qt.column("embedding").to_pylist()]),
    }
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    brute_force_topk(ds, queries, k=10).to_pandas()
    return time.perf_counter() - t0


def bench_token_quality() -> float:
    from ddsketch_ray.functions.text import quality_features_batch
    import ray.data as rd

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ds.map_batches(
        lambda b: quality_features_batch(b).select(["doc_id", "n_tokens", "quality_score"]),
        batch_format="pyarrow", batch_size=None,
    ).materialize()
    return time.perf_counter() - t0


def bench_session_counts() -> float:
    """Sort-plan session windows (round 3): one distributed sort +
    vectorized per-block gap counts + driver edge stitching."""
    import ray.data as rd

    from ddsketch_ray.functions.windows import session_counts

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    session_counts(ds).materialize()
    return time.perf_counter() - t0


def bench_bigjoin() -> float:
    """Big-big shuffle equi-join (round 3): lineitem ⋈ orders via
    hash-bucket co-partition + per-bucket Arrow hash join, then a
    grouped rollup."""
    import ray.data as rd

    from ddsketch_ray.functions.analytics import small_key_rollup
    from ddsketch_ray.functions.joins import equi_join_shuffle

    t0 = time.perf_counter()
    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"])
    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    j = equi_join_shuffle(
        li, orders, "l_orderkey", "o_orderkey",
        ["l_extendedprice"], ["o_orderpriority"], num_buckets=128,
    )
    small_key_rollup(j, ["o_orderpriority"], count_alias="n")
    return time.perf_counter() - t0


def bench_vocab() -> float:
    """Corpus vocabulary/IDF table (round 3): per-block polars token
    pre-agg → sort-plan rollup over tokens → top-k, over the 600k-page
    disk corpus (only the text column leaves storage)."""
    import ray.data as rd

    from ddsketch_ray.functions.text import vocab_stats

    path = ensure_corpus(READ_N)
    t0 = time.perf_counter()
    ds = rd.read_parquet(path, columns=["url", "text"])
    # url stands in for doc_id (unique per page)
    vocab_stats(ds, text_col="text", doc_id_col="url", top_k=100).to_pandas()
    return time.perf_counter() - t0


def bench_bm25() -> float:
    """BM25 keyword search (round 3): two zero-shuffle passes (df/avgdl
    stats + block-local score/top-k) over the 600k-page disk corpus."""
    import ray.data as rd

    from ddsketch_ray.functions.search import bm25_search

    path = ensure_corpus(READ_N)
    t0 = time.perf_counter()
    ds = rd.read_parquet(path, columns=["url", "text"])
    bm25_search(
        ds,
        {"q1": "baba loroh", "q2": "vekep hucu sisig", "q3": "falan podo"},
        text_col="text",
        doc_id_col="url",
        k=10,
    )
    return time.perf_counter() - t0



_TIX_DIR = os.environ.get("GRAFT_TIX_DIR", "/tmp/ddsr_bench_tix")


def ensure_text_index(n: int) -> str:
    """Persisted inverted index over the bench webpage corpus — built
    once per corpus (like ensure_corpus/ensure_embeddings), reused by
    every bm25_index_serve timing."""
    import ray.data as rd

    from ddsketch_ray.functions.search_index import write_text_index

    meta_p = os.path.join(_TIX_DIR, "_text_index_meta.json")
    stamp = os.path.join(_TIX_DIR, "_bench_stamp.json")
    if os.path.exists(meta_p) and os.path.exists(stamp):
        with open(stamp) as f:
            if json.load(f).get("n") == n:
                return _TIX_DIR
    import shutil

    shutil.rmtree(_TIX_DIR, ignore_errors=True)
    path = ensure_corpus(n)
    ds = rd.read_parquet(path, columns=["url", "text"])
    write_text_index(ds, _TIX_DIR, text_col="text", doc_id_col="url", num_buckets=64)
    with open(stamp, "w") as f:
        json.dump({"n": n}, f)
    return _TIX_DIR


def bench_bm25_index_serve() -> float:
    """Serving 10 query batches from the persisted inverted index
    (round 5): per-term equality-pruned reads through the byte-gated
    driver plan — the amortized counterpart of bm25_600k_pages (which
    re-tokenizes the corpus per call)."""
    from ddsketch_ray.functions.search_index import search_text_index

    root = ensure_text_index(READ_N)
    batches = [
        {"a": f"baba loroh q{i}", "b": f"vekep hucu sisig q{i}", "c": "falan podo"}
        for i in range(10)
    ]
    t0 = time.perf_counter()
    for q in batches:
        search_text_index(root, q, k=10)
    return time.perf_counter() - t0


_EMB_DIR = os.environ.get("GRAFT_EMB_DIR", "/tmp/ddsr_bench_emb1m")


def ensure_embeddings(n: int = 1_000_000, d: int = 64, shards: int = 16) -> str:
    """Deterministic 1M x 64 float32 embedding corpus, written once."""
    marker = os.path.join(_EMB_DIR, f".complete-{n}")
    if os.path.exists(marker):
        return _EMB_DIR
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ddsketch_ray.hashing import splitmix64

    shutil.rmtree(_EMB_DIR, ignore_errors=True)
    os.makedirs(_EMB_DIR, exist_ok=True)
    per = n // shards
    for s in range(shards):
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        base = (ids[:, None].astype(np.uint64) * np.uint64(d)) + np.arange(
            d, dtype=np.uint64
        )[None, :]
        h = splitmix64(base.ravel())
        vecs = (
            ((h >> np.uint64(11)).astype(np.float64) / float(1 << 53))
            .astype(np.float32)
            .reshape(per, d)
        )
        vecs = vecs + (ids % 8).astype(np.float32)[:, None] * 2.0  # 8 blobs
        t = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), pa.float32()), d
                ).cast(pa.list_(pa.float32())),
            }
        )
        pq.write_table(t, os.path.join(_EMB_DIR, f"part-{s:03d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return _EMB_DIR


def bench_kmeans() -> float:
    """Deterministic distributed k-means (round 3): k=16, 5 Lloyd
    iterations over 1M x 64 embeddings — broadcast centroids +
    fixed-point integer partials each pass."""
    import ray.data as rd

    from ddsketch_ray.functions.cluster import kmeans_fit

    path = ensure_embeddings()
    t0 = time.perf_counter()
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    kmeans_fit(ds, k=16, iters=5, seed=0)
    return time.perf_counter() - t0


def bench_dyadic_cm() -> float:
    """Dyadic-range count-min build over events.value cents + the range /
    rank / quantile query battery (sketches/dyadic.py)."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import DyadicCMAgg, sketch_from_result

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"])

    def derive(t: pa.Table) -> pa.Table:
        import numpy as np

        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"cents": np.rint(v * 100.0).astype(np.int64)})

    res = ds.map_batches(derive, batch_format="pyarrow", batch_size=None).aggregate(
        DyadicCMAgg(on="cents", levels=16, width=1024, depth=5, alias_name="d")
    )
    sk = sketch_from_result(res["d"])
    for lo, hi in [(0, 999), (1000, 9999), (123, 45678)]:
        sk.range_count(lo, hi)
    for q in (0.5, 0.95, 0.99):
        sk.quantile_value(q)
    return time.perf_counter() - t0


def bench_cube() -> float:
    """Sketch-cube lifecycle (functions/cube.py): partial-plan build of
    the (event_type × day) HLL cube, then the dashboard battery —
    per-type slices + rolling 7-day windows — from cell merges."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ddsketch_ray.functions.cube import (
        grouped_cube_merge,
        hll_cell,
        rolling_cube_merge,
        write_sketch_cube_partials,
    )

    t0 = time.perf_counter()
    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "event_type", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": pc.strftime(t.column("ts"), format="%Y-%m-%d"),
                "user_id": t.column("user_id"),
            }
        )

    keyed = ds.map_batches(derive, batch_format="pyarrow", batch_size=None)
    out = "/tmp/bench_cube_hll"
    write_sketch_cube_partials(keyed, ["event_type", "day"], *hll_cell("user_id"), out_dir=out)
    grouped_cube_merge(out, ["event_type"])
    rolling_cube_merge(out, "day", window=7)
    return time.perf_counter() - t0


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # polars ignores Ray's CPU accounting and spins an
            # os.cpu_count() thread pool PER WORKER (measured: 32 threads
            # in a num_cpus=4 session) — the parallelism is Ray's tasks,
            # one core per task, exactly like a real multi-node cluster
            runtime_env={"env_vars": {"POLARS_MAX_THREADS": "1"}},
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from ddsketch_ray import tune_for_sketch_pipelines

    tune_for_sketch_pipelines()  # single source of the executor settings

    # Page-cache warmup for the inputs (untimed).
    import pyarrow.parquet as pq

    for t in ("lineitem", "events", "documents", "embeddings", "orders"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # Every pipeline runs twice: the first (untimed) pass pays Ray's
    # one-time per-session costs — on-demand worker spawn and library
    # imports in each of num_cpus worker processes (~25 s at 32 workers,
    # measured) — which a production run amortizes over hours. The second
    # pass is the steady-state measurement.
    # Force-start the whole worker pool and its imports (one-time session
    # cost a production run amortizes; without this the first pipelines
    # measure process spawn, not the engine).
    @ray.remote
    def _warm():
        import ddsketch_ray.agg, ddsketch_ray.synth, ddsketch_ray.pipelines  # noqa
        import ddsketch_ray.functions.dedup, ddsketch_ray.functions.ann  # noqa
        import polars, pandas  # noqa
        time.sleep(0.5)  # hold the slot so every worker actually spawns
        return 1

    ray.get([_warm.remote() for _ in range(NUM_CPUS * 2)])

    # Best-of-N timing: the sandbox hypervisor steals 10-25% CPU in
    # bursts, so a single sample is noise-dominated.
    queries: dict[str, float] = {}
    bench_webpages(WEBPAGES_N // 4)  # pipeline warm pass
    web = min((bench_webpages(WEBPAGES_N) for _ in range(3)), key=lambda r: r["sec"])
    queries["webpages_sketch_suite"] = round(web["sec"], 3)
    log(f"webpages: {web['sec']:.2f}s ({web['docs_per_sec']:.0f} docs/s)")
    bench_read_webpages(READ_N)  # warm (also builds the corpus once)
    # best-of-4: this path is IO/steal-noise dominated (observed 2.8-5.4 s
    # for identical work back-to-back); more samples = honest best case
    readw = min((bench_read_webpages(READ_N) for _ in range(4)), key=lambda r: r["sec"])
    queries["read_webpages_sketch"] = round(readw["sec"], 3)
    log(f"read_webpages: {readw['sec']:.2f}s ({readw['docs_per_sec']:.0f} docs/s)")
    for name, fn in [
        ("lineitem_sketches", bench_lineitem_sketches),
        ("grouped_quantiles_events", bench_grouped_quantiles),
        ("minhash_dedup_documents", bench_minhash_dedup),
        ("ann_topk_embeddings", bench_ann),
        ("token_quality_documents", bench_token_quality),
        ("session_counts_events", bench_session_counts),
        ("bigjoin_lineitem_orders", bench_bigjoin),
        ("vocab_600k_pages", bench_vocab),
        ("bm25_600k_pages", bench_bm25),
        ("bm25_index_serve_10x", bench_bm25_index_serve),
        ("kmeans_1m_embeddings", bench_kmeans),
        ("pack_documents", bench_pack),
        ("mixture_documents", bench_mixture),
        ("dyadic_cm_events", bench_dyadic_cm),
        ("cube_hll_events", bench_cube),
    ]:
        fn()  # warm pass
        queries[name] = round(min(fn() for _ in range(2)), 3)
        log(f"{name}: {queries[name]:.2f}s")

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "webpages_docs_per_sec": round(web["docs_per_sec"], 1),
        "read_webpages_docs_per_sec": round(readw["docs_per_sec"], 1),
        "webpages_n": WEBPAGES_N,
        "read_n": READ_N,
    }
    ray.shutdown()
    return result


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _wait_quiet(threshold: float = 4.0, max_wait_s: float = 90.0) -> float:
    """Steal-window gate (CLAUDE.md: the hypervisor steals 10-25 % CPU
    in bursts): don't start a timing leg while the box is visibly busy.
    Waits up to max_wait_s for 1-min loadavg <= threshold; returns the
    loadavg the leg actually started at (recorded in the output so a
    dirty window is visible, never silent)."""
    t0 = time.time()
    la = _loadavg()
    while la > threshold and time.time() - t0 < max_wait_s:
        log(f"loadavg {la:.1f} > {threshold}; waiting for a quiet window")
        time.sleep(10)
        la = _loadavg()
    return la


def _per_pipeline_eff(r_lo: dict, r_hi: dict, lo: int, hi: int) -> dict:
    """Per-pipeline lo/hi seconds + scaling efficiency — makes fixed-cost
    dilution visible (a small fixed-latency entry shows eff ≈ lo/hi and
    should not be read as an engine-stage regression)."""
    out = {}
    for name, sec_lo in r_lo["queries"].items():
        sec_hi = r_hi["queries"].get(name)
        if sec_hi:
            out[name] = {
                "sec_lo": sec_lo,
                "sec_hi": sec_hi,
                "efficiency": round((sec_lo / sec_hi) / (hi / lo), 3),
            }
    return out


def run_scaling() -> dict:
    import subprocess

    # Default pair 4 -> 16: both legs fit inside the VM's reliably
    # available capacity (the host hypervisor steals 10-25% CPU in bursts
    # and pure-multiprocessing scaling itself caps at 0.77 for 8 -> 32 on
    # this box — measured; see BASELINE.md). Override with
    # GRAFT_SCALE_LO/GRAFT_SCALE_HI to reproduce the 8 -> 32 pair.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # --scale-sf (r4 verdict item 6): WEAK scaling — each leg generates
    # page volume proportional to its CPU count (hi runs the full
    # GRAFT_WEBPAGES_N, lo runs N·lo/hi), so the sub-second fixed
    # per-execution costs (plan/scheduling, measured 0.10-0.20 s per
    # entry) are amortized identically on both legs instead of diluting
    # the small leg. This matches the cluster criterion's intent (N →
    # 4N NODES carry 4× the corpus); the classic fixed-size pair
    # remains the default.
    weak = "--scale-sf" in sys.argv or os.environ.get("GRAFT_SCALE_WEAK") == "1"

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        if weak:
            env["GRAFT_WEBPAGES_N"] = str(WEBPAGES_N * ncpu // hi)
        start_load = _wait_quiet()
        log(f"--- scaling run at num_cpus={ncpu} (loadavg {start_load:.1f}) ---")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        sys.stderr.write(out.stderr[-2000:])
        parsed = json.loads(out.stdout.strip().splitlines()[-1])
        parsed["start_loadavg"] = round(start_load, 2)
        return parsed

    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    dps_lo, dps_hi = r_lo["webpages_docs_per_sec"], r_hi["webpages_docs_per_sec"]
    rd_lo, rd_hi = r_lo["read_webpages_docs_per_sec"], r_hi["read_webpages_docs_per_sec"]
    # efficiency on the north-star metric (sketch-build docs/sec,
    # BASELINE.json): throughput ratio normalized by the CPU ratio
    eff = (dps_hi / dps_lo) / (hi / lo)
    eff_read = (rd_hi / rd_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "docs_per_sec_lo": dps_lo,
        "docs_per_sec_hi": dps_hi,
        "read_docs_per_sec_lo": rd_lo,
        "read_docs_per_sec_hi": rd_hi,
        "read_scaling_efficiency": round(eff_read, 3),
        "total_sec_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
        "per_pipeline": _per_pipeline_eff(r_lo, r_hi, lo, hi),
        "start_loadavg": {"lo": r_lo["start_loadavg"], "hi": r_hi["start_loadavg"]},
        "scale_mode": "weak" if weak else "strong",
        "webpages_n": {"lo": r_lo["webpages_n"], "hi": r_hi["webpages_n"]},
        "sf": SF_DIR,
    }


def run_scaling_both() -> dict:
    """Both scaling pairs from four shared legs (4, 8, 16, 32 CPUs):
    4→16 is the criterion pair (both legs inside the VM's reliably
    available capacity); 8→32 is reported against the measured 0.77
    pure-multiprocessing host ceiling (BASELINE.md)."""
    import subprocess

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        start_load = _wait_quiet()
        log(f"--- scaling leg num_cpus={ncpu} (loadavg {start_load:.1f}) ---")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        sys.stderr.write(out.stderr[-1500:])
        parsed = json.loads(out.stdout.strip().splitlines()[-1])
        parsed["start_loadavg"] = round(start_load, 2)
        return parsed

    legs = {n: run(n) for n in (4, 8, 16, 32)}

    def pair(lo: int, hi: int) -> dict:
        dps_lo = legs[lo]["webpages_docs_per_sec"]
        dps_hi = legs[hi]["webpages_docs_per_sec"]
        return {
            "num_cpus_lo": lo,
            "num_cpus_hi": hi,
            "docs_per_sec_lo": dps_lo,
            "docs_per_sec_hi": dps_hi,
            "efficiency": round((dps_hi / dps_lo) / (hi / lo), 3),
            "read_efficiency": round(
                (legs[hi]["read_webpages_docs_per_sec"] / legs[lo]["read_webpages_docs_per_sec"])
                / (hi / lo),
                3,
            ),
        }

    p_crit, p_wide = pair(4, 16), pair(8, 32)
    return {
        "metric": "scaling_efficiency",
        "value": p_crit["efficiency"],  # criterion pair
        "unit": "ratio",
        "pairs": {"4_to_16": p_crit, "8_to_32": p_wide},
        "per_pipeline": {
            "4_to_16": _per_pipeline_eff(legs[4], legs[16], 4, 16),
            "8_to_32": _per_pipeline_eff(legs[8], legs[32], 8, 32),
        },
        "legs_total_sec": {str(n): legs[n]["value"] for n in legs},
        "start_loadavg": {str(n): legs[n]["start_loadavg"] for n in legs},
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling-both" in sys.argv:
        print(json.dumps(run_scaling_both()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
