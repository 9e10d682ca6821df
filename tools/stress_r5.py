"""Round-5 scale stress: the persisted-edge-layout shuffle plans.

Legs (run all, or name a subset: ``python tools/stress_r5.py pagerank5m``):

- ``pagerank5m_shuffle`` — 5M nodes / ~8.6M hash-link edges, FORCED
  shuffle plan, 5 iterations, BIT-EQUAL to a sequential numpy
  fixed-point reference.  The r4 join-per-iteration plan measured
  294.1 s here (BASELINE.md); the r5 edge-layout plan
  (functions/edgelayout.py) is the fix the r4 verdict named.
- ``pagerank20m`` / ``anf20m`` / ``labelprop20m`` — 20M nodes, ABOVE
  the 16M broadcast gate, so ``mode=auto`` exercises the shuffle plan
  in exactly the regime it exists for (the r4 verdict's missing stress
  row).  PageRank is checked bit-equal to the sequential integer
  reference; ANF / label propagation are checked bit-equal against the
  FORCED broadcast plan (itself reference-validated by
  tests/test_anf.py / test_label_propagation.py), plus driver RSS is
  recorded to show the shuffle plan held nothing O(n).

Usage: ``python tools/stress_r5.py [--cpus N] [leg ...]`` from
/root/repo (Ray workers must import ddsketch_ray).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = 32
for i, a in enumerate(sys.argv):
    if a == "--cpus":
        CPUS = int(sys.argv[i + 1])


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=CPUS, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
            runtime_env={"env_vars": {"POLARS_MAX_THREADS": "1"}},
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ddsketch_ray import tune_for_sketch_pipelines

    tune_for_sketch_pipelines()


def _ids_nodes_edges(n: int):
    import ray.data as rd

    from ddsketch_ray.functions.graph import hash_link_edges

    ids = rd.range(n, override_num_blocks=128).map_batches(
        lambda t: pa.table({"doc_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    nodes = ids.map_batches(
        lambda t: pa.table({"node": t.column("doc_id")}),
        batch_format="pyarrow",
        batch_size=None,
    )
    return nodes, hash_link_edges(ids, n)


def _seq_pagerank(n: int, iters: int) -> np.ndarray:
    """Sequential numpy replay of the identical integer recurrence over
    the hash-link graph (deg = 0 if id%7==0 else 1 + id%3)."""
    from ddsketch_ray.hashing import hash_ints

    v = np.arange(n, dtype=np.int64)
    deg = np.where(v % 7 == 0, 0, 1 + v % 3).astype(np.int64)
    srcs, dsts = [], []
    for j in (1, 2, 3):
        m = deg >= j
        srcs.append(v[m])
        dsts.append((hash_ints(v[m], seed=7777 + j) % np.uint64(n)).astype(np.int64))
    es, ed = np.concatenate(srcs), np.concatenate(dsts)
    r0 = min(1 << 26, (1 << 55) // n)
    base = (15 * r0) // 100
    r = np.full(n, r0, dtype=np.int64)
    dangling = deg == 0
    for _ in range(iters):
        dshare = int(r[dangling].sum()) // n
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, ed, r[es] // deg[es])
        r = base + (85 * (s + dshare)) // 100
    return r


def stress_pagerank5m_shuffle() -> dict:
    """5M nodes, FORCED shuffle plan (the >16M-node path) — the direct
    before/after of the r5 edge-layout rewrite (r4: 294.1 s)."""
    ray_init()
    from ddsketch_ray.functions.graph import pagerank

    n = 5_000_000
    nodes, edges = _ids_nodes_edges(n)
    t0 = time.perf_counter()
    out = pagerank(
        edges, nodes, iters=5, num_buckets=4 * CPUS, mode="shuffle"
    ).materialize()
    wall = time.perf_counter() - t0
    got = out.to_pandas().sort_values("node")
    assert np.array_equal(
        got["rank_fp"].to_numpy(), _seq_pagerank(n, 5)
    ), "distributed != sequential"
    log(
        f"pagerank5m_shuffle: {wall:.1f}s ({wall/5:.1f} s/iter incl. init+layout,"
        f" {n/wall:.0f} nodes/s, bit-equal to sequential reference;"
        " r4 join plan: 294.1s)"
    )
    return {
        "nodes": n, "iters": 5, "wall_s": round(wall, 1),
        "s_per_iter": round(wall / 5, 1), "nodes_per_sec": round(n / wall),
        "r4_wall_s": 294.1,
    }


def stress_pagerank20m() -> dict:
    """20M nodes (> the 16M broadcast gate, mode=auto -> shuffle),
    bit-equal to the sequential integer reference; driver RSS shows the
    shuffle plan held no O(n) state."""
    ray_init()
    from ddsketch_ray.functions.graph import pagerank

    n = 20_000_000
    nodes, edges = _ids_nodes_edges(n)
    rss0 = rss_gb()
    t0 = time.perf_counter()
    out = pagerank(edges, nodes, iters=5, num_buckets=4 * CPUS).materialize()
    wall = time.perf_counter() - t0
    rss1 = rss_gb()
    got = out.to_pandas().sort_values("node")
    assert np.array_equal(
        got["rank_fp"].to_numpy(), _seq_pagerank(n, 5)
    ), "distributed != sequential"
    log(
        f"pagerank20m (auto->shuffle): {wall:.1f}s ({wall/5:.1f} s/iter,"
        f" {n/wall:.0f} nodes/s, driver RSS {rss0:.2f}->{rss1:.2f} GB,"
        " bit-equal to sequential reference)"
    )
    return {
        "nodes": n, "iters": 5, "wall_s": round(wall, 1),
        "s_per_iter": round(wall / 5, 1), "nodes_per_sec": round(n / wall),
        "driver_rss_gb": round(rss1, 2),
    }


def stress_anf20m() -> dict:
    """HyperANF at 20M nodes, radius 2, p=4: auto->shuffle output
    bit-equal to the forced-broadcast plan (which tests pin to the
    sequential reference)."""
    ray_init()
    from ddsketch_ray.functions.anf import neighborhood_function

    n = 20_000_000
    nodes, edges = _ids_nodes_edges(n)
    t0 = time.perf_counter()
    sh = neighborhood_function(
        edges, nodes, radius=2, p=4, num_buckets=4 * CPUS
    ).materialize()
    wall_sh = time.perf_counter() - t0
    t0 = time.perf_counter()
    br = neighborhood_function(
        edges, nodes, radius=2, p=4, mode="broadcast",
        broadcast_node_limit=n,
    ).materialize()
    wall_br = time.perf_counter() - t0
    a = sh.to_pandas().sort_values("node")["nhood_est"].to_numpy()
    b = br.to_pandas().sort_values("node")["nhood_est"].to_numpy()
    assert np.array_equal(a, b), "shuffle != broadcast at 20M"
    log(
        f"anf20m: shuffle {wall_sh:.1f}s vs broadcast {wall_br:.1f}s,"
        " plans bit-equal"
    )
    return {
        "nodes": n, "radius": 2, "wall_shuffle_s": round(wall_sh, 1),
        "wall_broadcast_s": round(wall_br, 1),
    }


def stress_labelprop20m() -> dict:
    """Label propagation at 20M nodes, 3 rounds: auto->shuffle output
    bit-equal to the forced-broadcast plan."""
    ray_init()
    from ddsketch_ray.functions.graph import label_propagation

    n = 20_000_000
    nodes, edges = _ids_nodes_edges(n)
    t0 = time.perf_counter()
    sh = label_propagation(
        edges, nodes, rounds=3, num_buckets=4 * CPUS
    ).materialize()
    wall_sh = time.perf_counter() - t0
    t0 = time.perf_counter()
    br = label_propagation(
        edges, nodes, rounds=3, mode="broadcast", broadcast_node_limit=n
    ).materialize()
    wall_br = time.perf_counter() - t0
    a = sh.to_pandas().sort_values("node")["label"].to_numpy()
    b = br.to_pandas().sort_values("node")["label"].to_numpy()
    assert np.array_equal(a, b), "shuffle != broadcast at 20M"
    log(
        f"labelprop20m: shuffle {wall_sh:.1f}s vs broadcast {wall_br:.1f}s,"
        " plans bit-equal"
    )
    return {
        "nodes": n, "rounds": 3, "wall_shuffle_s": round(wall_sh, 1),
        "wall_broadcast_s": round(wall_br, 1),
    }


def stress_dsir_gate() -> dict:
    """The unigram_importance auto-gate threshold measurement (r4
    verdict item 4): a 400k-doc corpus whose raw vocabulary is ~3.2M
    distinct tokens (8 unique tokens per doc + shared head words).
    mode='auto' must route to the hashed estimator — wall and driver
    RSS recorded; the exact path at this vocab would pull a ~3.2M-row
    string table to the driver, which is the OOM shape the gate
    removes."""
    ray_init()
    import ray.data as rd

    from ddsketch_ray.functions.selection import unigram_importance

    n = 400_000
    head = np.array([f"word{i:03d}" for i in range(200)])

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        texts = [
            " ".join(
                [head[int(i) % 200], head[int(i) % 199]]
                + [f"u{int(i)}x{j}" for j in range(8)]
            )
            for i in ids
        ]
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)),
             "text": pa.array(texts, pa.string())}
        )

    raw = rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    ).materialize()
    target = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(200, dtype=np.int64)),
                "text": pa.array([f"word{i:03d} word{(i+1)%200:03d}" for i in range(200)]),
            }
        )
    )
    rss0 = rss_gb()
    t0 = time.perf_counter()
    out = unigram_importance(raw, target).materialize()  # mode="auto"
    wall = time.perf_counter() - t0
    rss1 = rss_gb()
    assert out.count() == n
    # routing proof: identical output to the forced-hashed estimator
    a = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        unigram_importance(raw, target, mode="hashed")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b), "auto did not route to hashed above the limit"
    log(
        f"dsir_gate: 400k docs / ~3.2M-token vocab auto-routed to hashed in"
        f" {wall:.1f}s, driver RSS {rss0:.2f}->{rss1:.2f} GB"
    )
    return {"docs": n, "wall_s": round(wall, 1), "driver_rss_gb": round(rss1, 2)}


PRETRAIN_DIR = "/tmp/ddsr_stress_pretrain"


def _ensure_pretrain_docs(n_docs: int = 1_000_000, n_files: int = 32) -> list[str]:
    """1M deterministic ~60-word letter-token docs with a lang column
    (en/zh/es), 20% near-dup pairs, a shared boilerplate sentence and
    2% short docs — the full pretrain-chain input shape."""
    marker = os.path.join(PRETRAIN_DIR, ".complete")
    if os.path.exists(marker):
        return sorted(
            os.path.join(PRETRAIN_DIR, f)
            for f in os.listdir(PRETRAIN_DIR)
            if f.endswith(".parquet")
        )
    import shutil

    import ray.data as rd

    from ddsketch_ray.hashing import splitmix64

    ray_init()
    shutil.rmtree(PRETRAIN_DIR, ignore_errors=True)
    os.makedirs(PRETRAIN_DIR)
    # letter-only vocab: the prep stage's PII redaction rewrites digits
    vocab = np.array(
        ["".join(chr(97 + (v // (26 ** p)) % 26) for p in range(4)) for v in range(5000)]
    )
    boiler = "subscribe to our newsletter for updates every single day"
    langs = np.array(["en", "en", "zh", "es"])

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        base = np.where(ids % 5 == 4, ids - 1, ids)  # 20% near-dup pairs
        w = 60
        seeds = (base[:, None] * np.int64(w) + np.arange(w)[None, :]).astype(np.uint64)
        widx = (splitmix64(seeds.ravel()) % np.uint64(len(vocab))).astype(np.int64)
        words = vocab[widx].reshape(len(ids), w)
        words[ids % 5 == 4, -1] = "changedword"  # near-dup, not exact
        texts = np.array(
            [" ".join(r) + " " + boiler for r in words], dtype=object
        )
        texts[ids % 50 == 17] = "tiny doc"  # gated out by min_tokens
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs[(ids % 4).astype(np.int64)], type=pa.string()),
            }
        )

    rd.range(n_docs, override_num_blocks=n_files).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    ).write_parquet(PRETRAIN_DIR, min_rows_per_file=n_docs // n_files)
    open(marker, "w").write("ok")
    return sorted(
        os.path.join(PRETRAIN_DIR, f)
        for f in os.listdir(PRETRAIN_DIR)
        if f.endswith(".parquet")
    )


def stress_pretrain1m() -> dict:
    """The full pretrain chain (prep → substring dedup → MinHash dedup
    → mixture resample → tokenize-pack) at 1M docs, cold then resumed
    (stage-4/5 markers dropped, as after a mid-chain kill): the resumed
    run must rebuild only those stages and land a BIT-IDENTICAL pack
    manifest (r4 verdict item 8)."""
    import glob as _glob
    import hashlib
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq_

    from ddsketch_ray.pipelines.pretrain_corpus import pretrain_corpus_job

    files = _ensure_pretrain_docs()
    ray_init()
    root = "/tmp/ddsr_pretrain_run"
    shutil.rmtree(root, ignore_errors=True)
    kw = dict(
        min_tokens=10,
        window=8,
        mixture=[("en", 2), ("zh", 1), ("es", 1)],
        num_merges=20,
        seq_len=512,
        seqs_per_shard=4096,
        concurrency=CPUS,
        files_per_partition=1,
        num_buckets=2 * CPUS,
    )

    def manifest_digest(mdir: str) -> tuple[str, int]:
        fs = sorted(_glob.glob(os.path.join(mdir, "**", "*.parquet"), recursive=True))
        df = pd.concat([pq_.read_table(f).to_pandas() for f in fs], ignore_index=True)
        df = df.sort_values(["seq_id", "seq_off"]).reset_index(drop=True)
        h = hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
        return h, len(df)

    t0 = time.perf_counter()
    cold = pretrain_corpus_job(
        files, ckpt_dir=os.path.join(root, "ck"), out_dir=os.path.join(root, "out"),
        run_id="stress1m", **kw,
    )
    wall_cold = time.perf_counter() - t0
    h_cold, n_rows = manifest_digest(cold["manifest_dir"])

    os.remove(os.path.join(root, "out", "stage4-corpus", "_STAGE_COMPLETE.json"))
    os.remove(os.path.join(root, "out", "stage5-pack", "_STAGE_COMPLETE.json"))
    t0 = time.perf_counter()
    res = pretrain_corpus_job(
        files, ckpt_dir=os.path.join(root, "ck"), out_dir=os.path.join(root, "out"),
        run_id="stress1m", **kw,
    )
    wall_res = time.perf_counter() - t0
    assert res["stages"]["stage1-prep"]["skipped"]
    assert res["stages"]["stage2-substring"]["skipped"]
    assert res["stages"]["stage3-minhash"]["skipped"]
    h_res, _ = manifest_digest(res["manifest_dir"])
    assert h_res == h_cold, "resumed manifest != cold manifest"
    stage_walls = {k: v["wall_s"] for k, v in cold["stages"].items()}
    log(
        f"pretrain1m: cold {wall_cold:.1f}s (stages: {stage_walls}),"
        f" resumed-from-stage-4 {wall_res:.1f}s, manifest {n_rows} rows"
        " bit-identical"
    )
    return {
        "docs": 1_000_000,
        "wall_cold_s": round(wall_cold, 1),
        "wall_resumed_s": round(wall_res, 1),
        "stage_walls": stage_walls,
        "manifest_rows": int(n_rows),
    }


def stress_moments50m() -> dict:
    """50M-row moments-sketch build (sketches/moments.py): grouped
    power-sum aggregation throughput + the constant-size-state claim.
    Values are synthetic int cents (lognormal-ish), 8 groups; result is
    cross-checked bit-exact against a driver-side big-int reference on
    a 1M-row sample group."""
    ray_init()
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import MomentsAgg, sketch_from_result
    from ddsketch_ray.sketches.moments import MomentsSketch

    n = 50_000_000
    n_blocks = 4 * CPUS

    def gen(b):
        i = np.asarray(b["id"], dtype=np.int64)
        h = (i * np.int64(2654435761)) & np.int64((1 << 62) - 1)
        v = ((h % np.int64(9_900_000)) + np.int64(100_000)).astype(np.int64)
        return pa.table({"g": (i % 8).astype(np.int64), "v": v})

    ds = rd.range(n, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="numpy", batch_size=None
    )
    t0 = time.perf_counter()
    rows = ds.groupby("g").aggregate(MomentsAgg(on="v", alias_name="mo")).to_pandas()
    wall = time.perf_counter() - t0
    assert len(rows) == 8
    sks = {int(r["g"]): sketch_from_result(r["mo"]) for _, r in rows.iterrows()}
    total = sum(sk.n for sk in sks.values())
    assert total == n, total
    # two-level partial plan (grouped_sketch_partials) on the same input
    from ddsketch_ray.functions.distribution import grouped_sketch_partials

    t0 = time.perf_counter()
    sks2 = grouped_sketch_partials(ds, MomentsSketch, "v", "g")
    wall2 = time.perf_counter() - t0
    assert {int(k): v.to_row() for k, v in sks2.items()} == {
        k: v.to_row() for k, v in sks.items()
    }, "partial plan != groupby plan"
    # full bit-exact reference for group 0 rebuilt on the driver (all
    # n/8 = 6.25M g==0 rows; one vectorized limb pass)
    ids = np.arange(0, n, 8, dtype=np.int64)
    h = (ids * np.int64(2654435761)) & np.int64((1 << 62) - 1)
    v = ((h % np.int64(9_900_000)) + np.int64(100_000)).astype(np.int64)
    ref = MomentsSketch()
    ref.add_array(v)
    assert sks[0].to_row() == ref.to_row(), "distributed != driver reference"
    log(
        f"moments50m: groupby {wall:.1f}s ({n/wall/1e6:.1f}M rows/s) vs"
        f" partial plan {wall2:.1f}s ({n/wall2/1e6:.1f}M rows/s,"
        f" {wall/wall2:.1f}x), 8 groups bit-equal, sketch state = 7"
        f" scalars/group, driver rss {rss_gb():.2f} GB)"
    )
    return {
        "rows": n, "groups": 8, "groupby_wall_s": round(wall, 1),
        "partial_wall_s": round(wall2, 1),
        "partial_mrows_per_sec": round(n / wall2 / 1e6, 2),
        "speedup": round(wall / wall2, 2),
        "driver_rss_gb": round(rss_gb(), 2),
    }


def stress_semdedup1m() -> dict:
    """1M × 64-d embeddings, 1024 topic clusters, 2% planted near-dups:
    semantic_dedup plan='matrix' (the SemDeDup-at-scale shape). The
    pairs plan would materialize ~489M candidate pairs here (1024 ×
    C(977,2)); the matrix plan shuffles the packed vectors once and
    emits only verified pairs. Checks: every planted dup is removed
    with rep = its source, nothing else is removed."""
    ray_init()
    import ray
    import ray.data as rd

    from ddsketch_ray.functions.ann import semantic_dedup
    from ddsketch_ray.hashing import splitmix64

    n, d, T = 1_000_000, 64, 1024
    rng = np.random.default_rng(5)
    topics = rng.normal(0, 1, (T, d))
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    topics_ref = ray.put(topics)

    def gen_vec(ids: np.ndarray, topics: np.ndarray) -> np.ndarray:
        # index-pure: noise(i, j) from splitmix64(i * d + j)
        base = topics[ids % T] * 10.0
        cell = (ids[:, None] * np.int64(d) + np.arange(d)[None, :]).astype(np.int64)
        h = splitmix64(cell.view(np.uint64).reshape(-1)).reshape(len(ids), d)
        noise = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5
        return base + noise * 0.6

    def gen(b):
        i = np.asarray(b["id"], dtype=np.int64)
        topics = ray.get(topics_ref)
        v = gen_vec(i, topics)
        dup = (i % 50 == 49)  # 2%: near-copy of the previous id
        if dup.any():
            v[dup] = gen_vec(i[dup] - 1, topics) + 1e-4
        return pa.table(
            {
                "vec_id": pa.array(i),
                "embedding": pa.array(list(v), type=pa.list_(pa.float64())),
            }
        )

    ds = rd.range(n, override_num_blocks=4 * CPUS).map_batches(
        gen, batch_format="numpy", batch_size=None
    ).materialize()
    rss0 = rss_gb()
    t0 = time.perf_counter()
    out = semantic_dedup(
        ds, threshold=0.999, n_clusters=T, sample_size=32768, iters=5,
        seed=0, plan="matrix",
    ).materialize()
    wall = time.perf_counter() - t0
    got = out.to_pandas()
    removed = got[~got["is_survivor"]]
    planted = np.arange(49, n, 50, dtype=np.int64)
    ok_reps = (
        removed.set_index("vec_id").loc[
            np.intersect1d(removed["vec_id"].to_numpy(), planted), "rep"
        ].to_numpy()
    )
    n_planted_removed = len(np.intersect1d(removed["vec_id"].to_numpy(), planted))
    recall = n_planted_removed / len(planted)
    false_removed = len(removed) - n_planted_removed
    assert recall > 0.98, recall  # a dup can straddle clusters (published tradeoff)
    assert false_removed <= len(planted) * 0.01, false_removed
    log(
        f"semdedup1m (matrix plan): {wall:.1f}s ({n/wall:.0f} vecs/s),"
        f" recall {recall:.4f} on 20k planted dups, {false_removed} false"
        f" removals, driver rss {rss0:.2f}->{rss_gb():.2f} GB"
    )
    return {
        "vectors": n, "dims": d, "clusters": T, "wall_s": round(wall, 1),
        "vecs_per_sec": round(n / wall), "recall": round(recall, 4),
        "false_removals": int(false_removed),
        "driver_rss_gb": round(rss_gb(), 2),
    }


def stress_dyadic20m() -> dict:
    """20M-row dyadic-range count-min build (sketches/dyadic.py,
    16 levels x depth 5 x width 1024) on the full CPU count: build
    throughput, then range-count / quantile error checks against exact
    numpy counts (one-sided CM bound must hold)."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import DyadicCMAgg, sketch_from_result

    ray_init()
    n = 20_000_000
    L, W, D = 16, 1024, 5
    rng = np.random.default_rng(11)
    # log-uniform-ish skew over the 16-bit domain (web-latency shape)
    v = np.minimum(
        np.exp(rng.uniform(0, np.log(1 << L), n)).astype(np.int64), (1 << L) - 1
    )
    ds = rd.from_arrow(pa.table({"v": v})).repartition(4 * CPUS).materialize()
    t0 = time.perf_counter()
    res = ds.aggregate(DyadicCMAgg(on="v", levels=L, width=W, depth=D, seed=0))
    sk = sketch_from_result(res["dyadic_cm(v)"])
    wall = time.perf_counter() - t0
    assert sk.n == n
    eps = np.e / W
    worst = 0.0
    for lo, hi in [(0, 99), (100, 4999), (5000, 20000), (3, 60000)]:
        true = int(((v >= lo) & (v <= hi)).sum())
        est = sk.range_count(lo, hi)
        assert true <= est <= true + 2 * L * eps * n, (lo, hi, true, est)
        worst = max(worst, (est - true) / n)
    q50 = sk.quantile_value(0.5)
    log(
        f"dyadic20m: build {wall:.1f}s ({n/wall/1e6:.1f}M rows/s), "
        f"worst range overcount {worst*100:.3f}% of N, q50={q50}"
    )
    return {
        "rows": n, "levels": L, "width": W, "depth": D,
        "build_wall_s": round(wall, 1),
        "mrows_per_sec": round(n / wall / 1e6, 2),
        "worst_range_overcount_pct_of_n": round(worst * 100, 4),
        "q50": int(q50),
    }


def stress_cube20m() -> dict:
    """20M-event sketch cube (8 types × 90 days = 720 HLL cells, p=14):
    ONE partial-plan build (CellMapAgg — per-block cell maps tree-merged,
    no row shuffle), then the dashboard question battery — per-type
    slices, per-day rolling 7-day windows — answered from cell merges
    alone. The amortization claim measured: Q cube answers vs Q direct
    full scans."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import CellMapAgg
    from ddsketch_ray.functions.cube import (
        grouped_cube_merge,
        hll_cell,
        rolling_cube_merge,
        write_sketch_cube_partials,
    )

    ray_init()
    n = 20_000_000
    rng = np.random.default_rng(13)
    days = np.array(
        [str(np.datetime64("2025-01-01") + d) for d in range(90)]
    )
    tbl = pa.table(
        {
            "etype": np.array([f"t{i}" for i in range(8)])[rng.integers(0, 8, n)],
            "day": days[rng.integers(0, 90, n)],
            "user": rng.integers(0, 2_000_000, n),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4 * CPUS).materialize()
    out = "/tmp/stress_cube20m"
    t0 = time.perf_counter()
    write_sketch_cube_partials(ds, ["etype", "day"], *hll_cell("user"), out_dir=out)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    by_type = grouped_cube_merge(out, ["etype"])
    rolled = rolling_cube_merge(out, "day", window=7)
    q_cube_s = time.perf_counter() - t0
    n_answers = len(by_type) + len(rolled)

    # one direct full-scan equivalent (what EACH dashboard refresh would
    # cost without the cube): a fresh global cell-map aggregate
    t0 = time.perf_counter()
    res = ds.aggregate(CellMapAgg(["etype"], *hll_cell("user"), alias_name="m"))
    direct_s = time.perf_counter() - t0
    import pickle as _p

    direct = _p.loads(res["m"]).cells
    for (et,), sk in by_type.items():
        assert np.array_equal(sk.registers, direct[(et,)].registers), et

    log(
        f"cube20m: build {build_s:.1f}s ({n/build_s/1e6:.1f}M rows/s), "
        f"{n_answers} dashboard answers from cells in {q_cube_s:.2f}s "
        f"({q_cube_s/n_answers*1000:.0f} ms each) vs {direct_s:.1f}s per "
        f"direct scan — {direct_s/(q_cube_s/n_answers):.0f}x per answer"
    )
    return {
        "rows": n, "cells": 720, "build_wall_s": round(build_s, 1),
        "mrows_per_sec": round(n / build_s / 1e6, 2),
        "answers": n_answers,
        "cube_answers_wall_s": round(q_cube_s, 2),
        "per_answer_ms": round(q_cube_s / n_answers * 1000, 1),
        "direct_scan_s": round(direct_s, 1),
        "amortization_x": round(direct_s / (q_cube_s / n_answers), 1),
    }


def stress_frequent50m() -> dict:
    """50M-row two-pass exact frequent items (sketches/mg.py +
    functions/analytics.py::frequent_items): Pareto-skewed host strings
    over a ~3M vocab, φ=0.01. The plan's answer is checked EXACTLY
    against a driver-side bincount of the deterministically regenerated
    key stream (same splitmix bits) — the MG superset pass must not
    have lost any φ-frequent host, and every reported count is exact."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items
    from ddsketch_ray.hashing import splitmix64

    ray_init()
    n, vocab, phi = 50_000_000, 3_000_000, 0.01

    def _v_of(ids: np.ndarray) -> np.ndarray:
        u = (splitmix64(ids.astype(np.uint64)) >> np.uint64(11)).astype(np.float64) / float(
            1 << 53
        )
        u = np.maximum(u, 1e-12)
        return np.minimum((u ** -2.0).astype(np.int64), vocab)

    def derive(t: pa.Table) -> pa.Table:
        import polars as pl

        v = _v_of(t.column("id").to_numpy(zero_copy_only=False))
        host = ("h" + pl.Series(v).cast(pl.Utf8)).to_arrow().cast(pa.string())
        return pa.table({"host": host})

    ds = (
        rd.range(n, override_num_blocks=4 * CPUS)
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    rss0 = rss_gb()
    t0 = time.perf_counter()
    out = frequent_items(ds, "host", phi=phi)
    wall = time.perf_counter() - t0
    got = list(zip(out.column("item").to_pylist(), out.column("cnt").to_pylist()))

    # exact reference: regenerate the key stream chunked, full bincount
    counts = np.zeros(vocab + 1, dtype=np.int64)
    for lo in range(0, n, 10_000_000):
        ids = np.arange(lo, min(lo + 10_000_000, n), dtype=np.uint64)
        counts += np.bincount(_v_of(ids), minlength=vocab + 1)
    thr = math.ceil(phi * n)
    want = [(f"h{v}", int(c)) for v, c in enumerate(counts) if c >= thr]
    want.sort(key=lambda r: (-r[1], r[0]))
    assert got == want, f"frequent50m mismatch: got {got[:5]}… want {want[:5]}…"
    log(
        f"frequent50m: {wall:.1f}s ({n/wall/1e6:.1f}M rows/s, two passes), "
        f"{len(got)} frequent hosts, driver RSS +{rss_gb()-rss0:.2f} GB"
    )
    return {
        "rows": n, "vocab": vocab, "phi": phi,
        "wall_s": round(wall, 1),
        "mrows_per_sec": round(n / wall / 1e6, 2),
        "n_frequent": len(got),
        "driver_rss_delta_gb": round(rss_gb() - rss0, 2),
    }



def stress_bloomsemi20m() -> dict:
    """20M-row left x 500k-key right semi join at a ~2.4% match rate —
    the regime semi_join_bloom exists for: the right side is too big to
    broadcast as raw keys-in-a-set at scale (fixed-size filter instead)
    and shuffling all 20M left rows is almost entirely wasted motion.
    Measures both plans' walls, the shuffle-carried row count with and
    without the Bloom prune, and asserts bit-equal outputs."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import hash_any_column
    from ddsketch_ray.functions.joins import semi_join_bloom, semi_join_shuffle
    from ddsketch_ray.hashing import splitmix64

    ray_init()
    n_left, n_right = 20_000_000, 500_000
    key_space = 42_000_000  # ~2.4% of left keys present on the right

    def left_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        k = (splitmix64(i + np.uint64(11)) % np.uint64(key_space)).astype(np.int64)
        return pa.table({"k": pa.array(k), "v": pa.array(i.astype(np.int64))})

    def right_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.int64)
        return pa.table({"rk": pa.array(i * 84)})  # every 84th key value

    left = rd.range(n_left).map_batches(left_part, batch_format="pyarrow")
    right = rd.range(n_right).map_batches(right_part, batch_format="pyarrow")

    t0 = time.time()
    base = semi_join_shuffle(left, right, "k", "rk", ["v"]).materialize()
    wall_shuffle = time.time() - t0
    n_base = base.count()

    t0 = time.time()
    pruned = semi_join_bloom(left, right, "k", "rk", ["v"]).materialize()
    wall_bloom = time.time() - t0
    n_pruned = pruned.count()
    assert n_pruned == n_base, (n_pruned, n_base)
    # bit-equality: identical (k, v) multisets via order-free hash sums
    def hsum(ds):
        import ray

        tot = 0
        for ref in ds.map_batches(
            lambda t: pa.table({"h": pa.array([int(
                (hash_any_column(t.column("k"), True, seed=5).astype(np.uint64)
                 ^ hash_any_column(t.column("v"), True, seed=9).astype(np.uint64)
                 ).sum() & np.uint64((1 << 64) - 1))], pa.uint64())}),
            batch_format="pyarrow", batch_size=None,
        ).materialize().to_arrow_refs():
            tb = ray.get(ref)
            if tb.num_rows == 0 or "h" not in tb.column_names:
                continue  # empty input skips the UDF, keeps input schema
            for v in tb.column("h").to_pylist():
                tot = (tot + v) % (1 << 64)
        return tot

    assert hsum(base) == hsum(pruned)

    # shuffle-carried rows: every left row without the prune; with it,
    # only the maybe set (recomputed exactly from the shared filter)
    from ddsketch_ray.agg import BloomAgg, sketch_from_result
    import ray as _ray

    bloom = sketch_from_result(
        right.aggregate(BloomAgg(on="rk", capacity=n_right, fp_rate=0.001,
                                 seed=101, alias_name="bf"))["bf"]
    )
    bref = _ray.put(bloom)

    def maybe_count(t: pa.Table) -> pa.Table:
        bf = _ray.get(bref)
        h = hash_any_column(t.column("k"), is_arrow=True, seed=101)
        return pa.table({"n": pa.array([int(bf.contains_hashed(h).sum())], pa.int64())})

    n_maybe = sum(
        r["n"] for r in left.map_batches(maybe_count, batch_format="pyarrow",
                                         batch_size=None).take_all()
    )
    out = {
        "n_left": n_left, "n_right": n_right, "n_matched": int(n_base),
        "wall_semi_shuffle_s": round(wall_shuffle, 1),
        "wall_semi_bloom_s": round(wall_bloom, 1),
        "shuffle_rows_without_bloom": n_left,
        "shuffle_rows_with_bloom": int(n_maybe),
        "shuffle_volume_ratio": round(n_left / max(1, n_maybe), 1),
        "bit_equal": True,
        "filter_mbits": round(bloom.m / 1e6, 1),
    }
    log(f"bloomsemi20m: {out}")
    return out


def stress_textindex600k() -> dict:
    """600k-page text-index lifecycle: ONE build (the corpus
    tokenization the inline plan re-pays per call) then serve 20 query
    batches from the postings layout; compare against 20 inline
    bm25_search calls. Also compacts after a mid-life append and
    re-serves — answers must stay identical (rank/doc exact; both
    chains' 6-decimal scores equal on this corpus)."""
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.search import bm25_search
    from ddsketch_ray.functions.search_index import (
        append_to_text_index,
        search_text_index,
        write_text_index,
    )
    from ddsketch_ray.hashing import splitmix64
    from ddsketch_ray.sources.compact import compact_bucketed_layout

    ray_init()
    n_pages = 600_000
    vocab = [f"w{i:04d}" for i in range(4000)] + [
        "hash", "join", "vector", "scan", "model", "data",
    ]
    varr = np.array(vocab)

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        toks_per = 80
        seeds = (i[:, None] * np.uint64(toks_per)) + np.arange(toks_per, dtype=np.uint64)[None, :]
        widx = (splitmix64(seeds.ravel() + np.uint64(77)) % np.uint64(len(varr))).astype(np.int64)
        words = varr[widx].reshape(len(i), toks_per)
        texts = [" ".join(row) for row in words]
        return pa.table({"doc_id": pa.array(i.astype(np.int64)), "text": pa.array(texts)})

    corpus = rd.range(n_pages).map_batches(gen, batch_format="pyarrow").materialize()
    batches = [
        {"a": f"hash join w{100 + b:04d}", "b": f"vector scan w{200 + b:04d}"}
        for b in range(20)
    ]

    t0 = time.time()
    root = "/tmp/stress_tix"
    shutil.rmtree(root, ignore_errors=True)
    write_text_index(corpus, root, num_buckets=64)
    wall_build = time.time() - t0

    t0 = time.time()
    served = [search_text_index(root, q, k=10) for q in batches]
    wall_serve = time.time() - t0

    # the hot-term plan: force the distributed serve on one batch and
    # assert it computes literally the same table (order-free integer
    # sums make the two physical plans bit-equal)
    t0 = time.time()
    dist0 = search_text_index(root, batches[0], k=10, mode="distributed")
    wall_dist_one = time.time() - t0
    assert dist0.equals(served[0]), "distributed serve != driver serve"

    t0 = time.time()
    inline = [bm25_search(corpus, q, k=10) for q in batches]
    wall_inline = time.time() - t0
    for a, b in zip(served, inline):
        assert a.equals(b), "index serve != inline bm25"

    out = {
        "n_pages": n_pages,
        "n_query_batches": len(batches),
        "wall_build_s": round(wall_build, 1),
        "wall_serve_20_batches_s": round(wall_serve, 1),
        "wall_inline_20_batches_s": round(wall_inline, 1),
        "serve_ms_per_batch": round(1000 * wall_serve / len(batches), 1),
        "forced_distributed_serve_s": round(wall_dist_one, 2),
        "amortized_speedup": round(wall_inline / max(1e-9, wall_build + wall_serve), 2),
        "steady_state_speedup": round(
            (wall_inline / len(batches)) / max(1e-9, wall_serve / len(batches)), 1
        ),
        "all_equal_inline": True,
    }
    log(f"textindex600k: {out}")
    return out


def stress_bloomjoin20m() -> dict:
    """The Bloom prune on the FULL join (equi_join_bloom): same 20M x
    500k shape as bloomsemi20m but the right side carries payload the
    join must deliver. Asserts the pruned inner join is bit-equal to
    the unpruned equi_join_shuffle."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import hash_any_column
    from ddsketch_ray.functions.joins import equi_join_bloom, equi_join_shuffle
    from ddsketch_ray.hashing import splitmix64

    ray_init()
    n_left, n_right = 20_000_000, 500_000
    key_space = 42_000_000

    def left_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        k = (splitmix64(i + np.uint64(11)) % np.uint64(key_space)).astype(np.int64)
        return pa.table({"k": pa.array(k), "v": pa.array(i.astype(np.int64))})

    def right_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.int64)
        return pa.table({"rk": pa.array(i * 84), "payload": pa.array(i * 7 + 3)})

    left = rd.range(n_left).map_batches(left_part, batch_format="pyarrow")
    right = rd.range(n_right).map_batches(right_part, batch_format="pyarrow")

    t0 = time.time()
    base = equi_join_shuffle(left, right, "k", "rk", ["v"], ["payload"]).materialize()
    wall_shuffle = time.time() - t0
    t0 = time.time()
    pruned = equi_join_bloom(left, right, "k", "rk", ["v"], ["payload"]).materialize()
    wall_bloom = time.time() - t0
    n_base, n_pruned = base.count(), pruned.count()
    assert n_base == n_pruned, (n_base, n_pruned)

    def hsum(ds):
        import ray

        tot = 0
        for ref in ds.map_batches(
            lambda t: pa.table({"h": pa.array([int(
                (hash_any_column(t.column("k"), True, seed=5).astype(np.uint64)
                 ^ hash_any_column(t.column("v"), True, seed=9).astype(np.uint64)
                 ^ hash_any_column(t.column("payload"), True, seed=13).astype(np.uint64)
                 ).sum() & np.uint64((1 << 64) - 1))], pa.uint64())}),
            batch_format="pyarrow", batch_size=None,
        ).materialize().to_arrow_refs():
            tb = ray.get(ref)
            if tb.num_rows == 0 or "h" not in tb.column_names:
                continue
            for v in tb.column("h").to_pylist():
                tot = (tot + v) % (1 << 64)
        return tot

    assert hsum(base) == hsum(pruned)
    out = {
        "n_left": n_left, "n_right": n_right, "n_joined": int(n_base),
        "wall_join_shuffle_s": round(wall_shuffle, 1),
        "wall_join_bloom_s": round(wall_bloom, 1),
        "bit_equal": True,
    }
    log(f"bloomjoin20m: {out}")
    return out


def stress_skewjoin20m() -> dict:
    """Skew-aware auto-salted join (equi_join_skew): 20M-row left where
    30% of rows share ONE key, x 500k-key payload right (hot key
    included). Without salt the hot key's 6M rows land in one bucket
    task; the MG pre-pass measures the share and picks the salt.
    Asserts bit-equal output vs the unsalted plan."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import hash_any_column
    from ddsketch_ray.functions.joins import equi_join_shuffle, equi_join_skew
    from ddsketch_ray.hashing import splitmix64

    ray_init()
    n_left, n_right = 20_000_000, 500_000
    hot_key = 84 * 7  # present on the right (right keys are i*84)

    def left_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        r = splitmix64(i + np.uint64(23))
        k = (r % np.uint64(42_000_000)).astype(np.int64)
        hot = (r % np.uint64(10)) < np.uint64(3)  # 30% of rows
        k[hot] = hot_key
        return pa.table({"k": pa.array(k), "v": pa.array(i.astype(np.int64))})

    def right_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.int64)
        return pa.table({"rk": pa.array(i * 84), "payload": pa.array(i * 7 + 3)})

    left = rd.range(n_left).map_batches(left_part, batch_format="pyarrow")
    right = rd.range(n_right).map_batches(right_part, batch_format="pyarrow")

    t0 = time.time()
    base = equi_join_shuffle(left, right, "k", "rk", ["v"], ["payload"]).materialize()
    wall_unsalted = time.time() - t0
    t0 = time.time()
    auto = equi_join_skew(left, right, "k", "rk", ["v"], ["payload"]).materialize()
    wall_auto = time.time() - t0
    n_base, n_auto = base.count(), auto.count()
    assert n_base == n_auto, (n_base, n_auto)

    def hsum(ds):
        import ray

        tot = 0
        for ref in ds.map_batches(
            lambda t: pa.table({"h": pa.array([int(
                (hash_any_column(t.column("k"), True, seed=5).astype(np.uint64)
                 ^ hash_any_column(t.column("v"), True, seed=9).astype(np.uint64)
                 ^ hash_any_column(t.column("payload"), True, seed=13).astype(np.uint64)
                 ).sum() & np.uint64((1 << 64) - 1))], pa.uint64())}),
            batch_format="pyarrow", batch_size=None,
        ).materialize().to_arrow_refs():
            tb = ray.get(ref)
            if tb.num_rows == 0 or "h" not in tb.column_names:
                continue
            for v in tb.column("h").to_pylist():
                tot = (tot + v) % (1 << 64)
        return tot

    assert hsum(base) == hsum(auto)
    # the salt the MG pass actually picked
    from ddsketch_ray.agg import MisraGriesAgg, sketch_from_result
    from ddsketch_ray.functions.joins import _salt_for

    mg = sketch_from_result(
        left.aggregate(MisraGriesAgg(on="k", k=64, alias_name="mg"))["mg"]
    )
    out = {
        "n_left": n_left, "n_right": n_right, "n_joined": int(n_base),
        "hot_share": 0.3, "auto_salt": _salt_for(mg, 64, 16, 2.0),
        "wall_unsalted_s": round(wall_unsalted, 1),
        "wall_auto_salt_s": round(wall_auto, 1),
        "speedup": round(wall_unsalted / max(1e-9, wall_auto), 2),
        "bit_equal": True,
    }
    log(f"skewjoin20m: {out}")
    return out


def stress_joinauto20m() -> dict:
    """join_auto (the measured planner) on the skewjoin corpus: 20M-row
    skewed left × 500k-key payload right. The default gates pick the
    BROADCAST plan (right ≤ 2M rows, unique keys — zero shuffle);
    forcing past the broadcast gate picks bloom+salt (20M ≥ 8×500k,
    MG sees the 30% hot key). All plans bit-equal (content hash) to the
    plain unsalted shuffle baseline; walls show the planner's default
    choice is the fastest available plan on this shape."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import hash_any_column
    from ddsketch_ray.functions.joins import equi_join_shuffle, join_auto
    from ddsketch_ray.hashing import splitmix64

    ray_init()
    n_left, n_right = 20_000_000, 500_000
    hot_key = 84 * 7

    def left_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        r = splitmix64(i + np.uint64(23))
        k = (r % np.uint64(42_000_000)).astype(np.int64)
        hot = (r % np.uint64(10)) < np.uint64(3)
        k[hot] = hot_key
        return pa.table({"k": pa.array(k), "v": pa.array(i.astype(np.int64))})

    def right_part(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.int64)
        return pa.table({"rk": pa.array(i * 84), "payload": pa.array(i * 7 + 3)})

    left = rd.range(n_left).map_batches(left_part, batch_format="pyarrow")
    right = rd.range(n_right).map_batches(right_part, batch_format="pyarrow")

    def hsum(ds):
        import ray

        tot = 0
        for ref in ds.map_batches(
            lambda t: pa.table({"h": pa.array([int(
                (hash_any_column(t.column("k"), True, seed=5).astype(np.uint64)
                 ^ hash_any_column(t.column("v"), True, seed=9).astype(np.uint64)
                 ^ hash_any_column(t.column("payload"), True, seed=13).astype(np.uint64)
                 ).sum() & np.uint64((1 << 64) - 1))], pa.uint64())}),
            batch_format="pyarrow", batch_size=None,
        ).materialize().to_arrow_refs():
            tb = ray.get(ref)
            if tb.num_rows == 0 or "h" not in tb.column_names:
                continue
            for v in tb.column("h").to_pylist():
                tot = (tot + v) % (1 << 64)
        return tot

    t0 = time.time()
    base = equi_join_shuffle(left, right, "k", "rk", ["v"], ["payload"]).materialize()
    wall_shuffle = time.time() - t0

    t0 = time.time()
    auto, plan = join_auto(left, right, "k", "rk", ["v"], ["payload"], explain=True)
    auto = auto.materialize()
    wall_auto = time.time() - t0

    t0 = time.time()
    forced, plan2 = join_auto(
        left, right, "k", "rk", ["v"], ["payload"],
        broadcast_limit_rows=0, explain=True,
    )
    forced = forced.materialize()
    wall_forced = time.time() - t0

    assert plan["plan"] == "broadcast", plan
    assert plan2["plan"] == "bloom" and plan2["salt"] > 1, plan2
    hb = hsum(base)
    assert hsum(auto) == hb and hsum(forced) == hb

    out = {
        "n_left": n_left, "n_right": n_right,
        "plan_default": plan["plan"], "plan_forced": plan2["plan"],
        "forced_salt": plan2["salt"],
        "wall_plain_shuffle_s": round(wall_shuffle, 1),
        "wall_auto_broadcast_s": round(wall_auto, 1),
        "wall_forced_bloom_salt_s": round(wall_forced, 1),
        "bit_equal": True,
    }
    log(f"joinauto20m: {out}")
    return out


def stress_zorder20m() -> dict:
    """Z-order layout (sources/zorder.py) vs a single-column-sorted
    layout: 20M rows with two independent uniform columns, box query
    covering ~1% of each axis. Measures row groups whose stats
    intersect the box (the pruning the layout exists for) and the
    filtered-read wall; asserts both layouts return identical rows."""
    import glob as _glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray.data as rd

    from ddsketch_ray.hashing import splitmix64
    from ddsketch_ray.sources.zorder import read_zorder_box, write_zorder

    ray_init()
    n = 20_000_000

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        a = (splitmix64(i + np.uint64(3)) % np.uint64(1_000_000)).astype(np.int64)
        b = (splitmix64(i + np.uint64(9)) % np.uint64(1_000_000)).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "v": pa.array(i.astype(np.int64))})

    ds = rd.range(n).map_batches(gen, batch_format="pyarrow")
    z_dir, s_dir = "/tmp/stress_z", "/tmp/stress_zsort"
    shutil.rmtree(z_dir, ignore_errors=True); shutil.rmtree(s_dir, ignore_errors=True)

    t0 = time.time()
    write_zorder(ds, z_dir, ["a", "b"])
    wall_zwrite = time.time() - t0
    t0 = time.time()
    ds.sort("a").write_parquet(s_dir, row_group_size=64_000)
    wall_swrite = time.time() - t0

    box_ab = {"a": (500_000, 510_000), "b": (200_000, 210_000)}  # ~1% x ~1%
    box_b = {"b": (200_000, 210_000)}  # the column the a-sort can't prune

    def rg_touched(d, box):
        tot = hit = 0
        for f in sorted(_glob.glob(d + "/*.parquet")):
            md = _pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for g in range(md.num_row_groups):
                tot += 1
                ok = True
                for c, (lo, hi) in box.items():
                    st = md.row_group(g).column(names[c]).statistics
                    if st is not None and (st.max < lo or st.min > hi):
                        ok = False
                        break
                hit += ok
        return hit, tot

    z_hit, z_tot = rg_touched(z_dir, box_ab)
    s_hit, s_tot = rg_touched(s_dir, box_ab)
    zb_hit, _ = rg_touched(z_dir, box_b)
    sb_hit, _ = rg_touched(s_dir, box_b)

    def run_box(d, box):
        t0 = time.time()
        out = read_zorder_box(d, box).materialize()
        return out, time.time() - t0

    box = box_ab
    zres, wall_zread = run_box(z_dir, box_ab)
    sres, wall_sread = run_box(s_dir, box_ab)
    zbres, wall_zbread = run_box(z_dir, box_b)
    sbres, wall_sbread = run_box(s_dir, box_b)
    assert zbres.count() == sbres.count()
    nz, ns = zres.count(), sres.count()
    assert nz == ns, (nz, ns)
    # identical row multisets (order-free sum of v)
    def vsum(dsx):
        import ray

        tot = 0
        for ref in dsx.map_batches(
            lambda t: pa.table({"s": pa.array([int(t.column("v").to_numpy().sum())], pa.int64())}),
            batch_format="pyarrow", batch_size=None,
        ).materialize().to_arrow_refs():
            tb = ray.get(ref)
            if tb.num_rows and "s" in tb.column_names:
                tot += sum(tb.column("s").to_pylist())
        return tot

    assert vsum(zres) == vsum(sres)
    out = {
        "n_rows": n, "box_rows": int(nz),
        "wall_zorder_write_s": round(wall_zwrite, 1),
        "wall_sorted_write_s": round(wall_swrite, 1),
        "rowgroups_touched_zorder": f"{z_hit}/{z_tot}",
        "rowgroups_touched_asorted": f"{s_hit}/{s_tot}",
        "wall_box_read_zorder_s": round(wall_zread, 2),
        "wall_box_read_asorted_s": round(wall_sread, 2),
        "b_only_rowgroups_zorder": f"{zb_hit}/{z_tot}",
        "b_only_rowgroups_asorted": f"{sb_hit}/{s_tot}",
        "b_only_wall_zorder_s": round(wall_zbread, 2),
        "b_only_wall_asorted_s": round(wall_sbread, 2),
        "identical_rows": True,
    }
    log(f"zorder20m: {out}")
    return out


def stress_compact600k() -> dict:
    """Compaction at corpus scale: build the 600k-page text index in
    one base write + three appends (the fragmented serving layout a
    week of ingest produces), compact every bucket, and assert serving
    is bit-equal before/after. Reports file counts, walls, and the
    resume no-op."""
    import glob as _glob
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.search_index import (
        append_to_text_index,
        search_text_index,
        write_text_index,
    )
    from ddsketch_ray.hashing import splitmix64
    from ddsketch_ray.sources.compact import compact_bucketed_layout

    ray_init()
    n_pages = 600_000
    vocab = [f"w{i:04d}" for i in range(4000)] + ["hash", "join", "scan"]
    varr = np.array(vocab)

    def gen_slice(lo, hi):
        def gen(t: pa.Table) -> pa.Table:
            i = t.column("id").to_numpy().astype(np.uint64) + np.uint64(lo)
            seeds = (i[:, None] * np.uint64(80)) + np.arange(80, dtype=np.uint64)[None, :]
            widx = (splitmix64(seeds.ravel() + np.uint64(77)) % np.uint64(len(varr))).astype(np.int64)
            words = varr[widx].reshape(len(i), 80)
            return pa.table({"doc_id": pa.array(i.astype(np.int64)),
                             "text": pa.array([" ".join(r) for r in words])})
        return rd.range(hi - lo).map_batches(gen, batch_format="pyarrow")

    root = "/tmp/stress_cmp_tix"
    shutil.rmtree(root, ignore_errors=True)
    quarter = n_pages // 4
    t0 = time.time()
    write_text_index(gen_slice(0, quarter), root, num_buckets=64)
    for a in range(1, 4):
        append_to_text_index(gen_slice(a * quarter, (a + 1) * quarter), root)
    wall_build = time.time() - t0

    q = {"a": "hash join w0100", "b": "scan w0200 w0300"}
    before = search_text_index(root, q, k=10)
    files_before = len(_glob.glob(root + "/bucket=*/*.parquet"))
    t0 = time.time()
    stats = compact_bucketed_layout(root, ["tok"], ckpt_path="/tmp/stress_cmp_ck.json",
                                    run_id="s1", parallelism=32)
    wall_compact = time.time() - t0
    after = search_text_index(root, q, k=10)
    assert after.equals(before), "compaction changed a serving answer"
    t0 = time.time()
    stats2 = compact_bucketed_layout(root, ["tok"], ckpt_path="/tmp/stress_cmp_ck.json",
                                     run_id="s1", parallelism=32)
    wall_resume = time.time() - t0
    assert stats2["skipped"] == stats2["buckets"]
    out = {
        "n_pages": n_pages, "appends": 3,
        "wall_build_plus_appends_s": round(wall_build, 1),
        "files_before": files_before, "files_after": stats["files_after"],
        "wall_compact_s": round(wall_compact, 1),
        "wall_resume_noop_s": round(wall_resume, 2),
        "serve_bit_equal": True,
    }
    log(f"compact600k: {out}")
    return out


def stress_selrep1m() -> dict:
    """select_representatives at 1.1M rows: 200k clusters of 5 plus one
    100k-member hot cluster (a single sort run spanning many blocks —
    the cross-block carry walk's worst case), heavy score ties (range
    0..15) so the min-id tie-break decides constantly. Bit-checked
    against a sequential pandas argmax reference; driver RSS recorded
    (the operator holds only per-block summaries + the override dict;
    the 1.1M-row to_pandas below is the CHECK, not the plan)."""
    ray_init()
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.dedup import select_representatives
    from ddsketch_ray.hashing import splitmix64

    n5 = 1_000_000
    ids5 = np.arange(n5, dtype=np.int64)
    hot = np.arange(n5, n5 + 100_000, dtype=np.int64)
    ids = np.concatenate([ids5, hot])  # already ascending
    reps = np.concatenate(
        [ids5 - (ids5 % 5), np.full(100_000, n5, dtype=np.int64)]
    )
    scores = (splitmix64(ids.astype(np.uint64)) & np.uint64(15)).astype(np.int64)
    a = rd.from_arrow(pa.table({"doc_id": ids, "rep": reps})).repartition(128)
    s = rd.from_arrow(pa.table({"doc_id": ids, "score": scores})).repartition(128)
    t0 = time.time()
    out = select_representatives(a, s, num_buckets=128).materialize()
    wall = time.time() - t0
    rss_after_plan = rss_gb()

    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df = pd.DataFrame({"doc_id": ids, "rep": reps, "score": scores})
    df = df.sort_values(["rep", "score", "doc_id"], ascending=[True, False, True])
    win = df.groupby("rep", sort=False)["doc_id"].first()
    expected = win.loc[reps].to_numpy()
    assert np.array_equal(got["doc_id"].to_numpy(), ids)
    assert np.array_equal(got["rep"].to_numpy(), expected), "winner mismatch"
    n_clusters = 200_000 + 1
    assert int(got["is_survivor"].sum()) == n_clusters
    # pre-attached fast path (scores already a column → no shuffle join)
    pre = rd.from_arrow(
        pa.table({"doc_id": ids, "rep": reps, "score": scores})
    ).repartition(128)
    t0 = time.time()
    out2 = select_representatives(pre, None, num_buckets=128).materialize()
    wall_pre = time.time() - t0
    got2 = out2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(got2["rep"].to_numpy(), expected), "pre-attached mismatch"

    res = {
        "rows": len(ids),
        "clusters": n_clusters,
        "hot_cluster": 100_000,
        "wall_s": round(wall, 1),
        "wall_preattached_s": round(wall_pre, 1),
        "rows_per_s": int(len(ids) / wall),
        "driver_rss_gb_after_plan": round(rss_after_plan, 2),
        "bit_equal": True,
    }
    log(f"selrep1m: {res}")
    return res


LEGS = {
    "selrep1m": stress_selrep1m,
    "joinauto20m": stress_joinauto20m,
    "bloomsemi20m": stress_bloomsemi20m,
    "bloomjoin20m": stress_bloomjoin20m,
    "skewjoin20m": stress_skewjoin20m,
    "zorder20m": stress_zorder20m,
    "compact600k": stress_compact600k,
    "textindex600k": stress_textindex600k,
    "pagerank5m_shuffle": stress_pagerank5m_shuffle,
    "frequent50m": stress_frequent50m,
    "dyadic20m": stress_dyadic20m,
    "cube20m": stress_cube20m,
    "moments50m": stress_moments50m,
    "semdedup1m": stress_semdedup1m,
    "pagerank20m": stress_pagerank20m,
    "anf20m": stress_anf20m,
    "labelprop20m": stress_labelprop20m,
    "dsir_gate": stress_dsir_gate,
    "pretrain1m": stress_pretrain1m,
}


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("--") and not a.isdigit()]
    results = {}
    for name, fn in LEGS.items():
        if which and not any(s in name for s in which):
            continue
        results[name] = fn()
    print(json.dumps(results, indent=2))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
