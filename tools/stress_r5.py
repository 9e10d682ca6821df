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


LEGS = {
    "pagerank5m_shuffle": stress_pagerank5m_shuffle,
    "pagerank20m": stress_pagerank20m,
    "anf20m": stress_anf20m,
    "labelprop20m": stress_labelprop20m,
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
