"""Deterministic distributed k-means (Lloyd's) over an embedding column.

The clustering counterpart of `functions/ann.py`'s IVF coarse quantizer
— but FULL-corpus: every iteration streams the whole Dataset once, so
it clusters 10^12 rows where IVF's driver-side 2k-row training sample
could not. The plan per iteration is the canonical broadcast-partials
shape (zero shuffle):

    broadcast centroids (ray.put, KB)  ->  map_batches: per-block
    nearest-centroid assignment + per-cluster partial sums/counts
    ->  driver combines O(blocks x k) partial rows  ->  new centroids.

Bit-determinism across block layouts and cluster sizes — the property
every frozen gate oracle in this repo depends on — does NOT hold for
naive float accumulation (per-block partial sums reorder float adds
whenever block boundaries move). This implementation therefore
accumulates in FIXED POINT: each coordinate is quantized once per
iteration to ``round(x * 2**frac_bits)`` as int64, integer partials are
exactly associative, and the driver combines them with Python
arbitrary-precision ints (no overflow at any scale). Centroid updates
and per-row distances stay float64, computed identically on every
worker from the broadcast centroids, so assignments — and with them the
whole run — are a pure function of the input multiset.

Magnitude contract: ``|x| * 2**frac_bits`` must fit int64 per PER-BLOCK
partial (unit-norm-ish embeddings with the default frac_bits=20 allow
blocks of ~8e12 rows — unreachable). Ties in nearest-centroid go to the
lowest cluster index (np.argmin). Empty clusters keep their previous
centroid.

Initialization is hash-deterministic: the k rows with the smallest
SplitMix64(vec_id ^ seed) become the initial centroids (KMV-style
global bottom-k: per-block bottom-k candidates, O(blocks x k) driver
merge), ordered by ascending hash. Layout- and cluster-size-invariant
by construction.

Reference scope note: gmorleo/DDSketch has no clustering operators
(SURVEY.md §2.3) — this is a north-rule training-data-pipeline
addition (corpus bucketing / diversity sampling / IVF index training).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ddsketch_ray.functions.ann import _embedding_matrix
from ddsketch_ray.hashing import mix_seed

__all__ = [
    "kmeans_assign",
    "kmeans_fit",
    "kmeans_fit_checkpointed",
    "kmeans_iteration",
]


def _bottomk_init(ds, vec_col: str, id_col: str, k: int, seed: int) -> np.ndarray:
    """Initial centroids: embeddings of the k ids with smallest
    SplitMix64(id ^ seed), ascending-hash order. Assumes distinct ids
    (SplitMix64 is a bijection, so distinct ids never tie)."""
    import ray

    def block_bottomk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix_seed(ids.view(np.uint64), seed)
        take = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "hu": pa.array(h[take], type=pa.uint64()),
                vec_col: t.column(vec_col).take(pa.array(take)),
            }
        )

    parts = [
        tb
        for tb in ray.get(
            ds.map_batches(
                block_bottomk, batch_format="pyarrow", batch_size=None
            ).materialize().to_arrow_refs()
        )
        if tb.num_rows
    ]
    if not parts:
        raise ValueError("kmeans_fit: empty dataset")
    allc = pa.concat_tables(parts).combine_chunks()
    hu = allc.column("hu").to_numpy(zero_copy_only=False)
    order = np.argsort(hu, kind="stable")[:k]
    sel = allc.take(pa.array(order))
    return _embedding_matrix(sel, vec_col)


def kmeans_fit(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    seed: int = 0,
    frac_bits: int = 20,
) -> dict:
    """Lloyd's k-means, ``iters`` full passes. Returns
    ``{"centroids": (k,d) float64, "counts": (k,) int64,
    "inertia": float, "history": [float per iteration]}`` where counts
    and inertia describe the FINAL iteration's assignment.

    Driver footprint: O(blocks x k x d) integer partial rows per
    iteration — never the corpus.
    """
    centroids = _bottomk_init(ds, vec_col, id_col, k, seed)
    history: list[float] = []
    counts = np.zeros(centroids.shape[0], dtype=np.int64)
    inertia = 0.0
    for _ in range(max(1, int(iters))):
        centroids, counts, inertia = kmeans_iteration(ds, centroids, vec_col, frac_bits)
        history.append(inertia)
    return {
        "centroids": centroids,
        "counts": counts,
        "inertia": inertia,
        "history": history,
    }


def kmeans_iteration(ds, centroids: np.ndarray, vec_col: str = "embedding", frac_bits: int = 20):
    """One Lloyd iteration: assignment under ``centroids`` + exact
    fixed-point partial combine. Returns (new_centroids, counts,
    inertia) describing the assignment under the INPUT centroids.
    Deterministic given (input multiset, centroids) — the unit of work
    the checkpointed job resumes at."""
    import ray

    centroids = np.asarray(centroids, dtype=np.float64)
    kk, d = centroids.shape
    scale = float(2**frac_bits)
    cref = ray.put(centroids)

    def block_partials(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _embedding_matrix(t, vec_col)
        if x.shape[0] == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "inertia_fp": pa.array([], pa.int64()),
                    "sum_fp": pa.array([], pa.list_(pa.int64())),
                }
            )
        x2 = np.einsum("ij,ij->i", x, x)
        c2 = np.einsum("ij,ij->i", c, c)
        d2 = x2[:, None] - 2.0 * (x @ c.T) + c2[None, :]
        assign = np.argmin(d2, axis=1)  # ties -> lowest cluster id
        dmin = np.maximum(d2[np.arange(len(assign)), assign], 0.0)
        xq = np.round(x * scale).astype(np.int64)
        sums = np.zeros((c.shape[0], x.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, xq)
        n = np.bincount(assign, minlength=c.shape[0]).astype(np.int64)
        iq = np.round(dmin * scale).astype(np.int64)
        inert = np.zeros(c.shape[0], dtype=np.int64)
        np.add.at(inert, assign, iq)
        return pa.table(
            {
                "cluster": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                "n": pa.array(n),
                "inertia_fp": pa.array(inert),
                "sum_fp": pa.array(sums.tolist(), type=pa.list_(pa.int64())),
            }
        )

    parts = [
        tb
        for tb in ray.get(
            ds.map_batches(
                block_partials, batch_format="pyarrow", batch_size=None
            ).materialize().to_arrow_refs()
        )
        if tb.num_rows
    ]
    # exact integer combine: Python ints -> no overflow at any scale
    g_n = [0] * kk
    g_inert = [0] * kk
    g_sum = [[0] * d for _ in range(kk)]
    for tb in parts:
        cl = tb.column("cluster").to_pylist()
        nn = tb.column("n").to_pylist()
        ii = tb.column("inertia_fp").to_pylist()
        ss = tb.column("sum_fp").to_pylist()
        for c_i, n_i, i_i, s_i in zip(cl, nn, ii, ss):
            g_n[c_i] += n_i
            g_inert[c_i] += i_i
            row = g_sum[c_i]
            for j, v in enumerate(s_i):
                row[j] += v
    new_c = centroids.copy()
    for ci in range(kk):
        if g_n[ci] > 0:
            new_c[ci] = np.array(
                [(float(v) / scale) / float(g_n[ci]) for v in g_sum[ci]],
                dtype=np.float64,
            )
    return new_c, np.array(g_n, dtype=np.int64), float(sum(g_inert)) / scale


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "cluster",
):
    """Append the nearest-centroid index (float64 distance, lowest-index
    tie-break — the same rule as training) to each row. Broadcast
    centroids, pure map — layout/cluster-size invariant."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign_batch(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _embedding_matrix(t, vec_col)
        if x.shape[0] == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        x2 = np.einsum("ij,ij->i", x, x)
        c2 = np.einsum("ij,ij->i", c, c)
        d2 = x2[:, None] - 2.0 * (x @ c.T) + c2[None, :]
        assign = np.argmin(d2, axis=1).astype(np.int64)
        return t.append_column(out_col, pa.array(assign))

    return ds.map_batches(assign_batch, batch_format="pyarrow", batch_size=None)


def kmeans_fit_checkpointed(
    ds,
    ckpt_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    seed: int = 0,
    frac_bits: int = 20,
    input_desc: str = "",
) -> dict:
    """`kmeans_fit` with per-ITERATION checkpoints — the resumable shape
    for iterative algorithms (the map-style jobs checkpoint per
    partition; an iterative fit checkpoints its state vector instead).

    After every Lloyd iteration the centroids land atomically in
    ``{ckpt_dir}/centroids-{i:04d}.parquet`` (i=0 is the deterministic
    hash init) with lineage metadata (k, d, seed, frac_bits, vec_col,
    input_desc, inertia, wall_s). A re-run loads the highest complete
    iteration ≤ ``iters`` and continues; because every iteration is a
    pure function of (input multiset, centroids), a resumed run is
    BIT-IDENTICAL to a cold one — parameter mismatches against the
    stored metadata raise instead of silently diverging.

    Returns the `kmeans_fit` dict plus ``resumed_from_iteration`` and
    ``iterations_run``."""
    import json as _json
    import os as _os
    import time as _time

    import pyarrow.parquet as _pq

    _os.makedirs(ckpt_dir, exist_ok=True)
    params = {
        "k": int(k),
        "seed": int(seed),
        "frac_bits": int(frac_bits),
        "vec_col": vec_col,
        "id_col": id_col,
        "input_desc": input_desc,
    }

    def _path(i: int) -> str:
        return _os.path.join(ckpt_dir, f"centroids-{i:04d}.parquet")

    def _write(i: int, centroids: np.ndarray, counts, inertia, wall_s: float) -> None:
        t = pa.table(
            {
                "cluster": pa.array(np.arange(centroids.shape[0], dtype=np.int64)),
                "centroid": pa.array(centroids.tolist(), pa.list_(pa.float64())),
                "n": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )
        meta = dict(params, iteration=i, inertia=inertia, wall_s=round(wall_s, 3))
        t = t.replace_schema_metadata({b"ddsr_kmeans": _json.dumps(meta).encode()})
        tmp = _path(i) + ".tmp"
        _pq.write_table(t, tmp)
        _os.replace(tmp, _path(i))  # atomic: readers never see partials

    def _load(i: int):
        t = _pq.read_table(_path(i))
        meta = _json.loads(t.schema.metadata[b"ddsr_kmeans"].decode())
        for key, want in params.items():
            if key == "input_desc":
                continue  # descriptive only
            if meta.get(key) != want:
                raise ValueError(
                    f"checkpoint {_path(i)} was written with {key}={meta.get(key)!r}, "
                    f"this run uses {want!r} — refusing to resume"
                )
        cent = np.array(t.column("centroid").to_pylist(), dtype=np.float64)
        counts = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return cent, counts, meta

    done = sorted(
        int(f[len("centroids-"):-len(".parquet")])
        for f in _os.listdir(ckpt_dir)
        if f.startswith("centroids-") and f.endswith(".parquet")
    )
    start = max((i for i in done if i <= iters), default=-1)
    history: list[float] = []
    if start >= 0:
        centroids, counts, meta = _load(start)
        inertia = float(meta.get("inertia") or 0.0)
    else:
        t0 = _time.perf_counter()
        centroids = _bottomk_init(ds, vec_col, id_col, k, seed)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        _write(0, centroids, counts, None, _time.perf_counter() - t0)
        start = 0
    ran = 0
    for i in range(start + 1, int(iters) + 1):
        t0 = _time.perf_counter()
        centroids, counts, inertia = kmeans_iteration(ds, centroids, vec_col, frac_bits)
        _write(i, centroids, counts, inertia, _time.perf_counter() - t0)
        history.append(inertia)
        ran += 1
    return {
        "centroids": centroids,
        "counts": counts,
        "inertia": inertia,
        "history": history,
        "resumed_from_iteration": start,
        "iterations_run": ran,
    }


def group_centroids(ds, group_col: str, vec_col: str = "embedding", frac_bits: int = 20):
    """Exact per-group embedding centroid (mean vector) — the
    domain/language profile vector of a corpus. Same fixed-point
    contract as ``kmeans_iteration``: each block rounds components to
    ``x * 2**frac_bits`` int64 and sums per group (exact associative
    integer partials → bit-identical across layouts and cluster
    sizes); the driver combines O(blocks × groups) partial rows with
    Python-int accumulation and divides once in float64. Rows with a
    null group or null vector are dropped (documented). Returns a
    pandas DataFrame (group_col, n, centroid: list[float64]) sorted by
    group."""
    import pandas as pd
    import ray

    scale = float(1 << frac_bits)

    def block_partials(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type
        mask = pc.and_(
            pc.is_valid(t.column(group_col)), pc.is_valid(t.column(vec_col))
        )
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], gtype),
                    "n": pa.array([], pa.int64()),
                    "sum_fp": pa.array([], pa.list_(pa.int64())),
                }
            )
        X = _embedding_matrix(t, vec_col)  # zero-copy flatten, float64
        fp = np.rint(X * scale).astype(np.int64)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        gs, fps = g[order], fp[order]
        starts = np.nonzero(np.r_[True, gs[1:] != gs[:-1]])[0]
        sums = np.add.reduceat(fps, starts, axis=0)
        ns = np.diff(np.r_[starts, len(gs)]).astype(np.int64)
        return pa.table(
            {
                group_col: pa.array(gs[starts], type=gtype),
                "n": pa.array(ns),
                "sum_fp": pa.array([row.tolist() for row in sums], pa.list_(pa.int64())),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(block_partials, batch_format="pyarrow", batch_size=None)
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    acc: dict = {}
    for t in parts:
        gv = t.column(group_col).to_pylist()
        nv = t.column("n").to_pylist()
        sv = t.column("sum_fp").to_pylist()
        for g, n, s in zip(gv, nv, sv):
            if g in acc:
                an, asum = acc[g]
                acc[g] = (an + n, [a + b for a, b in zip(asum, s)])
            else:
                acc[g] = (n, [int(x) for x in s])
    rows = []
    for g in sorted(acc):
        n, s = acc[g]
        rows.append(
            {
                group_col: g,
                "n": np.int64(n),
                "centroid": [float(x) / (scale * n) for x in s],
            }
        )
    return pd.DataFrame(rows)
