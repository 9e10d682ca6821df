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

from ddsketch_ray.functions.ann import _embedding_matrix
from ddsketch_ray.hashing import mix_seed

__all__ = ["kmeans_fit", "kmeans_assign"]


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
    import ray

    centroids = _bottomk_init(ds, vec_col, id_col, k, seed)
    kk, d = centroids.shape
    scale = float(2**frac_bits)
    history: list[float] = []
    counts = np.zeros(kk, dtype=np.int64)
    inertia_int = 0

    for _ in range(max(1, int(iters))):
        cref = ray.put(centroids)

        def block_partials(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
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
        counts = np.array(g_n, dtype=np.int64)
        inertia_int = sum(g_inert)
        history.append(float(inertia_int) / scale)
        new_c = centroids.copy()
        for ci in range(kk):
            if g_n[ci] > 0:
                new_c[ci] = np.array(
                    [(float(v) / scale) / float(g_n[ci]) for v in g_sum[ci]],
                    dtype=np.float64,
                )
        centroids = new_c

    return {
        "centroids": centroids,
        "counts": counts,
        "inertia": float(inertia_int) / scale,
        "history": history,
    }


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
