"""Deterministic distributed k-means tests (functions/cluster.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.cluster import kmeans_assign, kmeans_fit
from ddsketch_ray.hashing import mix_seed


def _emb_table(vecs, ids=None):
    vecs = np.asarray(vecs, dtype=np.float32)
    ids = ids if ids is not None else list(range(len(vecs)))
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())),
        }
    )


def _kmeans_reference(vecs, ids, k, iters, seed, frac_bits=20):
    """Sequential reference of the SAME quantized algorithm."""
    x = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    h = mix_seed(ids.view(np.uint64), seed)
    order = np.argsort(h, kind="stable")[:k]
    c = x[order].copy()
    scale = float(2**frac_bits)
    counts = None
    inertia = None
    for _ in range(iters):
        d2 = (
            np.einsum("ij,ij->i", x, x)[:, None]
            - 2.0 * (x @ c.T)
            + np.einsum("ij,ij->i", c, c)[None, :]
        )
        a = np.argmin(d2, axis=1)
        dmin = np.maximum(d2[np.arange(len(a)), a], 0.0)
        xq = np.round(x * scale).astype(np.int64)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        inertia = int(np.round(dmin * scale).astype(np.int64).sum())
        for ci in range(k):
            m = a == ci
            if m.any():
                s = xq[m].sum(axis=0, dtype=np.int64)
                c[ci] = (s.astype(np.float64) / scale) / float(m.sum())
    return c, counts, float(inertia) / scale


def test_kmeans_matches_reference_across_layouts(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16))
    vecs = np.concatenate([centers[i % 4] + 0.1 * rng.normal(size=16) for i in range(120)]).reshape(
        120, 16
    )
    ids = list(range(120))
    want_c, want_n, want_i = _kmeans_reference(vecs, ids, k=4, iters=4, seed=3)

    results = []
    for parts in (1, 5, 16):
        ds = rd.from_arrow(_emb_table(vecs, ids)).repartition(parts)
        fit = kmeans_fit(ds, k=4, iters=4, seed=3)
        results.append(fit)
    for fit in results:
        # bit-identical across layouts AND vs the sequential reference
        assert np.array_equal(fit["centroids"], want_c)
        assert np.array_equal(fit["counts"], want_n)
        assert fit["inertia"] == want_i
    assert results[0]["history"] == results[1]["history"] == results[2]["history"]


def test_kmeans_inertia_non_increasing(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(200, 8))
    ds = rd.from_arrow(_emb_table(vecs)).repartition(7)
    fit = kmeans_fit(ds, k=6, iters=6, seed=0)
    h = fit["history"]
    # Lloyd's monotonicity (quantization perturbs by <= 2^-frac_bits per term)
    for a, b in zip(h, h[1:]):
        assert b <= a + 1e-6
    assert fit["counts"].sum() == 200


def test_kmeans_assign_consistent_with_fit(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(90, 12))
    ds = rd.from_arrow(_emb_table(vecs)).repartition(4)
    fit = kmeans_fit(ds, k=3, iters=3, seed=1)
    # assignment under the PRE-update centroids of the last iteration is
    # what counts describe; assigning with final centroids is the user
    # surface — sizes must still total N and clusters be in range
    out = kmeans_assign(ds, fit["centroids"], out_col="cluster").to_pandas()
    assert len(out) == 90
    assert set(out["cluster"].unique()) <= {0, 1, 2}


def test_kmeans_separated_clusters_recovered(ray_session):
    import ray.data as rd

    # far-apart blobs: every blob becomes one cluster regardless of init
    blobs = []
    for i in range(3):
        blobs.append(np.full((10, 4), 100.0 * i) + 0.01 * np.arange(40).reshape(10, 4))
    vecs = np.concatenate(blobs)
    ds = rd.from_arrow(_emb_table(vecs)).repartition(3)
    fit = kmeans_fit(ds, k=3, iters=5, seed=0)
    assert sorted(fit["counts"].tolist()) == [10, 10, 10]
    # within-blob spread only (blob separation is 100 per dim)
    assert fit["inertia"] < 5.0


def test_kmeans_empty_dataset_raises(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_emb_table(np.zeros((0, 4))))
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=2, iters=1)


def test_kmeans_checkpoint_resume_bit_identical(ray_session, tmp_path):
    import ray.data as rd

    from ddsketch_ray.functions.cluster import kmeans_fit, kmeans_fit_checkpointed

    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(150, 8))
    ds = rd.from_arrow(_emb_table(vecs)).repartition(5)
    cold = kmeans_fit(ds, k=4, iters=4, seed=2)

    ck = str(tmp_path / "km")
    first = kmeans_fit_checkpointed(ds, ck, k=4, iters=2, seed=2)
    assert first["resumed_from_iteration"] == 0 and first["iterations_run"] == 2
    resumed = kmeans_fit_checkpointed(ds, ck, k=4, iters=4, seed=2)
    assert resumed["resumed_from_iteration"] == 2
    assert resumed["iterations_run"] == 2
    assert np.array_equal(resumed["centroids"], cold["centroids"])
    assert np.array_equal(resumed["counts"], cold["counts"])
    assert resumed["inertia"] == cold["inertia"]

    # fully-complete checkpoint: zero work on re-run
    again = kmeans_fit_checkpointed(ds, ck, k=4, iters=4, seed=2)
    assert again["iterations_run"] == 0
    assert np.array_equal(again["centroids"], cold["centroids"])

    # parameter mismatch refuses to resume
    with pytest.raises(ValueError):
        kmeans_fit_checkpointed(ds, ck, k=4, iters=4, seed=99)
