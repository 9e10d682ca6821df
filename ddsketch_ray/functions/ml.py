"""Deterministic distributed linear-model training.

``logreg_fit`` — full-batch gradient-descent logistic regression over a
Dataset, the trainer behind corpus quality classifiers (fastText-style
quality gates, contamination detectors): features are cheap per-doc
statistics, labels are rule-derived, and the model must be
REPRODUCIBLE — retraining on the same corpus at any cluster size must
give the same bytes.

Determinism contract (same as ``cluster.kmeans_fit``): each block
rounds its per-row gradient contributions to ``x * 2**frac_bits`` int64
and sums (exact associative integer partials); the driver combines the
O(blocks × (d+1)) partial rows with Python-int accumulation and applies
the float update once per iteration. Output = pure function of the
input multiset — bit-identical across block layouts and cluster sizes.

Magnitude contract: |per-row gradient| ≤ 1 per feature unit (sigmoid
residual is in [-1, 1]), so features should be pre-scaled to O(1-100)
— the per-block int64 partial then holds corpora up to ~2^43 rows per
block at frac_bits=20.

No reference counterpart (gmorleo/DDSketch — SURVEY.md §2.3); this is
the training-pipeline/north-rule model-fitting slot alongside k-means.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_iteration(ds, w: np.ndarray, feature_cols, label_col: str, frac_bits: int = 20):
    """One full-batch gradient evaluation at weights ``w`` (bias last).
    Returns (grad: float64[d+1], n_rows, loss_fp_sum: int) — all exact
    integer combines of per-block fixed-point partials."""
    import ray

    feature_cols = list(feature_cols)
    d = len(feature_cols)
    scale = float(1 << frac_bits)
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def block_partials(t: pa.Table) -> pa.Table:
        ww = ray.get(wref)
        if t.num_rows == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "loss_fp": pa.array([], pa.int64()),
                    "grad_fp": pa.array([], pa.list_(pa.int64())),
                }
            )
        X = np.column_stack(
            [t.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False) for c in feature_cols]
        )
        y = t.column(label_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        z = X @ ww[:d] + ww[d]
        p = _sigmoid(z)
        resid = p - y  # in [-1, 1]
        # per-ROW fixed-point rounding, then exact int sums (the
        # kmeans_iteration contract: layout cannot change the result)
        gx = np.rint(resid[:, None] * X * scale).astype(np.int64).sum(axis=0)
        gb = int(np.rint(resid * scale).astype(np.int64).sum())
        # stable log-loss: log(1+e^-|z|) + max(z,0) - z*y. Written as
        # ln(1+x), NOT log1p: DuckDB has no log1p, and the SQL oracle
        # must replay this expression bit-for-bit (e^-|z| <= 1, so the
        # 1+x form loses no meaningful precision here)
        ll = np.log(1.0 + np.exp(-np.abs(z))) + np.maximum(z, 0.0) - z * y
        lfp = int(np.rint(ll * scale).astype(np.int64).sum())
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "loss_fp": pa.array([lfp], pa.int64()),
                "grad_fp": pa.array([np.r_[gx, gb].tolist()], pa.list_(pa.int64())),
            }
        )

    parts = [
        tb
        for tb in ray.get(
            ds.map_batches(block_partials, batch_format="pyarrow", batch_size=None)
            .materialize()
            .to_arrow_refs()
        )
        if tb.num_rows
    ]
    n = 0
    loss_fp = 0
    grad_i = [0] * (d + 1)
    for tb in parts:
        n += sum(tb.column("n").to_pylist())
        loss_fp += sum(tb.column("loss_fp").to_pylist())
        for row in tb.column("grad_fp").to_pylist():
            for j, v in enumerate(row):
                grad_i[j] += int(v)
    grad = np.array([float(g) / scale for g in grad_i], dtype=np.float64)
    return grad, n, loss_fp


def logreg_fit(
    ds,
    feature_cols,
    label_col: str,
    iters: int = 20,
    lr: float = 0.1,
    frac_bits: int = 20,
):
    """Full-batch GD logistic regression; weights init 0. Returns
    {"weights": float64[d], "bias": float, "n": int, "loss": float}
    (loss = mean log-loss at the FINAL weights). Bit-identical across
    layouts/cluster sizes; empty dataset raises."""
    feature_cols = list(feature_cols)
    d = len(feature_cols)
    w = np.zeros(d + 1, dtype=np.float64)
    n = 0
    for _ in range(int(iters)):
        grad, n, _ = logreg_iteration(ds, w, feature_cols, label_col, frac_bits)
        if n == 0:
            raise ValueError("logreg_fit: empty dataset")
        w = w - lr * grad / float(n)
    _, n, loss_fp = logreg_iteration(ds, w, feature_cols, label_col, frac_bits)
    return {
        "weights": w[:d].copy(),
        "bias": float(w[d]),
        "n": int(n),
        "loss": float(loss_fp) / float(1 << frac_bits) / float(n),
    }


def logreg_fit_checkpointed(
    ds,
    ckpt_dir: str,
    feature_cols,
    label_col: str,
    iters: int = 20,
    lr: float = 0.1,
    frac_bits: int = 20,
    input_desc: str = "",
) -> dict:
    """``logreg_fit`` with per-ITERATION weight checkpoints (the
    ``kmeans_fit_checkpointed`` shape): after each gradient step the
    weight vector lands atomically in ``{ckpt_dir}/weights-{i:04d}.
    parquet`` with lineage metadata; a re-run resumes from the highest
    complete iteration ≤ ``iters`` and — every iteration being a pure
    function of (input multiset, weights) — is BIT-IDENTICAL to a cold
    run. Parameter mismatches refuse to resume. Returns the fit dict
    plus ``resumed_from_iteration`` / ``iterations_run``."""
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    feature_cols = list(feature_cols)
    d = len(feature_cols)
    _os.makedirs(ckpt_dir, exist_ok=True)
    params = {
        "feature_cols": feature_cols,
        "label_col": label_col,
        "lr": float(lr),
        "frac_bits": int(frac_bits),
        "input_desc": input_desc,
    }

    def _path(i: int) -> str:
        return _os.path.join(ckpt_dir, f"weights-{i:04d}.parquet")

    def _write(i: int, w: np.ndarray) -> None:
        t = pa.table({"j": pa.array(np.arange(d + 1, dtype=np.int64)),
                      "w": pa.array(w.tolist(), pa.float64())})
        meta = dict(params, iteration=i)
        t = t.replace_schema_metadata({b"ddsr_logreg": _json.dumps(meta).encode()})
        tmp = _path(i) + ".tmp"
        _pq.write_table(t, tmp)
        _os.replace(tmp, _path(i))

    def _load(i: int) -> np.ndarray:
        t = _pq.read_table(_path(i))
        meta = _json.loads(t.schema.metadata[b"ddsr_logreg"].decode())
        for key, want in params.items():
            if key == "input_desc":
                continue
            if meta.get(key) != want:
                raise ValueError(
                    f"checkpoint {_path(i)} was written with {key}={meta.get(key)!r}, "
                    f"this run uses {want!r} — refusing to resume"
                )
        return np.array(t.column("w").to_pylist(), dtype=np.float64)

    done = sorted(
        int(f[len("weights-"):-len(".parquet")])
        for f in _os.listdir(ckpt_dir)
        if f.startswith("weights-") and f.endswith(".parquet")
    )
    start = max((i for i in done if i <= iters), default=-1)
    if start >= 0:
        w = _load(start)
    else:
        w = np.zeros(d + 1, dtype=np.float64)
        _write(0, w)
        start = 0
    n = 0
    for i in range(start, int(iters)):
        grad, n, _ = logreg_iteration(ds, w, feature_cols, label_col, frac_bits)
        if n == 0:
            raise ValueError("logreg_fit_checkpointed: empty dataset")
        w = w - lr * grad / float(n)
        _write(i + 1, w)
    _, n, loss_fp = logreg_iteration(ds, w, feature_cols, label_col, frac_bits)
    return {
        "weights": w[:d].copy(),
        "bias": float(w[d]),
        "n": int(n),
        "loss": float(loss_fp) / float(1 << frac_bits) / float(n),
        "resumed_from_iteration": int(start),
        "iterations_run": int(iters) - int(start),
    }


def logreg_score_batch(
    batch: pa.Table, feature_cols, weights, bias: float, out_col: str = "score"
) -> pa.Table:
    """Apply a (possibly externally trained) logistic model as a pure
    vectorized map — the quality-gate scoring pass. The dot product is
    evaluated in EXPLICIT left-to-right order (z = ((b + x0·w0) + x1·w1)
    + ...), not BLAS order, so a SQL oracle mirroring the same
    parenthesization is bit-identical; the sigmoid uses the stable
    two-branch form, also mirrored (CASE WHEN z >= 0 ...)."""
    feature_cols = list(feature_cols)
    w = np.asarray(weights, dtype=np.float64)
    z = np.full(batch.num_rows, float(bias), dtype=np.float64)
    for c, wc in zip(feature_cols, w):
        x = batch.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
        z = z + x * wc
    return batch.append_column(out_col, pa.array(_sigmoid(z)))
