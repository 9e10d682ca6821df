"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
using t-digests", 2019) — the K1 (arcsine) scale function variant.

Alternative quantile sketch to DDSketch with *rank-space* accuracy
(tightest at the tails) rather than relative-value accuracy. Same
mergeable contract: add_array / merge / quantile / to_row.

Buffered accumulation: values collect in a buffer and are folded into the
centroid list by a single sorted greedy pass when the buffer fills; merge
concatenates centroid lists and re-compresses. Compression is deterministic
given the input multiset order produced by a stable sort; merge results can
differ slightly by merge order (rank-error bound still holds — same caveat
as the reference's γ²-collapse order dependence, SURVEY.md §4).
"""

from __future__ import annotations

import math

import numpy as np

_BUFFER_LIMIT = 8192


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf", "_buf_n", "n", "vmin", "vmax")

    def __init__(self, delta: int = 200):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.n = 0
        self.vmin = math.inf
        self.vmax = -math.inf

    def _k(self, q: np.ndarray) -> np.ndarray:
        # K1 scale: k(q) = δ/(2π)·asin(2q−1)
        return self.delta / (2 * math.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def add_array(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self.n += int(v.size)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._buf.append(v)
        self._buf_n += v.size
        if self._buf_n >= _BUFFER_LIMIT:
            self._flush()

    def _flush(self) -> None:
        if self._buf_n == 0:
            return
        v = np.concatenate(self._buf)
        self._buf, self._buf_n = [], 0
        means = np.concatenate([self.means, v])
        weights = np.concatenate([self.weights, np.ones(v.size, dtype=np.int64)])
        self.means, self.weights = self._compress(means, weights)

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        """Vectorized k-cell compression: points whose LEFT cumulative
        quantile falls in the same unit cell of the K1 scale merge into
        one centroid (numpy reduceat; no per-centroid Python). Same
        k-size invariant as the greedy pass — a cluster spans < 1 unit
        of k plus its last point — with ≤ δ/2 + 2 centroids."""
        order = np.argsort(means, kind="stable")
        m, w = means[order].astype(np.float64), weights[order].astype(np.int64)
        total = float(w.sum())
        q_left = (np.cumsum(w) - w) / total
        kcell = np.floor(self._k(q_left)).astype(np.int64)
        bounds = np.nonzero(np.diff(kcell))[0] + 1
        seg_starts = np.concatenate([[0], bounds])
        out_w = np.add.reduceat(w, seg_starts)
        out_m = np.add.reduceat(m * w, seg_starts) / out_w
        return out_m, out_w.astype(np.int64)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("delta mismatch")
        other._flush()
        self._flush()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self.means, self.weights = self._compress(self.means, self.weights)
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        return self

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        self._flush()
        qs = np.clip(np.asarray(qs, dtype=np.float64), 0.0, 1.0)
        if self.n == 0 or self.means.size == 0:
            return np.full(qs.shape, np.nan)
        w = self.weights.astype(np.float64)
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        targets = qs * self.n
        out = np.interp(targets, cum, self.means)
        # clamp into observed range; exact at the extremes
        out = np.clip(out, self.vmin, self.vmax)
        out[qs <= 0] = self.vmin
        out[qs >= 1] = self.vmax
        return out

    def to_row(self) -> dict:
        self._flush()
        return {
            "kind": "tdigest",
            "delta": self.delta,
            "n": self.n,
            "vmin": self.vmin,
            "vmax": self.vmax,
            "means": self.means.copy(),
            "weights": self.weights.copy(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "TDigest":
        sk = cls(delta=int(row["delta"]))
        sk.means = np.asarray(row["means"], dtype=np.float64).copy()
        sk.weights = np.asarray(row["weights"], dtype=np.int64).copy()
        sk.n = int(row["n"])
        sk.vmin = float(row["vmin"])
        sk.vmax = float(row["vmax"])
        return sk
