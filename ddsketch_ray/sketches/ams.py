"""AMS "tug-of-war" sketch — F2 (self-join size) and inner-product
(equi-join size) estimation without paying any shuffle.

Alon, Matias & Szegedy, "The space complexity of approximating the
frequency moments" (STOC 1996) + Alon, Gibbons, Matias & Szegedy
(PODS 1999) for join-size estimation: R independent sign hashes, each
folded into B counters; ``F2 ≈ median_r Σ_b C[r,b]²`` and
``|A ⋈ B| ≈ median_r Σ_b Ca[r,b]·Cb[r,b]``. The sketch is a tiny
(R × B int64) array, merge = elementwise add (associative/commutative
→ bit-identical distributed results), so a query planner can estimate
a join's output size from two cheap streaming passes before deciding
bucket counts / salting for the real ``equi_join_shuffle``.

Hash family mirrors the repo convention (SplitMix64 per row-seed:
``h_r = splitmix64(k ^ splitmix64(seed + r))``; bucket = low bits,
sign = top bit), so a DuckDB oracle recomputes every counter in
mod-2^64 SQL and the estimates match bit-for-bit.

No reference counterpart (gmorleo/DDSketch is quantiles-only) — this
fills the join-size-estimation slot of the north rule's sketch library.
"""

from __future__ import annotations

import numpy as np

from ddsketch_ray.hashing import splitmix64

_U64 = np.uint64


class AMSSketch:
    __slots__ = ("rows", "buckets", "seed", "counters")

    def __init__(self, rows: int = 9, buckets: int = 512, seed: int = 0):
        if rows < 1 or rows % 2 == 0:
            raise ValueError("rows must be odd (median of estimates)")
        if buckets < 2:
            raise ValueError("buckets must be >= 2")
        self.rows = int(rows)
        self.buckets = int(buckets)
        self.seed = int(seed)
        self.counters = np.zeros((self.rows, self.buckets), dtype=np.int64)

    def add_hashed(self, keys_u64: np.ndarray) -> None:
        """Vectorized insert of pre-hashed (or raw uint64) keys, one
        count each. ``keys_u64`` are the RAW key values viewed as
        uint64 — the per-row hash is applied here (so the SQL oracle
        can recompute it from the column values)."""
        k = np.asarray(keys_u64, dtype=_U64)
        if k.size == 0:
            return
        for r in range(self.rows):
            h = splitmix64(k ^ splitmix64(np.uint64(self.seed + r)))
            b = (h % _U64(self.buckets)).astype(np.int64)
            sign = np.where((h >> _U64(63)).astype(bool), -1.0, 1.0)
            self.counters[r] += np.bincount(
                b, weights=sign, minlength=self.buckets
            ).astype(np.int64)

    def merge(self, other: "AMSSketch") -> "AMSSketch":
        if (self.rows, self.buckets, self.seed) != (other.rows, other.buckets, other.seed):
            raise ValueError("AMS parameter mismatch")
        self.counters += other.counters
        return self

    def f2(self) -> float:
        """Second frequency moment (self-join size) estimate."""
        ests = (self.counters.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(ests))

    def inner_product(self, other: "AMSSketch") -> float:
        """Equi-join output-size estimate: Σ_k count_a(k)·count_b(k)."""
        if (self.rows, self.buckets, self.seed) != (other.rows, other.buckets, other.seed):
            raise ValueError("AMS parameter mismatch")
        ests = (self.counters.astype(np.float64) * other.counters.astype(np.float64)).sum(axis=1)
        return float(np.median(ests))

    def copy(self) -> "AMSSketch":
        out = AMSSketch(self.rows, self.buckets, self.seed)
        out.counters = self.counters.copy()
        return out
