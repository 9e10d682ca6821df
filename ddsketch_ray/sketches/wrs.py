"""Weighted reservoir sample — Efraimidis & Spirakis A-Res (IPL 2006).

Keep the k items with the LARGEST key = ln(u)/w, where u ∈ (0,1) is
derived deterministically from the item id's hash (u = (splitmix64(id)
+ 0.5)/2⁶⁴ — the same SplitMix64 family as the KMV sketch, so the
oracle can recompute keys in exact mod-2⁶⁴ SQL). Items are included
with probability proportional to weight in the without-replacement
sense; w ≤ 0 / non-finite weights are excluded.

Mergeable: the top-k of a union is the top-k of the merged per-partition
top-ks, so this drops into the same AggregateFnV2 machinery as every
sketch here (training-data shape: "sample documents ∝ quality score").
Duplicate ids across rows dedupe to the id's best (largest-key)
occurrence — A-Res samples distinct ITEMS, not rows.

Reference contract parity: (init) → accumulate → merge → query, with a
row-serializable state (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np

from ddsketch_ray.hashing import hash_ints

_TWO64 = float(1 << 64)


class WeightedReservoir:
    __slots__ = ("k", "seed", "ids", "weights", "keys", "n_seen")

    def __init__(self, k: int = 64, seed: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.ids = np.empty(0, dtype=np.int64)
        self.weights = np.empty(0, dtype=np.float64)
        self.keys = np.empty(0, dtype=np.float64)
        self.n_seen = 0

    def _shrink(self) -> None:
        """Dedupe by id (keep the largest key) and keep the top-k keys;
        deterministic tie-break by ascending id."""
        if self.ids.size == 0:
            return
        # sort by (id asc, key desc) then keep first per id
        order = np.lexsort((-self.keys, self.ids))
        ids, keys, ws = self.ids[order], self.keys[order], self.weights[order]
        first = np.r_[True, ids[1:] != ids[:-1]]
        ids, keys, ws = ids[first], keys[first], ws[first]
        # top-k by key desc, ties by id asc
        sel = np.lexsort((ids, -keys))[: self.k]
        sel.sort()  # keep id-grouped layout irrelevant; stable storage
        self.ids, self.keys, self.weights = ids[sel], keys[sel], ws[sel]

    def accumulate(self, ids, weights) -> None:
        ids = np.asarray(ids, dtype=np.int64).ravel()
        w = np.asarray(weights, dtype=np.float64).ravel()
        ok = np.isfinite(w) & (w > 0)
        ids, w = ids[ok], w[ok]
        self.n_seen += int(ids.size)
        if ids.size == 0:
            return
        u = (hash_ints(ids, seed=self.seed).astype(np.float64) + 0.5) / _TWO64
        key = np.log(u) / w
        self.ids = np.concatenate([self.ids, ids])
        self.weights = np.concatenate([self.weights, w])
        self.keys = np.concatenate([self.keys, key])
        self._shrink()

    def merge(self, other: "WeightedReservoir") -> "WeightedReservoir":
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("k/seed mismatch")
        self.ids = np.concatenate([self.ids, other.ids])
        self.weights = np.concatenate([self.weights, other.weights])
        self.keys = np.concatenate([self.keys, other.keys])
        self.n_seen += other.n_seen
        self._shrink()
        return self

    def sample(self) -> tuple[np.ndarray, np.ndarray]:
        """(ids, weights) ordered by key desc (ties by id asc) — the
        without-replacement weighted sample."""
        order = np.lexsort((self.ids, -self.keys))
        return self.ids[order], self.weights[order]

    def to_row(self) -> dict:
        return {
            "kind": "wrs",
            "k": self.k,
            "seed": self.seed,
            "n_seen": self.n_seen,
            "ids": self.ids.copy(),
            "weights": self.weights.copy(),
            "keys": self.keys.copy(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "WeightedReservoir":
        sk = cls(k=int(row["k"]), seed=int(row["seed"]))
        sk.ids = np.asarray(row["ids"], dtype=np.int64).copy()
        sk.weights = np.asarray(row["weights"], dtype=np.float64).copy()
        sk.keys = np.asarray(row["keys"], dtype=np.float64).copy()
        sk.n_seen = int(row["n_seen"])
        return sk
