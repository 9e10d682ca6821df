"""KLL rank sketch (Karnin, Lang & Liberty, FOCS 2016).

Uniform-rank-error quantile sketch: additive rank error O(1/k) with
geometrically-shrinking level capacities (c = 2/3). The classic algorithm
flips a fair coin per compaction to pick even/odd survivors; here the coin
is a deterministic hash of (seed, level, compaction counter) so that runs
are reproducible across processes and Ray tasks — a documented divergence:
the expectation guarantees of the paper then hold over the hash-derived
coin sequence, and merge results depend (boundedly) on merge order, like
every compacting sketch in this library (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from ddsketch_ray.hashing import splitmix64

_C = 2.0 / 3.0


class KLL:
    __slots__ = ("k", "seed", "levels", "n", "compactions")

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.compactions = 0

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def add_array(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compact()

    def _coin(self, level: int) -> int:
        bits = ((self.seed & 0xFFFFFFFF) ^ (level << 32) ^ (self.compactions << 40)) & 0xFFFFFFFFFFFFFFFF
        mix = splitmix64(np.uint64(bits))
        return int(mix & np.uint64(1))

    def _compact(self) -> None:
        changed = True
        while changed:
            changed = False
            for level in range(len(self.levels)):
                size = self.levels[level].size
                if size < self._capacity(level) or size < 2:
                    continue
                arr = np.sort(self.levels[level], kind="stable")
                start = self._coin(level)
                self.compactions += 1
                even = size - (size % 2)  # compact pairs; odd leftover stays
                promoted = arr[start:even:2]
                self.levels[level] = arr[even:].copy()
                if level + 1 >= len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[level + 1] = np.concatenate(
                    [self.levels[level + 1], promoted]
                )
                changed = True
                break

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for lv, arr in enumerate(other.levels):
            if arr.size:
                self.levels[lv] = np.concatenate([self.levels[lv], arr])
        self.n += other.n
        self.compactions += other.compactions + 1  # decorrelate coins
        self._compact()
        return self

    def _weighted(self):
        vals, wts = [], []
        for lv, arr in enumerate(self.levels):
            if arr.size:
                vals.append(arr)
                wts.append(np.full(arr.size, 1 << lv, dtype=np.int64))
        if not vals:
            return None, None
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        qs = np.clip(np.asarray(qs, dtype=np.float64), 0.0, 1.0)
        v, w = self._weighted()
        if v is None:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(w)
        total = cum[-1]
        stops = qs * (total - 1)
        idx = np.minimum(np.searchsorted(cum, stops, side="right"), v.size - 1)
        return v[idx]

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        v, w = self._weighted()
        if v is None:
            return float("nan")
        total = w.sum()
        return float(w[v <= value].sum() / total)

    def to_row(self) -> dict:
        return {
            "kind": "kll",
            "k": self.k,
            "seed": self.seed,
            "n": self.n,
            "compactions": self.compactions,
            "level_sizes": np.array([a.size for a in self.levels], dtype=np.int64),
            "items": np.concatenate([a for a in self.levels])
            if any(a.size for a in self.levels)
            else np.empty(0),
        }

    @classmethod
    def from_row(cls, row: dict) -> "KLL":
        sk = cls(k=int(row["k"]), seed=int(row["seed"]))
        sk.n = int(row["n"])
        sk.compactions = int(row["compactions"])
        sizes = np.asarray(row["level_sizes"], dtype=np.int64)
        items = np.asarray(row["items"], dtype=np.float64)
        sk.levels = []
        pos = 0
        for s in sizes.tolist():
            sk.levels.append(items[pos : pos + s].copy())
            pos += s
        if not sk.levels:
            sk.levels = [np.empty(0, dtype=np.float64)]
        return sk
