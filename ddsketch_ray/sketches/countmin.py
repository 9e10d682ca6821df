"""Count-min sketch + mergeable heavy-hitters (Cormode & Muthukrishnan 2005).

Frequency estimation over pre-hashed uint64 keys with the standard
``(ε, δ)`` guarantee: estimates overcount by at most ``ε·N`` with
probability ≥ 1−δ, where width = ⌈e/ε⌉ and depth = ⌈ln(1/δ)⌉. Row hashes
derive from one 64-bit key hash by double hashing (h1 + i·h2 mod width),
so accumulation stays fully vectorized.

``HeavyHitters`` pairs the CMS with a bounded candidate set (top keys seen
per partition); merge unions candidates and re-scores them against the
merged CMS. CMS never undercounts, so a candidate's merged score is always
an upper bound — but candidate RECALL is heuristic, not guaranteed: a key
spread thinly across many partitions can fall below every partition's
top-``capacity`` cut. In practice capacity ≫ k makes this vanishingly
rare; size ``capacity`` generously relative to partition count.
"""

from __future__ import annotations

import math

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class CountMin:
    __slots__ = ("width", "depth", "table", "n")

    def __init__(self, width: int = 2048, depth: int = 5):
        if width < 1 or depth < 1:
            raise ValueError("width and depth must be >= 1")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0

    @classmethod
    def from_error(cls, epsilon: float, delta: float) -> "CountMin":
        # width rounds UP to a power of two: the double-hash stride (odd
        # h2) is only full-period modulo 2^k; a shared factor with an
        # arbitrary width would correlate rows and weaken the δ guarantee
        w = int(math.ceil(math.e / epsilon))
        return cls(
            width=1 << max(1, (w - 1).bit_length()),
            depth=int(math.ceil(math.log(1.0 / delta))),
        )

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    def _row_indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices via double hashing."""
        h = np.asarray(h, dtype=np.uint64)
        h1 = h
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return (((h1[None, :] + i * h2[None, :]) & _MASK64) % np.uint64(self.width)).astype(
            np.int64
        )

    def add_hashed(self, hashes: np.ndarray, counts=1) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return
        c = np.broadcast_to(np.asarray(counts, dtype=np.int64), h.shape)
        idx = self._row_indices(h)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], c)
        self.n += int(c.sum())

    def add_array(self, values) -> None:
        self.add_hashed(values)

    def estimate_hashed(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        idx = self._row_indices(h)
        ests = self.table[np.arange(self.depth)[:, None], idx]
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("count-min dimension mismatch")
        self.table += other.table
        self.n += other.n
        return self

    def to_row(self) -> dict:
        return {
            "kind": "countmin",
            "width": self.width,
            "depth": self.depth,
            "n": self.n,
            "table": self.table.ravel().copy(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "CountMin":
        sk = cls(width=int(row["width"]), depth=int(row["depth"]))
        sk.table = np.asarray(row["table"], dtype=np.int64).reshape(sk.depth, sk.width).copy()
        sk.n = int(row["n"])
        return sk


class HeavyHitters:
    """CMS + bounded candidate set; query returns keys with est ≥ φ·N."""

    __slots__ = ("cms", "capacity", "candidates", "_hash_of")

    def __init__(self, width: int = 2048, depth: int = 5, capacity: int = 256):
        self.cms = CountMin(width=width, depth=depth)
        self.capacity = int(capacity)
        self.candidates: dict = {}  # key (str/int) -> uint64 hash
        self._hash_of = None

    def add_keyed(self, keys, hashes: np.ndarray, counts=1) -> None:
        """keys: python-accessible labels aligned with their uint64 hashes."""
        h = np.asarray(hashes, dtype=np.uint64)
        self.cms.add_hashed(h, counts)
        for k, hv in zip(keys, h.tolist()):
            self.candidates[k] = hv
        self._prune()

    def _prune(self) -> None:
        if len(self.candidates) <= self.capacity:
            return
        keys = list(self.candidates)
        hs = np.array([self.candidates[k] for k in keys], dtype=np.uint64)
        ests = self.cms.estimate_hashed(hs)
        # keep top-capacity by estimate; deterministic tie-break on key repr
        order = sorted(range(len(keys)), key=lambda i: (-int(ests[i]), str(keys[i])))
        self.candidates = {keys[i]: int(hs[i]) for i in order[: self.capacity]}

    def merge(self, other: "HeavyHitters") -> "HeavyHitters":
        self.cms.merge(other.cms)
        self.candidates.update(other.candidates)
        self._prune()
        return self

    def top_k(self, k: int = 10) -> list[tuple[object, int]]:
        keys = list(self.candidates)
        if not keys:
            return []
        hs = np.array([self.candidates[kk] for kk in keys], dtype=np.uint64)
        ests = self.cms.estimate_hashed(hs)
        order = sorted(range(len(keys)), key=lambda i: (-int(ests[i]), str(keys[i])))
        return [(keys[i], int(ests[i])) for i in order[:k]]

    def heavy_hitters(self, phi: float) -> list[tuple[object, int]]:
        thresh = phi * self.cms.n
        return [(k, c) for k, c in self.top_k(len(self.candidates)) if c >= thresh]

    def to_row(self) -> dict:
        import json

        keys = list(self.candidates)
        return {
            "kind": "heavy_hitters",
            "capacity": self.capacity,
            "cms": self.cms.to_row(),
            # JSON keeps int/str/float key types through a parquet
            # round-trip (str(k) would silently retype int keys)
            "cand_keys": json.dumps(keys),
            "cand_hashes": np.array([self.candidates[k] for k in keys], dtype=np.uint64),
        }

    @classmethod
    def from_row(cls, row: dict) -> "HeavyHitters":
        import json

        cms = CountMin.from_row(row["cms"])
        hh = cls(width=cms.width, depth=cms.depth, capacity=int(row["capacity"]))
        hh.cms = cms
        keys = row["cand_keys"]
        if isinstance(keys, str):
            keys = json.loads(keys)
        hh.candidates = {
            k: int(h) for k, h in zip(keys, np.asarray(row["cand_hashes"]))
        }
        return hh
