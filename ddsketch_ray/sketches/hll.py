"""HyperLogLog distinct-count sketch (Flajolet et al. 2007).

Mergeable cardinality estimator over pre-hashed uint64 values, following the
same accumulate/merge/query contract as the DDSketch core (the reference's
``DDS_*`` shape, ``/root/reference/ddsketch.h:58-252``). Standard error is
``1.04/sqrt(2^p)`` (~0.81% at the default p=14, 16 KiB of state).

64-bit-hash variant: no large-range correction needed; linear counting for
the small range (classic small-range correction).
"""

from __future__ import annotations

import numpy as np

from ddsketch_ray.hashing import clz64


def _alpha_m(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError(f"p must be in [4,18], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @property
    def relative_error(self) -> float:
        return 1.04 / (self.m**0.5)

    def add_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = (h << np.uint64(self.p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        rho = np.minimum(clz64(w) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def add_array(self, values) -> None:
        """Accepts pre-hashed uint64; hash strings/ints upstream."""
        self.add_hashed(values)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError(f"precision mismatch: {self.p} vs {other.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        # Σ 2^-reg computed EXACTLY as a big integer of 2^-64 units
        # (each term 2^(64-reg) — reg ≤ 64 — summed without rounding),
        # then ONE float conversion + scale. Order-independent, so an
        # independent SQL oracle's unordered SUM reproduces the same
        # double bit-for-bit (a float-accumulated np.sum would differ
        # from SQL in the last ulp depending on summation order).
        counts = np.bincount(self.registers, minlength=1)
        s_num = 0
        for r, c in enumerate(counts):
            if c:
                s_num += int(c) << (64 - r)
        s = float(s_num) * 2.0**-64
        raw = _alpha_m(m) * m * m / s
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros > 0:
                return m * float(np.log(m / zeros))
        return float(raw)

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    def to_row(self) -> dict:
        return {"kind": "hll", "p": self.p, "registers": self.registers.copy()}

    @classmethod
    def from_row(cls, row: dict) -> "HyperLogLog":
        sk = cls(p=int(row["p"]))
        sk.registers = np.asarray(row["registers"], dtype=np.uint8).copy()
        return sk

    def __repr__(self) -> str:  # pragma: no cover
        return f"HyperLogLog(p={self.p}, est={self.cardinality()})"
