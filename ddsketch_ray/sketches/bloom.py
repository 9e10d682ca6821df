"""Bloom filter (Bloom 1970) over pre-hashed uint64 keys.

Bit array packed into uint64 words; k probe positions per key via double
hashing (Kirsch & Mitzenmacher 2006: h1 + i·h2 is as good as k independent
hashes). Merge = bitwise OR (same geometry required). Sized from
(capacity, fp_rate): m = ⌈−n ln p / ln²2⌉, k = max(1, round(m/n·ln 2)).
"""

from __future__ import annotations

import math

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class BloomFilter:
    __slots__ = ("m", "k", "words", "n_added")

    def __init__(self, m: int, k: int):
        if m < 64 or k < 1:
            raise ValueError("m must be >= 64 and k >= 1")
        self.m = int(m)
        self.k = int(k)
        self.words = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def from_capacity(cls, capacity: int, fp_rate: float = 0.01) -> "BloomFilter":
        m = max(64, int(math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2))))
        k = max(1, round(m / capacity * math.log(2)))
        return cls(m=m, k=k)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        h1 = h
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (((h1[None, :] + i * h2[None, :]) & _MASK64) % np.uint64(self.m)).astype(np.int64)

    def add_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        self.n_added += int(h.size)

    def add_array(self, values) -> None:
        self.add_hashed(values)

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        pos = self._positions(h)  # (k, n)
        bits = (self.words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("bloom geometry mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    def fill_ratio(self) -> float:
        # denominator is m, not the padded word capacity: positions are
        # always < m, so the tail padding bits can never be set
        return float(np.unpackbits(self.words.view(np.uint8)).sum()) / self.m

    def to_row(self) -> dict:
        return {
            "kind": "bloom",
            "m": self.m,
            "k": self.k,
            "n_added": self.n_added,
            "words": self.words.copy(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "BloomFilter":
        sk = cls(m=int(row["m"]), k=int(row["k"]))
        sk.words = np.asarray(row["words"], dtype=np.uint64).copy()
        sk.n_added = int(row["n_added"])
        return sk


class CountingBloomFilter:
    """Counting Bloom filter (Fan et al., "Summary Cache", 1998/2000):
    int64 counters instead of bits, so DELETES are supported — the
    membership analogue of the reference's delete-stream family
    (``DDS_DeleteCollapse*`` subtracts bucket counts; this subtracts
    probe counts). Same double-hash probe geometry as BloomFilter.

    - ``add_hashed(h, counts)`` adds ``counts`` (may be NEGATIVE — a
      delete is just a negative-weight insert, so a turnstile stream is
      ONE distributed pass over a signed-weight union);
    - membership: all k probe counters > 0;
    - merge = counter addition — associative, commutative, so the
      distributed build is bit-identical to any sequential order;
    - deleting a never-inserted key can drive counters negative; that
      is the caller's contract violation and is kept visible (the
      reference preserves its n-decrement quirk the same way), not
      masked.

    If the same key's k probes collide (i≠j landing on one position)
    the counter takes the weight twice — mirrored exactly by the SQL
    oracle (positions are NOT deduplicated, unlike the bit Bloom where
    OR makes duplicates invisible)."""

    __slots__ = ("m", "k", "counters", "n_added")

    def __init__(self, m: int, k: int):
        if m < 64 or k < 1:
            raise ValueError("m must be >= 64 and k >= 1")
        self.m = int(m)
        self.k = int(k)
        self.counters = np.zeros(self.m, dtype=np.int64)
        self.n_added = 0

    @classmethod
    def from_capacity(cls, capacity: int, fp_rate: float = 0.01) -> "CountingBloomFilter":
        m = max(64, int(math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2))))
        k = max(1, round(m / capacity * math.log(2)))
        return cls(m=m, k=k)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (((h[None, :] + i * h2[None, :]) & _MASK64) % np.uint64(self.m)).astype(
            np.int64
        )

    def add_hashed(self, hashes: np.ndarray, counts=1) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return
        c = np.broadcast_to(np.asarray(counts, dtype=np.int64), h.shape)
        pos = self._positions(h)  # (k, n)
        np.add.at(self.counters, pos.ravel(), np.broadcast_to(c, pos.shape).ravel())
        self.n_added += int(c.sum())

    def delete_hashed(self, hashes: np.ndarray, counts=1) -> None:
        self.add_hashed(hashes, -np.asarray(counts, dtype=np.int64))

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        pos = self._positions(h)
        return (self.counters[pos] > 0).all(axis=0)

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("counting-bloom geometry mismatch")
        self.counters += other.counters
        self.n_added += other.n_added
        return self

    def to_row(self) -> dict:
        return {
            "kind": "counting_bloom",
            "m": self.m,
            "k": self.k,
            "n_added": self.n_added,
            "counters": self.counters.copy(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "CountingBloomFilter":
        sk = cls(m=int(row["m"]), k=int(row["k"]))
        sk.counters = np.asarray(row["counters"], dtype=np.int64).copy()
        sk.n_added = int(row["n_added"])
        return sk
