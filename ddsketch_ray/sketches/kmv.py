"""KMV (k-minimum-values) sketch: deterministic bottom-k distinct sample
+ distinct-count estimator.

Bar-Yossef et al., "Counting distinct elements in a data stream"
(RANDOM 2002) and Beyer et al., "On synopses for distinct-value
estimation under multiset operations" (SIGMOD 2007): keep the k smallest
64-bit hashes of the distinct values; the k-th smallest normalized hash
U_(k) estimates distinct count as (k-1)/U_(k).

Two properties make this the most checkable sketch in the library:

- the merge is a set union followed by bottom-k — fully order-
  independent, so the distributed result is bit-identical to any
  sequential run;
- the kept SAMPLE is itself useful: "bottom-k by a fixed hash" is a
  deterministic, mergeable, uniform distinct-sample of the column (the
  classic coordinated-sampling trick), and because ``hash_ints`` is
  plain SplitMix64 the exact same bottom-k can be recomputed by a
  DuckDB oracle in mod-2^64 SQL arithmetic — an approximate sketch
  with an EXACT end-to-end SQL oracle.

Unlike the reference's DDSketch (no sample semantics) this has no
reference counterpart; it fills the north rule's "sampling" slot
(SURVEY.md §2.3: sorts/limits/top-k/sampling).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_TWO64 = 18446744073709551616.0  # 2^64, exact in float64


class KMV:
    """Bottom-k distinct sample over pre-hashed uint64 keys.

    Stores (hash, value) pairs for the k smallest distinct hashes;
    ``values`` preserves the original column values so the sample is
    directly usable (ids to audit, keys to coordinate samples across
    tables)."""

    __slots__ = ("k", "hashes", "values")

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError("KMV needs k >= 2 for the (k-1)/U_(k) estimator")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=_U64)
        self.values = np.empty(0, dtype=object)

    def add_hashed(self, hashes: np.ndarray, values: np.ndarray) -> None:
        """Vectorized insert of a batch of (hash, value) pairs."""
        h = np.asarray(hashes, dtype=_U64)
        if h.size == 0:
            return
        v = np.asarray(values, dtype=object)
        all_h = np.concatenate([self.hashes, h])
        all_v = np.concatenate([self.values, v])
        # unique on hash keeps the first occurrence per hash (identical
        # values hash identically; a 64-bit cross-value collision keeps
        # one representative deterministically via the stable sort)
        order = np.argsort(all_h, kind="stable")
        all_h, all_v = all_h[order], all_v[order]
        keep = np.ones(len(all_h), dtype=bool)
        keep[1:] = all_h[1:] != all_h[:-1]
        all_h, all_v = all_h[keep], all_v[keep]
        self.hashes = all_h[: self.k]
        self.values = all_v[: self.k]

    def merge(self, other: "KMV") -> "KMV":
        """Set-union bottom-k — associative, commutative, idempotent."""
        if self.k != other.k:
            raise ValueError(f"KMV k mismatch: {self.k} vs {other.k}")
        self.add_hashed(other.hashes, other.values)
        return self

    @property
    def size(self) -> int:
        return len(self.hashes)

    def estimate_distinct(self) -> float:
        """(k-1)/U_(k) when saturated; exact count below saturation."""
        if self.size < self.k:
            return float(self.size)
        hk = float(self.hashes[-1])  # k-th smallest (arrays stay sorted)
        if hk == 0.0:
            return float(self.size)
        return (self.k - 1) * _TWO64 / hk

    def sample(self) -> np.ndarray:
        """The bottom-k values, ordered by hash (the canonical sample
        order — stable across any partitioning/merge order)."""
        return self.values.copy()

    def copy(self) -> "KMV":
        out = KMV(self.k)
        out.hashes = self.hashes.copy()
        out.values = self.values.copy()
        return out

def kmv_set_ops(a: KMV, b: KMV) -> dict:
    """Multiset-operation estimates from two same-k KMV sketches
    (Beyer et al., SIGMOD 2007 §4): merge to the union bottom-k M, then
    every estimate is (membership fraction within M) × |A∪B| estimate.

    Returns a dict:
      ``k_used``        — |M| (== k when saturated; below that every
                          number is EXACT because the sketches are the
                          full distinct sets),
      ``n_both/n_only_a/n_only_b`` — membership counts within M,
      ``est_union``     — (k-1)/U_(k) union estimate,
      ``est_intersection/est_diff_a/est_diff_b`` — fraction × union,
      ``jaccard``       — n_both / |M|.

    Deterministic given the hash (SplitMix64 is a uint64 bijection, so
    distinct values never tie) — every output is reproducible by a SQL
    oracle that recomputes the bottom-k sets in mod-2^64 arithmetic and
    mirrors the float expressions."""
    if a.k != b.k:
        raise ValueError(f"KMV k mismatch: {a.k} vs {b.k}")
    m = a.copy().merge(b)
    kk = m.size
    if kk == 0:
        return {
            "k_used": 0, "n_both": 0, "n_only_a": 0, "n_only_b": 0,
            "est_union": 0.0, "est_intersection": 0.0,
            "est_diff_a": 0.0, "est_diff_b": 0.0, "jaccard": 0.0,
        }
    in_a = np.isin(m.hashes, a.hashes)
    in_b = np.isin(m.hashes, b.hashes)
    n_both = int((in_a & in_b).sum())
    n_only_a = int((in_a & ~in_b).sum())
    n_only_b = int((~in_a & in_b).sum())
    est_union = m.estimate_distinct()
    # one division then one multiply, mirrored exactly in the SQL oracle
    return {
        "k_used": kk,
        "n_both": n_both,
        "n_only_a": n_only_a,
        "n_only_b": n_only_b,
        "est_union": est_union,
        "est_intersection": float(n_both) / kk * est_union,
        "est_diff_a": float(n_only_a) / kk * est_union,
        "est_diff_b": float(n_only_b) / kk * est_union,
        "jaccard": float(n_both) / kk,
    }
