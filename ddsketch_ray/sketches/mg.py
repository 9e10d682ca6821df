"""Misra-Gries frequent-items summary: a deterministic-guarantee,
hash-free, mergeable heavy-hitter sketch.

Misra & Gries, "Finding repeated elements" (Sci. Comput. Program. 1982)
with the mergeability result of Agarwal et al., "Mergeable summaries"
(PODS 2012 §3): keep at most ``k`` (value, counter) pairs; when an
insert/merge would exceed ``k`` entries, subtract the (k+1)-th largest
counter from every counter and drop the non-positive ones. Invariants
(any insert order, any merge tree — PODS 2012 Thm. 1):

- ``stored(v) <= true(v) <= stored(v) + offset`` for every value ``v``
  (``offset`` = the summed decrements, itself <= n/(k+1));
- every value with true count > n/(k+1) is present in the summary.

The summary complements the library's CountMin ``HeavyHitters``
(sketches/countmin.py): CM answers point queries for ANY key but can
overcount via hash collisions; Misra-Gries stores the candidate values
themselves, never overcounts, and its superset guarantee is exact — so
a second exact counting pass over just the candidates yields the EXACT
frequent-item set (functions/analytics.py::frequent_items), which a SQL
oracle recomputes with a plain GROUP BY / HAVING. The summary state
depends on block boundaries (decrement timing), but the two-pass result
is layout-invariant.

Counts are int64 throughout (weights allowed — token-weighted frequent
hosts is the webtext shape); no floats anywhere, so every bound test is
exact. No reference counterpart (the reference is quantiles-only); this
fills SURVEY.md §2.3's heavy-hitter slot with the deterministic flavor.
"""

from __future__ import annotations

import numpy as np


class MisraGries:
    """At most ``k`` (value, count) pairs + the total decrement offset.

    ``values`` is a numpy object array (str or int keys — anything numpy
    can stable-sort); ``counts`` int64, always > 0; entries are kept
    sorted by value so combine is a linear merge after one stable sort.
    """

    __slots__ = ("k", "values", "counts", "n", "offset")

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("MisraGries needs k >= 1")
        self.k = int(k)
        self.values = np.empty(0, dtype=object)
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0  # total stream weight observed (exact)
        self.offset = 0  # summed decrements: true - stored <= offset

    def add_counts(self, values: np.ndarray, counts: np.ndarray) -> None:
        """Vectorized insert of pre-reduced (value, count) pairs.

        Callers pass per-batch ``value_counts`` output (pyarrow /
        numpy), never raw rows — the per-row MG loop becomes one
        group-sum + one partition select per batch."""
        v = np.asarray(values, dtype=object)
        c = np.asarray(counts, dtype=np.int64)
        if v.size == 0:
            return
        if (c < 0).any():
            raise ValueError("MisraGries counts must be non-negative")
        if (c == 0).any():  # zero-weight rows carry no mass — drop
            nz = c > 0
            v, c = v[nz], c[nz]
            if v.size == 0:
                return
        self.n += int(c.sum())
        all_v = np.concatenate([self.values, v])
        all_c = np.concatenate([self.counts, c])
        order = np.argsort(all_v, kind="stable")
        all_v, all_c = all_v[order], all_c[order]
        # group-sum runs of equal values
        new_grp = np.ones(len(all_v), dtype=bool)
        new_grp[1:] = all_v[1:] != all_v[:-1]
        sums = np.add.reduceat(all_c, np.flatnonzero(new_grp))
        uniq_v = all_v[new_grp]
        if len(uniq_v) > self.k:
            # delta = the (k+1)-th largest count; subtracting it leaves
            # at most k positive counters (ties at delta all drop)
            delta = int(np.partition(sums, len(sums) - self.k - 1)[len(sums) - self.k - 1])
            self.offset += delta
            keep = sums > delta
            uniq_v, sums = uniq_v[keep], sums[keep]
        self.values, self.counts = uniq_v, sums

    def add_array(self, values: np.ndarray) -> None:
        """Raw-row insert (the ``grouped_sketch_partials`` protocol):
        pre-reduce with one value_counts, then the vectorized path."""
        vals, cnts = np.unique(np.asarray(values), return_counts=True)
        self.add_counts(vals.astype(object), cnts)

    def merge(self, other: "MisraGries") -> "MisraGries":
        """Counter addition + one prune — associative-in-guarantee
        (PODS 2012: the error bounds survive any merge tree)."""
        if self.k != other.k:
            raise ValueError(f"MisraGries k mismatch: {self.k} vs {other.k}")
        n_before = self.n
        self.add_counts(other.values, other.counts)
        # add_counts counted only the STORED weight; restore exact n
        self.n = n_before + other.n
        self.offset += other.offset
        return self

    @property
    def size(self) -> int:
        return len(self.values)

    def error_bound(self) -> int:
        """Max undercount of any stored (or absent) value's estimate.
        Always <= n // (k+1) (tested); ``offset`` is the tighter,
        realized bound."""
        return self.offset

    def candidates(self) -> np.ndarray:
        """Stored values, sorted — a superset of every value with true
        count > n/(k+1)."""
        return self.values.copy()

    def estimate(self, value) -> tuple[int, int]:
        """(lower, upper) bounds on the true count of ``value``: stored
        count (0 if absent) and stored + offset."""
        i = np.searchsorted(self.values, value)
        if i < len(self.values) and self.values[i] == value:
            lo = int(self.counts[i])
        else:
            lo = 0
        return lo, lo + self.offset

    def copy(self) -> "MisraGries":
        out = MisraGries(self.k)
        out.values = self.values.copy()
        out.counts = self.counts.copy()
        out.n = self.n
        out.offset = self.offset
        return out


class CandidateCounts:
    """EXACT counts of a FIXED candidate list — pass 2 of the two-pass
    frequent-items plan packaged as a mergeable summary, so a resumable
    job (jobs/frequent_items_job.py) can ride the same per-partition
    checkpoint machinery (state/checkpoint.py) for both passes. Merge is
    element-wise integer addition over the shared candidate order —
    associative, commutative, bit-identical under any merge tree. ``n``
    counts ALL observed weight (the threshold denominator), not just
    candidate hits."""

    __slots__ = ("values", "counts", "n")

    def __init__(self, values: np.ndarray):
        v = np.asarray(values, dtype=object)
        if len(v) and not np.all(v[:-1] < v[1:]):
            raise ValueError("CandidateCounts needs strictly sorted unique values")
        self.values = v
        self.counts = np.zeros(len(v), dtype=np.int64)
        self.n = 0

    def add_counts(self, vals: np.ndarray, cnts: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=object)
        cnts = np.asarray(cnts, dtype=np.int64)
        if vals.size == 0:
            return
        self.n += int(cnts.sum())
        if len(self.values) == 0:
            return
        idx = np.minimum(np.searchsorted(self.values, vals), len(self.values) - 1)
        hit = self.values[idx] == vals
        np.add.at(self.counts, idx[hit], cnts[hit])

    def add_array(self, values: np.ndarray) -> None:
        vals, cnts = np.unique(np.asarray(values), return_counts=True)
        self.add_counts(vals.astype(object), cnts)

    def merge(self, other: "CandidateCounts") -> "CandidateCounts":
        if len(self.values) != len(other.values) or not np.array_equal(
            self.values, other.values
        ):
            raise ValueError("CandidateCounts merge: candidate lists differ")
        self.counts += other.counts
        self.n += other.n
        return self
