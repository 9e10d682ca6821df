"""Dyadic-range count-min: range counts / ranks / quantiles over an
integer domain (Cormode & Muthukrishnan 2005, §4.2 "range queries").

One CountMin per dyadic level ``l`` counts the prefixes ``v >> l``; an
arbitrary inclusive range ``[lo, hi]`` decomposes into at most ``2·levels``
aligned dyadic nodes, and its count estimate is the sum of the per-node
CM estimates. This upgrades the point-frequency CMS
(sketches/countmin.py) to the query family a quantile/range engine
needs, while keeping everything the north rule asks of a sketch:

- **mergeable**: merge = elementwise table add (associative,
  commutative) — the distributed aggregate is bit-identical to any
  sequential run;
- **one-sided error**: CM never undercounts, so a range estimate is
  ``true ≤ est ≤ true + 2·levels·ε·n`` with prob ≥ 1−2·levels·δ;
- **SQL-replayable**: hashes are SplitMix64 + the CountMin double-hash
  (both already mirrored in DuckDB mod-2^64 arithmetic elsewhere in
  this repo), bucket totals are exact integer sums, the dyadic
  decomposition of a constant range is a constant node list, and the
  quantile tree-descent is ``levels`` integer comparisons — the entire
  estimate chain is EXACT integers, no float mirroring needed.

No reference counterpart (gmorleo/DDSketch is a single quantile
sketch); this fills the north rule's count-min slot with the range /
rank / quantile query surface DDSketch cannot provide for additive
frequency workloads (how many events in [a, b]? which value is p95 by
count?).
"""

from __future__ import annotations

import numpy as np

from ddsketch_ray.hashing import splitmix64

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def dyadic_decompose(lo: int, hi: int, levels: int) -> list[tuple[int, int]]:
    """Canonical dyadic decomposition of the inclusive integer range
    ``[lo, hi]`` within domain ``[0, 2^levels)``: the unique minimal
    list of (level, prefix) nodes, node (l, p) covering
    ``[p << l, (p+1) << l)``. At most 2 nodes per level; the full
    domain decomposes to the single node ``(levels, 0)``.

    Pure function of the constants — a SQL oracle embeds the same node
    list verbatim."""
    if not (0 <= lo <= hi < (1 << levels)):
        raise ValueError(f"range [{lo}, {hi}] outside domain [0, 2^{levels})")
    out: list[tuple[int, int]] = []
    a, b, level = lo, hi, 0
    while a <= b:
        if a & 1:
            out.append((level, a))
            a += 1
        if not (b & 1):
            out.append((level, b))
            b -= 1
        if a > b:
            break
        a >>= 1
        b >>= 1
        level += 1
    return out


class DyadicCountMin:
    """Per-level CountMin stack over the integer domain ``[0, 2^levels)``.

    ``tables[l]`` is a (depth, width) CM counting the level-``l``
    prefixes ``v >> l`` for ``l`` in [0, levels); the level-``levels``
    node (the full domain) is served by the exact total ``n``. Values
    outside the domain are clamped to its edges (documented semantics
    — web-scale junk rows must not crash a 100-TB aggregation; mirror
    with LEAST/GREATEST in SQL).

    Hash family per level: ``splitmix64(prefix ^ splitmix64(seed*1000003
    + level))`` (the hashing.mix_seed construction), then the CountMin
    double-hash column positions ``(h + d·((h>>32)|1)) mod 2^64 mod
    width``. ``width`` must be a power of two (same rationale as
    CountMin.from_error: the odd stride is full-period mod 2^k)."""

    __slots__ = ("levels", "width", "depth", "seed", "tables", "n", "_lseeds")

    def __init__(self, levels: int = 16, width: int = 1024, depth: int = 5, seed: int = 0):
        if levels < 1 or levels > 62:
            raise ValueError("levels must be in [1, 62]")
        if width < 2 or (width & (width - 1)) != 0:
            raise ValueError("width must be a power of two >= 2")
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.levels = int(levels)
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.tables = np.zeros((self.levels, self.depth, self.width), dtype=np.int64)
        self.n = 0
        self._lseeds = self._level_seeds(self.seed, self.levels)

    @staticmethod
    def _level_seeds(seed: int, levels: int) -> np.ndarray:
        """splitmix64(seed*1000003 + level) per level — the xor-mix
        constant a SQL oracle folds at build time."""
        base = (np.arange(levels, dtype=np.int64) + np.int64(seed * 1000003)).view(_U64)
        return splitmix64(base)

    def _columns(self, level: int, prefixes: np.ndarray) -> np.ndarray:
        """(depth, n) double-hash column positions for level-``level``
        prefixes."""
        p = np.asarray(prefixes, dtype=np.int64).view(_U64)
        h = splitmix64(p ^ self._lseeds[level])
        h2 = (h >> _U64(32)) | _U64(1)
        d = np.arange(self.depth, dtype=_U64)[:, None]
        with np.errstate(over="ignore"):
            return (((h[None, :] + d * h2[None, :]) & _MASK64) % _U64(self.width)).astype(
                np.int64
            )

    def add_values(self, values: np.ndarray, counts=1) -> None:
        """Vectorized insert of integer values (clamped into the domain)."""
        v = np.asarray(values)
        if v.size == 0:
            return
        if v.dtype.kind not in ("i", "u"):
            raise TypeError(f"DyadicCountMin takes integers, got {v.dtype}")
        v = np.clip(v.astype(np.int64, copy=False), 0, (1 << self.levels) - 1)
        c = np.broadcast_to(np.asarray(counts, dtype=np.int64), v.shape)
        row = np.arange(self.depth, dtype=np.int64)[:, None] * self.width
        cc = np.broadcast_to(c, (self.depth, len(v))).ravel()
        for l in range(self.levels):
            idx = self._columns(l, v >> l)  # (depth, n)
            # one add.at per level over the raveled (depth, width) plane
            np.add.at(self.tables[l].reshape(-1), (idx + row).ravel(), cc)
        self.n += int(c.sum())

    def estimate_prefix(self, level: int, prefixes: np.ndarray) -> np.ndarray:
        """CM point estimate of each level-``level`` prefix count
        (``level == levels`` → the exact total ``n``)."""
        if level == self.levels:
            return np.full(np.asarray(prefixes).shape, self.n, dtype=np.int64)
        idx = self._columns(level, prefixes)
        ests = self.tables[level][np.arange(self.depth)[:, None], idx]
        return ests.min(axis=0)

    def range_count(self, lo: int, hi: int) -> int:
        """Estimated count of values in the inclusive range [lo, hi]."""
        nodes = dyadic_decompose(lo, hi, self.levels)
        total = 0
        for level, prefix in nodes:
            total += int(self.estimate_prefix(level, np.array([prefix]))[0])
        return total

    def rank(self, x: int) -> int:
        """Estimated count of values <= x (0 for x < 0)."""
        if x < 0:
            return 0
        return self.range_count(0, min(int(x), (1 << self.levels) - 1))

    def quantile_value(self, q: float) -> int:
        """Tree-descent quantile: the smallest leaf value whose estimated
        prefix-cumulative count reaches ceil(q·n). ``levels`` integer
        comparisons; replayed step-for-step by the SQL oracle."""
        if not (0.0 <= q <= 1.0):
            raise ValueError("q must be in [0, 1]")
        if self.n == 0:
            return 0
        import math

        target = max(1, int(math.ceil(q * self.n)))
        prefix, cum = 0, 0
        for level in range(self.levels - 1, -1, -1):
            left = prefix << 1
            e = int(self.estimate_prefix(level, np.array([left]))[0])
            if cum + e >= target:
                prefix = left
            else:
                cum += e
                prefix = left + 1
        return prefix

    def merge(self, other: "DyadicCountMin") -> "DyadicCountMin":
        if (self.levels, self.width, self.depth, self.seed) != (
            other.levels,
            other.width,
            other.depth,
            other.seed,
        ):
            raise ValueError("DyadicCountMin parameter mismatch")
        self.tables += other.tables
        self.n += other.n
        return self
