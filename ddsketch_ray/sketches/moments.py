"""Moments sketch — quantiles from exact integer power sums.

Gan, Ding, Tai, Sharan & Bailis, "Moment-Based Quantile Sketches for
Efficient High Cardinality Aggregation Queries" (VLDB 2018): summarize a
numeric stream by its first k power sums + min/max; the sketch is a
handful of scalars, merge is elementwise addition (exactly associative
and commutative), and quantiles are recovered analytically from the
standardized moments. This implementation keeps k=4 and uses the
classical Cornish-Fisher expansion (Cornish & Fisher 1938) for the
quantile estimate — a closed-form expression in (mean, std, skewness,
excess kurtosis), so the ENTIRE estimate chain is replayable by a SQL
oracle, which the repo's other quantile sketches (t-digest/KLL —
sequential centroid/compactor state) cannot offer.

Design for exactness (the repo's order-independence contract):

- Values are INTEGER-QUANTIZED by the caller (e.g. prices in cents, the
  same ``np.round(x*100).astype(int64)`` convention every integer-cents
  oracle in ``__ray_entry__`` uses) and must satisfy ``|v| < 2**24`` so
  the two-limb decomposition below is exact.
- Power sums S1..S4 are EXACT Python big ints, accumulated via
  vectorized int64 limb arithmetic (no float in the accumulation path):
  v² < 2⁴⁸ sums exactly in chunked int64; v³ = (q·2²⁴ + r)·v and
  v⁴ = q²·2⁴⁸ + 2qr·2²⁴ + r² with q = v²>>24, r = v²&(2²⁴−1) keep every
  partial below 2⁴⁸ per row. Exact integers ⇒ merge order cannot change
  a single bit, and a DuckDB oracle replays them as HUGEINT sums.
- The float estimate chain converts each power sum to double ONCE
  (correctly-rounded big-int→double, identical to DuckDB's
  HUGEINT→DOUBLE cast) and then applies a FIXED, explicitly-ordered
  sequence of IEEE double operations mirrored term-for-term by
  ``moments_sql_exprs`` — bit-identical Python vs SQL.

Reference scope: gmorleo/DDSketch is quantiles-only (ddsketch.h:58-252);
this fills the "constant-size mergeable quantile summary" slot of the
north rule's sketch library next to DDSketch's relative-error guarantee.
"""

from __future__ import annotations

import math

import numpy as np

_LIMIT = 1 << 24  # |v| bound for exact two-limb power accumulation
_CHUNK = 1 << 14  # rows per int64 partial: 2^14 * 2^48 = 2^62 < int64 max

# z_q constants shared verbatim with the SQL oracle (quantized ONCE —
# both sides parse the same decimal literal to the same double).
Z_SCORES = {
    0.5: "0.0",
    0.9: "1.2815515655446004",
    0.95: "1.6448536269514722",
    0.99: "2.3263478740408408",
}


def _exact_chunk_sum(arr: np.ndarray) -> int:
    """Exact sum of an int64 array whose entries are < 2**48 in absolute
    value: chunked int64 partials folded into a Python big int."""
    total = 0
    for i in range(0, arr.size, _CHUNK):
        total += int(arr[i : i + _CHUNK].sum())
    return total


class MomentsSketch:
    """k=4 moments sketch over integer-quantized values."""

    __slots__ = ("n", "s1", "s2", "s3", "s4", "vmin", "vmax")

    def __init__(self):
        self.n = 0
        self.s1 = 0
        self.s2 = 0
        self.s3 = 0
        self.s4 = 0
        self.vmin: int | None = None
        self.vmax: int | None = None

    # ------------------------------------------------------------- build
    def add_array(self, values) -> None:
        v = np.asarray(values)
        if v.dtype.kind == "f":
            if v.size and np.isnan(v).any():
                v = v[~np.isnan(v)]
            v = v.astype(np.int64)  # caller quantizes; enforce int here
        else:
            v = v.astype(np.int64, copy=False)
        if v.size == 0:
            return
        if int(np.abs(v).max()) >= _LIMIT:
            raise ValueError(
                f"MomentsSketch requires |v| < 2^24 after quantization "
                f"(got {int(np.abs(v).max())}); rescale the input"
            )
        v2 = v * v  # < 2^48, exact int64
        q = v2 >> 24  # < 2^24
        r = v2 & np.int64(_LIMIT - 1)
        self.n += int(v.size)
        self.s1 += int(v.sum())  # n * 2^24 << int64 max
        self.s2 += _exact_chunk_sum(v2)
        # v^3 = q*v * 2^24 + r*v       (each product < 2^48)
        self.s3 += (_exact_chunk_sum(q * v) << 24) + _exact_chunk_sum(r * v)
        # v^4 = q^2 * 2^48 + 2qr * 2^24 + r^2   (each product < 2^48)
        self.s4 += (
            (_exact_chunk_sum(q * q) << 48)
            + (_exact_chunk_sum(2 * q * r) << 24)
            + _exact_chunk_sum(r * r)
        )
        lo, hi = int(v.min()), int(v.max())
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)

    def merge(self, other: "MomentsSketch") -> "MomentsSketch":
        self.n += other.n
        self.s1 += other.s1
        self.s2 += other.s2
        self.s3 += other.s3
        self.s4 += other.s4
        for attr, op in (("vmin", min), ("vmax", max)):
            a, b = getattr(self, attr), getattr(other, attr)
            setattr(self, attr, b if a is None else (a if b is None else op(a, b)))
        return self

    # ------------------------------------------------------------- query
    def moments(self) -> dict:
        """(mean, variance, std, skewness g1, excess kurtosis g2) via the
        fixed double-expression chain mirrored by ``moments_sql_exprs``."""
        if self.n == 0:
            return {"n": 0, "mean": 0.0, "var": 0.0, "std": 0.0,
                    "skew": 0.0, "kurt": 0.0}
        nd = float(self.n)
        mean = float(self.s1) / nd
        ms2 = float(self.s2) / nd
        ms3 = float(self.s3) / nd
        ms4 = float(self.s4) / nd
        m2 = ms2 - (mean * mean)
        m3 = (ms3 - ((3.0 * mean) * ms2)) + ((2.0 * (mean * mean)) * mean)
        m4 = (
            (ms4 - ((4.0 * mean) * ms3))
            + ((6.0 * (mean * mean)) * ms2)
        ) - ((3.0 * ((mean * mean) * (mean * mean))))
        m2 = m2 if m2 > 0.0 else 0.0
        std = math.sqrt(m2)
        if m2 > 0.0:
            g1 = m3 / (m2 * std)
            g2 = (m4 / (m2 * m2)) - 3.0
        else:
            g1 = 0.0
            g2 = 0.0
        return {"n": self.n, "mean": mean, "var": m2, "std": std,
                "skew": g1, "kurt": g2}

    def quantile(self, q: float) -> float:
        """Cornish-Fisher estimate of the q-quantile (in the quantized
        integer units), clamped to the exact [min, max]."""
        if self.n == 0:
            return float("nan")
        mo = self.moments()
        z = float(Z_SCORES[q]) if q in Z_SCORES else _norm_ppf(q)
        est = mean_std_cf(mo["mean"], mo["std"], mo["skew"], mo["kurt"], z)
        lo, hi = float(self.vmin), float(self.vmax)
        if est < lo:
            est = lo
        if est > hi:
            est = hi
        return est

    def to_row(self) -> dict:
        return {
            "n": self.n,
            "s1": str(self.s1), "s2": str(self.s2),
            "s3": str(self.s3), "s4": str(self.s4),
            "vmin": self.vmin, "vmax": self.vmax,
        }

    @classmethod
    def from_row(cls, row: dict) -> "MomentsSketch":
        sk = cls()
        sk.n = int(row["n"])
        sk.s1, sk.s2 = int(row["s1"]), int(row["s2"])
        sk.s3, sk.s4 = int(row["s3"]), int(row["s4"])
        sk.vmin = None if row["vmin"] is None else int(row["vmin"])
        sk.vmax = None if row["vmax"] is None else int(row["vmax"])
        return sk

    def copy(self) -> "MomentsSketch":
        return self.from_row(self.to_row())


def mean_std_cf(mean: float, std: float, g1: float, g2: float, z: float) -> float:
    """The Cornish-Fisher third-order adjusted quantile, with the exact
    association order the SQL oracle mirrors:

      w = z + ((z²−1)·g1)/6 + ((z³−3z)·g2)/24 − (((2z³−5z)·g1)·g1)/36
      est = mean + std·w
    """
    z2 = z * z
    z3 = z2 * z
    w = (
        (z + (((z2 - 1.0) * g1) / 6.0))
        + ((((z3 - (3.0 * z)) * g2)) / 24.0)
    ) - (((((2.0 * z3) - (5.0 * z)) * g1) * g1) / 36.0)
    return mean + (std * w)


def _norm_ppf(q: float) -> float:
    """Acklam's rational approximation of the standard normal inverse
    CDF (for z-scores not in the shared table; NOT used by oracled
    queries, which stick to Z_SCORES so both sides share literals)."""
    # Peter Acklam (2003), public-domain algorithm.
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if q < plow:
        ql = math.sqrt(-2 * math.log(q))
        return (((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]) / \
               ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
    if q > phigh:
        ql = math.sqrt(-2 * math.log(1 - q))
        return -(((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]) / \
               ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
    ql = q - 0.5
    r = ql * ql
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * ql / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def moments_sql_exprs(prefix: str = "") -> dict[str, str]:
    """DuckDB expressions mirroring ``moments()`` bit-for-bit, given
    columns ``{p}n, {p}s1..{p}s4`` where the sums are HUGEINT and n is
    BIGINT. Each power sum is cast to DOUBLE once (same correctly-
    rounded big-int→double as Python ``float()``), then the expression
    tree copies the Python association order parenthesis-for-parenthesis."""
    p = prefix
    nd = f"CAST({p}n AS DOUBLE)"
    mean = f"(CAST({p}s1 AS DOUBLE) / {nd})"
    ms2 = f"(CAST({p}s2 AS DOUBLE) / {nd})"
    ms3 = f"(CAST({p}s3 AS DOUBLE) / {nd})"
    ms4 = f"(CAST({p}s4 AS DOUBLE) / {nd})"
    m2raw = f"({ms2} - ({mean} * {mean}))"
    m2 = f"(CASE WHEN {m2raw} > 0.0 THEN {m2raw} ELSE 0.0 END)"
    m3 = f"(({ms3} - ((3.0 * {mean}) * {ms2})) + ((2.0 * ({mean} * {mean})) * {mean}))"
    m4 = (
        f"((({ms4} - ((4.0 * {mean}) * {ms3}))"
        f" + ((6.0 * ({mean} * {mean})) * {ms2}))"
        f" - (3.0 * (({mean} * {mean}) * ({mean} * {mean}))))"
    )
    std = f"sqrt({m2})"
    g1 = f"(CASE WHEN {m2} > 0.0 THEN ({m3} / ({m2} * {std})) ELSE 0.0 END)"
    g2 = f"(CASE WHEN {m2} > 0.0 THEN (({m4} / ({m2} * {m2})) - 3.0) ELSE 0.0 END)"
    return {"mean": mean, "m2": m2, "std": std, "g1": g1, "g2": g2}


def cf_quantile_sql(mean: str, std: str, g1: str, g2: str, z_lit: str,
                    vmin: str, vmax: str) -> str:
    """The Cornish-Fisher estimate in SQL, mirroring ``mean_std_cf`` +
    the [min,max] clamp. ``z_lit`` must be the shared literal from
    ``Z_SCORES``; ``vmin``/``vmax`` are DOUBLE-cast column exprs."""
    z = f"(CAST({z_lit} AS DOUBLE))"  # DECIMAL*DECIMAL overflows scale 38
    z2 = f"({z} * {z})"
    z3 = f"({z2} * {z})"
    w = (
        f"((({z} + ((({z2} - 1.0) * {g1}) / 6.0))"
        f" + ((({z3} - (3.0 * {z})) * {g2}) / 24.0))"
        f" - (((((2.0 * {z3}) - (5.0 * {z})) * {g1}) * {g1}) / 36.0))"
    )
    est = f"({mean} + ({std} * {w}))"
    return f"LEAST(GREATEST({est}, {vmin}), {vmax})"
