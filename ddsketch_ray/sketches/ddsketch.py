"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee, VLDB 2019).

A from-scratch, vectorized Python/numpy re-implementation of the semantics of
the reference C implementation (gmorleo/DDSketch), built for batch/distributed
accumulation under Ray Data. Parity notes cite the reference file:line.

Semantics mirrored exactly:

- Bucket key function (``ddsketch.cc:83-103``): for x > 0,
  ``key = ceil(ln x / ln γ) + offset``; for x < 0 the sign-mirrored
  ``key = -ceil(ln -x / ln γ) - offset``; x == 0 → key 0. γ = (1+α)/(1−α)
  (``ddsketch.cc:37``). The ±offset bias (default 2³⁰, ``main.cpp:32``) keeps
  the negative / zero / positive key zones disjoint so ascending integer key
  order equals ascending value order.
- Point estimate per bucket (``ddsketch.cc:105-126``): ``±2γ^k/(γ+1)``.
- Quantile scan (``ddsketch.cc:519-556``): first key whose cumulative count
  exceeds ``q·(n−1)``.
- γ²-collapse (``ddsketch.cc:828-906``): γ←γ², α←2α/(1+α²), and the key pair
  {2m−1, 2m} maps to m (computed here in exact integer arithmetic,
  ``(k + of + 1) // 2`` with of = −1 for even keys, +1 for odd, matching
  ``DDS_CollapseKey`` at ``ddsketch.cc:183-209``).
- Last-/first-bucket collapse modes (``ddsketch.cc:779-826``) with their
  [win_min, win_max] collapsed-key window and the delete-redirect semantics
  (``ddsketch.cc:394-517``).
- Merge (``ddsketch.cc:558-777``): "collapse" mode equalizes alphas by
  γ²-collapsing the finer sketch until |α₁−α₂| ≤ 1e-4 then adds counts
  (n grows by the *sum of counts*, not the other sketch's n —
  ``ddsketch.cc:599-602``); "last"/"first" modes require equal alpha
  (error −5 at ``ddsketch.cc:658-661``) and merge the collapse windows.
- Delete (``ddsketch.cc:342-392``): decrement, erase at zero; a delete whose
  key has no bin is a no-op that does NOT decrement n (the reference's
  documented quirk at ``ddsketch.cc:380-388``) — preserved.

Deliberate divergences (documented in SURVEY.md §2):

- counters are Python ints / int64 (the reference's int32 ``n`` would
  overflow at the 10¹²-row target scale);
- NaN / ±inf / null inputs are dropped and counted in ``nan_dropped``
  (the reference leaves the key uninitialized — UB);
- quantile q is clamped to [0, 1] (the reference accepts q ≤ 1.01 and walks
  off the map end, ``ddsketch.cc:528``);
- batch inserts check the bin limit once per batch, not once per row, so in
  "last"/"first" modes the surviving bins can differ from a row-at-a-time
  run; estimates still honor the published bound (tests assert the bound,
  not bin identity — see SURVEY.md §4 on merge order-dependence);
- batch deletes in "last"/"first" modes process all non-window deletes
  before the window-redirected ones, so within one batch the extreme
  bucket drained can differ from the reference's per-item interleaving
  (same bound-level guarantee as the batched-insert divergence above).
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_OFFSET = 1 << 30  # main.cpp:32
DEFAULT_BIN_LIMIT = 500  # main.cpp:33
DEFAULT_ALPHA = 0.008  # main.cpp:34

MODE_COLLAPSE = "collapse"  # γ² escalation   (DDS_AddCollapse)
MODE_LAST = "last"  # collapse last two buckets (DDS_AddCollapseLastBucket)
MODE_FIRST = "first"  # collapse first two buckets (DDS_AddCollapseFirstBucket)
_MODES = (MODE_COLLAPSE, MODE_LAST, MODE_FIRST)

_WIN_MIN_SENTINEL = 1 << 62  # reference: numeric_limits<int>::max(), ddsketch.cc:49
_WIN_MAX_SENTINEL = -(1 << 62)  # reference: numeric_limits<int>::min(), ddsketch.cc:48


class DDSketch:
    """Mergeable relative-error quantile sketch. See module docstring."""

    __slots__ = (
        "alpha",
        "gamma",
        "ln_gamma",
        "offset",
        "bin_limit",
        "mode",
        "bins",
        "n",
        "nan_dropped",
        "win_min",
        "win_max",
    )

    def __init__(
        self,
        alpha: float = DEFAULT_ALPHA,
        bin_limit: int = DEFAULT_BIN_LIMIT,
        mode: str = MODE_COLLAPSE,
        offset: int = DEFAULT_OFFSET,
    ):
        if not (0.0 < alpha < 1.0):
            raise ValueError(f"alpha must be in (0,1), got {alpha}")
        if bin_limit < 2:
            raise ValueError(f"bin_limit must be >= 2, got {bin_limit}")
        if mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)  # ddsketch.cc:37
        self.ln_gamma = math.log(self.gamma)
        self.offset = int(offset)
        self.bin_limit = int(bin_limit)
        self.mode = mode
        self.bins: dict[int, int] = {}
        self.n = 0
        self.nan_dropped = 0
        self.win_min = _WIN_MIN_SENTINEL
        self.win_max = _WIN_MAX_SENTINEL

    # ------------------------------------------------------------------ keys

    def keys_for(self, values: np.ndarray) -> np.ndarray:
        """Vectorized DDS_GetKey (ddsketch.cc:83-103) over finite float64s."""
        v = np.asarray(values, dtype=np.float64)
        keys = np.zeros(v.shape, dtype=np.int64)  # zeros → key 0 (cc:97-98)
        pos = v > 0
        neg = v < 0
        if pos.any():
            keys[pos] = (
                np.ceil(np.log(v[pos]) / self.ln_gamma).astype(np.int64) + self.offset
            )
        if neg.any():
            keys[neg] = (
                -np.ceil(np.log(-v[neg]) / self.ln_gamma).astype(np.int64) - self.offset
            )
        return keys

    def key_for(self, value: float) -> int:
        return int(self.keys_for(np.array([value]))[0])

    def key_to_estimate(self, key: int) -> float:
        """DDS_GetRank (ddsketch.cc:105-126): mid-bucket point estimate."""
        if key > 0:
            k = key - self.offset
            return (2.0 * self.gamma**k) / (self.gamma + 1.0)
        if key < 0:
            k = key + self.offset
            return -(2.0 * self.gamma**-k) / (self.gamma + 1.0)
        return 0.0

    def key_to_upper_bound(self, key: int) -> float:
        """DDS_GetValue (ddsketch.cc:128-149): bucket upper bound ±γ^k."""
        if key > 0:
            return self.gamma ** (key - self.offset)
        return -(self.gamma ** -(key + self.offset))

    # ----------------------------------------------------------------- add

    def add_array(self, values) -> None:
        """Vectorized insert of a batch (DDS_AddCollapse* semantics,
        ddsketch.cc:212-340, with one bin-limit check per batch)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        finite = np.isfinite(v)
        if not finite.all():
            self.nan_dropped += int((~finite).sum())
            v = v[finite]
        if v.size == 0:
            return
        keys = self.keys_for(v)
        bins = self.bins
        for uk, counts in self._group_keys(keys):
            for k, c in zip(uk.tolist(), counts.tolist()):
                bins[k] = bins.get(k, 0) + c
        self.n += int(v.size)
        self._enforce_limit()

    @staticmethod
    def _group_keys(keys: np.ndarray):
        """(unique_keys, counts) pairs. Within one sign zone the key span
        is tiny (≈ ln(DBL_MAX/DBL_MIN)/ln γ ≈ 1e5), so np.bincount over
        the shifted zone beats sort-based np.unique by ~10×; the rare
        wide-span case falls back to unique."""
        for zone in (keys > 0, keys < 0):
            if not zone.any():
                continue
            zk = keys[zone]
            kmin = int(zk.min())
            span = int(zk.max()) - kmin + 1
            if span <= max(4 * zk.size, 1 << 18):
                counts = np.bincount(zk - kmin)
                nz = np.nonzero(counts)[0]
                yield nz + kmin, counts[nz]
            else:  # pragma: no cover - needs pathological key spread
                yield np.unique(zk, return_counts=True)
        n_zero = int((keys == 0).sum())
        if n_zero:
            yield np.array([0], dtype=np.int64), np.array([n_zero], dtype=np.int64)

    def add(self, value: float) -> None:
        """Single insert with the reference's per-item limit check."""
        self.add_array(np.array([value], dtype=np.float64))

    def add_weighted(self, values, weights) -> None:
        """Weighted insert: bucket count += weight — a weight-w value is
        exactly w unit inserts of that value, so every downstream query
        (quantile/cdf/merge) is unchanged. Integer weights >= 0 (zero
        weights are no-ops); the importance-weighted-distribution shape
        (e.g. price quantiles weighted by quantity). North-rule
        addition — the reference API is unit-count only
        (ddsketch.cc:212-340)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        w = np.asarray(weights).ravel()
        if v.shape != w.shape:
            raise ValueError("values and weights must have equal length")
        if not np.issubdtype(w.dtype, np.integer):
            wi = np.asarray(w, dtype=np.float64)
            if not np.isfinite(wi).all() or (wi != np.round(wi)).any():
                raise ValueError("weights must be integral")
            w = wi.astype(np.int64)
        else:
            w = w.astype(np.int64, copy=False)
        if (w < 0).any():
            raise ValueError("weights must be >= 0")
        finite = np.isfinite(v)
        self.nan_dropped += int((~finite).sum())
        keep = finite & (w > 0)
        v, w = v[keep], w[keep]
        if v.size == 0:
            return
        keys = self.keys_for(v)
        order = np.argsort(keys, kind="stable")
        sk, sw = keys[order], w[order]
        starts = np.r_[True, sk[1:] != sk[:-1]]
        uk = sk[starts]
        sums = np.add.reduceat(sw, np.nonzero(starts)[0])
        bins = self.bins
        for k, c in zip(uk.tolist(), sums.tolist()):
            bins[k] = bins.get(k, 0) + int(c)
        self.n += int(w.sum())
        self._enforce_limit()

    # --------------------------------------------------------------- delete

    def delete_array(self, values) -> None:
        """Vectorized DDS_DeleteCollapse* (ddsketch.cc:342-517).

        Turnstile deletes: decrement the bucket, erase at zero. Deletes whose
        key has no bin are no-ops that do NOT decrement n (reference quirk,
        ddsketch.cc:380-388). In "last"/"first" modes, keys falling inside
        the collapsed window [win_min, win_max] are redirected to the current
        last/first bucket (ddsketch.cc:414-418 / 477-480).
        """
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        keys = self.keys_for(v)
        in_window = np.zeros(v.shape, dtype=bool)
        if self.mode in (MODE_LAST, MODE_FIRST) and self.win_min <= self.win_max:
            in_window = (keys >= self.win_min) & (keys <= self.win_max)
        uk, counts = np.unique(keys[~in_window], return_counts=True)
        bins = self.bins
        for k, c in zip(uk.tolist(), counts.tolist()):
            have = bins.get(k)
            if have is None:
                continue  # absent key: no-op, n unchanged (cc:380-388)
            removed = min(c, have)
            if removed == have:
                del bins[k]
            else:
                bins[k] = have - removed
            self.n -= removed
        # window-redirected deletes drain the current extreme bucket(s)
        remaining = int(in_window.sum())
        while remaining > 0 and bins:
            k = max(bins) if self.mode == MODE_LAST else min(bins)
            take = min(remaining, bins[k])
            if take == bins[k]:
                del bins[k]
            else:
                bins[k] -= take
            self.n -= take
            remaining -= take

    # ------------------------------------------------------------- collapse

    def _enforce_limit(self) -> None:
        if len(self.bins) <= self.bin_limit:
            return
        if self.mode == MODE_COLLAPSE:
            while len(self.bins) > self.bin_limit:
                self._collapse_gamma2()
        elif self.mode == MODE_LAST:
            self._collapse_extreme(last=True)
        else:
            self._collapse_extreme(last=False)

    def _collapse_gamma2(self) -> None:
        """DDS_Collapse (ddsketch.cc:828-906): γ←γ², remap {2m−1,2m}→m."""
        self.gamma = self.gamma**2
        self.ln_gamma = math.log(self.gamma)
        self.alpha = (2.0 * self.alpha) / (1.0 + self.alpha**2)
        keys = np.fromiter(self.bins.keys(), dtype=np.int64, count=len(self.bins))
        counts = np.fromiter(self.bins.values(), dtype=np.int64, count=len(self.bins))
        # of = -1 for even keys, +1 for odd (parity of the biased key; offset
        # is even so this equals the unbiased parity) — ddsketch.cc:871-888
        of = np.where(keys % 2 == 0, -1, 1)
        new_keys = np.zeros_like(keys)
        pos = keys > 0
        neg = keys < 0
        i = keys[pos] - self.offset
        new_keys[pos] = (i + of[pos] + 1) // 2 + self.offset  # exact int ceil
        c = -keys[neg] - self.offset
        new_keys[neg] = -((c + of[neg] + 1) // 2) - self.offset
        uk, inv = np.unique(new_keys, return_inverse=True)
        summed = np.zeros(uk.shape, dtype=np.int64)
        np.add.at(summed, inv, counts)
        self.bins = dict(zip(uk.tolist(), summed.tolist()))

    def _collapse_extreme(self, last: bool) -> None:
        """Repeated DDS_CollapseLastBucket / FirstBucket (ddsketch.cc:779-826)
        applied k = size − bin_limit times, computed in one vectorized pass
        (the k sequential pairwise folds all accumulate into the same
        extreme bucket, so one pass is exact)."""
        size = len(self.bins)
        k = size - self.bin_limit
        if k <= 0:
            return
        keys = np.array(sorted(self.bins), dtype=np.int64)
        if last:
            folded = keys[size - 1 - k : size]  # 2nd-last…last over k folds
            survivor = int(keys[-1])
            self.win_min = min(self.win_min, int(folded[0]))
            self.win_max = max(self.win_max, survivor)
        else:
            folded = keys[0 : k + 1]
            survivor = int(keys[0])
            self.win_min = min(self.win_min, survivor)
            self.win_max = max(self.win_max, int(folded[-1]))
        total = 0
        for fk in folded.tolist():
            total += self.bins.pop(fk)
        self.bins[survivor] = self.bins.get(survivor, 0) + total

    # ---------------------------------------------------------------- merge

    def merge(self, other: "DDSketch") -> "DDSketch":
        """DDS_MergeCollapse* (ddsketch.cc:558-777). In-place into self;
        may γ²-collapse ``other`` during alpha equalization (the reference
        mutates both too). Associative/commutative up to the error bound."""
        if not isinstance(other, DDSketch):
            raise TypeError(f"cannot merge DDSketch with {type(other).__name__}")
        if self.mode != other.mode:
            raise ValueError(f"mode mismatch: {self.mode} vs {other.mode}")
        if self.offset != other.offset:
            raise ValueError("offset mismatch")
        if self.mode == MODE_COLLAPSE:
            # equalize alphas by collapsing the finer sketch (cc:583-595)
            while abs(self.alpha - other.alpha) > 1e-4:
                if self.alpha < other.alpha:
                    self._collapse_gamma2()
                else:
                    other._collapse_gamma2()
        else:
            if abs(self.alpha - other.alpha) > 1e-4:  # error −5, cc:658-661
                raise ValueError(
                    f"{self.mode}-mode merge requires equal alpha "
                    f"({self.alpha} vs {other.alpha})"
                )
        bins = self.bins
        for k, c in other.bins.items():
            bins[k] = bins.get(k, 0) + c
            self.n += c  # n += counts, not other.n (cc:599-602)
        self.nan_dropped += other.nan_dropped
        if self.mode in (MODE_LAST, MODE_FIRST):
            self.win_min = min(self.win_min, other.win_min)  # cc:676-682
            self.win_max = max(self.win_max, other.win_max)
        self._enforce_limit()
        return self

    def subtract_sketch(self, deletes: "DDSketch") -> "DDSketch":
        """Distributed turnstile delete: subtract a sketch of the delete
        stream bucket-wise, in place.

        Same per-bucket semantics as replaying the deletes through
        ``delete_array`` (DDS_DeleteCollapse, ddsketch.cc:342-392): each
        delete-bucket count decrements the matching bucket, clamped at
        zero — surplus deletes in an absent/short bucket are no-ops that
        do NOT decrement ``n`` (reference quirk, cc:380-388). In
        "last"/"first" modes, delete-buckets inside the collapsed window
        drain the current extreme bucket first (cc:414-418 / 477-480).

        This is the scale path for deletes: aggregate the delete stream
        into a second sketch (map-side combine, KB-sized state) and
        subtract once on the driver — no per-value stream ever leaves
        the cluster. Exact whenever neither sketch collapsed between
        insert and delete (counts cancel bucket-for-bucket).
        """
        if not isinstance(deletes, DDSketch):
            raise TypeError(f"cannot subtract {type(deletes).__name__}")
        if self.mode != deletes.mode:
            raise ValueError(f"mode mismatch: {self.mode} vs {deletes.mode}")
        if self.offset != deletes.offset:
            raise ValueError("offset mismatch")
        # EXACT alpha match required (stricter than merge's 1e-4): any
        # alpha difference means a different gamma bucket grid, so keys
        # would misalign and deletes silently hit wrong/absent buckets
        if self.alpha != deletes.alpha:
            raise ValueError(
                f"subtract_sketch requires identical alpha "
                f"({self.alpha} vs {deletes.alpha})"
            )
        bins = self.bins
        window_deletes = 0
        for k in sorted(deletes.bins):
            c = deletes.bins[k]
            if (
                self.mode in (MODE_LAST, MODE_FIRST)
                and self.win_min <= self.win_max
                and self.win_min <= k <= self.win_max
            ):
                window_deletes += c
                continue
            have = bins.get(k)
            if have is None:
                continue  # absent key: no-op, n unchanged (cc:380-388)
            removed = min(c, have)
            if removed == have:
                del bins[k]
            else:
                bins[k] = have - removed
            self.n -= removed
        while window_deletes > 0 and bins:
            k = max(bins) if self.mode == MODE_LAST else min(bins)
            take = min(window_deletes, bins[k])
            if take == bins[k]:
                del bins[k]
            else:
                bins[k] -= take
            self.n -= take
            window_deletes -= take
        return self

    # ---------------------------------------------------------------- query

    def quantile(self, q: float) -> float:
        """DDS_GetQuantile (ddsketch.cc:519-556); q clamped to [0,1]."""
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        qs = np.clip(np.asarray(qs, dtype=np.float64), 0.0, 1.0)
        if self.n <= 0 or not self.bins:
            return np.full(qs.shape, np.nan)
        keys = np.array(sorted(self.bins), dtype=np.int64)
        counts = np.array([self.bins[k] for k in keys.tolist()], dtype=np.int64)
        cum = np.cumsum(counts)
        stops = qs * (self.n - 1)  # cc:538
        idx = np.searchsorted(cum, stops, side="right")  # first cum > stop
        idx = np.minimum(idx, len(keys) - 1)
        return np.array([self.key_to_estimate(int(keys[i])) for i in idx])

    def cdf(self, values) -> np.ndarray:
        """Inverse of ``quantiles``: estimated fraction of inserted items
        ≤ each probe value — rank(v) = Σ_{k ≤ key(v)} count_k / n.

        Not in the reference API (its DDS_GetRank maps key→value,
        ddsketch.cc:105-126); this is the natural companion query the
        same bucket table answers, and it is recomputed exactly by the
        SQL oracle (same key function, cumulative bucket counts)."""
        v = np.asarray(values, dtype=np.float64)
        if self.n <= 0 or not self.bins:
            return np.full(v.shape, np.nan)
        keys = np.array(sorted(self.bins), dtype=np.int64)
        counts = np.array([self.bins[k] for k in keys.tolist()], dtype=np.int64)
        cum = np.cumsum(counts)
        probe_keys = self.keys_for(v)
        idx = np.searchsorted(keys, probe_keys, side="right") - 1
        out = np.where(idx >= 0, cum[np.maximum(idx, 0)], 0).astype(np.float64)
        return out / self.n

    def valid_quantile_range(self) -> tuple[float, float]:
        """getErrorBound (main.cpp:1108-1152): the q-range still honoring the
        α bound after last/first-bucket collapses."""
        if self.mode == MODE_COLLAPSE or self.win_max < self.win_min or self.n == 0:
            return (0.0, 1.0)
        if self.mode == MODE_LAST:
            c_last = self.bins[max(self.bins)] if self.bins else 0
            return (0.0, 1.0 - c_last / self.n)
        c_first = self.bins[min(self.bins)] if self.bins else 0
        return (c_first / self.n, 1.0)

    # ------------------------------------------------------------ utilities

    @property
    def size(self) -> int:
        """DDS_Size (ddsketch.cc:70-81): number of bins."""
        return len(self.bins)

    def sum_bins(self) -> int:
        """DDS_SumBins (ddsketch.cc:951-965)."""
        return sum(self.bins.values())

    def to_bucket_table(self):
        """DDS_PrintCSV + DDS_GetBounds parity (ddsketch.cc:908-949,
        151-181): one row per bucket with key, count, value bounds
        (lower, upper] = (±γ^(k−1), ±γ^k] sign-aware, and the mid-bucket
        estimate. Returns a pyarrow Table sorted by key."""
        import pyarrow as pa

        keys = sorted(self.bins)
        counts = [self.bins[k] for k in keys]
        uppers, lowers, ests = [], [], []
        for k in keys:
            if k > 0:
                u = k - self.offset
                lowers.append(self.gamma ** (u - 1))
                uppers.append(self.gamma**u)
            elif k < 0:
                u = -(k + self.offset)  # magnitude c (see keys_for)
                lowers.append(-(self.gamma**u))
                uppers.append(-(self.gamma ** (u - 1)))
            else:
                lowers.append(0.0)
                uppers.append(0.0)
            ests.append(self.key_to_estimate(k))
        return pa.table(
            {
                "key": pa.array(keys, type=pa.int64()),
                "cnt": pa.array(counts, type=pa.int64()),
                "lower": pa.array(lowers, type=pa.float64()),
                "upper": pa.array(uppers, type=pa.float64()),
                "estimate": pa.array(ests, type=pa.float64()),
            }
        )

    def to_row(self) -> dict:
        """Arrow-friendly serialized form (Parquet checkpoint row)."""
        keys = sorted(self.bins)
        return {
            "kind": "ddsketch",
            "mode": self.mode,
            "alpha": self.alpha,
            "gamma": self.gamma,
            "offset": self.offset,
            "bin_limit": self.bin_limit,
            "n": self.n,
            "nan_dropped": self.nan_dropped,
            "win_min": self.win_min,
            "win_max": self.win_max,
            "keys": np.array(keys, dtype=np.int64),
            "counts": np.array([self.bins[k] for k in keys], dtype=np.int64),
        }

    @classmethod
    def from_row(cls, row: dict) -> "DDSketch":
        sk = cls.__new__(cls)
        sk.mode = row["mode"]
        sk.alpha = float(row["alpha"])
        sk.gamma = float(row["gamma"])
        sk.ln_gamma = math.log(sk.gamma)
        sk.offset = int(row["offset"])
        sk.bin_limit = int(row["bin_limit"])
        sk.n = int(row["n"])
        sk.nan_dropped = int(row["nan_dropped"])
        sk.win_min = int(row["win_min"])
        sk.win_max = int(row["win_max"])
        keys = np.asarray(row["keys"], dtype=np.int64)
        counts = np.asarray(row["counts"], dtype=np.int64)
        sk.bins = dict(zip(keys.tolist(), counts.tolist()))
        return sk

    def copy(self) -> "DDSketch":
        return DDSketch.from_row(self.to_row())

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"DDSketch(alpha={self.alpha:.6g}, mode={self.mode!r}, "
            f"bins={len(self.bins)}, n={self.n})"
        )
