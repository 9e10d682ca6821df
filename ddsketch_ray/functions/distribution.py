"""Sketch-driven distribution analytics: two-sample comparison and
balanced range partitioning.

Both operators consume the SAME mergeable DDSketch aggregate the
quantile queries use (`agg.DDSketchAgg` — per-block partial sketches,
KB-sized shuffle), then answer a different question from the bucket
table. They demonstrate the "sketch as planning input" pattern: one
cheap streaming pass yields a distribution summary that then drives a
second distributed stage (a filter, a partition assignment) — the only
way to do distribution-aware work on 10^12 rows without a sort.

- `ks_distance`:  Kolmogorov–Smirnov statistic between two groups'
  value distributions, computed as sup_k |CDF_a(k) - CDF_b(k)| over the
  union of the two sketches' bucket keys. Since both CDFs are exact
  cumulative bucket counts (deterministic integer math + one float
  division), the statistic is recomputed exactly by a SQL oracle with
  the shared bucket-key expression — an *oracled* approximate operator,
  like `dds_cdf_price`. Resolution is one γ-bucket (relative α), the
  sketch's guarantee.

- `range_partition_by_quantiles`: split points = the sketch's
  (1/P .. (P-1)/P) quantile estimates, rounded to 6 decimals on BOTH
  sides (Ray and oracle) so the two `pow` implementations can never
  disagree on a boundary value; partition id = number of cut points
  <= value (numpy `searchsorted(side="right")`). Equal-frequency
  partitions from one streaming pass — the balanced-output-shards /
  skew-free-range-shuffle primitive. Nulls/NaN get pid -1.

Reference scope: gmorleo/DDSketch answers only quantile queries from
its sketch (ddsketch.cc:519); these are north-rule additions built on
the same bucket table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "grouped_sketch_partials",
    "grouped_sketches",
    "ks_distance",
    "percentile_rank",
    "range_partition_by_quantiles",
]


def grouped_sketch_partials(
    ds, factory, value_col: str, group_col: str, weight_col: str | None = None
) -> dict:
    """Low-cardinality grouped sketch build WITHOUT Ray's Aggregate
    operator: {group: sketch} via the two-level small-key plan
    (analytics.py::small_key_rollup's measured rationale — Ray's
    ``groupby().aggregate`` costs ~20 µs/row regardless of group count).
    Each block sorts its rows by group once (np.argsort) and builds one
    partial sketch per group present in the block; the driver merges the
    O(blocks × groups) pickled partials in deterministic block-major
    order. Contract: distinct groups ≤ ~10³ (else use Ray's groupby),
    and the sketch's merge must be associative — exactly true for
    integer-sum sketches (MomentsSketch, HLL, CMS), true-within-bound
    for collapsing sketches.

    Measured (tools/stress_r5.py moments50m, 32 CPUs): 50M rows / 8
    groups 32.8 s via Ray groupby → 0.8 s on this plan (41.8×, 63.7M
    rows/s), bit-identical result for MomentsSketch."""
    import pickle

    import ray

    from ddsketch_ray.sketches.base import from_bytes

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        # weighted variant: the sketch must expose add_counts(values,
        # weights) — integer-weight summaries (MisraGries); raw-value
        # sketches keep the add_array protocol
        w = (
            t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if weight_col is not None
            else None
        )
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        ws = w[order] if w is not None else None
        cuts = np.flatnonzero(gs[1:] != gs[:-1]) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(gs)]))
        keys, blobs = [], []
        for s, e in zip(starts, ends):
            if e == s:
                continue
            sk = factory()
            if ws is None:
                sk.add_array(vs[s:e])
            else:
                sk.add_counts(vs[s:e].astype(object), ws[s:e])
            keys.append(gs[s])
            blobs.append(pickle.dumps(sk, protocol=pickle.HIGHEST_PROTOCOL))
        return pa.table(
            {
                group_col: pa.array(keys, type=t.schema.field(group_col).type),
                "_sk": pa.array(blobs, type=pa.binary()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .materialize()  # single execution (to_arrow_refs double-run rule)
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    out: dict = {}
    for t in parts:  # O(blocks × groups) tiny rows on the driver
        for gval, blob in zip(t.column(group_col).to_pylist(), t.column("_sk").to_pylist()):
            sk = from_bytes(blob)
            if gval in out:
                out[gval].merge(sk)
            else:
                out[gval] = sk
    return out


def grouped_sketches(ds, value_col: str, group_col: str, alpha: float = 0.008, bin_limit: int = 2048) -> dict:
    """One grouped sketch aggregate -> {group: DDSketch}. The shuffle
    carries only per-block partial sketches (map-side combined); the
    driver holds O(groups) KB-sized sketches."""
    from ddsketch_ray.agg import DDSketchAgg, sketch_from_result

    rows = (
        ds.groupby(group_col)
        .aggregate(DDSketchAgg(on=value_col, alpha=alpha, bin_limit=bin_limit, alias_name="_sk"))
        .to_pandas()
    )
    return {g: sketch_from_result(b) for g, b in zip(rows[group_col], rows["_sk"])}


def ks_distance(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    alpha: float = 0.008,
    bin_limit: int = 2048,
) -> dict:
    """Two-sample KS statistic between ``group_a`` and ``group_b``.

    Returns {"ks": float, "n_a": int, "n_b": int}. ks is
    max over union bucket keys of |cum_a/n_a - cum_b/n_b| — the exact
    expression the SQL oracle evaluates (int cumsums, one float64
    division per key, abs, max), so the float results are identical.
    """
    import pyarrow.compute as pc

    wanted = ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t.column(group_col), value_set=pa.array([group_a, group_b]))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    sks = grouped_sketches(wanted, value_col, group_col, alpha=alpha, bin_limit=bin_limit)
    if group_a not in sks or group_b not in sks:
        missing = [g for g in (group_a, group_b) if g not in sks]
        raise ValueError(f"ks_distance: group(s) with no rows: {missing}")
    sa, sb = sks[group_a], sks[group_b]
    keys = np.array(sorted(set(sa.bins) | set(sb.bins)), dtype=np.int64)

    def cum(sk) -> np.ndarray:
        ks = np.array(sorted(sk.bins), dtype=np.int64)
        cs = np.cumsum(np.array([sk.bins[k] for k in ks.tolist()], dtype=np.int64))
        idx = np.searchsorted(ks, keys, side="right") - 1
        return np.where(idx >= 0, cs[np.maximum(idx, 0)], 0).astype(np.float64)

    diff = np.abs(cum(sa) / float(sa.n) - cum(sb) / float(sb.n))
    return {"ks": float(diff.max()), "n_a": int(sa.n), "n_b": int(sb.n)}


def percentile_rank(
    ds,
    col: str,
    alpha: float = 0.008,
    bin_limit: int = 2048,
    out_col: str = "pct_rank",
    group_col: str | None = None,
):
    """Append each row's estimated percentile rank of ``col`` — the
    sketch CDF applied per row (rank(v) = #{values with bucket key <=
    key(v)} / n, exactly `DDSketch.cdf`). One sketch pass, then a
    broadcast pure map: the per-row "sketch as transform" shape
    (feature normalization / outlier flagging at corpus scale without
    a sort). Nulls/NaN get null rank. Rank is exact bucket-cumulative
    math, so a SQL oracle recomputes it bit-for-bit.

    With ``group_col``, the rank is WITHIN the row's group (per-group
    quantile normalization): one grouped sketch aggregate, then the
    broadcast map looks up the row's group sketch. The per-batch cost
    is O(groups_present x rows), and the broadcast dict is O(groups) —
    the same low-cardinality contract as any grouped sketch held
    driver-side (event types / languages, not user ids)."""
    import ray

    from ddsketch_ray.agg import DDSketchAgg, sketch_from_result

    if group_col is None:
        res = ds.aggregate(
            DDSketchAgg(on=col, alpha=alpha, bin_limit=bin_limit, alias_name="_sk")
        )
        skref = ray.put(sketch_from_result(res["_sk"]))

        def rank_batch(t: pa.Table) -> pa.Table:
            sk = ray.get(skref)
            v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            r = sk.cdf(v)
            r[np.isnan(v)] = np.nan
            return t.append_column(out_col, pa.array(r, pa.float64()))

        return ds.map_batches(rank_batch, batch_format="pyarrow", batch_size=None)

    sks = grouped_sketches(ds, col, group_col, alpha=alpha, bin_limit=bin_limit)
    gref = ray.put(sks)

    def rank_batch_grouped(t: pa.Table) -> pa.Table:
        table = ray.get(gref)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        g = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        r = np.full(len(v), np.nan)
        for grp, sk in table.items():
            m = g == grp
            if m.any():
                r[m] = sk.cdf(v[m])
        r[np.isnan(v)] = np.nan
        return t.append_column(out_col, pa.array(r, pa.float64()))

    return ds.map_batches(rank_batch_grouped, batch_format="pyarrow", batch_size=None)


def range_partition_by_quantiles(
    ds,
    col: str,
    num_partitions: int,
    alpha: float = 0.008,
    bin_limit: int = 2048,
    out_col: str = "pid",
):
    """Append an equal-frequency partition id (0..num_partitions-1)
    derived from one sketch pass: pid = #{cut <= value} with cuts =
    quantile estimates at i/P, rounded to 6 decimals (boundary
    determinism vs the oracle's pow). Nulls/NaN -> pid -1.

    Returns (dataset_with_pid, cuts). At cluster scale the pid column
    feeds `write_parquet(partition_cols=[out_col])` or a hash-free
    range shuffle — balanced by construction (within α)."""
    from ddsketch_ray.agg import DDSketchAgg, sketch_from_result

    if num_partitions < 2:
        raise ValueError("num_partitions must be >= 2")
    res = ds.aggregate(
        DDSketchAgg(on=col, alpha=alpha, bin_limit=bin_limit, alias_name="_sk")
    )
    sk = sketch_from_result(res["_sk"])
    qs = [i / num_partitions for i in range(1, num_partitions)]
    cuts = np.round(np.asarray(sk.quantiles(qs), dtype=np.float64), 6)

    def assign(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        pid = np.searchsorted(cuts, v, side="right").astype(np.int64)
        pid[np.isnan(v)] = -1
        return t.append_column(out_col, pa.array(pid))

    return (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None),
        cuts,
    )


def clip_to_quantiles(
    ds,
    col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    alpha: float = 0.008,
    bin_limit: int = 2048,
    out_col: str | None = None,
):
    """Winsorize a column at sketch-estimated quantiles — the outlier
    clamp of feature preprocessing, without any sort: one DDSketch pass
    picks (lo, hi) cut estimates rounded to 6dp (both sides of the
    oracle boundary, the range-partitioner convention), then a pure
    vectorized LEAST/GREATEST map. Nulls/NaN pass through. Returns the
    Dataset with ``out_col`` (default ``{col}_clipped``) appended."""
    import pyarrow.compute as pc

    from ddsketch_ray.agg import DDSketchAgg, sketch_from_result

    if not (0.0 <= lo_q < hi_q <= 1.0):
        raise ValueError("need 0 <= lo_q < hi_q <= 1")
    out_col = out_col or f"{col}_clipped"
    res = ds.aggregate(
        DDSketchAgg(on=col, alpha=alpha, bin_limit=bin_limit, alias_name="_sk")
    )
    sk = sketch_from_result(res["_sk"])
    lo, hi = (round(float(v), 6) for v in sk.quantiles([lo_q, hi_q]))

    def clip(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(col), pa.float64())
        clipped = pc.min_element_wise(pc.max_element_wise(v, lo), hi)
        return t.append_column(out_col, clipped)

    return ds.map_batches(clip, batch_format="pyarrow", batch_size=None)
