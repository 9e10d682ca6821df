"""Join operators Ray Data lacks natively, expressed Ray-Data-first.

``asof_join_broadcast`` — the classic time-series as-of join (each left
row matches the LATEST right row with the same key and ts ≤ left ts).
Ray Data has no join operator that expresses this; the scale shape here
is the broadcast pattern (SURVEY.md §2.3 joins/lookups): the right
(dimension) side is small — reference rates, config epochs, model
versions — so it is ray.put ONCE as per-key sorted timestamp arrays and
every map task binary-searches it per batch. No shuffle of the big side
at all; the big side streams.

For a big-big as-of join the partitioning assumption is: co-partition
both sides by key (hash bucket), sort within partition, and run this
same searchsorted kernel per bucket — the broadcast variant is the
building block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _prepare_dim(dim: pa.Table, key_col: str, ts_col: str, value_cols):
    """{key: (sorted int64 ts array, {col: values aligned to ts})}."""
    keys = dim.column(key_col).to_pylist()
    ts = dim.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
    vals = {c: dim.column(c).to_numpy(zero_copy_only=False) for c in value_cols}
    out: dict = {}
    for k in set(keys):
        mask = np.array([kk == k for kk in keys], dtype=bool)
        order = np.argsort(ts[mask], kind="stable")
        out[k] = (
            ts[mask][order],
            {c: vals[c][mask][order] for c in value_cols},
        )
    return out


def asof_join_broadcast(
    big_ds,
    dim: pa.Table,
    key_col: str,
    ts_col: str,
    value_cols,
    dim_ts_col: str | None = None,
    suffix: str = "_ref",
):
    """Inner as-of join (backward): every big-side row is matched to the
    latest dim row with equal ``key_col`` and dim ts ≤ row ts; rows with
    no qualifying dim row are dropped (DuckDB ``ASOF JOIN`` semantics).

    Returns big_ds's columns plus ``{dim_ts_col}{suffix}`` and
    ``{c}{suffix}`` for each value column. The dim table is broadcast
    once; each stateless task fetches it zero-copy and runs one
    searchsorted per key present in the batch.
    """
    import ray

    dim_ts_col = dim_ts_col or ts_col
    value_cols = list(value_cols)
    ref = ray.put(_prepare_dim(dim, key_col, dim_ts_col, value_cols))

    def join_batch(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        n = t.num_rows
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        keys = t.column(key_col).to_pylist()
        matched = np.zeros(n, dtype=bool)
        m_ts = np.zeros(n, dtype=np.int64)
        m_vals = {c: np.zeros(n, dtype=object) for c in value_cols}
        key_arr = np.array(keys, dtype=object)
        for k in set(keys):
            entry = lookup.get(k)
            if entry is None:
                continue
            dts, dvals = entry
            mask = key_arr == k
            idx = np.searchsorted(dts, ts[mask], side="right") - 1
            ok = idx >= 0
            rows = np.nonzero(mask)[0][ok]
            matched[rows] = True
            m_ts[rows] = dts[idx[ok]]
            for c in value_cols:
                m_vals[c][rows] = dvals[c][idx[ok]]
        sub = t.filter(pa.array(matched))
        out = sub
        out = out.append_column(
            f"{dim_ts_col}{suffix}",
            pa.array(m_ts[matched].view("datetime64[us]"), type=pa.timestamp("us")),
        )
        for c in value_cols:
            out = out.append_column(
                f"{c}{suffix}", pa.array(list(m_vals[c][matched]))
            )
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


def range_join_broadcast(
    big_ds,
    intervals: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    carry_cols=("label",),
    closed: str = "left",
):
    """Range (interval) join: every big-side row matches the interval
    containing ``value_col`` (inner join; non-matching rows drop).

    Intervals must be non-overlapping; they are broadcast once as sorted
    bound arrays and each stateless task does ONE searchsorted per batch
    — zero shuffle of the big side. ``closed``: "left" = [lo, hi),
    "both" = [lo, hi]. For overlapping intervals, decompose into
    elementary disjoint segments first (standard interval-tree flatten)
    and re-attach interval ids via the carried columns.
    """
    import ray

    los = intervals.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
    his = intervals.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(los, kind="stable")
    los, his = los[order], his[order]
    if np.any(los[1:] < his[:-1]):
        raise ValueError("range_join_broadcast requires non-overlapping intervals")
    carry = {c: intervals.column(c).take(pa.array(order)) for c in carry_cols}
    ref = ray.put((los, his, {c: a.to_numpy(zero_copy_only=False) for c, a in carry.items()}))

    def join_batch(t: pa.Table) -> pa.Table:
        plos, phis, pcarry = ray.get(ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(plos, v, side="right") - 1
        idx = np.maximum(idx, 0)
        inside = (v >= plos[idx]) & ((v <= phis[idx]) if closed == "both" else (v < phis[idx]))
        sub = t.filter(pa.array(inside))
        out = sub
        for c in carry_cols:
            out = out.append_column(c, pa.array(list(pcarry[c][idx[inside]])))
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)
