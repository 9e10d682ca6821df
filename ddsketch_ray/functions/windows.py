"""Windowed / stream-shaped aggregation over an event log.

Ray Data is a batch engine with no event-time watermarks; a bounded event
log (the ``events`` table: event_id, ts, user_id, event_type, value) is
treated as an ordered, partitioned stream (SURVEY.md §2.3 "streaming
semantics"):

- **tumbling windows** — a vectorized derive adds
  ``window_start = floor(ts / size) * size``; any grouped aggregate
  (sketch or exact) then runs per (key, window). Pure map + the usual
  pre-aggregated groupby; nothing stateful.
- **sliding windows** — each row is exploded to the ``size/hop`` windows
  containing it (bounded fan-out inside map_batches), then tumbling
  machinery applies.
- **session windows** — require per-key ordering: one distributed sort
  on (key, ts), then each sorted block counts session starts
  vectorized (key-change OR gap > timeout) and only the block-edge key
  groups (≤ 2 partial rows per block) are stitched on the driver —
  the same sort plan as ``sorted_group_rollup`` (functions/dedup.py),
  measured 60× faster than per-key ``map_groups`` at 9.6M rows
  (BASELINE.md r2). No per-key Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_SECOND = 1_000_000
US_PER_HOUR = 3600 * US_PER_SECOND


def add_tumbling_window(
    batch: pa.Table, ts_col: str = "ts", size_us: int = US_PER_HOUR, out_col: str = "window_start"
) -> pa.Table:
    ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
    start = (ts // size_us) * size_us
    return batch.append_column(out_col, pa.array(start).cast(pa.timestamp("us")))


def explode_sliding_windows(
    batch: pa.Table,
    ts_col: str = "ts",
    size_us: int = US_PER_HOUR,
    hop_us: int = US_PER_HOUR // 4,
    out_col: str = "window_start",
) -> pa.Table:
    """Each row repeated once per sliding window covering it (size/hop
    copies — keep the ratio small; it multiplies the shuffle)."""
    ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
    k = -(-size_us // hop_us)  # ceiling: covers non-divisible size/hop
    # windows with start in (ts - size, ts], aligned to hop
    last = (ts // hop_us) * hop_us
    starts = last[:, None] - hop_us * np.arange(k, dtype=np.int64)[None, :]
    valid = starts > (ts[:, None] - size_us)
    idx = np.repeat(np.arange(len(ts)), valid.sum(axis=1))
    flat = starts[valid]
    out = batch.take(pa.array(idx))
    return out.append_column(out_col, pa.array(flat).cast(pa.timestamp("us")))


def session_counts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * US_PER_SECOND,
):
    """Per-key session count: sessions split where the gap between
    consecutive events exceeds ``gap_us``. → Dataset (key, n_sessions).

    Sort plan (not groupby.map_groups — per-key Python calls are the
    scale-killer CLAUDE.md documents): project to (key, ts:int64), one
    distributed sort on (key, ts), then each block counts session
    starts vectorized — a row starts a session iff it starts a key
    group or follows a > ``gap_us`` gap. A key group spanning a block
    edge double-counts one session start iff the cross-block gap is
    small, so each block's FIRST and LAST key groups are emitted as
    partial rows (key, n, first_ts, last_ts) and stitched driver-side:
    O(2 × blocks) rows, subtract one per small adjacent-partial gap.
    Partitioning assumption: keys ≫ blocks (a single dominant key
    degrades to O(blocks) partials of that key — still tiny)."""
    import ray.data as rd

    def project(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if pa.types.is_timestamp(col.type):  # normalize ns/us storage
            col = col.cast(pa.timestamp("us"))
        return pa.table({"k": t.column(key_col), "t": col.cast(pa.int64())})

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(["k", "t"])

    def block_sessions(t: pa.Table) -> pa.Table:
        ktype = t.schema.field("k").type
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=ktype),
                    "n_sessions": pa.array([], type=pa.int64()),
                    "first_ts": pa.array([], type=pa.int64()),
                    "last_ts": pa.array([], type=pa.int64()),
                    "boundary": pa.array([], type=pa.bool_()),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy()
        kchg = np.r_[True, k[1:] != k[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap_us] & ~kchg
        sess_start = (kchg | gap_break).astype(np.int64)
        kstarts = np.nonzero(kchg)[0]
        kends = np.r_[kstarts[1:], len(k)] - 1
        n_sess = np.add.reduceat(sess_start, kstarts)
        boundary = np.zeros(len(kstarts), dtype=bool)
        boundary[0] = boundary[-1] = True
        return pa.table(
            {
                key_col: t.column("k").take(pa.array(kstarts)),
                "n_sessions": pa.array(n_sess),
                "first_ts": pa.array(ts[kstarts]),
                "last_ts": pa.array(ts[kends]),
                "boundary": pa.array(boundary),
            }
        )

    rep = s.map_batches(block_sessions, batch_format="pyarrow", batch_size=None).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("boundary"))).select(
            [key_col, "n_sessions"]
        ),
        batch_format="pyarrow", batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()  # ≤ 2 partial rows per block
    if len(edge):
        edge = edge.sort_values([key_col, "first_ts"], kind="stable")
        same = edge[key_col].eq(edge[key_col].shift())
        joined = same & (edge["first_ts"] - edge["last_ts"].shift() <= gap_us)
        # a partial's first row was counted as a session start; when the
        # previous partial of the same key ends within gap_us it is the
        # same session — subtract the double count
        edge["n_sessions"] = edge["n_sessions"] - joined.astype(np.int64)
        out = edge.groupby(key_col, as_index=False)["n_sessions"].sum()
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return internal.union(rd.from_pandas(out[[key_col, "n_sessions"]]))
    return internal
