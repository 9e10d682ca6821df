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
- **session windows** — require per-key ordering: groupby(key) →
  map_groups sorts by ts and splits on gaps > timeout. ORDERING
  ASSUMPTION: correctness needs all rows of one key in one group, which
  groupby guarantees; order within the group is established by the sort
  inside the UDF, not by the shuffle.
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
    consecutive events exceeds ``gap_us``. → Dataset (key, n_sessions)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        # normalize to microseconds regardless of pandas ns/us storage
        ts = np.sort(g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64))
        if ts.size == 0:
            n = 0
        else:
            n = 1 + int((np.diff(ts) > gap_us).sum())
        return pd.DataFrame({key_col: [g[key_col].iloc[0]], "n_sessions": [np.int64(n)]})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
