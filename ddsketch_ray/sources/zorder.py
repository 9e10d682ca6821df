"""Z-order (Morton-interleaved) multi-column layout.

``write_bucketed`` co-locates ONE key; ``write_range_partitioned``
prunes ONE value column. A 100-TB events table is queried by boxes —
``user BETWEEN a AND b AND value BETWEEN x AND y`` — and a layout
sorted by either column alone leaves the other column's values uniform
inside every row group, so its predicate prunes nothing. Z-ordering
sorts by the bit-interleaving of the (quantized) columns: points close
in the multi-dimensional box end up close in file order, so parquet
row-group min/max statistics become TIGHT on every z-ordered column at
once and an ordinary filtered read prunes on all of them.

No side manifest: the pruning machinery IS parquet row-group
statistics (64k-row groups, same as the text index) driven by the
layout. The reader is a plain ``read_parquet(filter=...)`` plus the
exact residual filter — correctness never depends on the layout, only
speed does (the ``write_bucketed`` philosophy).

Quantization: each z column is scaled to ``bits``-bit integer rank
space using the GLOBAL min/max measured in one cheap aggregate pass
(driver gets 2 doubles per column). Nulls quantize to rank 0 — they
cluster at the z-origin and the residual filter drops them exactly.
Interleaving is loop-free over rows (one vector op per bit × column —
``bits × n_cols`` passes over an int64 vector).

measured (tools/stress_r5.py zorder20m, 20M rows, two uniform
columns, 64k row groups): a 1%-range predicate on the SECOND column —
the one an a-sorted layout can't help — intersects 28/385 row groups
z-ordered vs 388/388 a-sorted (13.9×); a 1%×1% two-column box prunes
to 6 groups (the a-sort's own column keeps it competitive there at 5).
Local NVMe walls barely differ (decode is cheap next to a warm page
cache); at 100 TB over an object store the row-group-touch ratio IS
the IO bill. Identical result rows on every query shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["write_zorder", "read_zorder_box", "zorder_key_batch"]


def _as_numeric(col):
    """Timestamps/dates participate as their epoch integers (a box on a
    ts column is passed as datetime64/pd.Timestamp bounds by the
    reader; internally everything ranks as int64 µs)."""
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        return col.cast(pa.int64())
    return col


def _col_stats(ds, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global (min, max) per column — one streaming pass, O(blocks ×
    cols) driver doubles."""
    import ray

    def block_stats(t: pa.Table) -> pa.Table:
        mins = []
        maxs = []
        for c in cols:
            col = _as_numeric(t.column(c))
            mins.append(pc.min(col).as_py())
            maxs.append(pc.max(col).as_py())
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "mn": pa.array([float("inf") if m is None else float(m) for m in mins]),
                "mx": pa.array([float("-inf") if m is None else float(m) for m in maxs]),
            }
        )

    lo = {c: float("inf") for c in cols}
    hi = {c: float("-inf") for c in cols}
    for tb in ray.get(
        ds.map_batches(block_stats, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    ):
        if tb.num_rows == 0 or "mn" not in tb.column_names:
            continue
        for c, mn, mx in zip(
            tb.column("col").to_pylist(),
            tb.column("mn").to_pylist(),
            tb.column("mx").to_pylist(),
        ):
            lo[c] = min(lo[c], mn)
            hi[c] = max(hi[c], mx)
    return {c: (lo[c], hi[c]) for c in cols}


def zorder_key_batch(
    t: pa.Table, cols: list[str], stats: dict, bits: int
) -> np.ndarray:
    """Morton key per row: quantize each column to ``bits``-bit rank
    space with the global stats, then interleave (column j owns bit
    positions j, j+n, j+2n, ...)."""
    n_cols = len(cols)
    z = np.zeros(t.num_rows, dtype=np.uint64)
    for j, c in enumerate(cols):
        x = _as_numeric(t.column(c)).to_numpy(zero_copy_only=False).astype(np.float64)
        lo, hi = stats[c]
        span = hi - lo
        if span <= 0:
            q = np.zeros(t.num_rows, dtype=np.uint64)
        else:
            scaled = (x - lo) / span * ((1 << bits) - 1)
            # nulls arrive as NaN from to_numpy — pin them to rank 0
            scaled = np.where(np.isnan(scaled), 0.0, np.clip(scaled, 0, (1 << bits) - 1))
            q = scaled.astype(np.uint64)
        for b in range(bits):
            z |= ((q >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * n_cols + j)
    return z.astype(np.int64)


def write_zorder(
    ds,
    out_dir: str,
    cols: list[str],
    bits: int = 16,
    row_group_size: int = 64_000,
) -> dict:
    """Write ``ds`` z-ordered by ``cols``. One stats pass + ONE sort on
    the Morton key (the layout's one-time shuffle), 64k row groups so
    statistics prune. Returns the manifest (cols, bits, global stats)
    written to ``_zorder_meta.json``."""
    import json
    import os

    import ray.data as rd  # noqa: F401

    cols = list(cols)
    if not cols:
        raise ValueError("write_zorder needs at least one column")
    # the Morton key must fit 64 bits: bits × n_cols ≤ 64. Auto-reduce
    # per-column resolution for wide keys (4 cols → 16 bits each,
    # 6 cols → 10) instead of silently wrapping the interleave.
    bits = min(int(bits), 64 // len(cols))
    if bits < 1:
        raise ValueError(f"too many z-order columns ({len(cols)} > 64)")
    stats = _col_stats(ds, cols)

    def add_z(t: pa.Table) -> pa.Table:
        return t.append_column("_z", pa.array(zorder_key_batch(t, cols, stats, bits)))

    os.makedirs(out_dir, exist_ok=True)
    (
        ds.map_batches(add_z, batch_format="pyarrow", batch_size=None)
        .sort("_z")
        .drop_columns(["_z"])
        .write_parquet(out_dir, row_group_size=row_group_size)
    )
    meta = {"cols": cols, "bits": bits, "stats": {c: list(stats[c]) for c in cols}}
    with open(os.path.join(out_dir, "_zorder_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def read_zorder_box(out_dir: str, box: dict, columns=None):
    """Filtered Dataset over a ``write_zorder`` layout: ``box`` maps
    column → (lo, hi) inclusive. The filter is EXACT (pyarrow row-level
    semantics); the layout only makes the row-group pruning effective.
    Columns absent from the box are simply not constrained."""
    import glob as _glob

    import ray.data as rd

    expr = None
    for c, (lo, hi) in box.items():
        e = (pc.field(c) >= lo) & (pc.field(c) <= hi)
        expr = e if expr is None else expr & e
    files = sorted(_glob.glob(f"{out_dir}/*.parquet"))
    return rd.read_parquet(files, columns=columns, filter=expr)
