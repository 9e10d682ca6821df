"""Exact distributed analytics plans beyond plain aggregates.

``grouped_topk`` — top-k rows per group, the "best N examples per
language / per domain" shape of training-data curation. Built on the
sort plan (CLAUDE.md: sort + per-block vectorized reduce beats
high-cardinality ``groupby`` by up to 60×): one distributed sort on
(group, value DESC, tiebreak), then each block keeps the first k rows
of every group it sees; only the block-edge groups (≤ 2 per block) need
driver stitching, and each contributes at most k candidate rows — the
driver holds O(blocks × k), never the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_topk(
    ds,
    group_col: str,
    value_col: str,
    k: int,
    id_col: str,
    carry_cols=(),
):
    """Top-k rows per group by ``value_col`` descending, ties broken by
    ascending ``id_col`` (a unique column — makes the result
    deterministic). Returns a Dataset with
    (group_col, value_col, id_col, *carry_cols, rank) where rank is
    1-based within the group.

    Partitioning assumption: groups ≫ blocks for full parallelism (a
    single dominant group degrades to O(blocks·k) driver rows — still
    tiny); k is small (the per-block emit is ≤ k rows per group).
    """
    import pandas as pd
    import ray.data as rd

    carry_cols = list(carry_cols)
    keep = [group_col, value_col, id_col] + carry_cols
    s = ds.select_columns(keep).sort(
        [group_col, value_col, id_col], descending=[False, True, False]
    )

    def block_topk(t: pa.Table) -> pa.Table:
        base = {c: t.column(c) for c in keep}
        if t.num_rows == 0:
            cols = {c: base[c] for c in keep}
            cols["rank"] = pa.array([], type=pa.int64())
            cols["boundary"] = pa.array([], type=pa.bool_())
            return pa.table(cols)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        gchg = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(gchg) - 1
        starts = np.nonzero(gchg)[0]
        # rank within group = position - group start (0-based here)
        pos = np.arange(len(g)) - starts[gid]
        sel = pos < k
        m = np.nonzero(sel)[0]
        take = pa.array(m.astype(np.int64))
        cols = {c: t.column(c).take(take) for c in keep}
        cols["rank"] = pa.array((pos[m] + 1).astype(np.int64))
        # first and last group of the block may continue in neighbors
        boundary = (gid[m] == 0) | (gid[m] == gid[-1])
        cols["boundary"] = pa.array(boundary)
        return pa.table(cols)

    rep = s.map_batches(block_topk, batch_format="pyarrow", batch_size=None).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).drop_columns(["boundary"]),
        batch_format="pyarrow", batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()  # ≤ 2k rows per block
    if len(edge):
        # rows are already in global sorted order within each group once
        # re-sorted by (value desc, id); recompute rank per group, cut k
        edge = edge.sort_values(
            [group_col, value_col, id_col], ascending=[True, False, True], kind="stable"
        )
        edge["rank"] = edge.groupby(group_col).cumcount() + 1
        edge = edge[edge["rank"] <= k].drop(columns=["boundary"])
        edge["rank"] = edge["rank"].astype(np.int64)
        return internal.union(rd.from_pandas(edge.reset_index(drop=True)))
    return internal
