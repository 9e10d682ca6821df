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


def small_key_rollup(
    ds,
    keys,
    sums=(),
    count_alias: str | None = None,
    mins=(),
    maxs=(),
) -> pa.Table:
    """Low-cardinality grouped aggregate WITHOUT Ray's Aggregate operator.

    Ray Data's ``groupby().aggregate`` costs ~20 µs/row regardless of
    group count (measured: 13.9 s of CPU to roll 600k joined rows into
    5 groups at sf0.1 — 14× the cost of the join it followed). For keys
    with few distinct values the textbook plan is two-level: each block
    partially aggregates with pyarrow's C++ hash aggregation
    (``Table.group_by``), and the driver combines the tiny partials
    (O(blocks × groups) rows — the ONLY data that ever leaves the
    workers; the contract is distinct-keys ≤ ~10⁵, else use Ray's
    groupby or the sort plan).

    ``sums`` / ``mins`` / ``maxs``: sequences of ``(alias, col)``;
    ``count_alias``: alias for a row count. Sums must be overflow-safe
    ints or exact-enough doubles per the oracle rules (int cents). Null
    keys form their own group (SQL GROUP BY semantics, unlike pandas).
    Returns a pyarrow Table sorted by ``keys``.
    """
    import ray

    keys = list(keys)
    sums, mins, maxs = list(sums), list(mins), list(maxs)
    part_aggs = (
        [(c, "sum") for _, c in sums]
        + [(c, "min") for _, c in mins]
        + [(c, "max") for _, c in maxs]
        + ([([], "count_all")] if count_alias else [])
    )
    # partial output column order follows the aggregate list; rename to
    # alias names so the final combine is alias-keyed and collision-free
    alias_order = (
        [a for a, _ in sums]
        + [a for a, _ in mins]
        + [a for a, _ in maxs]
        + ([count_alias] if count_alias else [])
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate(part_aggs)
        # group_by emits aggregate cols first or last depending on
        # version — select by generated name, then rename
        gen = (
            [f"{c}_sum" for _, c in sums]
            + [f"{c}_min" for _, c in mins]
            + [f"{c}_max" for _, c in maxs]
            + (["count_all"] if count_alias else [])
        )
        return g.select(keys + gen).rename_columns(keys + alias_order)

    parts = [
        t
        for t in ray.get(
            ds.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ).materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        sch = ds.schema()
        sch = getattr(sch, "base_schema", sch)  # Ray Schema → pyarrow schema
        if sch is None or not hasattr(sch, "empty_table"):
            # Ray pathology: filter-to-empty datasets can lose their schema
            # entirely (same convention as functions/joins.py:39).
            raise ValueError(
                "dataset has no schema (empty, schema-less); the rollup "
                "needs typed columns — pass at least one typed block"
            )
        return partial(sch.empty_table())
    allp = pa.concat_tables(parts).combine_chunks()
    final_aggs = (
        [(a, "sum") for a, _ in sums]
        + [(a, "min") for a, _ in mins]
        + [(a, "max") for a, _ in maxs]
        + ([(count_alias, "sum")] if count_alias else [])
    )
    out = allp.group_by(keys, use_threads=False).aggregate(final_aggs)
    gen = (
        [f"{a}_sum" for a, _ in sums]
        + [f"{a}_min" for a, _ in mins]
        + [f"{a}_max" for a, _ in maxs]
        + ([f"{count_alias}_sum"] if count_alias else [])
    )
    out = out.select(keys + gen).rename_columns(keys + alias_order)
    return out.sort_by([(k, "ascending") for k in keys])


def grouped_topk(
    ds,
    group_col: str,
    value_col: str,
    k: int,
    id_col: str,
    carry_cols=(),
    ascending: bool = False,
):
    """Top-k rows per group by ``value_col`` descending (or BOTTOM-k
    with ``ascending=True``), ties broken by ascending ``id_col`` (a
    unique column — makes the result deterministic). Returns a Dataset
    with (group_col, value_col, id_col, *carry_cols, rank) where rank
    is 1-based within the group.

    Partitioning assumption: groups ≫ blocks for full parallelism (a
    single dominant group degrades to O(blocks·k) driver rows — still
    tiny); k is small (the per-block emit is ≤ k rows per group).
    """
    import pandas as pd
    import ray.data as rd

    carry_cols = list(carry_cols)
    keep = [group_col, value_col, id_col] + carry_cols
    s = ds.select_columns(keep).sort(
        [group_col, value_col, id_col], descending=[False, not ascending, False]
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
            [group_col, value_col, id_col],
            ascending=[True, ascending, True],
            kind="stable",
        )
        edge["rank"] = edge.groupby(group_col).cumcount() + 1
        edge = edge[edge["rank"] <= k].drop(columns=["boundary"])
        edge["rank"] = edge["rank"].astype(np.int64)
        return internal.union(rd.from_pandas(edge.reset_index(drop=True)))
    return internal


def sorted_sum_rollup(ds, key_col: str, sum_cols: list[str]):
    """Per-key integer sums via the sort plan — the HIGH-cardinality
    counterpart of ``small_key_rollup`` (same family as
    ``sorted_group_rollup``, functions/dedup.py, measured 7-60× over
    ``groupby().aggregate`` at 9.6M rows): one distributed sort on the
    key, each sorted block reduces adjacent key runs with
    ``np.add.reduceat``, and only the block's first/last key groups
    (≤ 2 partial rows per block) are re-summed on the driver. Returns a
    Dataset (key_col, *sum_cols). Sums must be overflow-safe int64."""
    import ray.data as rd

    sum_cols = list(sum_cols)
    s = ds.sort(key_col)

    def block_rollup(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=ktype),
                    **{c: pa.array([], type=pa.int64()) for c in sum_cols},
                    "boundary": pa.array([], type=pa.bool_()),
                }
            )
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        out = {key_col: t.column(key_col).take(pa.array(starts))}
        for c in sum_cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            out[c] = pa.array(np.add.reduceat(v, starts).astype(np.int64))
        out["boundary"] = pa.array(boundary)
        return pa.table(out)

    rep = s.map_batches(block_rollup, batch_format="pyarrow", batch_size=None).materialize()
    keep = [key_col] + sum_cols
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).select(keep),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(keep),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 partial rows per block
    if len(edge):
        edge = edge.groupby(key_col, as_index=False)[sum_cols].sum()
        ktype = getattr(rep.schema(), "base_schema", rep.schema()).field(key_col).type
        # union as an ARROW block: a pandas block here would poison a
        # downstream sort (Ray's boundary sampler requires one block type)
        fix = pa.table(
            {
                key_col: pa.array(edge[key_col].to_numpy(), type=ktype),
                **{
                    c: pa.array(edge[c].to_numpy().astype(np.int64), pa.int64())
                    for c in sum_cols
                },
            }
        )
        return internal.union(rd.from_arrow(fix))
    return internal


def profile_numeric_columns(ds, columns, distinct_cols=()):
    """Distributed ``describe``: one streaming pass computing per-column
    (n_rows, n_nulls, min, max) — per-block pyarrow C++ aggregates,
    driver combines O(blocks × columns) partial rows — plus exact
    COUNT(DISTINCT) via the sort plan (``dedup.distinct_count``, one
    narrow sort per requested column — opt-in because it is the only
    non-map cost). → pyarrow Table
    (column, n_rows, n_nulls, min, max, n_distinct[nullable]).

    min/max are emitted as float64 (the profile surface, not an
    arithmetic path); int64 columns beyond 2^53 would round — profile
    such ids with ``distinct_cols``/count instead of min/max.
    """
    import ray

    columns = list(columns)
    distinct_cols = set(distinct_cols)

    def partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [], "mn": [], "mx": []}
        for c in columns:
            col = t.column(c)
            rows["column"].append(c)
            rows["n"].append(len(col))
            rows["nulls"].append(col.null_count)
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            rows["mn"].append(None if mn is None else float(mn))
            rows["mx"].append(None if mx is None else float(mx))
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "nulls": pa.array(rows["nulls"], pa.int64()),
                "mn": pa.array(rows["mn"], pa.float64()),
                "mx": pa.array(rows["mx"], pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None).materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    allp = pa.concat_tables(parts).combine_chunks()
    g = allp.group_by(["column"], use_threads=False).aggregate(
        [("n", "sum"), ("nulls", "sum"), ("mn", "min"), ("mx", "max")]
    )
    stats = {
        r["column"]: (r["n_sum"], r["nulls_sum"], r["mn_min"], r["mx_max"])
        for r in g.to_pylist()
    }
    nd = {}
    if distinct_cols:
        from ddsketch_ray.functions.dedup import distinct_count

        for c in sorted(distinct_cols):
            nd[c] = int(distinct_count(ds.select_columns([c]), c))
    return pa.table(
        {
            "column": pa.array(columns, pa.string()),
            "n_rows": pa.array([stats[c][0] for c in columns], pa.int64()),
            "n_nulls": pa.array([stats[c][1] for c in columns], pa.int64()),
            "min": pa.array([stats[c][2] for c in columns], pa.float64()),
            "max": pa.array([stats[c][3] for c in columns], pa.float64()),
            "n_distinct": pa.array([nd.get(c) for c in columns], pa.int64()),
        }
    )


def integer_moments(ds, x_col: str, y_col: str) -> dict:
    """Exact one-pass bivariate moments of two INTEGER columns:
    {n, sx, sy, sxx, syy, sxy} as exact (arbitrary-precision) ints.

    Scale contract: callers pre-scale floats to integers (cents, basis
    points — the repo's exact-sums convention) such that each
    ELEMENTWISE product |x·y|, x², y² fits int64 (money×quantity does
    by 9 orders of magnitude). Per-block sums are chunked so they stay
    exact past int64 (partials ship as strings, combined as Python
    ints), making the result deterministic across block layouts and
    cluster sizes, unlike float sums. Rows with a null in either column
    are dropped (SQL two-column aggregate semantics). Driver payload:
    one row per block."""
    import ray

    def _exact_sum(a: np.ndarray) -> int:
        """Exact sum of an int64 array whose TOTAL may exceed int64:
        chunk so each partial provably fits, combine as Python ints."""
        if a.size == 0:
            return 0
        m = int(np.abs(a).max())
        if m == 0:
            return 0
        step = max(1, (1 << 62) // m)
        if step >= a.size:
            return int(a.sum())
        return sum(int(a[i : i + step].sum()) for i in range(0, a.size, step))

    def block_moments(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t.column(x_col)), pc.is_valid(t.column(y_col)))
        x = t.column(x_col).filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = {
            "n": len(x),
            "sx": _exact_sum(x),
            "sy": _exact_sum(y),
            "sxx": _exact_sum(x * x),
            "syy": _exact_sum(y * y),
            "sxy": _exact_sum(x * y),
        }
        # strings: exact regardless of magnitude (int64 would wrap)
        return pa.table({k: pa.array([str(v)], pa.string()) for k, v in vals.items()})

    out = {"n": 0, "sx": 0, "sy": 0, "sxx": 0, "syy": 0, "sxy": 0}
    for tb in ray.get(
        ds.map_batches(
            block_moments, batch_format="pyarrow", batch_size=None
        ).materialize().to_arrow_refs()
    ):
        for k in out:
            out[k] += sum(int(v) for v in tb.column(k).to_pylist())
    return out


def integer_corr(ds, x_col: str, y_col: str) -> dict:
    """Pearson correlation of two pre-scaled integer columns from
    `integer_moments` — corr = (n·sxy − sx·sy) / (sqrt(n·sxx − sx²) ·
    sqrt(n·syy − sy²)), each operand an EXACT integer converted to
    float64 once, so the float result is bit-identical to a SQL oracle
    computing the same expression (and to any block layout). Returns
    {"n": int, "corr": float, "mean_x": float, "mean_y": float};
    corr is NaN for degenerate (constant) columns."""
    m = integer_moments(ds, x_col, y_col)
    n = m["n"]
    if n == 0:
        return {"n": 0, "corr": float("nan"), "mean_x": float("nan"), "mean_y": float("nan")}
    num = float(n * m["sxy"] - m["sx"] * m["sy"])
    dx = float(n * m["sxx"] - m["sx"] * m["sx"])
    dy = float(n * m["syy"] - m["sy"] * m["sy"])
    corr = num / (np.sqrt(dx) * np.sqrt(dy)) if dx > 0 and dy > 0 else float("nan")
    return {
        "n": n,
        "corr": float(corr),
        "mean_x": float(m["sx"]) / float(n),
        "mean_y": float(m["sy"]) / float(n),
    }


def grouped_quantile_exact(ds, key_col: str, value_col: str, q: float, alias: str = "q_value"):
    """EXACT per-key order-statistic quantile at UNBOUNDED key
    cardinality — the gap the sketch-based grouped quantiles
    (driver-held sketch per group) cannot cover at 1M+ keys.

    Definition: per key, sorted_values[floor(q * (n-1))] — the
    reference's oracle indexing (main.cpp:971-976). Sort plan: ONE
    distributed sort on (key, value); every INTERIOR key group of a
    block is wholly contained (keys are contiguous after the sort), so
    its order statistic is one vectorized take at
    start + floor(q*(n-1)); only each block's first/last group's rows
    escape to the driver (≤ 2 keys per block), which computes them the
    same way. Returns a Dataset (key_col, alias). Nulls in value are
    dropped per key (SQL semantics); keys with only nulls are absent.
    Partitioning assumption: keys ≫ blocks (one dominant key degrades
    to O(its rows) driver-side — use the sketch path for that shape).
    """
    import pandas as pd
    import ray.data as rd

    if not (0.0 <= q <= 1.0):
        raise ValueError("q must be in [0, 1]")

    def project(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t.column(key_col)), pc.is_valid(t.column(value_col)))
        t = t.filter(valid)
        return pa.table({"k": t.column(key_col), "v": t.column(value_col)})

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(["k", "v"])

    def block_quantile(t: pa.Table) -> pa.Table:
        ktype = t.schema.field("k").type
        vtype = t.schema.field("v").type
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=ktype),
                    alias: pa.array([], type=vtype),
                    "boundary": pa.array([], pa.bool_()),
                    "escape_v": pa.array([], type=vtype),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        kchg = np.r_[True, k[1:] != k[:-1]]
        starts = np.nonzero(kchg)[0]
        counts = np.diff(np.r_[starts, len(k)])
        # exact order statistic per group, one vectorized take
        target = starts + np.floor(q * (counts - 1)).astype(np.int64)
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        gid = np.cumsum(kchg) - 1
        esc = np.nonzero((gid == 0) | (gid == gid[-1]))[0]
        n_int = int((~boundary).sum())
        return pa.table(
            {
                key_col: pa.concat_arrays(
                    [
                        t.column("k").take(pa.array(starts[~boundary])).combine_chunks(),
                        t.column("k").take(pa.array(esc.astype(np.int64))).combine_chunks(),
                    ]
                ),
                alias: pa.concat_arrays(
                    [
                        t.column("v").take(pa.array(target[~boundary])).combine_chunks(),
                        pa.nulls(len(esc), vtype),
                    ]
                ),
                "boundary": pa.array([False] * n_int + [True] * len(esc)),
                "escape_v": pa.concat_arrays(
                    [
                        pa.nulls(n_int, vtype),
                        t.column("v").take(pa.array(esc.astype(np.int64))).combine_chunks(),
                    ]
                ),
            }
        )

    rep = s.map_batches(block_quantile, batch_format="pyarrow", batch_size=None).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).select([key_col, alias]),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select([key_col, "escape_v"]),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 keys' rows per block
    if len(edge):
        edge = edge.sort_values([key_col, "escape_v"], kind="stable")
        g = edge.groupby(key_col, sort=True)["escape_v"]
        rows = []
        for key, vals in g:
            arr = vals.to_numpy()
            rows.append((key, arr[int(np.floor(q * (len(arr) - 1)))]))
        out = pd.DataFrame(rows, columns=[key_col, alias])
        return internal.union(rd.from_pandas(out))
    return internal


def grouped_distinct_exact(ds, key_col: str, value_col: str, alias: str = "n_distinct"):
    """Exact per-key COUNT(DISTINCT value) at unbounded key cardinality
    — the per-key generalization of ``distinct_count``
    (functions/dedup.py) on the same sort plan: one distributed sort on
    (key, value); each block counts adjacent-new (key, value) pairs per
    key run; keys wholly inside a block are final. Per block, only the
    first/last key runs (≤ 2 partial rows) plus one (first/last pair)
    edge row go to the driver, which re-sums block-spanning keys and
    subtracts one per equal adjacent block-edge PAIR (a (key, value)
    pair spanning blocks was counted once per block — same subtraction
    ``distinct_count`` does globally). Driver payload = O(3 rows per
    block); no per-key state anywhere.

    Null / NaN values are DROPPED first (SQL COUNT(DISTINCT)
    semantics); keys whose values are all null are absent from the
    output. Returns a Dataset (key_col, alias)."""
    import pandas as pd
    import ray.data as rd

    def drop_null(t: pa.Table) -> pa.Table:
        t = t.select([key_col, value_col])
        v = t.column(value_col)
        mask = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            mask = pc.and_(mask, pc.invert(pc.coalesce(pc.is_nan(v), pa.scalar(False))))
        return t.filter(mask)

    s = ds.map_batches(drop_null, batch_format="pyarrow", batch_size=None).sort(
        [key_col, value_col]
    )

    def block_counts(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        vtype = t.schema.field(value_col).type
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], ktype),
                    alias: pa.array([], pa.int64()),
                    "boundary": pa.array([], pa.bool_()),
                    "edge_first_v": pa.array([], vtype),
                    "edge_last_v": pa.array([], vtype),
                }
            )
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        new_key = np.r_[True, k[1:] != k[:-1]]
        new_pair = np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])]
        starts = np.nonzero(new_key)[0]
        nd = np.add.reduceat(new_pair.astype(np.int64), starts)
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        # edge pair values ride on the first/last boundary rows; the
        # driver re-derives block order from them (pair ranges of
        # sorted blocks are disjoint-or-touching)
        ev_first = pa.nulls(len(starts), vtype).to_pylist()
        ev_last = pa.nulls(len(starts), vtype).to_pylist()
        first_v = t.column(value_col).take(pa.array([0])).to_pylist()[0]
        last_v = t.column(value_col).take(pa.array([t.num_rows - 1])).to_pylist()[0]
        ev_first[0] = first_v
        ev_last[-1] = last_v
        return pa.table(
            {
                key_col: t.column(key_col).take(pa.array(starts)),
                alias: pa.array(nd, pa.int64()),
                "boundary": pa.array(boundary),
                "edge_first_v": pa.array(ev_first, vtype),
                "edge_last_v": pa.array(ev_last, vtype),
            }
        )

    rep = s.map_batches(block_counts, batch_format="pyarrow", batch_size=None).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).select([key_col, alias]),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(
            [key_col, alias, "edge_first_v", "edge_last_v"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 rows per block
    if not len(edge):
        return internal
    firsts = edge[edge["edge_first_v"].notna()].sort_values(
        [key_col, "edge_first_v"], kind="stable"
    )
    lasts = edge[edge["edge_last_v"].notna()].sort_values(
        [key_col, "edge_last_v"], kind="stable"
    )
    # adjacent blocks sharing their edge (key, value) pair double-count it
    sub = pd.Series(0, index=edge.index, dtype=np.int64)
    if len(firsts) > 1:
        fk = firsts[key_col].to_numpy()
        fv = firsts["edge_first_v"].to_numpy()
        lk = lasts[key_col].to_numpy()
        lv = lasts["edge_last_v"].to_numpy()
        dup = (lk[:-1] == fk[1:]) & (lv[:-1] == fv[1:])
        for i in np.nonzero(dup)[0]:
            sub[firsts.index[i + 1]] += 1
    fixed = edge.assign(**{alias: edge[alias] - sub})
    fixed = fixed.groupby(key_col, as_index=False)[alias].sum()
    ktype = getattr(rep.schema(), "base_schema", rep.schema()).field(key_col).type
    out = pa.table(
        {
            key_col: pa.array(fixed[key_col].to_numpy(), type=ktype),
            alias: pa.array(fixed[alias].to_numpy().astype(np.int64), pa.int64()),
        }
    )
    return internal.union(rd.from_arrow(out))


def pivot_rollup(
    ds,
    group_col: str,
    pivot_col: str,
    pivot_values,
    sum_col: str | None = None,
    count_prefix: str = "n_",
) -> pa.Table:
    """Wide grouped aggregate (SQL ``COUNT(*)/SUM(x) FILTER (WHERE
    pivot = v)``): one output row per group, one column per pivot value
    — the report/feature-matrix shape. ``pivot_values`` must be the
    explicit (small) value list: an unknown pivot domain would make the
    output schema data-dependent, which neither Arrow blocks nor the
    SQL oracle can express; values outside the list are ignored.

    Plan: per-batch vectorized indicator columns (one ``==`` mask per
    pivot value; ``sum_col`` multiplies the mask — int64, so sums must
    be overflow-safe ints per the oracle rules), then the two-level
    ``small_key_rollup`` partial plan — the shuffle carries
    O(blocks × groups) pre-aggregated rows, never the input. Returns a
    pyarrow Table sorted by ``group_col``."""
    pivot_values = list(pivot_values)
    aliases = [f"{count_prefix}{v}" for v in pivot_values]

    def indicators(t: pa.Table) -> pa.Table:
        cols = {group_col: t.column(group_col)}
        pv = t.column(pivot_col)
        if sum_col is not None:
            x = t.column(sum_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        for v, a in zip(pivot_values, aliases):
            m = pc.fill_null(pc.equal(pv, v), False).to_numpy(zero_copy_only=False)
            vals = (m.astype(np.int64) * x) if sum_col is not None else m.astype(np.int64)
            cols[a] = pa.array(vals)
        return pa.table(cols)

    ind = ds.map_batches(indicators, batch_format="pyarrow", batch_size=None)
    return small_key_rollup(ind, [group_col], sums=[(a, a) for a in aliases])


def equiwidth_histogram(ds, value_col: str, lo: float, hi: float, n_bins: int) -> pa.Table:
    """Exact equi-width histogram over [lo, hi): bin = floor((v - lo) /
    width), values < lo clamp to bin 0? NO — out-of-range and null
    values are counted in dedicated ``underflow`` / ``overflow`` bins
    (-1 / n_bins) so nothing is silently dropped. One pure map computing
    bins + the two-level ``small_key_rollup`` — shuffle carries
    O(blocks × bins) rows. Bin edges are float64; the SQL oracle
    mirrors the same floor expression. Returns a pyarrow Table
    (bin:int64, n:int64) sorted by bin, only non-empty bins."""
    if not (hi > lo) or n_bins <= 0:
        raise ValueError("need hi > lo and n_bins > 0")
    width = (hi - lo) / n_bins

    def bins(t: pa.Table) -> pa.Table:
        v = t.column(value_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        b = np.floor((v - lo) / width)
        b = np.where(np.isnan(v), n_bins, b)  # nulls/NaN -> overflow bin
        b = np.clip(b, -1, n_bins).astype(np.int64)
        return pa.table({"bin": pa.array(b)})

    keyed = ds.map_batches(bins, batch_format="pyarrow", batch_size=None)
    return small_key_rollup(keyed, ["bin"], count_alias="n")


def hierarchical_heavy_hitters(
    ds,
    level_cols: list[str],
    phi: float,
    weight_col: str | None = None,
):
    """Deterministic discounted hierarchical heavy hitters (the exact
    variant of Cormode et al., "Finding Hierarchical Heavy Hitters in
    Data Streams", VLDB 2003) over a column-prefix hierarchy: the node
    at level ``l`` is the tuple of the first ``l`` columns of
    ``level_cols`` (level 0 = the root = the whole stream, leaves =
    the full tuple). The corpus-governance question this answers: which
    (lang), (lang, source), ... subpopulations exceed ``phi`` of the
    corpus AFTER discounting the mass already reported below them.

    Bottom-up discounting: a leaf's discounted count is its exact
    count; an inner node's is the sum of its children's NOT-reported
    mass (a reported HHH child passes 0 upward, a non-HHH child passes
    its own discounted count). A node is an HHH iff disc >= T where
    T = max(1, ceil(phi * N)). All counts are exact integers from ONE
    distributed leaf rollup — no sketch error; every number is
    reproducible by a SQL oracle as chained per-level GROUP BYs.

    ``weight_col`` switches the mass from row count to an integer
    weight sum (e.g. token counts — the unit corpus mixtures are
    specified in). Keys must be non-null (null keys would need a
    path encoding; callers filter or fill first).

    Scale: the leaf rollup is small_key_rollup (distinct leaf tuples
    must fit its ~10^5-group contract — true for lang x source style
    governance hierarchies; for unbounded leaf domains use the
    count-min + dyadic machinery instead). Driver holds O(leaf groups)
    rows; every upper level shrinks.

    Returns a pandas DataFrame (level:int64, path:str, cnt:int64,
    disc:int64) of the HHH nodes, path = "/".join(key values), sorted
    by (level, path). The root reports with path "".
    """
    import pandas as pd

    if not level_cols:
        raise ValueError("level_cols must name at least one column")
    if not (0.0 < phi <= 1.0):
        raise ValueError("phi must be in (0, 1]")
    sums = [("cnt", weight_col)] if weight_col else []
    leaf = small_key_rollup(
        ds,
        list(level_cols),
        sums=sums,
        count_alias=None if weight_col else "cnt",
    ).to_pandas()
    for c in level_cols:
        if leaf[c].isna().any():
            raise ValueError(f"hierarchical_heavy_hitters: null keys in {c!r}")
    n_total = int(leaf["cnt"].sum())
    if n_total == 0:
        return pd.DataFrame(
            {
                "level": np.array([], dtype=np.int64),
                "path": np.array([], dtype=object),
                "cnt": np.array([], dtype=np.int64),
                "disc": np.array([], dtype=np.int64),
            }
        )
    import math

    thresh = max(1, int(math.ceil(phi * n_total)))

    out_rows = []
    # leaves: disc == cnt
    cur = leaf.copy()
    cur["disc"] = cur["cnt"].astype(np.int64)
    for level in range(len(level_cols), 0, -1):
        cols = list(level_cols[:level])
        is_hhh = cur["disc"].to_numpy() >= thresh
        paths = cur[cols[0]].astype(str)
        for c in cols[1:]:
            paths = paths + "/" + cur[c].astype(str)
        for p, c_, d_ in zip(
            paths.to_numpy()[is_hhh],
            cur["cnt"].to_numpy()[is_hhh],
            cur["disc"].to_numpy()[is_hhh],
        ):
            out_rows.append((level, p, int(c_), int(d_)))
        passed = np.where(is_hhh, 0, cur["disc"].to_numpy())
        cur = cur.assign(_passed=passed)
        parent_cols = cols[:-1]
        if parent_cols:
            cur = (
                cur.groupby(parent_cols, as_index=False, sort=False)
                .agg(cnt=("cnt", "sum"), disc=("_passed", "sum"))
            )
        else:
            root_cnt = int(cur["cnt"].sum())
            root_disc = int(cur["_passed"].sum())
            if root_disc >= thresh:
                out_rows.append((0, "", root_cnt, root_disc))
    out = pd.DataFrame(out_rows, columns=["level", "path", "cnt", "disc"])
    out["level"] = out["level"].astype(np.int64)
    out["cnt"] = out["cnt"].astype(np.int64)
    out["disc"] = out["disc"].astype(np.int64)
    return out.sort_values(["level", "path"]).reset_index(drop=True)


def frequent_items(
    ds,
    col: str,
    phi: float,
    k: int | None = None,
    weight_col: str | None = None,
):
    """EXACT φ-frequent items over an unbounded-cardinality column in two
    distributed passes — no full groupby, no hashing, O(blocks × k)
    driver traffic.

    Pass 1 builds a Misra-Gries summary (sketches/mg.py, k counters) via
    the aggregate protocol: its candidate set provably contains every
    value with total weight > n/(k+1), so with ``k >= ceil(1/phi)`` it
    is a superset of the φ-frequent set. Pass 2 broadcasts the sorted
    candidate array (ray.put, ≤ k values) and counts ONLY candidates
    exactly per block (pyarrow hash-agg per block → ``small_key_rollup``
    over candidate INDICES); values with exact weight ≥ ceil(φ·n)
    survive. The output is therefore exact and layout-invariant even
    though the pass-1 summary state depends on block boundaries — a
    plain GROUP BY / HAVING recomputes it, which is what the gate's SQL
    oracle does (``frequent_tokens_documents``).

    At 100 TB this is the "frequent hosts / tokens / shingles" shape:
    two streaming passes, KB-sized summary in the shuffle, candidate
    list ≤ k values broadcast once.

    Returns a pyarrow Table (item, cnt:int64, n:int64) sorted by
    (cnt DESC, item ASC); ``n`` is the exact total weight (same value
    every row — kept so callers and oracles share the denominator).
    """
    import math

    import ray

    from ddsketch_ray.agg import MisraGriesAgg, sketch_from_result

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    k_min = math.ceil(1.0 / phi)
    if k is None:
        k = 2 * k_min  # slack halves the summary's realized offset
    if k < k_min:
        raise ValueError(
            f"k={k} cannot cover phi={phi}: need k >= ceil(1/phi) = {k_min} "
            "for the Misra-Gries superset guarantee"
        )

    res = ds.aggregate(MisraGriesAgg(on=col, k=k, weight_col=weight_col, alias_name="_mg"))
    sk = sketch_from_result(res["_mg"])
    n = sk.n
    cand = sk.candidates()  # sorted object array, <= k values
    if n == 0 or len(cand) == 0:
        return pa.table(
            {"item": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    threshold = math.ceil(phi * n)
    cand_ref = ray.put(cand)

    def count_candidates(t: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        vcol = t.column(col)
        if weight_col is None:
            vc = pa.compute.value_counts(vcol.combine_chunks().drop_null())
            vals = vc.field("values").to_numpy(zero_copy_only=False)
            cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            g = (
                pa.table({"v": vcol, "w": pc.cast(t.column(weight_col), pa.int64())})
                .drop_null()
                .group_by("v")
                .aggregate([("w", "sum")])
            )
            vals = g.column("v").to_numpy(zero_copy_only=False)
            cnts = g.column("w_sum").to_numpy(zero_copy_only=False)
        vals = np.asarray(vals, dtype=object)
        idx = np.searchsorted(c, vals)
        idx_c = np.minimum(idx, len(c) - 1)
        hit = c[idx_c] == vals
        return pa.table(
            {"idx": pa.array(idx_c[hit], pa.int64()), "cnt": pa.array(cnts[hit], pa.int64())}
        )

    counted = ds.map_batches(count_candidates, batch_format="pyarrow", batch_size=None)
    rolled = small_key_rollup(counted, ["idx"], sums=[("cnt", "cnt")])
    idx_arr = rolled.column("idx").to_numpy(zero_copy_only=False)
    cnt_arr = rolled.column("cnt").to_numpy(zero_copy_only=False)
    keep = cnt_arr >= threshold
    items, cnts = cand[idx_arr[keep]], cnt_arr[keep]
    order = sorted(range(len(items)), key=lambda i: (-int(cnts[i]), items[i]))
    # typed even when empty (pa.array([]) would be null-typed and break
    # schema comparison): infer the item type from the candidate values
    item_type = pa.int64() if isinstance(cand[0], (int, np.integer)) else pa.string()
    return pa.table(
        {
            "item": pa.array([items[i] for i in order], item_type),
            "cnt": pa.array([int(cnts[i]) for i in order], pa.int64()),
            "n": pa.array([n] * len(order), pa.int64()),
        }
    )


def frequent_items_by_group(
    ds,
    group_col: str,
    col: str,
    phi: float,
    k: int | None = None,
    weight_col: str | None = None,
):
    """EXACT per-group φ-frequent items (per-language frequent tokens,
    per-host frequent shingles) — ``frequent_items`` with a group key.
    ``weight_col`` (int64) makes both passes weight-based: "which items
    carry ≥φ of each group's token mass".

    Pass 1 builds one Misra-Gries summary per group through the
    two-level small-key plan (``distribution.grouped_sketch_partials``:
    per-block group-sorted partials, O(blocks × groups) driver merge —
    inherits its distinct-groups ≤ ~10³ contract; for high-cardinality
    groups use ``groupby().aggregate(MisraGriesAgg(...))`` and shuffle
    the recount instead). Pass 2 broadcasts each group's sorted
    candidate array (≤k values per group) and exact-counts ONLY
    candidates per block into composite (group_idx, cand_idx) partials
    rolled by ``small_key_rollup``. Each group's threshold is
    ceil(φ · n_g) over its OWN total weight n_g, so the output is exact
    and layout-invariant — the gate oracle is a grouped HAVING.

    Returns a pyarrow Table (group, item, cnt:int64, n:int64) sorted by
    (group ASC, cnt DESC, item ASC); ``n`` is the group's exact total.
    """
    import math

    import ray

    from ddsketch_ray.functions.distribution import grouped_sketch_partials
    from ddsketch_ray.sketches.mg import MisraGries

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    k_min = math.ceil(1.0 / phi)
    if k is None:
        k = 2 * k_min
    if k < k_min:
        raise ValueError(
            f"k={k} cannot cover phi={phi}: need k >= ceil(1/phi) = {k_min}"
        )

    sketches = grouped_sketch_partials(
        ds, lambda: MisraGries(k=k), col, group_col, weight_col=weight_col
    )
    groups = sorted(sketches)
    if not groups:
        return pa.table(
            {"group": pa.array([], pa.string()), "item": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    cand_by_group = {g: sketches[g].candidates() for g in groups}
    n_by_group = {g: sketches[g].n for g in groups}
    group_arr = np.array(groups, dtype=object)
    cand_ref = ray.put((group_arr, [cand_by_group[g] for g in groups]))

    def count_candidates(t: pa.Table) -> pa.Table:
        garr, cands = ray.get(cand_ref)
        g = np.asarray(t.column(group_col).to_numpy(zero_copy_only=False), dtype=object)
        v = np.asarray(t.column(col).to_numpy(zero_copy_only=False), dtype=object)
        w = (
            t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if weight_col is not None
            else None
        )
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        ws = w[order] if w is not None else None
        cuts = np.flatnonzero(gs[1:] != gs[:-1]) + 1
        starts = np.concatenate(([0], cuts)) if len(gs) else np.empty(0, np.int64)
        ends = np.concatenate((cuts, [len(gs)])) if len(gs) else np.empty(0, np.int64)
        out_key, out_cnt = [], []
        for s, e in zip(starts, ends):
            gi = np.searchsorted(garr, gs[s])
            if gi >= len(garr) or garr[gi] != gs[s]:
                continue  # group had only null/zero mass in pass 1
            c = cands[gi]
            if len(c) == 0:
                continue
            if ws is None:
                vals, cnts = np.unique(vs[s:e], return_counts=True)
            else:  # exact int64 weight sums (bincount would go float64)
                vals, inv = np.unique(vs[s:e], return_inverse=True)
                cnts = np.zeros(len(vals), dtype=np.int64)
                np.add.at(cnts, inv, ws[s:e])
            idx = np.minimum(np.searchsorted(c, vals), len(c) - 1)
            hit = c[idx] == vals
            # composite int64 key: group_idx * 2^32 + cand_idx
            out_key.append(gi * (1 << 32) + idx[hit].astype(np.int64))
            out_cnt.append(cnts[hit].astype(np.int64))
        if out_key:
            key = np.concatenate(out_key)
            cnt = np.concatenate(out_cnt)
        else:
            key = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        return pa.table({"key": pa.array(key, pa.int64()), "cnt": pa.array(cnt, pa.int64())})

    counted = ds.map_batches(count_candidates, batch_format="pyarrow", batch_size=None)
    rolled = small_key_rollup(counted, ["key"], sums=[("cnt", "cnt")])
    keys = rolled.column("key").to_numpy(zero_copy_only=False)
    cnts = rolled.column("cnt").to_numpy(zero_copy_only=False)
    rows = []
    for key, cnt in zip(keys.tolist(), cnts.tolist()):
        gi, ci = key >> 32, key & 0xFFFFFFFF
        g = groups[gi]
        if cnt >= math.ceil(phi * n_by_group[g]):
            rows.append((g, cand_by_group[g][ci], int(cnt), n_by_group[g]))
    rows.sort(key=lambda r: (r[0], -r[2], r[1]))
    # typed even when empty (see frequent_items): infer from pass-1 state
    grp_type = pa.int64() if isinstance(groups[0], (int, np.integer)) else pa.string()
    sample_cands = next((c for c in cand_by_group.values() if len(c)), None)
    item_type = (
        pa.int64()
        if sample_cands is not None and isinstance(sample_cands[0], (int, np.integer))
        else pa.string()
    )
    return pa.table(
        {
            "group": pa.array([r[0] for r in rows], grp_type),
            "item": pa.array([r[1] for r in rows], item_type),
            "cnt": pa.array([r[2] for r in rows], pa.int64()),
            "n": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def kmv_overlap_matrix(ds, group_col: str, value_col: str, k: int = 64, seed: int = 0):
    """Pairwise distinct-set overlap between every pair of groups from
    ONE grouped KMV pass — the theta-sketch audience-overlap dashboard
    (distinct-user overlap between event types, distinct-url overlap
    between languages/hosts). Beyer et al. SIGMOD 2007 §4 set algebra
    via ``sketches/kmv.py::kmv_set_ops``; bottom-k by a SHARED hash is
    a coordinated sample, so one sketch per group answers all
    G·(G−1)/2 pairs.

    Distributed cost is the single ``groupby(group_col)`` building G
    bottom-k sketches (G small by contract — group keys are categories,
    not ids); the pairwise loop runs on the driver over k-sized arrays,
    O(G²·k) — ~40 KB at G=10, k=512. Estimates are exact below
    saturation (all groups < k distinct) and (k−1)/U_(k)-approximate
    above it; either way the output is deterministic, merge-order
    independent, and exactly reproducible by a SplitMix64 SQL oracle
    (`kmv_overlap_matrix_events` gate query).

    Returns a pa.Table with one row per unordered pair, ordered
    (group_a < group_b): ``group_a, group_b, k_used, n_both,
    est_union, est_intersection, est_diff_a, est_diff_b, jaccard``
    (floats ROUND(,6) to match the SQL mirror).
    """
    from itertools import combinations

    from ddsketch_ray.agg import KMVAgg, sketch_from_result
    from ddsketch_ray.sketches.kmv import kmv_set_ops

    rows = (
        ds.groupby(group_col)
        .aggregate(KMVAgg(on=value_col, k=k, seed=seed, alias_name="kmv"))
        .to_pandas()
    )
    if len(rows) == 0:
        return pa.table(
            {
                "group_a": pa.array([], pa.string()),
                "group_b": pa.array([], pa.string()),
                "k_used": pa.array([], pa.int64()),
                "n_both": pa.array([], pa.int64()),
                "est_union": pa.array([], pa.float64()),
                "est_intersection": pa.array([], pa.float64()),
                "est_diff_a": pa.array([], pa.float64()),
                "est_diff_b": pa.array([], pa.float64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    sketches = {
        row[group_col]: sketch_from_result(row["kmv"]) for _, row in rows.iterrows()
    }
    out: dict[str, list] = {
        "group_a": [], "group_b": [], "k_used": [], "n_both": [],
        "est_union": [], "est_intersection": [], "est_diff_a": [],
        "est_diff_b": [], "jaccard": [],
    }
    for ga, gb in combinations(sorted(sketches), 2):
        r = kmv_set_ops(sketches[ga], sketches[gb])
        out["group_a"].append(ga)
        out["group_b"].append(gb)
        out["k_used"].append(int(r["k_used"]))
        out["n_both"].append(int(r["n_both"]))
        out["est_union"].append(round(r["est_union"], 6))
        out["est_intersection"].append(round(r["est_intersection"], 6))
        out["est_diff_a"].append(round(r["est_diff_a"], 6))
        out["est_diff_b"].append(round(r["est_diff_b"], 6))
        out["jaccard"].append(round(r["jaccard"], 6))
    grp_type = (
        pa.int64() if isinstance(next(iter(sketches)), (int, np.integer)) else pa.string()
    )
    return pa.table(
        {
            "group_a": pa.array(out["group_a"], grp_type),
            "group_b": pa.array(out["group_b"], grp_type),
            "k_used": pa.array(out["k_used"], pa.int64()),
            "n_both": pa.array(out["n_both"], pa.int64()),
            "est_union": pa.array(out["est_union"], pa.float64()),
            "est_intersection": pa.array(out["est_intersection"], pa.float64()),
            "est_diff_a": pa.array(out["est_diff_a"], pa.float64()),
            "est_diff_b": pa.array(out["est_diff_b"], pa.float64()),
            "jaccard": pa.array(out["jaccard"], pa.float64()),
        }
    )
