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


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = 30 * 60 * US_PER_SECOND,
    session_alias: str = "session_id",
):
    """Per-ROW session assignment — the SQL
    ``FIRST_VALUE(id) OVER (PARTITION BY key, session_run ORDER BY ts, id)``
    shape: every input row gets a ``session_alias`` equal to the
    ``id_col`` of its session's first event (sessions split where the
    gap between consecutive same-key events exceeds ``gap_us``).
    → Dataset (id_col, session_alias), one row per input row.

    Sort plan (``session_counts`` returns only per-key counts; this
    materializes the assignment itself): project to (k, t:int64,
    i:int64), ONE distributed sort on (k, t, i), then each block labels
    rows vectorized — session id = id of the last row at-or-before it
    where (key changed OR gap > gap_us). The only rows that can be
    mislabeled are the block's FIRST session (a session continuing from
    the previous block); their provisional label is the block's first
    row id, which is globally unique, so the fix is a driver-built
    remap {first_row_id -> true session id} of size ≤ blocks, chained
    sequentially across blocks (a session spanning B blocks remaps
    B−1 entries to the same true id) and broadcast into one relabel
    pass. Driver payload: ONE summary row per block. No per-key Python
    anywhere; keys must be non-null (SQL PARTITION BY groups nulls —
    raise instead of guessing); ``id_col`` must be unique int64."""
    import ray
    import ray.data as rd

    def project(t: pa.Table) -> pa.Table:
        if t.column(key_col).null_count:
            raise ValueError("sessionize: null keys not supported")
        col = t.column(ts_col)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        return pa.table(
            {
                "k": t.column(key_col),
                "t": col.cast(pa.int64()),
                "i": t.column(id_col).cast(pa.int64()),
            }
        )

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(["k", "t", "i"])

    def block_label(t: pa.Table) -> pa.Table:
        ktype = t.schema.field("k").type
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    session_alias: pa.array([], pa.int64()),
                    "_sum": pa.array([], pa.bool_()),
                    "_fk": pa.array([], ktype),
                    "_ft": pa.array([], pa.int64()),
                    "_lk": pa.array([], ktype),
                    "_lt": pa.array([], pa.int64()),
                    "_lsess": pa.array([], pa.int64()),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy()
        ids = t.column("i").to_numpy()
        n = len(k)
        kchg = np.r_[True, k[1:] != k[:-1]]
        brk = kchg | (np.r_[False, (ts[1:] - ts[:-1]) > gap_us] & ~kchg)
        start_pos = np.maximum.accumulate(np.where(brk, np.arange(n), 0))
        sess = ids[start_pos]
        # summary row rides along with null row fields; row fields of
        # the summary are (first_row_id, first_row_sess) so the driver
        # can key the remap without an extra column
        return pa.table(
            {
                id_col: pa.array(np.r_[ids, ids[:1]]),
                session_alias: pa.array(np.r_[sess, sess[:1]]),
                "_sum": pa.array(np.r_[np.zeros(n, bool), [True]]),
                "_fk": pa.concat_arrays(
                    [pa.nulls(n, ktype), t.column("k").take(pa.array([0])).combine_chunks()]
                ),
                "_ft": pa.array(np.r_[np.zeros(n, np.int64), ts[:1]], mask=np.r_[np.ones(n, bool), [False]]),
                "_lk": pa.concat_arrays(
                    [pa.nulls(n, ktype), t.column("k").take(pa.array([n - 1])).combine_chunks()]
                ),
                "_lt": pa.array(np.r_[np.zeros(n, np.int64), ts[-1:]], mask=np.r_[np.ones(n, bool), [False]]),
                "_lsess": pa.array(np.r_[np.zeros(n, np.int64), sess[-1:]], mask=np.r_[np.ones(n, bool), [False]]),
            }
        )

    rep = s.map_batches(block_label, batch_format="pyarrow", batch_size=None).materialize()
    rows = rep.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("_sum"))).select(
            [id_col, session_alias]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("_sum")),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # exactly 1 summary row per non-empty block
    if not len(edge):
        return rows
    # global sort order makes block (k, t, i) ranges disjoint — ordering
    # blocks by their first-row tuple reconstructs block order
    edge = edge.sort_values(["_fk", "_ft", id_col], kind="stable").reset_index(drop=True)
    fks = edge["_fk"].to_numpy()
    fts = edge["_ft"].to_numpy().astype(np.int64)
    fis = edge[id_col].to_numpy().astype(np.int64)
    fsess = edge[session_alias].to_numpy().astype(np.int64)
    lks = edge["_lk"].to_numpy()
    lts = edge["_lt"].to_numpy().astype(np.int64)
    lsess = edge["_lsess"].to_numpy().astype(np.int64)
    remap: dict[int, int] = {}
    carry_k = carry_t = carry_sess = None
    for j in range(len(edge)):
        if (
            carry_k is not None
            and fks[j] == carry_k
            and fts[j] - carry_t <= gap_us
        ):
            remap[int(fis[j])] = carry_sess
            first_true = carry_sess
        else:
            first_true = int(fsess[j])
        last_true = first_true if int(lsess[j]) == int(fsess[j]) else int(lsess[j])
        carry_k, carry_t, carry_sess = lks[j], int(lts[j]), last_true
    if not remap:
        return rows
    keys = np.array(sorted(remap), dtype=np.int64)
    vals = np.array([remap[x] for x in keys], dtype=np.int64)
    ref = ray.put((keys, vals))

    def relabel(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(ref)
        sess = t.column(session_alias).to_numpy()
        pos = np.searchsorted(kk, sess)
        pos_c = np.clip(pos, 0, len(kk) - 1)
        hit = kk[pos_c] == sess
        out = np.where(hit, vv[pos_c], sess)
        return pa.table({id_col: t.column(id_col), session_alias: pa.array(out)})

    return rows.map_batches(relabel, batch_format="pyarrow", batch_size=None)


def rolling_by_key(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_rows: int = 3,
    roll_alias: str = "roll_sum",
    count_alias: str = "n_in_window",
    lag_alias: str = "lag_value",
):
    """Per-key rolling-row-window aggregate + LAG — the SQL shape
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)`` plus
    ``LAG(v)`` — as a sort plan. → Dataset of one row per input row:
    (id_col, roll_alias, count_alias, lag_alias[nullable]).

    Plan: project to (k, t, i, v), one distributed sort on (k, t, i)
    (id is the deterministic tiebreaker — REQUIRED unique), then each
    block computes rolling sums vectorized from a cumulative sum with
    per-key-group window clamping. Only a block's FIRST key group can
    need rows from earlier blocks, and only its first ``window_rows - 1``
    rows; each block therefore emits (a) finished rows, (b) ≤ W-1
    "uncertain" head rows, and (c) the ≤ W-1 tail context rows of its
    LAST key group. The driver re-derives the uncertain rows from the
    chained context — O(blocks × window_rows) rows, the same stitching
    budget as ``session_counts`` — and unions them back as one small
    block. No per-key Python anywhere; keys must be non-null (SQL
    PARTITION BY would group nulls — raise instead of guessing).

    ``value_col`` must be an integer column (exact rolling sums — use
    cents for money per the oracle rules). Keep ``window_rows`` modest
    (≤ ~64): it bounds both the driver stitch and nothing else.
    """
    import ray.data as rd

    W = int(window_rows)
    if W < 1:
        raise ValueError("window_rows must be >= 1")

    def project(t: pa.Table) -> pa.Table:
        if t.column(key_col).null_count:
            raise ValueError("rolling_by_key: null keys not supported")
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        v = t.column(value_col)
        if not pa.types.is_integer(v.type):
            raise TypeError("rolling_by_key needs an integer value column (use cents)")
        return pa.table(
            {
                "k": t.column(key_col),
                "t": ts.cast(pa.int64()),
                "i": t.column(id_col).cast(pa.int64()),
                "v": v.cast(pa.int64()),
            }
        )

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(["k", "t", "i"])

    def block_roll(t: pa.Table) -> pa.Table:
        ktype = t.schema.field("k").type
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    roll_alias: pa.array([], pa.int64()),
                    count_alias: pa.array([], pa.int64()),
                    lag_alias: pa.array([], pa.int64()),
                    "_uncertain": pa.array([], pa.bool_()),
                    "_ctx": pa.array([], pa.bool_()),
                    "_k": pa.array([], ktype),
                    "_t": pa.array([], pa.int64()),
                    "_v": pa.array([], pa.int64()),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy()
        ids = t.column("i").to_numpy()
        v = t.column("v").to_numpy()
        n = len(k)
        kchg = np.r_[True, k[1:] != k[:-1]]
        # index of each row's key-group start
        gstart = np.maximum.accumulate(np.where(kchg, np.arange(n), 0))
        idx = np.arange(n)
        lo = np.maximum(idx - (W - 1), gstart)
        c = np.concatenate([[0], np.cumsum(v)])  # c[j] = sum(v[:j])
        roll = c[idx + 1] - c[lo]
        cnt = idx - lo + 1
        lag = np.r_[0, v[:-1]]
        has_lag = idx > gstart  # first row of its group: no lag (in-block)
        # rows of the FIRST key group whose window/lag could reach back
        # into a previous block: position-in-group < W-1 for the window,
        # position 0 for lag — both only matter for the first group
        first_group = gstart == 0
        uncertain = first_group & ((idx - gstart) < max(W - 1, 1))
        # tail context: last ≤ max(W-1, 1) rows of the LAST key group
        # (even W == 1 exports the final row — the next block's LAG
        # needs it)
        last_start = gstart[-1]
        ctx_lo = max(last_start, n - max(W - 1, 1))
        is_ctx = idx >= ctx_lo
        return pa.table(
            {
                id_col: pa.array(ids),
                roll_alias: pa.array(roll.astype(np.int64)),
                count_alias: pa.array(cnt.astype(np.int64)),
                lag_alias: pa.array(
                    np.where(has_lag, lag, 0), mask=~has_lag
                ),
                "_uncertain": pa.array(uncertain),
                "_ctx": pa.array(is_ctx),
                "_k": t.column("k"),
                "_t": pa.array(ts),
                "_v": pa.array(v),
            }
        )

    rep = s.map_batches(block_roll, batch_format="pyarrow", batch_size=None).materialize()
    final_cols = [id_col, roll_alias, count_alias, lag_alias]
    internal = rep.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("_uncertain"))).select(final_cols),
        batch_format="pyarrow",
        batch_size=None,
    )
    # Driver stitch: uncertain heads + tail contexts, in global sort
    # order (≤ 2(W-1) rows per block). Recompute each uncertain row from
    # the ≤ W-1 context rows of the same key that precede it.
    edge = rep.map_batches(
        lambda t: t.filter(
            pa.compute.or_(t.column("_uncertain"), t.column("_ctx"))
        ).select(final_cols + ["_uncertain", "_ctx", "_k", "_t", "_v"]),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    if not len(edge) or not edge["_uncertain"].any():
        return internal
    # any total order that groups equal keys and sorts (t, id) within a
    # key reproduces the walk-back adjacency the fixups need
    edge = edge.sort_values(["_k", "_t", id_col], kind="stable").reset_index(drop=True)
    ek = edge["_k"].to_numpy()
    ev = edge["_v"].to_numpy()
    is_unc = edge["_uncertain"].to_numpy()
    # per uncertain row: walk back over edge rows of the same key. The
    # edge set contains every row that can fall in its window — its own
    # block's preceding head rows are themselves uncertain, and each
    # earlier block exported the tail of its last key group (or, for a
    # short spanning group, ALL its rows as uncertain+context).
    pos = np.nonzero(is_unc)[0]
    roll_fix = np.empty(len(pos), dtype=np.int64)
    cnt_fix = np.empty(len(pos), dtype=np.int64)
    lag_fix: list[int | None] = []
    for out_i, p in enumerate(pos):  # O(blocks × W²) driver-side, tiny
        j = p - 1
        acc, m = int(ev[p]), 1
        lagv = None
        while j >= 0 and ek[j] == ek[p] and m < W:
            if lagv is None:
                lagv = int(ev[j])
            acc += int(ev[j])
            m += 1
            j -= 1
        if lagv is None and p - 1 >= 0 and ek[p - 1] == ek[p]:
            lagv = int(ev[p - 1])  # W == 1: window excludes it, LAG doesn't
        roll_fix[out_i] = acc
        cnt_fix[out_i] = m
        lag_fix.append(lagv)
    fix_tbl = pa.table(
        {
            id_col: pa.array(edge.loc[is_unc, id_col].to_numpy(), pa.int64()),
            roll_alias: pa.array(roll_fix),
            count_alias: pa.array(cnt_fix),
            lag_alias: pa.array(lag_fix, pa.int64()),
        }
    )
    return internal.union(rd.from_arrow(fix_tbl))


def _funnel_reached(k: np.ndarray, ts: np.ndarray, sid: np.ndarray, n_stages: int):
    """Shared funnel kernel over arrays SORTED by (key, ts): per key
    group, stage i is reached at t_i = min ts of a stage-i row STRICTLY
    after t_{i-1} (t_0 = min stage-0 ts). Returns (group_start_indices,
    reached bool matrix groups x stages). Vectorized: one masked
    minimum.reduceat per stage."""
    kchg = np.r_[True, k[1:] != k[:-1]]
    starts = np.nonzero(kchg)[0]
    gid = np.cumsum(kchg) - 1
    inf = np.iinfo(np.int64).max
    t_prev = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
    reached = np.zeros((len(starts), n_stages), dtype=bool)
    for i in range(n_stages):
        mask = (sid == i) & (ts > t_prev[gid])
        mts = np.where(mask, ts, inf)
        t_i = np.minimum.reduceat(mts, starts)
        reached[:, i] = t_i < inf
        t_prev = t_i
    return starts, reached


def funnel_counts(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages,
) -> pa.Table:
    """Ordered multi-stage funnel: how many keys (users) performed
    stage 0, then stage 1 STRICTLY after it, then stage 2 after that, …
    (first-touch semantics: each stage anchors at its EARLIEST
    qualifying timestamp). Returns an Arrow table
    (stage_idx, stage, n_keys), n_keys non-increasing by construction.

    Sort plan, same machinery as ``session_counts``: filter rows to the
    stage types (prunes the sort input), project to (key, ts:int64,
    stage_idx:int8), ONE distributed sort on (key, ts), per-block
    vectorized masked-min funnel over interior key groups, and the
    block-edge groups' raw rows (≤ 2 keys per block) escape to the
    driver, which runs the identical kernel on them. Driver payload:
    one counts row per block + the edge rows. Partitioning assumption:
    keys ≫ blocks. Timestamp ties across stages don't qualify (strict
    >), so the result is independent of sort tie-breaking."""
    import ray

    stages = list(stages)
    n_stages = len(stages)
    if n_stages < 1:
        raise ValueError("stages must be non-empty")
    stage_idx = {s: i for i, s in enumerate(stages)}

    def project(t: pa.Table) -> pa.Table:
        keep = pa.compute.is_in(t.column(type_col), value_set=pa.array(stages))
        t = t.filter(keep)
        col = t.column(ts_col)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        sid = np.array(
            [stage_idx[v] for v in t.column(type_col).to_pylist()], dtype=np.int8
        )
        return pa.table(
            {
                "k": t.column(key_col),
                "t": col.cast(pa.int64()),
                "s": pa.array(sid),
            }
        )

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(["k", "t"])

    def block_funnel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "counts": pa.array([], pa.list_(pa.int64())),
                    "k": pa.array([], t.schema.field("k").type),
                    "t": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int8()),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy()
        sid = t.column("s").to_numpy()
        starts, reached = _funnel_reached(k, ts, sid, n_stages)
        gid = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        interior = np.ones(len(starts), dtype=bool)
        interior[0] = interior[-1] = False
        counts = reached[interior].sum(axis=0).astype(np.int64)
        edge_rows = np.nonzero((gid == 0) | (gid == gid[-1]))[0]
        take = pa.array(edge_rows.astype(np.int64))
        ktype = t.schema.field("k").type
        return pa.table(
            {
                "kind": pa.array(["counts"] + ["edge"] * len(edge_rows), pa.string()),
                "counts": pa.array([counts.tolist()] + [None] * len(edge_rows), pa.list_(pa.int64())),
                "k": pa.concat_arrays(
                    [pa.nulls(1, ktype), t.column("k").take(take).combine_chunks()]
                ),
                "t": pa.concat_arrays(
                    [pa.nulls(1, pa.int64()), t.column("t").take(take).combine_chunks()]
                ),
                "s": pa.concat_arrays(
                    [pa.nulls(1, pa.int8()), t.column("s").take(take).combine_chunks()]
                ),
            }
        )

    parts = [
        tb
        for tb in ray.get(
            s.map_batches(block_funnel, batch_format="pyarrow", batch_size=None)
            .materialize()
            .to_arrow_refs()
        )
        if tb.num_rows
    ]
    total = np.zeros(n_stages, dtype=np.int64)
    edge_tables = []
    for tb in parts:
        kinds = tb.column("kind").to_pylist()
        for i, kind in enumerate(kinds):
            if kind == "counts":
                total += np.array(tb.column("counts")[i].as_py(), dtype=np.int64)
        mask = pa.compute.equal(tb.column("kind"), "edge")
        e = tb.filter(mask)
        if e.num_rows:
            edge_tables.append(e.select(["k", "t", "s"]))
    if edge_tables:
        et = pa.concat_tables(edge_tables).combine_chunks()
        ek = np.asarray(et.column("k").to_pylist(), dtype=object)
        ets = et.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        es = et.column("s").to_numpy(zero_copy_only=False).astype(np.int8)
        order = np.lexsort((ets, ek))
        _, reached = _funnel_reached(ek[order], ets[order], es[order], n_stages)
        total += reached.sum(axis=0).astype(np.int64)
    return pa.table(
        {
            "stage_idx": pa.array(np.arange(n_stages, dtype=np.int64)),
            "stage": pa.array(stages, pa.string()),
            "n_keys": pa.array(total),
        }
    )
