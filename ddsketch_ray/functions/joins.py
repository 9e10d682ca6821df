"""Join operators Ray Data 2.49 lacks natively, expressed Ray-Data-first.

Two physical families, chosen by the small side's size:

**Broadcast** (small side fits the object store — ray.put ONCE, every
stateless task reads it zero-copy; the big side streams with ZERO
shuffle):
- ``asof_join_broadcast`` — time-series as-of (latest dim row with same
  key and ts ≤ row ts), inner/left;
- ``equi_join_broadcast`` — unique-key lookup join, inner/left;
- ``semi_join_broadcast`` — semi/anti membership filter (blocklists);
- ``range_join_broadcast`` — interval containment, inner/left.

**Shuffle** (neither side fits a broadcast):
- ``asof_join_sorted`` — tagged union → ONE distributed sort on
  (key_hash, ts, side) → per-block vectorized forward-fill with
  carry/spill block stitching (driver O(blocks));
- ``equi_join_shuffle`` — hash-bucket co-partition both sides →
  per-bucket Arrow hash join inside groupby.map_groups (many-to-many).

All kernels are loop-free numpy/Arrow per batch; carried columns keep
their exact Arrow types end-to-end (typed padding + take — never a
float64 round-trip; int64 ids above 2^53 and string keys are safe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _schema_types(ds, cols) -> dict[str, pa.DataType]:
    """Arrow types of ``cols`` from a Dataset schema (handles the
    pandas-block schema variant)."""
    schema = ds.schema()
    if schema is None:  # empty dataset with no blocks carries no schema
        raise ValueError(
            "dataset has no schema (empty, schema-less); the join needs "
            "typed columns — pass at least one (possibly empty) typed block"
        )
    base = getattr(schema, "base_schema", schema)
    out: dict[str, pa.DataType] = {}
    for col in cols:
        if hasattr(base, "field"):
            out[col] = base.field(col).type
        else:
            t = base.types[base.names.index(col)]
            if isinstance(t, pa.DataType):
                out[col] = t
            elif getattr(t, "kind", None) == "O":  # pandas object = string
                out[col] = pa.string()
            else:
                # pandas nullable extension dtypes (Int64, Float64, ...)
                # expose their storage dtype as .numpy_dtype
                out[col] = pa.from_numpy_dtype(getattr(t, "numpy_dtype", t))
    return out


def _default_array(typ: pa.DataType, n: int) -> pa.Array:
    """Typed zero-padding for a column the row's side doesn't own.
    NOT nulls: Ray's sort may route blocks through pandas, where a
    nullable int64 column silently becomes float64 and corrupts ids
    above 2^53. The padding is never read (left cols are only taken
    at left rows, right cols at right rows)."""
    if pa.types.is_integer(typ):
        return pa.array(np.zeros(n, dtype=np.int64), type=typ)
    if pa.types.is_floating(typ):
        return pa.array(np.zeros(n, dtype=np.float64), type=typ)
    if pa.types.is_boolean(typ):
        return pa.array(np.zeros(n, dtype=bool))
    if pa.types.is_timestamp(typ):
        return pa.array(np.zeros(n, dtype=np.int64).view("datetime64[us]"), type=typ)
    if pa.types.is_fixed_size_binary(typ):
        return pa.Array.from_buffers(
            typ, n, [None, pa.py_buffer(bytes(n * typ.byte_width))]
        )
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.array([b""] * n, type=typ)
    return pa.array([""] * n, type=typ)  # string-like


def _prepare_dim(dim: pa.Table, key_col: str, ts_col: str, value_cols):
    """Broadcast state: the dim table lexsorted by (key_hash, ts) with
    per-hash-group offsets. Value columns stay ARROW arrays so matches
    are emitted by typed ``take`` — exact for every type (int64 > 2^53,
    strings, ...) and schema-stable even for zero-match batches.

    Null-key dim rows are dropped (SQL: a null key matches nothing —
    they must not share a hash group with real keys). Each hash group
    must hold exactly ONE distinct key, else the merge kernel could pick
    a colliding key's row as the latest candidate and the equality guard
    would then DROP the match instead of falling back to the genuine
    same-key row — so on the astronomically-rare 64-bit collision the
    dim is rehashed with a new seed (and raises after 3 tries)."""
    from ddsketch_ray.agg import hash_any_column

    if dim.column(key_col).null_count:
        dim = dim.filter(pc.is_valid(dim.column(key_col)))
    for seed in range(3):
        kh = hash_any_column(dim.column(key_col), is_arrow=True, seed=seed)
        order = np.argsort(kh, kind="stable")
        khs = kh[order]
        sorted_tbl = dim.take(pa.array(order))
        uniq, gstart = np.unique(khs, return_index=True)
        # collision check: within each group all keys must equal the first
        keys_arr = sorted_tbl.column(key_col).combine_chunks()
        gid = np.cumsum(np.r_[True, khs[1:] != khs[:-1]]) - 1
        firsts = keys_arr.take(pa.array(gstart[gid]))
        ok = pc.fill_null(pc.equal(keys_arr, firsts), False)
        if pc.all(ok).as_py() if len(keys_arr) else True:
            break
    else:
        raise ValueError("persistent 64-bit hash collision in dim keys")
    ts = (
        sorted_tbl.column(ts_col)
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .view(np.int64)
    )
    # ts ascending WITHIN each hash group (argsort above was by hash only)
    order2 = np.lexsort((ts, khs))
    khs, ts = khs[order2], ts[order2]
    sorted_tbl = sorted_tbl.take(pa.array(order2))
    uniq, gstart = np.unique(khs, return_index=True)
    return {
        "seed": seed,
        "uniq": uniq,
        "gstart": gstart,
        "gend": np.r_[gstart[1:], len(khs)],
        "ts": ts,
        "ts_arrow": pa.array(ts.view("datetime64[us]"), type=pa.timestamp("us")),
        "keys": sorted_tbl.column(key_col).combine_chunks(),
        "vals": {c: sorted_tbl.column(c).combine_chunks() for c in value_cols},
    }


def asof_join_broadcast(
    big_ds,
    dim: pa.Table,
    key_col: str,
    ts_col: str,
    value_cols,
    dim_ts_col: str | None = None,
    suffix: str = "_ref",
    how: str = "inner",
):
    """As-of join (backward): every big-side row is matched to the
    latest dim row with equal ``key_col`` and dim ts ≤ row ts.
    ``how="inner"`` drops rows with no qualifying dim row (DuckDB
    ``ASOF JOIN``); ``how="left"`` keeps them with null dim columns
    (``ASOF LEFT JOIN``).

    Returns big_ds's columns plus ``{dim_ts_col}{suffix}`` and
    ``{c}{suffix}`` for each value column. The dim table is broadcast
    once; each stateless task fetches it zero-copy and joins with a
    loop-free merge kernel.
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    dim_ts_col = dim_ts_col or ts_col
    value_cols = list(value_cols)
    ref = ray.put(_prepare_dim(dim, key_col, dim_ts_col, value_cols))

    def join_batch(t: pa.Table) -> pa.Table:
        # Loop-free kernel (no per-key masks): hash keys, drop rows
        # whose key has no dim group, then MERGE the batch with the
        # relevant dim rows — lexsort by (group, ts, side) with dim
        # before big at equal ts (inclusive backward semantics) and a
        # group-reset maximum.accumulate finds each big row's latest
        # dim row. O((b + d') log(b + d')) numpy per batch, d' = dim
        # rows of groups present in the batch.
        from ddsketch_ray.agg import hash_any_column

        state = ray.get(ref)
        uniq, gstart, gend = state["uniq"], state["gstart"], state["gend"]
        bts = (
            t.column(ts_col)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        bkh = hash_any_column(t.column(key_col), is_arrow=True, seed=state["seed"])
        if len(uniq):
            gidx = np.minimum(np.searchsorted(uniq, bkh), len(uniq) - 1)
            in_dim = uniq[gidx] == bkh
        else:
            gidx = np.zeros(t.num_rows, dtype=np.int64)
            in_dim = np.zeros(t.num_rows, dtype=bool)
        bsel = np.nonzero(in_dim)[0]
        big_rows = np.empty(0, dtype=np.int64)
        dim_rows = np.empty(0, dtype=np.int64)
        if len(bsel):
            bg = gidx[bsel]
            present = np.unique(bg)
            lens = gend[present] - gstart[present]
            # ragged ranges [gstart[g], gend[g]) for every present group
            didx = (
                np.repeat(gstart[present] - np.r_[0, np.cumsum(lens)[:-1]], lens)
                + np.arange(int(lens.sum()))
            )
            mg = np.r_[np.repeat(np.arange(len(present)), lens), np.searchsorted(present, bg)]
            mt = np.r_[state["ts"][didx], bts[bsel]]
            mside = np.r_[
                np.zeros(len(didx), dtype=np.int8), np.ones(len(bsel), dtype=np.int8)
            ]
            mrow = np.r_[didx, bsel]
            order = np.lexsort((mside, mt, mg))
            is_dim = mside[order] == 0
            pos = np.arange(len(order))
            last_dim_pos = np.maximum.accumulate(np.where(is_dim, pos, -1))
            gchg = np.r_[True, mg[order][1:] != mg[order][:-1]]
            group_first = pos[gchg][np.cumsum(gchg) - 1]
            have = ~is_dim & (last_dim_pos >= group_first)
            src = mrow[order]
            big_rows = src[have]
            dim_rows = src[last_dim_pos[have]]
            # hash-collision guard: verify actual key equality (typed)
            eq = pa.compute.equal(
                t.column(key_col).take(pa.array(big_rows)),
                state["keys"].take(pa.array(dim_rows)),
            )
            ok = pa.compute.fill_null(eq, False).to_numpy(zero_copy_only=False)
            big_rows, dim_rows = big_rows[ok], dim_rows[ok]

        dim_ts_arrow = state["ts_arrow"]  # built once in _prepare_dim
        if how == "inner":
            out = t.take(pa.array(big_rows))
            take_ind = pa.array(dim_rows)
        else:  # left: keep every big row; null dim index where unmatched
            out = t
            full = np.full(t.num_rows, -1, dtype=np.int64)
            full[big_rows] = dim_rows
            take_ind = pa.array(full, mask=full < 0)
        out = out.append_column(f"{dim_ts_col}{suffix}", dim_ts_arrow.take(take_ind))
        for c in value_cols:  # typed take — schema-stable when empty
            out = out.append_column(f"{c}{suffix}", state["vals"][c].take(take_ind))
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


def asof_join_sorted(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    left_cols,
    right_value_cols,
    strict: bool = True,
    suffix: str = "_ref",
    how: str = "inner",
):
    """Big-big as-of join — the co-partitioned scale path the broadcast
    variant documents. Neither side fits a broadcast, so:

    1. both sides are tagged and UNIONed into one narrow dataset
       (key_hash, ts, side, projected columns) — the only wide movement.
       Keys of ANY type (string, int64 > 2^53, ...) are threaded as a
       64-bit hash; carried columns keep their exact Arrow types via
       typed padding + take, never a float64 round-trip. (A 64-bit
       hash collision between distinct keys would silently co-mingle
       their timelines — probability ~n²/2⁶⁵; documented, not checked.)
    2. one distributed sort on (key_hash, ts, side) makes every key's
       timeline contiguous, right rows interleaved exactly where
       forward-fill needs them (``strict`` orders left BEFORE right at
       equal ts, so a left row never sees a same-timestamp right row);
    3. each sorted block forward-fills vectorized (maximum.accumulate
       over right-row indices, reset at key-group starts) and joins its
       left rows locally. Only two kinds of rows escape the block: the
       last key's carry state (≤ 1 row) and the FIRST key's left rows
       that precede any in-block right row — a key's rows are contiguous
       after the sort, so only those can be resolved by earlier blocks.
       The driver walks blocks in range order, threading carry state
       through and resolving the escaped rows (O(blocks + spilled rows);
       degenerate single-key skew would spill more — that is the
       documented partitioning assumption: keys ≫ blocks).

    Block order at the driver is the block's FIRST (key_hash, ts, side)
    tuple. Two blocks share that tuple only when a duplicate-tuple run
    spans them entirely, which forces every row of both blocks to one
    (key, ts, side): all-left blocks carry no state (order irrelevant)
    and all-right blocks differ only in which duplicate-timestamp right
    row wins — a tie AS-OF semantics leaves unspecified anyway (DuckDB
    picks arbitrarily too). So no explicit block sequence id is needed
    for correctness.

    ``how="inner"`` drops left rows with no qualifying right row;
    ``how="left"`` keeps them with null right columns. Returns a
    Dataset with ``left_cols`` + each right value column as
    ``{col}{suffix}``. Timestamps are threaded as int64 internally.
    """
    import ray.data as rd

    from ddsketch_ray.agg import hash_any_column

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    left_cols = list(left_cols)
    right_value_cols = list(right_value_cols)
    left_side, right_side = (0, 1) if strict else (1, 0)
    ltypes = _schema_types(left_ds, left_cols)
    rtypes = _schema_types(right_ds, right_value_cols)

    def make_tag(is_left_src: bool):
        def tag(t: pa.Table) -> pa.Table:
            # null keys match nothing (SQL): drop them — they must not
            # share a hash with key 0. In "left" mode, null-key LEFT
            # rows are kept as side-2 marker rows (k = INT64_MIN) and
            # emitted with null rights inside block_join — no second
            # scan of the left dataset.
            col = t.column(key_col)
            keep_nulls = is_left_src and how == "left"
            if col.null_count and not keep_nulls:
                t = t.filter(pc.is_valid(col))
                col = t.column(key_col)
            n = t.num_rows
            ts = (
                t.column(ts_col)
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .view(np.int64)
            )
            kh = hash_any_column(col, is_arrow=True).view(np.int64)
            side_arr = np.full(n, left_side if is_left_src else right_side, dtype=np.int8)
            if keep_nulls and col.null_count:
                invalid = pc.is_null(col).to_numpy(zero_copy_only=False)
                kh = np.where(invalid, np.int64(np.iinfo(np.int64).min), kh)
                side_arr = np.where(invalid, np.int8(2), side_arr).astype(np.int8)
            cols = {
                "k": pa.array(kh),
                "t": pa.array(ts),
                "side": pa.array(side_arr),
            }
            for c in left_cols:
                cols[f"l_{c}"] = t.column(c) if is_left_src else _default_array(ltypes[c], n)
            for c in right_value_cols:
                cols[f"r_{c}"] = _default_array(rtypes[c], n) if is_left_src else t.column(c)
            return pa.table(cols)

        return tag

    tagged = left_ds.map_batches(make_tag(True), batch_format="pyarrow", batch_size=None).union(
        right_ds.map_batches(make_tag(False), batch_format="pyarrow", batch_size=None)
    )
    s = tagged.sort(["k", "t", "side"])

    out_fields = [(c, ltypes[c]) for c in left_cols] + [
        (f"{c}{suffix}", rtypes[c]) for c in right_value_cols
    ]

    def empty_out() -> pa.Table:
        cols = {name: pa.array([], type=typ) for name, typ in out_fields}
        cols["_kind"] = pa.array([], type=pa.int8())
        cols["_k"] = pa.array([], type=pa.int64())
        cols["_bk"] = pa.array([], type=pa.int64())
        cols["_t"] = pa.array([], type=pa.int64())
        cols["_bs"] = pa.array([], type=pa.int8())
        cols["_has"] = pa.array([], type=pa.int8())
        return pa.table(cols)

    def block_join(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty_out()
        k = t.column("k").to_numpy()
        ts = t.column("t").to_numpy()
        side = t.column("side").to_numpy()
        is_right = side == right_side
        idx = np.arange(n)
        lr = np.maximum.accumulate(np.where(is_right, idx, -1))
        gstart_marks = np.r_[True, k[1:] != k[:-1]]
        gid = np.cumsum(gstart_marks) - 1
        starts = np.nonzero(gstart_marks)[0]
        gstart = starts[gid]
        is_left = ~is_right
        null_left = side == 2  # null-key left markers ("left" mode only)
        have = lr >= gstart
        resolved = is_left & have & ~null_left
        # unresolved lefts in the FIRST key group may match in earlier
        # blocks; unresolved lefts of later groups are genuinely
        # matchless — dropped (inner) or emitted with nulls (left)
        spill = is_left & ~have & (gid == 0) & ~null_left
        matchless = is_left & ~have & (gid > 0) & ~null_left

        def rows(mask, kind, rsrc):
            m = np.nonzero(mask)[0]
            take = pa.array(m.astype(np.int64))
            cols = {}
            for c in left_cols:
                # arrow take: exact round-trip for any left column type
                # (int64 > 2^53, strings, ...) — never through float64
                cols[c] = t.column(f"l_{c}").take(take)
            for c in right_value_cols:
                if rsrc is None:
                    cols[f"{c}{suffix}"] = pa.nulls(len(m), type=rtypes[c])
                else:
                    cols[f"{c}{suffix}"] = t.column(f"r_{c}").take(
                        pa.array(rsrc[m].astype(np.int64))
                    )
            cols["_kind"] = pa.array(np.full(len(m), kind, dtype=np.int8))
            cols["_k"] = pa.array(k[m])
            # (_bk, _t) = the block's FIRST (key, ts) — its global range
            # position. Ordering by the row's own key/ts would be wrong:
            # timestamps restart per key, so a carry tagged with an
            # earlier key's timeline could sort AFTER a later block's
            # spill. Within one block, spills (kind 1) precede the carry
            # (kind 2), so a spill never sees its own block's rights.
            cols["_bk"] = pa.array(np.full(len(m), int(k[0]), dtype=np.int64))
            cols["_t"] = pa.array(np.full(len(m), int(ts[0]), dtype=np.int64))
            cols["_bs"] = pa.array(np.full(len(m), int(side[0]), dtype=np.int8))
            cols["_has"] = pa.array(np.zeros(len(m), dtype=np.int8))
            return pa.table(cols)

        parts = [rows(resolved, 0, lr), rows(spill, 1, None)]
        if how == "left":
            keep = matchless | null_left  # kept with null rights
            if keep.any():
                parts.append(rows(keep, 0, None))
        # carry: the LAST key group's latest right row state (if any)
        lr_last = int(lr[-1]) if (lr[-1] >= gstart[-1]) else -1
        carry_cols = {}
        for c in left_cols:
            carry_cols[c] = _default_array(ltypes[c], 1)
        for c in right_value_cols:
            carry_cols[f"{c}{suffix}"] = (
                t.column(f"r_{c}").take(pa.array([lr_last], type=pa.int64()))
                if lr_last >= 0
                else pa.nulls(1, type=rtypes[c])
            )
        carry_cols["_kind"] = pa.array([2], type=pa.int8())
        carry_cols["_k"] = pa.array([int(k[-1])], type=pa.int64())  # state key
        carry_cols["_bk"] = pa.array([int(k[0])], type=pa.int64())  # block order
        carry_cols["_t"] = pa.array([int(ts[0])], type=pa.int64())
        carry_cols["_bs"] = pa.array([int(side[0])], type=pa.int8())
        # explicit sentinel: "this block saw a right row for its last
        # key" — inferring it from value nullness would confuse a right
        # row whose value columns are ALL null with "no right rows"
        carry_cols["_has"] = pa.array([1 if lr_last >= 0 else 0], type=pa.int8())
        parts.append(pa.table(carry_cols))
        return pa.concat_tables(parts)

    rep = s.map_batches(block_join, batch_format="pyarrow", batch_size=None).materialize()
    resolved = rep.map_batches(
        lambda t: t.filter(pc.equal(t.column("_kind"), 0)).drop_columns(
            ["_kind", "_k", "_bk", "_t", "_bs", "_has"]
        ),
        batch_format="pyarrow", batch_size=None,
    )
    # carries (1/block) + first-key spills; take_all keeps exact Python
    # values (no pandas nullable-int → float64 corruption)
    small = rep.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("_kind"), 0)),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    fixed: list[dict] = []
    if small:
        # global block-range order (first key, first ts, first side —
        # the full sort tuple; see docstring for why duplicate-tuple
        # blocks need no further disambiguation), spills (kind 1)
        # before the same block's carry (kind 2); thread carry state
        state: dict = {}
        for row in sorted(
            small, key=lambda r: (r["_bk"], r["_t"], r["_bs"], r["_kind"])
        ):
            kk = int(row["_k"])
            if row["_kind"] == 1:  # spill: resolve with prior-block state
                if kk in state:
                    vals = state[kk]
                    fixed.append(
                        {
                            **{c: row[c] for c in left_cols},
                            **{f"{c}{suffix}": vals[c] for c in right_value_cols},
                        }
                    )
                elif how == "left":  # no earlier right row: keep, nulls
                    fixed.append(
                        {
                            **{c: row[c] for c in left_cols},
                            **{f"{c}{suffix}": None for c in right_value_cols},
                        }
                    )
            else:  # carry: update state iff the block saw a right row
                if row["_has"]:
                    state[kk] = {c: row[f"{c}{suffix}"] for c in right_value_cols}

    if not fixed:
        return resolved
    extra = pa.table(
        {
            name: pa.array([r[name] for r in fixed], type=typ)
            for name, typ in out_fields
        }
    )
    return resolved.union(rd.from_arrow(extra))


def range_join_broadcast(
    big_ds,
    intervals: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    carry_cols=("label",),
    closed: str = "left",
    how: str = "inner",
):
    """Range (interval) join: every big-side row matches the interval
    containing ``value_col`` (``how="inner"`` drops non-matching rows;
    ``how="left"`` keeps them with null carried columns).

    Intervals must be non-overlapping; they are broadcast once as sorted
    bound arrays and each stateless task does ONE searchsorted per batch
    — zero shuffle of the big side. ``closed``: "left" = [lo, hi),
    "both" = [lo, hi]. For overlapping intervals, decompose into
    elementary disjoint segments first (standard interval-tree flatten)
    and re-attach interval ids via the carried columns.
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    los = intervals.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
    his = intervals.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(los, kind="stable")
    los, his = los[order], his[order]
    # closed="both": touching intervals [a,b],[b,c] overlap at b, so the
    # check must be <= there; closed="left" allows exact touching
    overlaps = (los[1:] <= his[:-1]) if closed == "both" else (los[1:] < his[:-1])
    if np.any(overlaps):
        raise ValueError("range_join_broadcast requires non-overlapping intervals")
    # carried columns stay typed Arrow arrays (exact take, stable schema)
    carry = {c: intervals.column(c).take(pa.array(order)).combine_chunks() for c in carry_cols}
    ref = ray.put((los, his, carry))

    def join_batch(t: pa.Table) -> pa.Table:
        plos, phis, pcarry = ray.get(ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if len(plos) == 0:  # degenerate empty dim: no row matches
            inside = np.zeros(len(v), dtype=bool)
            idx = np.zeros(len(v), dtype=np.int64)
        else:
            idx = np.searchsorted(plos, v, side="right") - 1
            idx = np.maximum(idx, 0)
            inside = (v >= plos[idx]) & (
                (v <= phis[idx]) if closed == "both" else (v < phis[idx])
            )
        if how == "inner":
            out = t.filter(pa.array(inside))
            take_ind = pa.array(idx[inside])
        else:  # left: all rows kept, null carried cols where unmatched
            out = t
            take_ind = pa.array(idx, mask=~inside)
        for c in carry_cols:
            out = out.append_column(c, pcarry[c].take(take_ind))
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


def equi_join_broadcast(
    big_ds,
    dim: pa.Table,
    key_col: str,
    value_cols,
    dim_key_col: str | None = None,
    how: str = "inner",
    suffix: str = "",
):
    """Broadcast lookup equi-join: the small dim table (unique keys —
    a lookup, e.g. customer→nation) is ray.put ONCE as a sorted key-hash
    index; every stateless task binary-searches it per batch. Zero
    shuffle of the big side. This is the promoted library form of the
    inline pattern the gate's revenue_by_nation query used.

    ``how="inner"`` drops big rows whose key is absent from dim;
    ``how="left"`` keeps them with null value columns. Matches are
    verified by typed key equality (hash collisions between distinct
    keys cannot cause wrong matches); dim keys must be unique — for
    many-to-many use ``equi_join_shuffle``.
    """
    import ray

    from ddsketch_ray.agg import hash_any_column

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    dim_key_col = dim_key_col or key_col
    value_cols = list(value_cols)
    schema = big_ds.schema()
    if schema is None:  # empty dataset with no blocks carries no schema
        raise ValueError(
            "big_ds has no schema (empty, schema-less); the join needs "
            "typed columns — pass at least one (possibly empty) typed block"
        )
    big_names = set(getattr(schema, "base_schema", schema).names)
    clash = [c for c in value_cols if f"{c}{suffix}" in big_names]
    if clash:
        raise ValueError(
            f"output column(s) {clash} already exist on the big side; "
            "pass a suffix or rename before joining"
        )
    if dim.column(dim_key_col).null_count:  # null keys match nothing
        dim = dim.filter(pc.is_valid(dim.column(dim_key_col)))
    n_distinct = pc.count_distinct(dim.column(dim_key_col)).as_py()
    if n_distinct != dim.num_rows:
        raise ValueError(
            "equi_join_broadcast requires unique dim keys (lookup join); "
            "use equi_join_shuffle for many-to-many"
        )
    # rehash on the astronomically-rare 64-bit collision between
    # distinct keys (would make one of them unfindable)
    for seed in range(3):
        kh = hash_any_column(dim.column(dim_key_col), is_arrow=True, seed=seed)
        order = np.argsort(kh, kind="stable")
        kh = kh[order]
        if not np.any(kh[1:] == kh[:-1]):
            break
    else:
        raise ValueError("persistent 64-bit hash collision in dim keys")
    sorted_dim = dim.take(pa.array(order))
    ref = ray.put(
        {
            "seed": seed,
            "kh": kh,
            "keys": sorted_dim.column(dim_key_col).combine_chunks(),
            "vals": {c: sorted_dim.column(c).combine_chunks() for c in value_cols},
        }
    )

    def join_batch(t: pa.Table) -> pa.Table:
        state = ray.get(ref)
        skh = state["kh"]
        bkh = hash_any_column(t.column(key_col), is_arrow=True, seed=state["seed"])
        if len(skh):
            idx = np.minimum(np.searchsorted(skh, bkh), len(skh) - 1)
            cand = skh[idx] == bkh
        else:
            idx = np.zeros(t.num_rows, dtype=np.int64)
            cand = np.zeros(t.num_rows, dtype=bool)
        rows = np.nonzero(cand)[0]
        if len(rows):  # typed equality check on hash candidates
            eq = pc.equal(
                t.column(key_col).take(pa.array(rows)),
                state["keys"].take(pa.array(idx[rows])),
            )
            ok = pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
            rows = rows[ok]
        if how == "inner":
            out = t.take(pa.array(rows))
            take_ind = pa.array(idx[rows])
        else:
            out = t
            full = np.full(t.num_rows, -1, dtype=np.int64)
            full[rows] = idx[rows]
            take_ind = pa.array(full, mask=full < 0)
        for c in value_cols:  # typed take — schema-stable when empty
            out = out.append_column(f"{c}{suffix}", state["vals"][c].take(take_ind))
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


def equi_join_shuffle(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols,
    right_cols,
    num_buckets: int = 64,
    how: str = "inner",
    seed: int = 0,
    salt: int = 1,
    coalesce_blocks: bool = False,
):
    """Big-big equi-join (many-to-many) — neither side fits a broadcast.
    Ray 2.49 Data has no shuffle join, so this builds one from Dataset
    primitives:

    1. both sides are tagged (bucket = key_hash % num_buckets, side,
       typed-padded projected columns) and UNIONed — the only wide
       movement, carrying exactly the projected columns;
    2. ``groupby(bucket).map_groups`` co-locates each bucket's rows from
       BOTH sides (num_buckets large-ish groups — the allowed map_groups
       shape, never per-key) and runs pyarrow's C++ hash join locally.

    Joins on the true key column (carried typed), so hash collisions
    only co-bucket keys, never mis-join them. ``how``: "inner" or
    "left" (unmatched left rows null-filled).

    ``num_buckets`` is the join's parallelism: each bucket is one task
    running one single-threaded Arrow hash join, so use ≈ 4× cluster
    CPUs (the block-count rule) — measured at sf0.1/32 CPUs: 16 buckets
    15.0 s, 32 → 6.9 s, 128 → 4.4 s (same window; best observed 2.6 s).
    Skew: one hot key lands in one bucket, so num_buckets bounds a
    worker's share only under spread keys. ``salt > 1`` splits every
    bucket into ``salt`` sub-buckets — LEFT rows round-robin across
    them, RIGHT rows are replicated into all of them — so a dominant
    left-side key's probe work spreads over ``salt`` workers at the
    cost of a ×salt right-side shuffle. Output is identical for any
    salt. Use when the LEFT (probe) side is skewed and the right side
    is the smaller of the two.

    Returns a Dataset with ``left_key`` + ``left_cols`` + ``right_cols``
    (names must not clash; project/rename beforehand).
    """
    from ddsketch_ray.agg import hash_any_column

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    clash = set(left_cols) & set(right_cols)
    if clash:
        raise ValueError(f"column name clash: {sorted(clash)}; rename before joining")
    ltypes = _schema_types(left_ds, left_cols + [left_key])
    rtypes = _schema_types(right_ds, right_cols + [right_key])
    if ltypes[left_key] != rtypes[right_key]:
        raise ValueError(
            f"key type mismatch: {ltypes[left_key]} vs {rtypes[right_key]}"
        )

    if salt < 1:
        raise ValueError("salt must be >= 1")

    def make_tag(is_left_src: bool):
        key = left_key if is_left_src else right_key

        def tag(t: pa.Table) -> pa.Table:
            # hash BEFORE any replication: salt× fewer hash evaluations
            b = (hash_any_column(t.column(key), is_arrow=True, seed=seed)
                 % np.uint64(num_buckets)).astype(np.int64)
            if salt > 1 and not is_left_src:
                # replicate right rows into every sub-bucket of their key
                t = t.take(pa.array(np.repeat(np.arange(t.num_rows), salt)))
                b = np.repeat(b, salt)
            n = t.num_rows
            if salt > 1:
                if is_left_src:  # round-robin sub-bucket (any spread works)
                    sub = np.arange(n, dtype=np.int64) % salt
                else:
                    sub = np.tile(np.arange(salt, dtype=np.int64), n // salt)
                b = b * salt + sub
            cols = {
                "_b": pa.array(b),
                "_side": pa.array(np.full(n, 0 if is_left_src else 1, dtype=np.int8)),
                "_k": t.column(key),
            }
            for c in left_cols:
                cols[f"l_{c}"] = t.column(c) if is_left_src else _default_array(ltypes[c], n)
            for c in right_cols:
                cols[f"r_{c}"] = _default_array(rtypes[c], n) if is_left_src else t.column(c)
            return pa.table(cols)

        return tag

    tagged = left_ds.map_batches(make_tag(True), batch_format="pyarrow", batch_size=None).union(
        right_ds.map_batches(make_tag(False), batch_format="pyarrow", batch_size=None)
    )
    if coalesce_blocks:
        # Normalize the block count BEFORE the sort-based groupby: its
        # partitioning cost is superlinear in input blocks (each block
        # is sliced into every output partition — O(blocks × partitions)
        # tiny slices, expensive for wide payload columns). Measured at
        # 200k pairs ⋈ 400k 1KB-payload rows over 224-block inputs:
        # 24.2 s → 5.7 s. Opt-in (not default) because repartition adds
        # an extra pass over the tagged union — a loss when the inputs
        # are already ≲2× num_buckets blocks (bench_bigjoin 3.5 → 9.6 s
        # when applied unconditionally). Use from call sites whose
        # inputs are materialized and fragmented into many small blocks.
        tagged = tagged.repartition(num_buckets * salt)
    join_type = "inner" if how == "inner" else "left outer"

    out_fields = (
        [(left_key, ltypes[left_key])]
        + [(c, ltypes[c]) for c in left_cols]
        + [(c, rtypes[c]) for c in right_cols]
    )
    exp_types = {"_k": ltypes[left_key]}
    for c in left_cols:
        exp_types[f"l_{c}"] = ltypes[c]
    for c in right_cols:
        exp_types[f"r_{c}"] = rtypes[c]

    def bucket_join(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_side" not in g.column_names:
            # degenerate group: tiny inputs through the union/sort can
            # emit schema-less empty blocks that surface here as
            # zero-column tables (CLAUDE.md landmine)
            return pa.table({n: pa.array([], type=t) for n, t in out_fields})
        if any(pa.types.is_null(f.type) for f in g.schema):
            # a group whose key (or payload) values are ALL null — e.g.
            # the null-keyed left rows co-bucketed by their shared hash —
            # comes back null-TYPED after Ray's sort routes it through
            # pandas; Arrow's hash join rejects a null-typed key, so
            # restore the declared types (values stay null)
            g = pa.table(
                {
                    name: (
                        g.column(name).cast(exp_types[name])
                        if pa.types.is_null(g.schema.field(name).type)
                        and name in exp_types
                        else g.column(name)
                    )
                    for name in g.column_names
                }
            )
        side = g.column("_side").to_numpy()
        lt = g.filter(pa.array(side == 0)).select(["_k"] + [f"l_{c}" for c in left_cols])
        lt = lt.rename_columns(["_k"] + left_cols)
        rt = g.filter(pa.array(side == 1)).select(["_k"] + [f"r_{c}" for c in right_cols])
        rt = rt.rename_columns(["_k"] + right_cols)
        joined = lt.join(rt, keys="_k", join_type=join_type)
        # join output column order is not guaranteed — normalize
        joined = joined.select(["_k"] + left_cols + right_cols)
        return joined.rename_columns([left_key] + left_cols + right_cols)

    return tagged.groupby("_b").map_groups(bucket_join, batch_format="pyarrow")


def semi_join_broadcast(big_ds, keys, key_col: str, anti: bool = False):
    """Semi/anti join against a broadcast key set: keep big rows whose
    ``key_col`` IS in ``keys`` (semi) or IS NOT (anti) — the
    blocklist/allowlist filter shape of training-data pipelines
    (e.g. drop documents whose id appears in a dedup blocklist).

    ``keys``: a pyarrow Array/ChunkedArray (deduped here). The key set
    is broadcast once as a sorted hash index + the typed keys for exact
    verification, so membership is collision-proof. Scale contract: the
    KEY SET must fit in the object store (it is the small side); for
    key sets beyond that, use equi_join_shuffle + null-filter, or a
    Bloom filter (sketches/bloom.py) for approximate membership with
    no-false-negative semantics.

    Null keys on the big side never match (SQL IN semantics): they are
    dropped by semi and kept by anti.
    """
    import ray

    from ddsketch_ray.agg import hash_any_column

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys = keys.unique().drop_null()
    kh = hash_any_column(keys, is_arrow=True)
    order = np.argsort(kh, kind="stable")
    ref = ray.put({"kh": kh[order], "keys": keys.take(pa.array(order))})

    def filter_batch(t: pa.Table) -> pa.Table:
        state = ray.get(ref)
        skh = state["kh"]
        bkh = hash_any_column(t.column(key_col), is_arrow=True)
        member = np.zeros(t.num_rows, dtype=bool)
        if len(skh):
            idx = np.minimum(np.searchsorted(skh, bkh), len(skh) - 1)
            cand = np.nonzero(skh[idx] == bkh)[0]
            if len(cand):  # typed equality: hash collisions never match
                eq = pc.equal(
                    t.column(key_col).take(pa.array(cand)),
                    state["keys"].take(pa.array(idx[cand])),
                )
                member[cand] = pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
        # null big keys: member stays False -> dropped by semi, kept by anti
        return t.filter(pa.array(~member if anti else member))

    return big_ds.map_batches(filter_batch, batch_format="pyarrow", batch_size=None)

def semi_join_shuffle(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols,
    anti: bool = False,
    num_buckets: int = 64,
    seed: int = 0,
):
    """Big-big semi/anti join — keep left rows that have (semi) / lack
    (anti) a matching key on the right, when the right side is TOO BIG
    to broadcast (``semi_join_broadcast`` covers the small-side case).
    EXISTS / NOT EXISTS semantics: a match requires a non-null equal
    key, so null-key left rows are dropped by semi and kept by anti.

    Plan (same co-partition substrate as ``equi_join_shuffle`` but the
    right side ships KEYS ONLY, deduplicated per block before the
    union — the shuffle carries no right payload): bucket = key_hash %
    num_buckets on both sides, union, ``groupby(bucket).map_groups``
    runs one vectorized ``is_in`` membership filter per bucket.
    Membership tests the true typed key (hash only buckets). Returns a
    Dataset of ``left_key`` + ``left_cols``.
    """
    from ddsketch_ray.agg import hash_any_column

    left_cols = list(left_cols)
    ltypes = _schema_types(left_ds, left_cols + [left_key])
    rtypes = _schema_types(right_ds, [right_key])
    if ltypes[left_key] != rtypes[right_key]:
        raise ValueError(
            f"key type mismatch: {ltypes[left_key]} vs {rtypes[right_key]}"
        )

    def tag_left(t: pa.Table) -> pa.Table:
        k = t.column(left_key)
        b = (hash_any_column(k, is_arrow=True, seed=seed) % np.uint64(num_buckets)).astype(
            np.int64
        )
        cols = {
            "_b": pa.array(b),
            "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "_k": k,
        }
        for c in left_cols:
            cols[f"l_{c}"] = t.column(c)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t.column(right_key).drop_null().unique()
        b = (hash_any_column(k, is_arrow=True, seed=seed) % np.uint64(num_buckets)).astype(
            np.int64
        )
        n = len(k)
        cols = {
            "_b": pa.array(b),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
            "_k": k,
        }
        for c in left_cols:
            cols[f"l_{c}"] = _default_array(ltypes[c], n)
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow", batch_size=None).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    )

    def bucket_filter(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        lt = g.filter(pa.array(side == 0))
        keys = g.filter(pa.array(side == 1)).column("_k")
        lk = lt.column("_k")
        hit = pc.is_in(lk, value_set=keys.combine_chunks())
        # is_in(null) -> null; EXISTS semantics: null never matches
        hit = pc.fill_null(hit, False)
        keep = pc.invert(hit) if anti else hit
        out = lt.filter(keep).select(["_k"] + [f"l_{c}" for c in left_cols])
        return out.rename_columns([left_key] + left_cols)

    return tagged.groupby("_b").map_groups(bucket_filter, batch_format="pyarrow")


def semi_join_bloom(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols,
    anti: bool = False,
    fp_rate: float = 0.001,
    capacity: int | None = None,
    num_buckets: int = 64,
    seed: int = 0,
):
    """Bloom-pruned big-big semi/anti join — EXACT output, shuffle
    volume cut to (matches + fp_rate × non-matches) of the left side.

    ``semi_join_shuffle`` ships EVERY left row through the bucket
    all-to-all even when almost nothing matches; at 100 TB that shuffle
    is the whole job. This plan spends one fixed-size broadcast to
    avoid it: build a Bloom filter of the right keys through the
    aggregate tree (the filter is m bits REGARDLESS of key count —
    the small-side-doesn't-fit regime ``semi_join_broadcast`` can't
    serve), ``ray.put`` it once, and pre-filter the left side
    block-locally. Rows the filter rejects are DEFINITE non-members
    (a Bloom filter has no false negatives): semi drops them on the
    spot, anti emits them directly. Only the "maybe" rows — true
    matches plus the fp_rate sliver — enter the exact
    ``semi_join_shuffle`` verify, so the final output is exactly
    EXISTS / NOT EXISTS, never approximate.

    The anti plan consumes ``left_ds`` twice (definite-keep filter +
    maybe-verify branch; Ray re-executes the upstream read per
    consumer): two streaming column-pruned scans in exchange for
    shuffling only the matched sliver — the right trade whenever the
    scan is cheaper than the all-to-all, i.e. whenever this function
    is the right choice at all. Null left keys follow EXISTS
    semantics on both routes (dropped by semi, kept by anti) — the
    verify enforces it for maybes, and a null row landing on the
    definite route is by construction absent from the right.

    measured (tools/stress_r5.py bloomsemi): 20M-row left × 500k-key
    right, 1.2% match rate — shuffle-carried rows 20M → 258.6k
    (77.3×; filter 7.2 Mbits ≈ 0.9 MB broadcast vs 500k raw keys),
    bit-equal output. Single-node wall 12.0 → 10.7 s only, because a
    local "shuffle" never touches a network — the volume ratio is the
    multi-node story.
    """
    import ray

    from ddsketch_ray.agg import BloomAgg, hash_any_column, sketch_from_result

    left_cols = list(left_cols)
    if capacity is None:
        capacity = max(64, right_ds.count())
    hash_seed = seed + 101  # decouple filter hashing from bucket hashing
    bloom = sketch_from_result(
        right_ds.aggregate(
            BloomAgg(
                on=right_key,
                capacity=capacity,
                fp_rate=fp_rate,
                seed=hash_seed,
                alias_name="bf",
            )
        )["bf"]
    )
    bloom_ref = ray.put(bloom)
    keep_cols = [left_key] + left_cols

    def prune(keep_maybe: bool):
        def fn(t: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)  # zero-copy bitmap per stateless task
            h = hash_any_column(t.column(left_key), is_arrow=True, seed=hash_seed)
            maybe = bf.contains_hashed(h)
            mask = maybe if keep_maybe else ~maybe
            return t.filter(pa.array(mask)).select(keep_cols)

        return fn

    maybes = left_ds.map_batches(prune(True), batch_format="pyarrow", batch_size=None)
    verified = semi_join_shuffle(
        maybes,
        right_ds,
        left_key,
        right_key,
        left_cols,
        anti=anti,
        num_buckets=num_buckets,
        seed=seed,
    )
    if not anti:
        return verified
    definite = left_ds.map_batches(prune(False), batch_format="pyarrow", batch_size=None)
    return verified.union(definite)


def equi_join_bloom(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols,
    right_cols,
    how: str = "inner",
    fp_rate: float = 0.001,
    capacity: int | None = None,
    num_buckets: int = 64,
    seed: int = 0,
    salt: int = 1,
):
    """Bloom-pruned big-big equi join — ``semi_join_bloom``'s trade
    applied to the full join: EXACT ``equi_join_shuffle`` output with
    the all-to-all carrying only left rows that MIGHT match (true
    matches + fp_rate sliver). The right side still ships in full (it
    owns payload the join must deliver); when the right side is the
    big one, swap sides — the filter always belongs on the probe side.

    ``how="inner"``: filter-rejected left rows can never produce an
    output row — drop them before the shuffle. ``how="left"``: they
    produce exactly one output row with null right columns — emit it
    DIRECTLY, skipping the shuffle (the null-fill mirrors the joiner's
    own unmatched-row fill bit-for-bit: pa.nulls of the right types).
    Both routes re-verify through the exact join, so false positives
    cost shuffle bytes, never correctness. The left-join plan consumes
    ``left_ds`` twice (the semi_join_bloom anti-route trade: two
    streaming scans instead of shuffling the non-matching majority).

    measured (tools/stress_r5.py bloomjoin): 20M-row left × 500k-key
    payload right at 1.2% match — shuffle-carried left rows 20M →
    258.6k, inner join bit-equal to the unpruned plan.
    """
    import ray

    from ddsketch_ray.agg import BloomAgg, hash_any_column, sketch_from_result

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    if capacity is None:
        capacity = max(64, right_ds.count())
    hash_seed = seed + 101
    bloom = sketch_from_result(
        right_ds.aggregate(
            BloomAgg(
                on=right_key,
                capacity=capacity,
                fp_rate=fp_rate,
                seed=hash_seed,
                alias_name="bf",
            )
        )["bf"]
    )
    bloom_ref = ray.put(bloom)
    rtypes = _schema_types(right_ds, right_cols)

    def prune(keep_maybe: bool):
        def fn(t: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)
            h = hash_any_column(t.column(left_key), is_arrow=True, seed=hash_seed)
            maybe = bf.contains_hashed(h)
            out = t.filter(pa.array(maybe if keep_maybe else ~maybe)).select(
                [left_key] + left_cols
            )
            if keep_maybe:
                return out
            # definite non-matches under how="left": the joiner's own
            # unmatched fill is pa.nulls(rtypes) — mirror it exactly
            for c in right_cols:
                out = out.append_column(c, pa.nulls(out.num_rows, type=rtypes[c]))
            return out

        return fn

    maybes = left_ds.map_batches(prune(True), batch_format="pyarrow", batch_size=None)
    joined = equi_join_shuffle(
        maybes,
        right_ds,
        left_key,
        right_key,
        left_cols,
        right_cols,
        num_buckets=num_buckets,
        how=how,
        seed=seed,
        salt=salt,
    )
    if how == "inner":
        return joined
    definite = left_ds.map_batches(prune(False), batch_format="pyarrow", batch_size=None)
    return joined.union(definite)


def _salt_for(mg, num_buckets: int, max_salt: int, hot_factor: float) -> int:
    """Salt from a Misra-Gries summary of the probe-side keys: the
    heaviest candidate's UPPER-bound share of the stream (stored count
    + offset — MG can only undercount, so this never misses a hot key
    that matters). A key with share ``s`` concentrates s×n rows into
    ONE bucket task; engage when that exceeds ``hot_factor``× the
    average bucket load, and split its probe work across ~s×num_buckets
    sub-bucket tasks (capped: every salt step replicates the right
    side once more)."""
    import math

    if not mg.n or not mg.size:
        return 1
    top_upper = int(mg.counts.max()) + int(mg.offset)
    share = top_upper / mg.n
    if share <= hot_factor / num_buckets:
        return 1
    return min(max_salt, max(2, math.ceil(share * num_buckets)))


def equi_join_skew(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols,
    right_cols,
    num_buckets: int = 64,
    how: str = "inner",
    seed: int = 0,
    mg_k: int = 64,
    max_salt: int = 16,
    hot_factor: float = 2.0,
):
    """Skew-aware ``equi_join_shuffle``: measure, then salt.

    ``equi_join_shuffle`` exposes ``salt`` but the caller must know the
    skew in advance — exactly what nobody knows about 100 TB of web
    data. This wrapper spends ONE column-pruned Misra-Gries pass over
    the probe-side keys (a ≤``mg_k``-counter summary per block through
    the aggregate tree — no shuffle, no value explosion) and picks the
    salt from the heaviest key's upper-bound share (``_salt_for``).
    Uniform keys measure share ≈ 1/num_buckets and run the plain
    un-replicated plan; a hot key engages just enough replication to
    spread its bucket. Output is identical for every salt (pytest
    forces hot and uniform paths against salt=1).

    measured (tools/stress_r5.py skewjoin20m): 20M-row left with 30%
    of rows on ONE key × 500k-key payload right — auto salt 16, wall
    16.2 → 13.8 s single-node, bit-equal output. The single-node win
    is bounded because idle buckets absorb the straggler; on a real
    cluster the unsalted hot task IS the job's tail latency, which is
    what the salt removes.
    """
    from ddsketch_ray.agg import MisraGriesAgg, sketch_from_result

    mg = sketch_from_result(
        left_ds.aggregate(MisraGriesAgg(on=left_key, k=mg_k, alias_name="mg"))["mg"]
    )
    salt = _salt_for(mg, num_buckets, max_salt, hot_factor)
    return equi_join_shuffle(
        left_ds,
        right_ds,
        left_key,
        right_key,
        left_cols,
        right_cols,
        num_buckets=num_buckets,
        how=how,
        seed=seed,
        salt=salt,
    )


def join_auto(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols,
    right_cols,
    how: str = "inner",
    num_buckets: int | None = None,
    seed: int = 0,
    broadcast_limit_rows: int = 2_000_000,
    bloom_probe_factor: int = 8,
    mg_k: int = 64,
    max_salt: int = 16,
    hot_factor: float = 2.0,
    n_left: int | None = None,
    n_right: int | None = None,
    explain: bool = False,
):
    """Measured join planner: ONE entry point that picks the cheapest
    exact plan from this module's family, the way the dedup substrate's
    ``mode="auto"`` gates driver vs distributed. Output rows and columns
    are identical across plans (``left_key`` + ``left_cols`` +
    ``right_cols``; row ORDER is plan-dependent — sort downstream);
    only the movement strategy changes:

    1. **broadcast** — right side ≤ ``broadcast_limit_rows`` AND its
       keys are unique (verified exactly on the materialized dim, via
       one Arrow ``count_distinct``): zero shuffle, the dim rides
       ``ray.put`` once. Duplicate right keys fall through (broadcast
       is a lookup join; many-to-many needs the shuffle family).
    2. otherwise one column-pruned Misra-Gries pass over the probe keys
       picks the **salt** (``_salt_for`` — uniform keys measure
       share ≈ 1/num_buckets and stay unsalted), then:
    3. **bloom** — probe side ≥ ``bloom_probe_factor``× the right side:
       the all-to-all carries only left rows that might match
       (measured 77× shuffle-volume cut at 1.2% match, BASELINE.md);
    4. **shuffle** — the general bucketed co-partition plan.

    Sizes come from ``ds.count()`` — free on parquet reads (metadata),
    one execution on derived pipelines; pass ``n_left``/``n_right``
    (or ``.materialize()`` upstream) to skip that pass. The planning
    passes consume the inputs again (count / MG / bloom build), which
    is the price of measuring instead of guessing — at 100 TB a wrong
    plan costs more than a narrow extra scan.

    ``num_buckets=None`` sizes the shuffle-family parallelism to the
    session: 4 × cluster CPUs, the measured block-count rule from
    ``equi_join_shuffle``'s bucket sweep (16 → 15.0 s, 128 → 4.4 s at
    sf0.1/32 CPUs).

    ``explain=True`` returns ``(ds, plan)`` where ``plan`` records the
    decision (plan name, salt, sizes, num_buckets) for logs and tests.
    """
    import ray

    import pyarrow.compute as pc

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if num_buckets is None:
        num_buckets = max(16, 4 * int(ray.cluster_resources().get("CPU", 8)))
    nl = left_ds.count() if n_left is None else int(n_left)
    nr = right_ds.count() if n_right is None else int(n_right)

    plan: dict = {
        "n_left": nl,
        "n_right": nr,
        "salt": 1,
        "num_buckets": num_buckets,
    }

    def _ret(ds):
        return (ds, plan) if explain else ds

    if 0 < nr <= broadcast_limit_rows:
        refs = (
            right_ds.map_batches(
                lambda t: t.select([right_key] + list(right_cols)),
                batch_format="pyarrow",
                batch_size=None,
            )
            .materialize()
            .to_arrow_refs()
        )
        parts = [p for p in (ray.get(r) for r in refs) if p.num_columns]
        dim = pa.concat_tables(parts)
        if pc.count_distinct(dim.column(right_key)).as_py() == dim.num_rows:
            plan["plan"] = "broadcast"
            big = left_ds.map_batches(
                lambda t: t.select([left_key] + list(left_cols)),
                batch_format="pyarrow",
                batch_size=None,
            )
            return _ret(
                equi_join_broadcast(
                    big,
                    dim,
                    left_key,
                    list(right_cols),
                    dim_key_col=right_key,
                    how=how,
                )
            )
        plan["right_keys_unique"] = False  # lookup join ineligible

    from ddsketch_ray.agg import MisraGriesAgg, sketch_from_result

    mg = sketch_from_result(
        left_ds.aggregate(MisraGriesAgg(on=left_key, k=mg_k, alias_name="mg"))["mg"]
    )
    salt = _salt_for(mg, num_buckets, max_salt, hot_factor)
    plan["salt"] = salt

    if nr > 0 and nl >= bloom_probe_factor * nr:
        plan["plan"] = "bloom"
        return _ret(
            equi_join_bloom(
                left_ds,
                right_ds,
                left_key,
                right_key,
                left_cols,
                right_cols,
                how=how,
                capacity=max(64, nr),
                num_buckets=num_buckets,
                seed=seed,
                salt=salt,
            )
        )
    plan["plan"] = "shuffle"
    return _ret(
        equi_join_shuffle(
            left_ds,
            right_ds,
            left_key,
            right_key,
            left_cols,
            right_cols,
            num_buckets=num_buckets,
            how=how,
            seed=seed,
            salt=salt,
        )
    )
