"""Distributed exclusive prefix scan + fixed-length sequence packing.

The training-data op this serves: concatenate a corpus (in a stable
document order) into one token stream and cut it into fixed-length
sequences — every doc needs its GLOBAL token offset, i.e. an exact
exclusive prefix sum over billions of rows. SQL shape:
``SUM(n) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)``.

Plan (the repo's sort-plan idiom, cf. functions/windows.py:sessionize):
ONE distributed sort on the unique id, each sorted block computes its
in-block exclusive cumsum vectorized and tags every row with the
block's first id; the driver receives ONE summary row per block
(first_id, block_total), orders blocks by first_id (disjoint id ranges
after the sort), turns block totals into exclusive block offsets with
Python-int accumulation (no overflow at any scale), and broadcasts the
O(blocks) {first_id -> offset} map into one vectorized add pass.
Driver payload: one row per block; broadcast: two int64 arrays of
length = blocks (~16 MB at 10^6 blocks — noted, not materialized per
task: ``ray.put`` once, ``ray.get`` cached per worker).

No reference counterpart (gmorleo/DDSketch has no scan/window surface;
SURVEY.md §2.3 "Sorts/limits" row) — this is a north-rule/webtext
addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def exclusive_offsets(ds, id_col: str, count_col: str, offset_alias: str = "offset"):
    """Exact distributed exclusive prefix sum of ``count_col`` in
    ``id_col`` order. Returns a Dataset
    (id_col:int64, count_col:int64, offset_alias:int64), one row per
    input row; row i's offset = sum of counts of all rows with smaller
    id. ``id_col`` must be unique non-null int64 (raises on null;
    uniqueness is the caller's contract — duplicate ids make "order by
    id" ambiguous). Counts must be non-null int64 ≥ 0."""
    import ray

    def project(t: pa.Table) -> pa.Table:
        if t.column(id_col).null_count or t.column(count_col).null_count:
            raise ValueError("exclusive_offsets: null ids/counts not supported")
        return pa.table(
            {
                "i": t.column(id_col).cast(pa.int64()),
                "c": t.column(count_col).cast(pa.int64()),
            }
        )

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort("i")

    def block_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {"i": z, "c": z, "off": z, "_fid": z, "_sum": pa.array([], pa.bool_())}
            )
        c = t.column("c").to_numpy()
        if c.min() < 0:
            raise ValueError("exclusive_offsets: negative counts")
        ids = t.column("i").to_numpy()
        # sorted blocks put duplicate ids adjacent — catch them here (a
        # duplicate would silently corrupt the offset stitch)
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            raise ValueError("exclusive_offsets: duplicate ids")
        n = len(c)
        excl = np.concatenate(([0], np.cumsum(c[:-1], dtype=np.int64)))
        # summary row rides along: (_sum=True, off=block total, _fid=first id)
        return pa.table(
            {
                "i": pa.array(np.r_[ids, ids[:1]]),
                "c": pa.array(np.r_[c, c[:1]]),
                "off": pa.array(np.r_[excl, [excl[-1] + c[-1]]]),
                "_fid": pa.array(np.r_[np.full(n, ids[0], np.int64), ids[:1]]),
                "_sum": pa.array(np.r_[np.zeros(n, bool), [True]]),
            }
        )

    rep = s.map_batches(block_scan, batch_format="pyarrow", batch_size=None).materialize()
    edge = rep.map_batches(
        lambda t: t.filter(t.column("_sum")).select(["_fid", "off"]),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # exactly 1 summary row per non-empty block
    rows = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("_sum"))),
        batch_format="pyarrow",
        batch_size=None,
    )
    if not len(edge):
        return rows.map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column("i"),
                    count_col: t.column("c"),
                    offset_alias: t.column("off"),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    edge = edge.sort_values("_fid").reset_index(drop=True)
    fids = edge["_fid"].to_numpy().astype(np.int64)
    if len(fids) > 1 and (fids[1:] == fids[:-1]).any():
        # a duplicate id spanning a block boundary evaded the in-block check
        raise ValueError("exclusive_offsets: duplicate ids across blocks")
    totals = edge["off"].to_numpy().astype(np.int64)
    # exclusive block offsets; Python ints so a 10^14-token corpus can't
    # overflow an intermediate (result still fits int64 by contract)
    offs, acc = np.empty(len(totals), np.int64), 0
    for j in range(len(totals)):
        offs[j] = acc
        acc += int(totals[j])
    ref = ray.put((fids, offs))

    def add_base(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(ref)
        fid = t.column("_fid").to_numpy()
        pos = np.searchsorted(kk, fid)
        base = vv[pos]  # every _fid is a summary key by construction
        return pa.table(
            {
                id_col: t.column("i"),
                count_col: t.column("c"),
                offset_alias: pa.array(t.column("off").to_numpy() + base),
            }
        )

    return rows.map_batches(add_base, batch_format="pyarrow", batch_size=None)


def pack_sequences(
    ds,
    id_col: str,
    count_col: str,
    seq_len: int,
    offset_alias: str = "tok_start",
    seq_alias: str = "seq_first",
    nseq_alias: str = "n_seqs",
):
    """Fixed-length sequence packing by concatenation order: documents
    are laid out end-to-end in ``id_col`` order and the token stream is
    cut every ``seq_len`` tokens (docs may span sequence boundaries —
    the standard pretraining pack). Per doc: its global token offset,
    the first sequence id it lands in (offset // seq_len), and how many
    sequences it touches. Zero-token docs touch 0 sequences. Returns a
    Dataset (id_col, count_col, offset_alias, seq_alias, nseq_alias)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    offs = exclusive_offsets(ds, id_col, count_col, offset_alias=offset_alias)

    def seqs(t: pa.Table) -> pa.Table:
        start = t.column(offset_alias).to_numpy()
        n = t.column(count_col).to_numpy()
        first = start // seq_len
        nseq = np.where(n == 0, 0, (start + np.maximum(n, 1) - 1) // seq_len - first + 1)
        return t.append_column(seq_alias, pa.array(first)).append_column(
            nseq_alias, pa.array(nseq.astype(np.int64))
        )

    return offs.map_batches(seqs, batch_format="pyarrow", batch_size=None)


def global_rank(
    ds,
    value_col: str,
    id_col: str,
    descending: bool = False,
    rank_alias: str = "rank",
):
    """Global ``ROW_NUMBER() OVER (ORDER BY value [DESC], id)`` — the
    corpus-wide leaderboard rank (quality ordering, curriculum
    position) no window function in Ray Data can produce. ``id_col``
    must be unique non-null int64 (the deterministic tiebreak AND the
    block-identity key for the offset stitch).

    Plan: ONE distributed sort on (value, id); each block emits
    1-based in-block positions plus one summary row (first id, row
    count, first value); the driver orders the O(blocks) summaries by
    (first value, first id) — the block sort order, reconstructible
    because id is unique — prefix-sums the counts, and broadcasts
    {first_id -> base} into one vectorized add. Returns a Dataset
    (id_col, value_col, rank_alias), one row per input row."""
    import ray

    def project(t: pa.Table) -> pa.Table:
        if t.column(id_col).null_count or t.column(value_col).null_count:
            # null ordering would have to agree between the distributed
            # sort and the driver stitch — refuse instead of guessing
            raise ValueError("global_rank: null ids/values not supported")
        return pa.table(
            {"v": t.column(value_col), "i": t.column(id_col).cast(pa.int64())}
        )

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(
        ["v", "i"], descending=[descending, False]
    )

    def block_pos(t: pa.Table) -> pa.Table:
        vtype = t.schema.field("v").type
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {
                    "i": z,
                    "v": pa.array([], vtype),
                    "pos": z,
                    "_fid": z,
                    "_sum": pa.array([], pa.bool_()),
                }
            )
        n = t.num_rows
        ids = t.column("i").to_numpy()
        return pa.table(
            {
                "i": pa.array(np.r_[ids, ids[:1]]),
                "v": pa.concat_arrays(
                    [t.column("v").combine_chunks(), t.column("v").take(pa.array([0])).combine_chunks()]
                ),
                # summary row's pos carries the block's ROW COUNT
                "pos": pa.array(np.r_[np.arange(1, n + 1, dtype=np.int64), [n]]),
                "_fid": pa.array(np.r_[np.full(n, ids[0], np.int64), ids[:1]]),
                "_sum": pa.array(np.r_[np.zeros(n, bool), [True]]),
            }
        )

    rep = s.map_batches(block_pos, batch_format="pyarrow", batch_size=None).materialize()
    edge_parts = [
        t
        for t in ray.get(
            rep.map_batches(
                lambda t: t.filter(t.column("_sum")).select(["_fid", "v", "pos"]),
                batch_format="pyarrow",
                batch_size=None,
            )
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]  # 1 summary row per non-empty block
    rows = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("_sum"))),
        batch_format="pyarrow",
        batch_size=None,
    )
    if edge_parts:
        # ARROW sort (not pandas): string comparison must match the
        # distributed sort's UTF-8 byte order or ties across blocks
        # would stitch in the wrong order
        et = pa.concat_tables(edge_parts).combine_chunks().sort_by(
            [("v", "descending" if descending else "ascending"), ("_fid", "ascending")]
        )
        fids = et.column("_fid").to_numpy().astype(np.int64)
        if len(np.unique(fids)) != len(fids):
            # two blocks share a first id — ids are not unique
            raise ValueError("global_rank: duplicate ids")
        counts = et.column("pos").to_numpy().astype(np.int64)
        bases = np.concatenate(([0], np.cumsum(counts[:-1], dtype=np.int64)))
        order = np.argsort(fids)
        ref = ray.put((fids[order], bases[order]))
    else:
        ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def add_base(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(ref)
        fid = t.column("_fid").to_numpy()
        base = vv[np.searchsorted(kk, fid)] if len(kk) else np.zeros(len(fid), np.int64)
        return pa.table(
            {
                id_col: t.column("i"),
                value_col: t.column("v"),
                rank_alias: pa.array(t.column("pos").to_numpy() + base),
            }
        )

    return rows.map_batches(add_base, batch_format="pyarrow", batch_size=None)


def pack_manifest(ds, id_col: str, count_col: str, seq_len: int):
    """The training-loader manifest for ``pack_sequences``: one row per
    (sequence, document) intersection — which token span of which doc
    fills which slice of which fixed-length sequence. Columns:
    ``seq_id``, id_col, ``doc_off`` (first doc token in this sequence),
    ``seq_off`` (position of that token within the sequence), ``take_n``
    (tokens contributed). Invariants: per doc, take_n sums to its token
    count; per sequence, take_n sums to seq_len (except the final
    sequence). Pure vectorized explode (np.repeat) over the
    ``pack_sequences`` output — no extra shuffle."""
    packed = pack_sequences(ds, id_col, count_col, seq_len)

    def explode(t: pa.Table) -> pa.Table:
        start = t.column("tok_start").to_numpy()
        n = t.column(count_col).to_numpy()
        nseq = t.column("n_seqs").to_numpy()
        first = t.column("seq_first").to_numpy()
        ids = t.column(id_col).to_numpy()
        idx = np.repeat(np.arange(len(ids)), nseq)
        # k = within-doc sequence index 0..nseq-1
        offs = np.concatenate(([0], np.cumsum(nseq)[:-1]))
        k = np.arange(len(idx)) - offs[idx]
        s = first[idx] + k
        seg_start = np.maximum(s * seq_len, start[idx])
        seg_end = np.minimum((s + 1) * seq_len, start[idx] + n[idx])
        return pa.table(
            {
                "seq_id": pa.array(s.astype(np.int64)),
                id_col: pa.array(ids[idx]),
                "doc_off": pa.array((seg_start - start[idx]).astype(np.int64)),
                "seq_off": pa.array((seg_start - s * seq_len).astype(np.int64)),
                "take_n": pa.array((seg_end - seg_start).astype(np.int64)),
            }
        )

    return packed.map_batches(explode, batch_format="pyarrow", batch_size=None)
