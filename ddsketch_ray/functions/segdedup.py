"""Segment-level exact dedup — the CCNet paragraph/line-dedup shape.

Removes segments (paragraphs, lines, fixed token windows) that occur in
``min_docs`` or more *distinct* documents — the standard boilerplate
strip applied to web corpora before training (nav bars, footers, cookie
banners repeat across a host's pages; body text does not). This is a
capability gap of the reference (gmorleo/DDSketch is a pure numeric
sketch — SURVEY.md §2.3); the operator family is part of the
"training-data pipeline" set the driver instructions require.

Plan (two streaming passes, one tiny shuffle):

1. **Count pass** — per block: segment every doc, hash each segment
   (64-bit ``hash_strings``), dedupe hashes *within* each doc
   (COUNT(DISTINCT doc) semantics), pre-aggregate per-block counts per
   hash. Because a doc lives in exactly one block, per-block counts sum
   exactly. The partials (seg_hash, n) — O(block-distinct segments) per
   block, fixed 16 bytes/row — go through the high-cardinality
   sort-plan rollup (``sorted_sum_rollup``, measured 7-60× over
   ``groupby().aggregate``).
2. **Common set** — rollup rows with n ≥ min_docs are the boilerplate
   segments. Their cardinality is O(boilerplate), orders of magnitude
   below corpus size (every common segment is ≥ min_docs times rarer
   than its occurrences); collected to the driver, sorted, broadcast
   once via ``ray.put``. ``max_common`` caps the footprint explicitly —
   the cap raises rather than silently truncating.
3. **Emit pass** — per block: re-segment, membership via one
   ``searchsorted`` against the broadcast array, drop common segments,
   reassemble each doc with ``join_sep`` (one polars group-join), emit
   (id, *carry, n_segs, n_common, kept_text). Docs with zero segments
   are dropped (SQL oracles exclude token-less docs the same way).

64-bit segment hashing is the industry-standard CCNet compromise:
a false collision needs two distinct segment strings sharing a 64-bit
hash (~n²/2⁶⁵); at 10¹² segments that's ~3% chance of ONE collision
corpus-wide, affecting one segment. Exactness beyond that is exact.

Scale: the only all-to-all is the rollup sort over fixed-width
(hash, count) partials; both corpus passes are embarrassingly parallel;
driver state is O(common segments) and capped.
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import polars as pl
import pyarrow as pa

from ddsketch_ray.hashing import hash_strings

logger = logging.getLogger(__name__)

_ENTITY_CHAIN = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "©"),
    ("&amp;", "&"),  # last — matches extract.py's single-pass semantics
]

# block-level tags become paragraph boundaries; inline tags become spaces
_BLOCK_TAG = r"(?i)</?(?:p|div|nav|header|footer|title|h[1-6]|li|ul|ol|table|tr|td|br|section|article)\b[^>]*>"


def _seg_frame(doc_row: np.ndarray, seg_idx: np.ndarray, seg) -> pa.Table:
    return pa.table(
        {
            "doc_row": pa.array(doc_row, type=pa.int64()),
            "seg_idx": pa.array(seg_idx, type=pa.int64()),
            "seg": pa.array(seg, type=pa.string()),
        }
    )


def _explode_lists(lists: pl.Series) -> pa.Table:
    """List[str] per row → (doc_row, seg_idx, seg) with empty/whitespace
    segments dropped; seg_idx numbers the KEPT segments within each doc."""
    df = (
        pl.DataFrame({"doc_row": np.arange(len(lists), dtype=np.int64), "seg": lists})
        .explode("seg", empty_as_null=True)  # nulls are filtered below either way
        .with_columns(pl.col("seg").str.strip_chars())
        .filter(pl.col("seg").is_not_null() & (pl.col("seg") != ""))
    )
    d = df["doc_row"].to_numpy().astype(np.int64)
    # explode preserves per-doc order and docs are contiguous ascending
    starts = np.nonzero(np.r_[True, d[1:] != d[:-1]])[0]
    seg_idx = np.arange(len(d), dtype=np.int64) - np.repeat(
        starts, np.diff(np.r_[starts, len(d)])
    )
    return _seg_frame(d, seg_idx, df["seg"].to_arrow())


def line_segments(batch: pa.Table, text_col: str = "text", sep: str = "\n") -> pa.Table:
    """Segments = ``sep``-separated lines of ``text_col`` (classic CCNet
    line dedup). Blank/whitespace-only lines are dropped."""
    s = pl.from_arrow(batch.column(text_col).combine_chunks()).fill_null("")
    return _explode_lists(s.str.split(sep))


def token_window_segments(
    batch: pa.Table, text_col: str = "text", chunk_tokens: int = 8
) -> pa.Table:
    """Segments = consecutive non-overlapping ``chunk_tokens``-token
    windows (single-space joined) — the segment unit for corpora whose
    text carries no line structure. Token definition = TOKEN_PATTERN
    (shared with token_count_batch, so SQL oracles replicate
    boundaries exactly)."""
    from ddsketch_ray.functions.text import chunk_documents_batch

    rows = pa.table(
        {
            "__row__": pa.array(np.arange(batch.num_rows, dtype=np.int64)),
            text_col: batch.column(text_col),
        }
    )
    ch = chunk_documents_batch(
        rows, text_col=text_col, id_col="__row__", chunk_tokens=chunk_tokens, overlap=0
    )
    return _seg_frame(
        ch.column("__row__").to_numpy(),
        ch.column("chunk_id").to_numpy(),
        ch.column("chunk_text"),
    )


def html_paragraph_segments(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Segments = rendered text of block-level HTML elements (<p>, nav,
    title, footer, headings, …) — the paragraph unit CCNet-style dedup
    uses on raw web crawls. Same strip/entity chain as the byte-exact
    extractor (extract.py), except block-tag boundaries become segment
    breaks instead of spaces; fully vectorized (Rust regex)."""
    arr = batch.column(html_col).combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        s = pl.from_arrow(arr).cast(pl.String)
    else:
        s = pl.from_arrow(arr)
    s = s.fill_null("")
    s = s.str.replace_all(r"(?s)<!--.*?-->", " ")
    s = s.str.replace_all(r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    s = s.str.replace_all(r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    s = s.str.replace_all(_BLOCK_TAG, "\n")
    s = s.str.replace_all(r"<[^>]*>", " ")
    for ent, repl in _ENTITY_CHAIN:
        s = s.str.replace_all(ent, repl, literal=True)
    s = s.str.replace_all(r"[ \t\r\x0b\x0c]+", " ")
    return _explode_lists(s.str.split("\n"))


def _doc_unique_hashes(segs: pa.Table, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_row, seg_hash) with within-doc duplicate hashes removed —
    the COUNT(DISTINCT doc) unit. Returns (docs, hashes) int64/uint64."""
    h = hash_strings(segs.column("seg"), seed=seed)
    d = segs.column("doc_row").to_numpy()
    if len(h) == 0:
        return d.astype(np.int64), h
    order = np.lexsort((h, d))
    hs, ds_ = h[order], d[order]
    keep = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
    return ds_[keep].astype(np.int64), hs[keep]


def _count_partials(batch: pa.Table, segmenter, seed: int) -> pa.Table:
    _, hu = _doc_unique_hashes(segmenter(batch), seed)
    if len(hu) == 0:
        return pa.table(
            {"seg_hash": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    hu = np.sort(hu)
    starts = np.nonzero(np.r_[True, hu[1:] != hu[:-1]])[0]
    return pa.table(
        {
            "seg_hash": pa.array(hu[starts].view(np.int64)),
            "n": pa.array(np.diff(np.r_[starts, len(hu)]).astype(np.int64)),
        }
    )


def common_segment_hashes(
    ds,
    segmenter,
    min_docs: int = 2,
    seed: int = 0,
    max_common: int = 5_000_000,
) -> np.ndarray:
    """Sorted int64 hashes of segments occurring in ≥ min_docs distinct
    docs (pass 1+2 of the plan above). Driver footprint = O(result),
    capped at ``max_common`` (raises — never silently truncates)."""
    import ray

    from ddsketch_ray.functions.analytics import sorted_sum_rollup

    partials = ds.map_batches(
        partial(_count_partials, segmenter=segmenter, seed=seed),
        batch_format="pyarrow",
        batch_size=None,
    )
    rolled = sorted_sum_rollup(partials, "seg_hash", ["n"])
    common = (
        rolled.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t.column("n"), pa.scalar(min_docs))
            ).select(["seg_hash"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
        .to_arrow_refs()
    )
    parts = [t for t in ray.get(common) if t.num_rows]
    out = (
        np.sort(np.concatenate([t.column("seg_hash").to_numpy() for t in parts]))
        if parts
        else np.empty(0, dtype=np.int64)
    )
    if len(out) > max_common:
        raise ValueError(
            f"{len(out)} common segments exceeds max_common={max_common}; "
            "raise min_docs or max_common (driver/broadcast footprint cap)"
        )
    logger.info("segment_dedup: %d common segments (min_docs=%d)", len(out), min_docs)
    return out


def _emit_batch(
    batch: pa.Table,
    segmenter,
    common_ref,
    id_col: str,
    carry_cols: tuple,
    join_sep: str,
    seed: int,
) -> pa.Table:
    import ray

    common = ray.get(common_ref) if common_ref is not None else np.empty(0, np.int64)
    segs = segmenter(batch)
    d = segs.column("doc_row").to_numpy()
    h = hash_strings(segs.column("seg"), seed=seed).view(np.int64)
    pos = np.searchsorted(common, h)
    pos_c = np.minimum(pos, max(len(common) - 1, 0))
    is_common = (
        (pos < len(common)) & (common[pos_c] == h)
        if len(common)
        else np.zeros(len(h), dtype=bool)
    )
    n_segs = np.bincount(d, minlength=batch.num_rows).astype(np.int64)
    n_common = np.bincount(d[is_common], minlength=batch.num_rows).astype(np.int64)
    docs_with = np.nonzero(n_segs > 0)[0]

    kept = pl.DataFrame(
        {
            "doc": d[~is_common],
            "idx": segs.column("seg_idx").to_numpy()[~is_common],
            "seg": pl.from_arrow(segs.column("seg")).filter(
                pl.Series(~is_common)
            ),
        }
    )
    agg = (
        kept.sort(["doc", "idx"])
        .group_by("doc", maintain_order=True)
        .agg(pl.col("seg").str.join(join_sep).alias("kept_text"))
    )
    texts = np.full(len(docs_with), "", dtype=object)
    if agg.height:
        texts[np.searchsorted(docs_with, agg["doc"].to_numpy())] = (
            agg["kept_text"].to_numpy()
        )
    take = pa.array(docs_with)
    out = {id_col: batch.column(id_col).take(take)}
    for c in carry_cols:
        out[c] = batch.column(c).take(take)
    out["n_segs"] = pa.array(n_segs[docs_with])
    out["n_common"] = pa.array(n_common[docs_with])
    out["kept_text"] = pa.array(texts, type=pa.string())
    return pa.table(out)


def segment_dedup(
    ds,
    segmenter,
    id_col: str = "doc_id",
    min_docs: int = 2,
    join_sep: str = " ",
    carry_cols: tuple = (),
    seed: int = 0,
    max_common: int = 5_000_000,
):
    """CCNet-style segment dedup (module docstring has the full plan).

    ``segmenter``: picklable ``batch -> (doc_row, seg_idx, seg)`` table
    (``line_segments`` / ``token_window_segments`` /
    ``html_paragraph_segments``, via ``functools.partial`` for args).

    Returns ``(dataset, info)``: dataset rows are
    (id_col, *carry_cols, n_segs, n_common, kept_text) for every input
    doc with ≥ 1 segment; ``info['n_common_segments']`` is the
    boilerplate cardinality.
    """
    import ray

    common = common_segment_hashes(
        ds, segmenter, min_docs=min_docs, seed=seed, max_common=max_common
    )
    ref = ray.put(common)
    out = ds.map_batches(
        partial(
            _emit_batch,
            segmenter=segmenter,
            common_ref=ref,
            id_col=id_col,
            carry_cols=tuple(carry_cols),
            join_sep=join_sep,
            seed=seed,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out, {"n_common_segments": int(len(common))}


def common_segments_report(ds, segmenter, top_k: int = 10, seed: int = 0):
    """Top-k boilerplate segments by document frequency: (seg, n_docs)
    ordered by (n_docs DESC, seg ASC). Same count plan as
    ``segment_dedup`` but keyed on the segment STRING (the report needs
    the text); final top-k via per-block candidates + an O(blocks×k)
    driver merge (rollup rows are key-unique — the vocab_stats
    pattern), never a second all-to-all."""
    import ray
    import ray.data as rd

    from ddsketch_ray.functions.analytics import sorted_sum_rollup

    def seg_partials(batch: pa.Table) -> pa.Table:
        segs = segmenter(batch)
        if segs.num_rows == 0:
            return pa.table(
                {"seg": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
            )
        df = (
            pl.DataFrame(
                {
                    "doc": segs.column("doc_row").to_numpy(),
                    "seg": pl.from_arrow(segs.column("seg")),
                }
            )
            .unique(subset=["doc", "seg"])
            .group_by("seg")
            .agg(pl.len().cast(pl.Int64).alias("n_docs"))
        )
        return pa.table(
            {
                "seg": pa.array(df["seg"].to_arrow(), type=pa.string()),
                "n_docs": pa.array(df["n_docs"].to_numpy()),
            }
        )

    rolled = sorted_sum_rollup(
        ds.map_batches(seg_partials, batch_format="pyarrow", batch_size=None),
        "seg",
        ["n_docs"],
    )
    keys = [("n_docs", "descending"), ("seg", "ascending")]

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= top_k:
            return t
        return t.take(pa.compute.sort_indices(t, sort_keys=keys)[:top_k])

    cands = [
        t
        for t in ray.get(
            rolled.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not cands:
        return rd.from_arrow(
            pa.table({"seg": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())})
        )
    allc = pa.concat_tables(cands).combine_chunks()
    return rd.from_arrow(allc.take(pa.compute.sort_indices(allc, sort_keys=keys)[:top_k]))
