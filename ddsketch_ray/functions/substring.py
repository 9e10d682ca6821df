"""Exact duplicated-substring detection and removal (corpus-level).

The operator the big LLM-corpus cleanups run AFTER document-level
dedup: find every token window of length ``window`` that occurs more
than once ANYWHERE in the corpus (across documents or within one), and
per document report / remove the union of the duplicated spans (Lee et
al., "Deduplicating Training Data Makes Language Models Better", ACL
2022 — their suffix-array formulation; this is the windowed
rolling-hash equivalent over Ray Data, the standard distributed
adaptation).

Reference scope note: gmorleo/DDSketch has no text operators at all
(`ddsketch.h:58-252` is a numeric sketch API); this module is part of
the LLM-data-pipeline surface this engine adds on top.

Semantics (locked to the SQL oracle `substring_dedup_documents`):

- tokens: ASCII-whitespace split (``text.TOKEN_PATTERN``), empties
  dropped — the library-wide token definition.
- a *window* is ``window`` consecutive tokens inside one document;
  its identity is the space-joined token string (the engine uses a
  64-bit polynomial of xxhash token hashes — equal up to hash
  collisions, the same accepted identity as ``ngram_jaccard_dedup``).
- a window is *duplicated* iff its gram occurs ≥ 2 times in the whole
  corpus, counting every (doc, position) occurrence — two occurrences
  inside one document count.
- per doc: ``dup_windows`` = number of duplicated window occurrences,
  ``dup_covered`` = |union of [p, p+window-1] over them|,
  ``clean_text`` = the uncovered tokens joined by one space (documents
  shorter than ``window`` tokens have no windows: nothing removed).

Plan (Ray-Data-first, two passes, no all-pairs anywhere):

1. COUNT: ``map_batches`` per block — tokenize (polars), hash tokens
   (xxhash), combine each window with one multiply-add pass per window
   offset (``window`` vector ops, no Python loop over rows), partial
   ``np.unique`` counts — then ``sorted_sum_rollup`` sums per hash and
   a filter keeps hashes with total ≥ 2. The shuffle carries
   pre-aggregated (hash, count) rows only.
2. MARK/CLEAN: size-gated like the dedup substrate.
   - ``broadcast`` (dup-hash count ≤ ``driver_threshold``): pull the
     duplicated hashes into one sorted uint64 array, ``ray.put`` it
     once, and a second stateless map over the documents recomputes
     window hashes, marks membership with ``searchsorted``, and
     computes coverage + cleaned text fully vectorized. Driver
     footprint = O(duplicated distinct windows) — the same documented
     bound as the dedup driver fast path.
   - ``distributed``: window instances ship as narrow (hash, doc, pos)
     rows through ``semi_join_shuffle`` against the duplicated-hash
     keys, per-doc spans are assembled with the sort-plan (boundary
     docs — ≤ 2 per block — re-merged on the driver), and one
     ``equi_join_shuffle`` (block-coalesced) attaches the spans back
     to the documents; the final map masks the spans. No stage holds
     O(duplicated windows) on the driver.
   Both modes produce identical output (pytest equality).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ddsketch_ray.functions.text import TOKEN_PATTERN
from ddsketch_ray.hashing import hash_strings, splitmix64

_U64 = np.uint64
_WCOMB = _U64(0x9E3779B97F4A7C15)  # odd multiplier for the window polynomial


def _tokenize(texts: pa.ChunkedArray | pa.Array):
    """(per-doc token lists as polars, flat token series, int64 lens)."""
    s = pl.from_arrow(texts.cast(pa.large_string())).fill_null("")
    toks = s.str.extract_all(TOKEN_PATTERN)
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()
    return toks, flat, lens


def _window_hashes(flat: pl.Series, lens: np.ndarray, window: int, seed: int):
    """Per-window uint64 hashes over a batch of documents.

    Returns (whash, gdoc, gpos): for every complete window — ``window``
    consecutive tokens inside one doc — its hash, the batch-local doc
    index, and the 0-based in-doc start position. One multiply-add pass
    per window offset; windows crossing doc boundaries are masked out.
    """
    total = int(lens.sum())
    if total < window:
        return (np.empty(0, _U64), np.empty(0, np.int64), np.empty(0, np.int64))
    th = hash_strings(flat.to_arrow(), seed=seed)  # uint64 per occurrence
    m = total - window + 1  # candidate start positions (global index)
    with np.errstate(over="ignore"):
        pw = _U64(1)
        acc = np.zeros(m, dtype=_U64)
        for j in range(window):
            acc += th[j : m + j] * pw
            pw = pw * _WCOMB
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = doc_idx[:m] == doc_idx[window - 1 :]
    g = np.nonzero(valid)[0]
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    gdoc = doc_idx[g]
    gpos = g - starts[gdoc]
    whash = splitmix64(acc[g] ^ splitmix64(np.asarray(seed, dtype=_U64)))
    return whash, gdoc, gpos


def _window_positions(lens: np.ndarray, window: int):
    """(gdoc, gpos) of every complete window — the position math of
    ``_window_hashes`` WITHOUT hashing (the clean/finish stage only
    masks by position; re-hashing every token there would double the
    pipeline's hash cost)."""
    total = int(lens.sum())
    if total < window:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    m = total - window + 1
    valid = doc_idx[:m] == doc_idx[window - 1 :]
    g = np.nonzero(valid)[0]
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    gdoc = doc_idx[g]
    return gdoc, g - starts[gdoc]


def _dup_window_hashes(ds, text_col: str, window: int, seed: int):
    """Dataset of (whash:int64, n:int64) for every window hash with
    total corpus occurrence count ≥ 2 (pass 1)."""
    import pyarrow.compute as pc

    from ddsketch_ray.functions.analytics import sorted_sum_rollup

    def partial(t: pa.Table) -> pa.Table:
        _, flat, lens = _tokenize(t.column(text_col))
        whash, _, _ = _window_hashes(flat, lens, window, seed)
        u, c = np.unique(whash, return_counts=True)
        return pa.table(
            {
                "whash": pa.array(u.view(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    rolled = sorted_sum_rollup(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "whash",
        ["n"],
    )
    return rolled.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 2)),
        batch_format="pyarrow",
        batch_size=None,
    )


def _finish_batch(
    t: pa.Table,
    id_col: str,
    text_col: str,
    dup_pos_mask,
    window: int,
) -> pa.Table:
    """Shared tail: given the batch and a boolean mask over its window
    instances (True = duplicated), emit the per-doc report row."""
    toks, flat, lens = _tokenize(t.column(text_col))
    n = t.num_rows
    total = int(lens.sum())
    whash, gdoc, gpos = dup_pos_mask["wins"]
    dup = dup_pos_mask["mask"]
    ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)

    dup_windows = np.bincount(gdoc[dup], minlength=n).astype(np.int64)
    # coverage: union of [p, p+window-1]; instances are sorted by
    # (doc, pos) by construction, so within-doc diffs clip at `window`
    dd, pp = gdoc[dup], gpos[dup]
    covered = np.zeros(n, dtype=np.int64)
    if len(dd):
        gap = np.diff(pp)
        same = dd[1:] == dd[:-1]
        contrib = np.where(same, np.minimum(gap, window), window)
        # each instance contributes min(window, next_pos - pos) except
        # the LAST of its doc, which contributes window
        per_inst = np.empty(len(dd), dtype=np.int64)
        per_inst[:-1] = contrib
        per_inst[-1] = window
        np.add.at(covered, dd, per_inst)
    # cleaned text: mask covered token positions, rejoin with ' '
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    delta = np.zeros(total + 1, dtype=np.int64)
    if len(dd):
        gstart = starts[dd] + pp
        np.add.at(delta, gstart, 1)
        np.add.at(delta, gstart + window, -1)
    cover = np.cumsum(delta[:-1]) > 0
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    kept = pl.DataFrame(
        {"i": doc_idx[~cover], "tok": flat.filter(pl.Series(~cover))}
    )
    joined = kept.group_by("i").agg(clean=pl.col("tok").str.join(" "))
    base = pl.DataFrame({"i": np.arange(n, dtype=np.int64)})
    out = base.join(joined, on="i", how="left").sort("i")
    clean = out["clean"].fill_null("").to_arrow().cast(pa.string())
    return pa.table(
        {
            id_col: pa.array(ids),
            "n_tokens": pa.array(lens),
            "dup_windows": pa.array(dup_windows),
            "dup_covered": pa.array(covered),
            "clean_text": clean,
        }
    )


def substring_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    seed: int = 0,
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    num_buckets: int = 64,
):
    """Corpus-level duplicated-substring report + removal. Returns a
    Dataset (id_col, n_tokens, dup_windows, dup_covered, clean_text) —
    one row per input document. See the module docstring for the exact
    semantics and the two size-gated execution plans."""
    if mode not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    dup_ds = _dup_window_hashes(ds, text_col, window, seed).materialize()
    n_dup = dup_ds.count()
    if mode == "auto":
        mode = "broadcast" if n_dup <= driver_threshold else "distributed"

    if mode == "broadcast":
        return _substring_clean_broadcast(
            ds, dup_ds, id_col, text_col, window, seed
        )
    return _substring_clean_distributed(
        ds, dup_ds, id_col, text_col, window, seed, num_buckets
    )


def _substring_clean_broadcast(ds, dup_ds, id_col, text_col, window, seed):
    import ray

    # O(duplicated distinct windows) driver pull — the documented bound
    # of the fast path; the auto gate routes bigger sets distributed
    dup_sorted = np.sort(
        dup_ds.to_pandas()["whash"].to_numpy().view(_U64)
    )
    ref = ray.put(dup_sorted)

    def mark(t: pa.Table) -> pa.Table:
        dup_arr = ray.get(ref)
        _, flat, lens = _tokenize(t.column(text_col))
        wins = _window_hashes(flat, lens, window, seed)
        wh = wins[0]
        if len(dup_arr) and len(wh):
            idx = np.searchsorted(dup_arr, wh)
            idx[idx == len(dup_arr)] = len(dup_arr) - 1
            mask = dup_arr[idx] == wh
        else:
            mask = np.zeros(len(wh), dtype=bool)
        return _finish_batch(
            t, id_col, text_col, {"wins": wins, "mask": mask}, window
        )

    return ds.map_batches(mark, batch_format="pyarrow", batch_size=None)


def _instances_fn(id_col: str, text_col: str, window: int, seed: int):
    """Picklable per-batch map: documents → (whash, _doc, _pos) window
    instance rows (the narrow explode both distributed phases consume)."""

    def instances(t: pa.Table) -> pa.Table:
        _, flat, lens = _tokenize(t.column(text_col))
        whash, gdoc, gpos = _window_hashes(flat, lens, window, seed)
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "whash": pa.array(whash.view(np.int64)),
                "_doc": pa.array(ids[gdoc]),
                "_pos": pa.array(gpos),
            }
        )

    return instances


def _substring_clean_distributed(
    ds, dup_ds, id_col, text_col, window, seed, num_buckets
):
    """Scale path: nothing O(duplicated windows) on the driver.

    instances —semi-join→ duplicated instances —sort-plan spans per
    doc (boundary docs driver-stitched, ≤ 2 rows per block)— left
    equi-join back onto the documents — final mask map."""
    from ddsketch_ray.functions.joins import semi_join_shuffle

    inst = ds.map_batches(
        _instances_fn(id_col, text_col, window, seed),
        batch_format="pyarrow",
        batch_size=None,
    )
    dup_inst = semi_join_shuffle(
        inst, dup_ds, "whash", "whash", ["_doc", "_pos"], num_buckets=num_buckets
    )
    spans = _spans_from_dup_instances(dup_inst, id_col)
    return _attach_and_finish(ds, spans, id_col, text_col, window, num_buckets)


def _spans_from_dup_instances(dup_inst, id_col: str):
    """Duplicated (\\_doc, \\_pos) instance rows → one (\\_doc,
    \\_positions blob) row per doc: sort-plan in-block runs, boundary
    docs (≤ 2 per block) re-merged on the driver."""
    import pyarrow.compute as pc
    import ray.data as rd

    # per-doc sorted positions -> packed span string (pos list as a
    # binary int64 blob): in-block runs, boundary docs via the driver
    srt = dup_inst.sort(["_doc", "_pos"])

    def block_spans(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "_doc": pa.array([], pa.int64()),
                    "_positions": pa.array([], pa.large_binary()),
                    "boundary": pa.array([], pa.bool_()),
                }
            )
        d = t.column("_doc").to_numpy()
        p = t.column("_pos").to_numpy()
        starts = np.nonzero(np.r_[True, d[1:] != d[:-1]])[0]
        ends = np.r_[starts[1:], len(d)]
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        blobs = [p[a:b].astype(np.int64).tobytes() for a, b in zip(starts, ends)]
        return pa.table(
            {
                "_doc": pa.array(d[starts]),
                "_positions": pa.array(blobs, pa.large_binary()),
                "boundary": pa.array(boundary),
            }
        )

    rep = srt.map_batches(
        block_spans, batch_format="pyarrow", batch_size=None
    ).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).select(
            ["_doc", "_positions"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(["_doc", "_positions"]),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 rows per block
    spans = internal
    if len(edge):
        merged = (
            edge.groupby("_doc", as_index=False)["_positions"]
            .agg(lambda bs: b"".join(bs))
        )
        spans = internal.union(
            rd.from_arrow(
                pa.table(
                    {
                        "_doc": pa.array(merged["_doc"].to_numpy(np.int64)),
                        "_positions": pa.array(
                            list(merged["_positions"]), pa.large_binary()
                        ),
                    }
                )
            )
        )

    return spans


def _attach_and_finish(docs_ds, spans, id_col, text_col, window, num_buckets):
    """LEFT-join the per-doc span blobs back onto the documents (block-
    coalesced shuffle join) and emit the report rows. Position-only —
    no re-hashing: the mask is rebuilt from the blobs with one
    vectorized isin over (doc, pos) combined keys."""
    from ddsketch_ray.functions.joins import equi_join_shuffle

    lab = equi_join_shuffle(
        docs_ds,
        spans,
        id_col,
        "_doc",
        [text_col],
        ["_positions"],
        num_buckets=num_buckets,
        how="left",
        coalesce_blocks=True,
    )

    def finish(t: pa.Table) -> pa.Table:
        _, flat, lens = _tokenize(t.column(text_col))
        gdoc, gpos = _window_positions(lens, window)
        blobs = t.column("_positions").to_pylist()
        mask = np.zeros(len(gdoc), dtype=bool)
        nonempty = [(i, b) for i, b in enumerate(blobs) if b]
        if len(gdoc) and nonempty:
            blob_doc = np.repeat(
                np.array([i for i, _ in nonempty], dtype=np.int64),
                np.array([len(b) // 8 for _, b in nonempty], dtype=np.int64),
            )
            blob_pos = np.frombuffer(
                b"".join(b for _, b in nonempty), dtype=np.int64
            )
            m = int(max(gpos.max(), blob_pos.max())) + 1
            mask = np.isin(gdoc * m + gpos, blob_doc * m + blob_pos)
        return _finish_batch(
            t, id_col, text_col, {"wins": (None, gdoc, gpos), "mask": mask}, window
        )

    return lab.map_batches(finish, batch_format="pyarrow", batch_size=None)


def substring_dedup_checkpointed(
    input_files,
    ckpt_dir: str,
    run_id: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    seed: int = 0,
    concurrency: int = 8,
    files_per_partition: int = 1,
    num_buckets: int = 64,
):
    """Resumable substring dedup for big corpora: the window-instance
    extraction — the dominant cost (tokenize + xxhash every token of
    text) — runs as a CheckpointedMapJob writing one (whash, _doc,
    _pos) instance parquet per input shard; a killed run resumes from
    the finished shards. The count/semi-join/span phases then STREAM
    from the instance parts (narrow 24-byte rows — re-running them
    after a crash re-reads, never re-tokenizes), and only the final
    clean map re-reads the original documents (position-mask only, no
    re-hashing). Always the distributed plan — this is the scale job.

    Returns (report Dataset, job) — ``job.manifest()`` carries the
    per-partition lineage + metrics."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ddsketch_ray.functions.analytics import sorted_sum_rollup
    from ddsketch_ray.functions.joins import semi_join_shuffle
    from ddsketch_ray.state.checkpoint import CheckpointedMapJob

    job = CheckpointedMapJob(
        list(input_files),
        _instances_fn(id_col, text_col, window, seed),
        columns=[id_col, text_col],
        ckpt_dir=ckpt_dir,
        run_id=run_id,
        files_per_partition=files_per_partition,
    )
    part_files = job.run(concurrency=concurrency)
    inst = rd.read_parquet(part_files).materialize()

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("whash").to_numpy(), return_counts=True)
        return pa.table({"whash": pa.array(u), "n": pa.array(c.astype(np.int64))})

    dup_ds = sorted_sum_rollup(
        inst.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "whash",
        ["n"],
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 2)),
        batch_format="pyarrow",
        batch_size=None,
    )
    dup_inst = semi_join_shuffle(
        inst, dup_ds, "whash", "whash", ["_doc", "_pos"], num_buckets=num_buckets
    )
    spans = _spans_from_dup_instances(dup_inst, id_col)
    docs = rd.read_parquet(list(input_files), columns=[id_col, text_col])
    out = _attach_and_finish(docs, spans, id_col, text_col, window, num_buckets)
    return out, job
