"""Persisted inverted-index layout for BM25 serving.

`functions/search.py:bm25_search` tokenizes the corpus once PER CALL —
the right plan for a one-shot query batch, and ~2.5 s/600k pages of pure
tokenization that every refresh re-pays. This module is the
amortization path, completing the persisted-index family
(`dedup_index.write_minhash_index` for near-dup lookup,
`ann.write_ivf` for vectors): tokenize the corpus ONCE into a
term-hash-bucketed postings layout, then serve any number of query
batches by reading ONLY the buckets (and, via the term-sorted files,
only the row groups) that contain the query terms.

Layout (``write_text_index``)::

    out_dir/
      _text_index_meta.json        # n_docs, sum_dl (exact ints),
                                   # num_buckets, seed, doc_id/text cols
      bucket=<b>/*.parquet         # postings (tok, doc_id, tf, dl),
                                   # sorted by (bucket, tok) so a term
                                   # predicate prunes row groups

Postings are denormalized — each (doc, term) row carries the doc's
token length ``dl`` — so serving never joins a doc-norms side table.
``df`` per term is NOT stored: it is the row count of the term's
postings, recounted exactly from the pruned read at query time, which
keeps appends trivially correct (no stats to invalidate beyond the two
manifest integers).

Scoring (``search_text_index``) uses the same Okapi BM25 formula and
(N, avgdl, df) statistics as the inline path, but sums per-document
term contributions in **int64 fixed point** (each per-(doc, term)
contribution quantized once at 2^40 units): a doc's query terms land in
DIFFERENT hash buckets, so unlike the inline plan its score cannot be
formed inside one source block — the cross-block sum must be
order-independent to stay deterministic under any block layout, which
float addition is not and exact integers are (the repo-wide fixed-point
rule: CLAUDE.md, functions/cluster.py, functions/graph.py). The whole
chain — idf/avgdl doubles from exact-int stats, one quantization per
contribution, integer sums, one float conversion, round-half-even to 6
decimals — is replayed bit-for-bit by the ``bm25_index_docs`` /
``bm25_index_append_docs`` SQL oracles. Quantization at 2^40 bounds
score magnitudes to < 2^23 (plenty: BM25 scores are O(terms × idf) ≤
hundreds) with 9.1e-13 resolution, far below the 1e-6 ranking round.

Serving plan (zero corpus pass, no all-to-all over the corpus)::

    read    only the query terms' bucket dirs, filter tok ∈ terms
            (row-group pruned via the term sort)
    df      per-block per-term row counts → driver sums O(blocks×terms)
    sort    pruned postings by doc_id — the ONLY shuffle, over the
            matched rows (Σ df over query terms), not the corpus
    score   per block: quantized contributions, dense (docs × terms)
            int64 matrix × query membership; interior docs (fully
            contained in the block — doc runs are contiguous after the
            sort) emit block-local top-k candidates; the block's first/
            last doc emits per-query integer partials (≤ 2×queries rows
            per block) for the driver to re-sum exactly
    merge   driver: fix boundary docs, global top-k per query —
            O(blocks × queries × (k + 2)) rows, never the corpus

Reference scope note: gmorleo/DDSketch has no text or retrieval
operators (SURVEY.md §2.3) — this is a north-rule training-data
addition, the serving counterpart of ``functions/search.py``.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ddsketch_ray.functions.text import TOKEN_PATTERN, _text_series

__all__ = ["write_text_index", "append_to_text_index", "search_text_index"]

META_NAME = "_text_index_meta.json"
# 2^40 fixed-point units per 1.0 of BM25 score — exact in float64, so
# `contrib * _SCALE` is one rounding-free double multiply on both the
# numpy and the SQL side.
_SCALE = float(1 << 40)


def _term_bucket(terms_arr: pa.ChunkedArray | pa.Array, num_buckets: int, seed: int) -> np.ndarray:
    """Bucket id per term — the same seeded string hash the MinHash
    index layout uses (agg.hash_any_column), mod num_buckets."""
    from ddsketch_ray.agg import hash_any_column

    return (hash_any_column(terms_arr, is_arrow=True, seed=seed) % np.uint64(num_buckets)).astype(
        np.int64
    )


def _postings_map(text_col: str, doc_id_col: str, num_buckets: int, seed: int):
    """Per-block corpus → postings kernel: tokenize once (the shared
    ASCII-whitespace TOKEN_PATTERN), group to (doc, tok) with exact tf,
    carry dl per row, add the term-hash bucket column."""

    def to_postings(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(doc_id_col).type
        empty = pa.table(
            {
                "tok": pa.array([], pa.string()),
                "doc_id": pa.array([], type=id_type),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        s = _text_series(t, text_col)
        dl = s.str.count_matches(TOKEN_PATTERN).cast(pl.Int64).to_numpy()
        rows = (
            pl.DataFrame(
                {
                    "row": pl.arange(0, len(s), dtype=pl.Int64, eager=True),
                    "tok": s.str.extract_all(TOKEN_PATTERN),
                }
            )
            .explode("tok")
            .drop_nulls("tok")
            .group_by(["row", "tok"])
            .agg(tf=pl.len().cast(pl.Int64))
        )
        if not rows.height:
            return empty
        ridx = rows["row"].to_numpy()
        tok = rows["tok"].to_arrow().cast(pa.string())
        return pa.table(
            {
                "tok": tok,
                "doc_id": t.column(doc_id_col).take(pa.array(ridx)),
                "tf": pa.array(rows["tf"].to_numpy(), pa.int64()),
                "dl": pa.array(np.asarray(dl)[ridx].astype(np.int64)),
                "bucket": pa.array(_term_bucket(tok, num_buckets, seed)),
            }
        )

    return to_postings


def _corpus_totals(ds, text_col: str) -> tuple[int, int]:
    """(n_docs, sum_dl) in one cheap count_matches pass (no explode) —
    O(blocks) driver rows, same as the inline pass B."""
    import ray

    def totals(t: pa.Table) -> pa.Table:
        s = _text_series(t, text_col)
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "sum_dl": pa.array(
                    [int(s.str.count_matches(TOKEN_PATTERN).cast(pl.Int64).sum() or 0)],
                    pa.int64(),
                ),
            }
        )

    n_docs = 0
    sum_dl = 0
    for tb in ray.get(
        ds.map_batches(totals, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    ):
        if tb.num_rows == 0:
            continue
        n_docs += sum(tb.column("n_docs").to_pylist())
        sum_dl += sum(tb.column("sum_dl").to_pylist())
    return n_docs, sum_dl


def write_text_index(
    ds,
    out_dir: str,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    num_buckets: int = 64,
    seed: int = 0,
) -> dict:
    """Build the persisted postings layout. One corpus tokenization +
    ONE sort by (bucket, tok) — the one-time shuffle the layout
    amortizes (the `write_bucketed` sorted-write rule: an unsorted hive
    write emits blocks × buckets tiny files and the re-read pays for
    every one). Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    n_docs, sum_dl = _corpus_totals(ds, text_col)
    postings = ds.map_batches(
        _postings_map(text_col, doc_id_col, num_buckets, seed),
        batch_format="pyarrow",
        batch_size=None,
    )
    if n_docs:
        # 64k-row row groups: the serve-time term filter prunes at row-
        # group granularity via the tok sort — one ~1M-row group per
        # file would force decoding the whole bucket for any one term
        # (measured 515 → 31 ms/serve on the 600k-page stress corpus)
        postings.sort(["bucket", "tok"]).write_parquet(
            out_dir, partition_cols=["bucket"], row_group_size=64_000
        )
    meta = {
        "version": 1,
        "n_docs": int(n_docs),
        "sum_dl": int(sum_dl),
        "num_buckets": int(num_buckets),
        "seed": int(seed),
        "text_col": text_col,
        "doc_id_col": doc_id_col,
    }
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def append_to_text_index(new_ds, out_dir: str) -> int:
    """Incremental ingest — the `append_to_ivf` contract: tokenize ONLY
    the new docs with the layout's recorded (num_buckets, seed, column)
    identity, append sorted parquet parts inside the bucket dirs (Ray
    UUIDs per-run file names, so appends never collide), and bump the
    two exact manifest integers. Because df is recounted from postings
    at query time and (n_docs, sum_dl) are exact sums, a served query
    is bit-identical to one against an index built on the union corpus
    (gate query ``bm25_index_append_docs``). The caller owns doc-id
    uniqueness across ingest batches. Returns docs appended."""
    with open(os.path.join(out_dir, META_NAME)) as f:
        meta = json.load(f)
    n_new, dl_new = _corpus_totals(new_ds, meta["text_col"])
    if n_new == 0:
        return 0
    new_ds.map_batches(
        _postings_map(meta["text_col"], meta["doc_id_col"], meta["num_buckets"], meta["seed"]),
        batch_format="pyarrow",
        batch_size=None,
    ).sort(["bucket", "tok"]).write_parquet(
        out_dir, partition_cols=["bucket"], row_group_size=64_000
    )
    meta["n_docs"] = int(meta["n_docs"] + n_new)
    meta["sum_dl"] = int(meta["sum_dl"] + dl_new)
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    return int(n_new)


def _term_bucket_files(
    out_dir: str, terms: list[str], num_buckets: int, seed: int
) -> tuple[list[str], dict[str, list[str]]]:
    """ONLY the query terms' bucket files — the pruning the layout
    exists for. Returns (all pruned files, per-term file lists). Byte
    sizes are known before any read, so the physical-plan gate costs
    nothing; the per-term lists let the driver plan issue one
    EQUALITY-filtered read per term (row-group statistics prune
    equality predicates; an isin over the union evaluates post-decode
    and measured 0.30 s where six equality reads take 0.05 s)."""
    tb = _term_bucket(pa.array(terms, pa.string()), num_buckets, seed)
    by_bucket: dict[int, list[str]] = {
        b: sorted(_glob.glob(f"{out_dir}/bucket={b}/*.parquet"))
        for b in sorted(set(tb.tolist()))
    }
    files = [f for b in sorted(by_bucket) for f in by_bucket[b]]
    per_term = {t: by_bucket[int(b)] for t, b in zip(terms, tb.tolist())}
    return files, per_term


def _contrib_quantized(idf_t, tf, dl, avgdl, k1, b):
    """Per-(doc, term) BM25 contribution → 2^40 int64 units — the
    expression spelled EXACTLY as the inline plan / SQL oracle
    (((idf·tf)·(k1+1)) / (tf + k1·(1−b+b·(dl/avgdl)))), quantized once
    (np.rint == round_even)."""
    denom = tf + k1 * (1.0 - b + b * (dl / avgdl))
    return np.rint(idf_t * tf * (k1 + 1.0) / denom * _SCALE).astype(np.int64)


def _rank_rows(per_query, q_ids, k, id_type) -> pa.Table:
    """Final ranking: per query, (doc ids, int64 score sums) → rounded
    score, (score DESC, doc ASC) order, rank 1..k."""
    out_q: list[str] = []
    out_r: list[int] = []
    out_d: list[object] = []
    out_s: list[float] = []
    for qid in q_ids:
        cd, cp = per_query.get(qid, (None, None))
        if cd is None or not len(cd):
            continue
        sc = np.round(cp / _SCALE, 6)  # half-even, mirrored by round_even in SQL
        keep = sc > 0
        cd, sc = cd[keep], sc[keep]
        if not len(cd):
            continue
        order = np.lexsort((cd, -sc))[:k]
        out_q.extend([qid] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_d.extend(cd[order].tolist())
        out_s.extend(sc[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "rank": pa.array(out_r, pa.int64()),
            "doc_id": pa.array(out_d, type=id_type),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def search_text_index(
    out_dir: str,
    queries: dict[str, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "auto",
    driver_bytes_limit: int = 128 << 20,
) -> pa.Table:
    """Global BM25 top-k per query, served from the persisted layout.
    Same output schema and ranking contract as
    ``search.bm25_search``: (query_id, rank, doc_id, score), score
    rounded half-even to 6 decimals BEFORE ordering, ties broken by
    ascending doc_id. Scores come from the order-independent
    fixed-point chain (module docstring) — ranks match the inline path
    everywhere the two chains' 2^-40-resolution scores round alike
    (pytest-asserted on the test corpora).

    Two physical plans behind one result (the dedup/pagerank
    ``mode="auto"`` size-gate pattern; bit-equal by construction since
    integer sums are order-free, pytest-proven). The gate input is the
    pruned bucket files' total BYTE size — known from the filesystem
    before any read, so deciding costs nothing:

    - **driver** (≤ ``driver_bytes_limit``, default 128 MB of pruned
      parquet): read the matched postings directly with pyarrow and
      score dense on the driver — ZERO Ray executions per serve. A
      serving lookup over a few pruned megabytes must not spin a
      distributed pipeline: the fixed per-execution cost of even one
      Dataset pass is ~20× the lookup itself (measured 1.24 s/batch
      distributed → 0.06 s driver on a 600k-page corpus — 16.5×
      steady-state vs inline bm25_search; tools/stress_r5.py
      textindex600k).
    - **distributed** (above the gate): Dataset read → df pass →
      doc-sort → per-block scoring with boundary fix-up — nothing
      driver-side ever exceeds O(blocks × queries × k); the hot-term
      regime's plan."""
    from ddsketch_ray.functions.search import tokenize_query

    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    with open(os.path.join(out_dir, META_NAME)) as f:
        meta = json.load(f)
    n_docs, sum_dl = int(meta["n_docs"]), int(meta["sum_dl"])

    q_ids = sorted(queries)
    q_terms = {qid: tokenize_query(queries[qid]) for qid in q_ids}
    terms = sorted({t for ts in q_terms.values() for t in ts})

    def empty_result() -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )

    if not terms or not q_ids or n_docs == 0:
        return empty_result()
    files, per_term = _term_bucket_files(out_dir, terms, meta["num_buckets"], meta["seed"])
    if not files:
        return empty_result()

    avgdl = sum_dl / n_docs if sum_dl else 1.0
    kk1, bb = float(k1), float(b)
    n_q = len(q_ids)
    n_t = len(terms)
    term_idx = {t: i for i, t in enumerate(terms)}
    member = np.zeros((n_t, n_q), dtype=np.int64)
    for j, qid in enumerate(q_ids):
        for t in q_terms[qid]:
            member[term_idx[t], j] = 1

    pruned_bytes = sum(os.path.getsize(f) for f in files)
    if mode == "driver" or (mode == "auto" and pruned_bytes <= driver_bytes_limit):
        # ---- driver plan: direct pyarrow read, zero Ray executions;
        # one equality-filtered read per term so row-group statistics
        # prune (terms match disjoint rows — concat is exact) ----
        import pyarrow.dataset as pads

        t_parts = []
        tidx_parts = []
        for term in terms:
            if not per_term[term]:  # term's bucket was never written
                continue
            tp = pads.dataset(per_term[term], format="parquet").to_table(
                columns=["doc_id", "tf", "dl"],
                filter=pc.field("tok") == term,
            )
            if tp.num_rows:
                t_parts.append(tp)
                tidx_parts.append(np.full(tp.num_rows, term_idx[term], dtype=np.int64))
        if not t_parts:
            return empty_result()
        t = pa.concat_tables(t_parts).combine_chunks()
        tidx = np.concatenate(tidx_parts)
        id_type = t.schema.field("doc_id").type
        dfv_i = np.zeros(n_t, dtype=np.int64)
        np.add.at(dfv_i, tidx, 1)
        dfv = dfv_i.astype(np.float64)
        idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        # group rows by doc via Arrow dictionary-encode (C++ hash; a
        # to_pylist + np.unique on millions of object strings was the
        # hot-term serve's whole cost — 8.5 s → 0.5 s per batch on the
        # 600k-page bench corpus with df≈300k url ids per term)
        enc = pc.dictionary_encode(t.column("doc_id").combine_chunks())
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_ids = enc.dictionary  # first-seen order, NOT id-sorted
        # integer rank in ascending-id order (Arrow sort == Python/SQL
        # string order for UTF-8) so per-query tie-breaks lexsort ints
        sort_idx = pc.sort_indices(uniq_ids).to_numpy(zero_copy_only=False)
        id_rank = np.empty(len(uniq_ids), dtype=np.int64)
        id_rank[sort_idx] = np.arange(len(uniq_ids), dtype=np.int64)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        cq = _contrib_quantized(idf[tidx], tf, dl, avgdl, kk1, bb)
        m = np.zeros((len(uniq_ids), n_t), dtype=np.int64)
        np.add.at(m, (inv, tidx), cq)
        scores = m @ member
        out_q: list[str] = []
        out_r: list[int] = []
        out_d: list = []
        out_s: list[float] = []
        for j, qid in enumerate(q_ids):
            sc = np.round(scores[:, j] / _SCALE, 6)
            idx = np.nonzero(sc > 0)[0]
            if not len(idx):
                continue
            order = np.lexsort((id_rank[idx], -sc[idx]))[:k]
            sel = idx[order]
            out_q.extend([qid] * len(sel))
            out_r.extend(range(1, len(sel) + 1))
            out_d.extend(uniq_ids.take(pa.array(sel)).to_pylist())
            out_s.extend(sc[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "rank": pa.array(out_r, pa.int64()),
                "doc_id": pa.array(out_d, type=id_type),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    # ---- distributed plan ----
    import ray
    import ray.data as rd

    pruned = rd.read_parquet(
        files,
        columns=["tok", "doc_id", "tf", "dl"],
        filter=pc.field("tok").isin(terms),
    ).materialize()  # read once; reused by the df pass and the sort

    # ---- df: exact per-term postings row counts, O(blocks×terms) ----
    def df_batch(t: pa.Table) -> pa.Table:
        return (
            t.select(["tok"])
            .group_by("tok", use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["tok", "df"])
        )

    df: dict[str, int] = {t: 0 for t in terms}
    for tb in ray.get(
        pruned.map_batches(df_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    ):
        if tb.num_rows == 0:  # empty input skips the UDF, keeps input schema
            continue
        for tok, d in zip(tb.column("tok").to_pylist(), tb.column("df").to_pylist()):
            if tok in df:
                df[tok] += d

    # ---- broadcast scoring state (identical expressions to inline) ----
    dfv = np.array([df[t] for t in terms], dtype=np.float64)
    idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
    bcast = ray.put(
        {"term_idx": term_idx, "idf": idf, "member": member, "avgdl": float(avgdl)}
    )

    # ---- the only shuffle: matched rows sorted by doc so each doc's
    # cross-bucket rows become one contiguous run ----
    s = pruned.sort("doc_id")

    def block_score(t: pa.Table) -> pa.Table:
        st = ray.get(bcast)
        id_type = t.schema.field("doc_id").type
        empty = pa.table(
            {
                "query_j": pa.array([], pa.int64()),
                "doc_id": pa.array([], type=id_type),
                "part": pa.array([], pa.int64()),
                "boundary": pa.array([], pa.bool_()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids_all = np.asarray(t.column("doc_id").to_pylist(), dtype=object)
        # sorted input → contiguous doc runs; np.unique keeps that order
        uniq, first_idx, inv = np.unique(ids_all, return_index=True, return_inverse=True)
        dl = t.column("dl").to_numpy(zero_copy_only=False)[first_idx].astype(np.float64)
        tidx = np.array(
            [st["term_idx"][tok] for tok in t.column("tok").to_pylist()], dtype=np.int64
        )
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        # ONE quantization per contribution → exact int64 sums from here
        cq = _contrib_quantized(st["idf"][tidx], tf, dl[inv], st["avgdl"], kk1, bb)
        m = np.zeros((len(uniq), n_t), dtype=np.int64)
        np.add.at(m, (inv, tidx), cq)  # duplicate (doc,term) rows impossible, but exact anyway
        scores = m @ st["member"]  # (docs × queries) int64 — order-free
        boundary = np.zeros(len(uniq), dtype=bool)
        boundary[0] = boundary[-1] = True
        out_j: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        interior = ~boundary
        for j in range(n_q):
            col = scores[:, j]
            # interior docs: exact block-local top-k candidates
            nz = np.nonzero(interior & (col > 0))[0]
            if len(nz):
                order = np.lexsort((uniq[nz], -col[nz]))[:k]
                sel = nz[order]
                out_j.append(np.full(len(sel), j, dtype=np.int64))
                out_d.append(uniq[sel])
                out_p.append(col[sel])
                out_b.append(np.zeros(len(sel), dtype=bool))
            # boundary docs: integer partials for the driver fix-up
            bz = np.nonzero(boundary & (col > 0))[0]
            if len(bz):
                out_j.append(np.full(len(bz), j, dtype=np.int64))
                out_d.append(uniq[bz])
                out_p.append(col[bz])
                out_b.append(np.ones(len(bz), dtype=bool))
        if not out_j:
            return empty
        return pa.table(
            {
                "query_j": pa.array(np.concatenate(out_j)),
                "doc_id": pa.array(np.concatenate(out_d).tolist(), type=id_type),
                "part": pa.array(np.concatenate(out_p)),
                "boundary": pa.array(np.concatenate(out_b)),
            }
        )

    cands = [
        tb
        for tb in ray.get(
            s.map_batches(block_score, batch_format="pyarrow", batch_size=None)
            .materialize()
            .to_arrow_refs()
        )
        if tb.num_rows
    ]
    if not cands:
        return empty_result()
    allc = pa.concat_tables(cands).combine_chunks()
    id_type = allc.schema.field("doc_id").type
    qj = allc.column("query_j").to_numpy(zero_copy_only=False)
    dids = np.asarray(allc.column("doc_id").to_pylist(), dtype=object)
    parts = allc.column("part").to_numpy(zero_copy_only=False).astype(np.int64)
    is_b = allc.column("boundary").to_numpy(zero_copy_only=False)

    per_query: dict[str, tuple] = {}
    for j, qid in enumerate(q_ids):
        mj = qj == j
        # re-sum boundary partials exactly (a doc boundary in several
        # blocks contributes one partial per block)
        bd = dids[mj & is_b]
        bp = parts[mj & is_b]
        if len(bd):
            u, binv = np.unique(bd, return_inverse=True)
            tot = np.zeros(len(u), dtype=np.int64)
            np.add.at(tot, binv, bp)
            cd = np.concatenate([dids[mj & ~is_b], u])
            cp = np.concatenate([parts[mj & ~is_b], tot])
        else:
            cd = dids[mj & ~is_b]
            cp = parts[mj & ~is_b]
        per_query[qid] = (cd, cp)
    return _rank_rows(per_query, q_ids, k, id_type)
