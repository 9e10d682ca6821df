"""Distributed keyword search (BM25) over a document Dataset.

The full-text-retrieval counterpart of `functions/ann.py` (vector
search): score every document against a small broadcast query set with
Okapi BM25 and return the global top-k per query — with ZERO all-to-all
shuffle. The plan exploits two facts that hold at any scale:

1. the query term set is tiny (bytes), so corpus statistics restricted
   to it (document frequency per term) are tiny too;
2. each document lives in exactly one Arrow block, so its BM25 score is
   computable entirely block-locally once (N, avgdl, df) are broadcast,
   and a block's own top-k is a superset of its contribution to the
   global top-k (the same candidates-then-driver-merge argument as
   `vocab_stats`' top-k and `grouped_topk`).

The corpus text is tokenized exactly ONCE (the expensive part —
measured ~2.5 s per pass over 600k pages). Streaming plan, no shuffle
anywhere:

    pass A  map_batches -> per-(doc, query-term) tf rows + the doc's
            token length dl, emitted ONLY for docs containing >= 1
            query term; MATERIALIZED as a block-aligned intermediate
            (each doc's rows stay in its source block, so per-block
            top-k remains exact). This is the only tokenization.
    pass B  map_batches over the original corpus -> per-block
            (n_docs, sum_dl) totals via count_matches (no explode,
            much cheaper than tokenization); driver sums O(blocks) rows.
    df      per-term document frequency = per-block row counts of the
            pass-A intermediate (a (doc, term) row appears exactly
            once, and docs never split across blocks); driver sums.
    pass C  broadcast {terms, idf, avgdl, membership}; score each
            pass-A block via the dense (matched_docs x terms) matrix,
            emit its top-k rows per query; driver merges
            O(blocks x queries x k) candidates.

BM25 formula (Robertson/Sparck-Jones idf as used by Lucene, always
positive):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, D) = sum_{t in q} idf(t) * tf * (k1 + 1)
                  / (tf + k1 * (1 - b + b * dl / avgdl))

with tf = occurrences of t in D, dl = |D| in tokens (TOKEN_PATTERN —
the oracle-aligned ASCII-whitespace definition), N = total documents
(empty docs included), avgdl = sum(dl) / N. Duplicate terms inside a
query count once (set semantics).

Ranking is by (round(score, 6) DESC, doc_id ASC) — rounding BEFORE
ordering so the Ray result and the SQL oracle (which must express the
same order with ROUND) can never disagree on rank from a last-bit
float difference.

Reference scope note: gmorleo/DDSketch contains no text or retrieval
operators (SURVEY.md §2.3) — this module is part of the north-rule
training-data-pipeline additions.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ddsketch_ray.functions.text import TOKEN_PATTERN, _text_series

__all__ = ["tokenize_query", "bm25_corpus_stats", "bm25_search"]


def tokenize_query(q: str) -> list[str]:
    """Query tokens under the corpus token definition (unique, in first-
    occurrence order — BM25 set semantics)."""
    toks = pl.Series([q]).str.extract_all(TOKEN_PATTERN).explode()
    out: list[str] = []
    for t in toks.to_list():
        if t is not None and t not in out:
            out.append(t)
    return out


def bm25_corpus_stats(ds, terms: list[str], text_col: str = "text") -> dict:
    """Pass 1: global corpus statistics restricted to ``terms``.

    Returns {"n_docs": int, "sum_dl": int, "df": {term: int}}. One
    map_batches pass; each block emits one totals row plus one row per
    query term PRESENT in the block, so the driver combine handles
    O(blocks x terms) rows — independent of corpus size.
    """
    import ray

    term_list = list(terms)

    def block_stats(t: pa.Table) -> pa.Table:
        s = _text_series(t, text_col)
        dl = s.str.count_matches(TOKEN_PATTERN).cast(pl.Int64)
        toks = (
            pl.DataFrame(
                {
                    "row": pl.arange(0, len(s), dtype=pl.Int64, eager=True),
                    "tok": s.str.extract_all(TOKEN_PATTERN),
                }
            )
            .explode("tok")
            .filter(pl.col("tok").is_in(term_list))
        )
        df_rows = toks.group_by("tok").agg(df=pl.col("row").n_unique().cast(pl.Int64))
        out_terms = df_rows["tok"].to_list()
        out_df = df_rows["df"].to_list()
        return pa.table(
            {
                # null term = the block-totals sentinel row
                "term": pa.array([None] + out_terms, type=pa.string()),
                "df": pa.array([0] + out_df, type=pa.int64()),
                "n_docs": pa.array([t.num_rows] + [0] * len(out_terms), type=pa.int64()),
                "sum_dl": pa.array(
                    [int(dl.sum() or 0)] + [0] * len(out_terms), type=pa.int64()
                ),
            }
        )

    parts = [
        tb
        for tb in ray.get(
            ds.map_batches(
                block_stats, batch_format="pyarrow", batch_size=None
            ).materialize().to_arrow_refs()
        )
        if tb.num_rows
    ]
    n_docs = 0
    sum_dl = 0
    df: dict[str, int] = {t: 0 for t in term_list}
    for tb in parts:
        terms_a = tb.column("term").to_pylist()
        df_a = tb.column("df").to_pylist()
        nd_a = tb.column("n_docs").to_pylist()
        sd_a = tb.column("sum_dl").to_pylist()
        for term, d, nd, sd in zip(terms_a, df_a, nd_a, sd_a):
            if term is None:
                n_docs += nd
                sum_dl += sd
            else:
                df[term] += d
    return {"n_docs": n_docs, "sum_dl": sum_dl, "df": df}


def bm25_search(
    ds,
    queries: dict[str, str],
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Global BM25 top-k per query. ``queries`` maps query_id -> query
    string. Returns an Arrow table (query_id, rank, doc_id, score) with
    score rounded to 6 decimals and rank 1..k per query, ordered by
    (query_id, rank). Documents scoring 0 (no query term) never rank.

    Driver footprint: O(blocks x queries x k) candidate rows from pass
    C plus O(blocks + terms) stats rows — never the corpus.
    """
    import ray

    q_ids = sorted(queries)
    q_terms = {qid: tokenize_query(queries[qid]) for qid in q_ids}
    # canonical term order = sorted, so scoring iterates terms in a
    # layout-independent order on every worker
    terms = sorted({t for ts in q_terms.values() for t in ts})
    if not terms or not q_ids:
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )

    # ---- pass A: tokenize once -> matched (doc, term, tf, dl) rows ----
    def tf_rows_batch(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(doc_id_col).type
        s = _text_series(t, text_col)
        dl = s.str.count_matches(TOKEN_PATTERN).cast(pl.Int64).to_numpy()
        tf_rows = (
            pl.DataFrame(
                {
                    "row": pl.arange(0, len(s), dtype=pl.Int64, eager=True),
                    "tok": s.str.extract_all(TOKEN_PATTERN),
                }
            )
            .explode("tok")
            .filter(pl.col("tok").is_in(terms))
            .group_by(["row", "tok"])
            .agg(tf=pl.len().cast(pl.Int64))
        )
        if not tf_rows.height:
            return pa.table(
                {
                    "doc_id": pa.array([], type=id_type),
                    "tok": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                }
            )
        rows = tf_rows["row"].to_numpy()
        return pa.table(
            {
                "doc_id": t.column(doc_id_col).take(pa.array(rows)),
                "tok": tf_rows["tok"].to_arrow().cast(pa.string()),
                "tf": pa.array(tf_rows["tf"].to_numpy(), pa.int64()),
                "dl": pa.array(np.asarray(dl)[rows].astype(np.int64)),
            }
        )

    tfds = ds.map_batches(
        tf_rows_batch, batch_format="pyarrow", batch_size=None
    ).materialize()

    # ---- pass B: corpus totals (cheap count_matches, no explode) ----
    def totals_batch(t: pa.Table) -> pa.Table:
        s = _text_series(t, text_col)
        dl_sum = int(s.str.count_matches(TOKEN_PATTERN).cast(pl.Int64).sum() or 0)
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "sum_dl": pa.array([dl_sum], pa.int64()),
            }
        )

    n_docs = 0
    sum_dl = 0
    for tb in ray.get(
        ds.map_batches(totals_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    ):
        if tb.num_rows == 0:  # empty input skips the UDF, keeps input schema
            continue
        n_docs += sum(tb.column("n_docs").to_pylist())
        sum_dl += sum(tb.column("sum_dl").to_pylist())
    if n_docs == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )

    # ---- df per term from the pass-A rows (one row per (doc, term)) ----
    def df_batch(t: pa.Table) -> pa.Table:
        return (
            t.select(["tok"])
            .group_by("tok", use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["tok", "df"])
        )

    df: dict[str, int] = {t: 0 for t in terms}
    for tb in ray.get(
        tfds.map_batches(df_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    ):
        if tb.num_rows == 0:
            continue
        for tok, d in zip(tb.column("tok").to_pylist(), tb.column("df").to_pylist()):
            df[tok] += d

    avgdl = sum_dl / n_docs if sum_dl else 1.0
    dfv = np.array([df[t] for t in terms], dtype=np.float64)
    # ln(1 + x) spelled exactly as the SQL oracle computes it (NOT
    # log1p — the intermediate 1+x rounding must match bit-for-bit)
    idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
    term_idx = {t: i for i, t in enumerate(terms)}
    # per-query term-membership matrix (terms x queries)
    member = np.zeros((len(terms), len(q_ids)), dtype=np.float64)
    for j, qid in enumerate(q_ids):
        for t in q_terms[qid]:
            member[term_idx[t], j] = 1.0
    # broadcast once — tiny, but keeps the per-task closure constant-size
    bcast = ray.put(
        {
            "terms": terms,
            "term_idx": term_idx,
            "idf": idf,
            "member": member,
            "avgdl": float(avgdl),
        }
    )
    kk1, bb = float(k1), float(b)
    n_q = len(q_ids)

    def block_topk(t: pa.Table) -> pa.Table:
        st = ray.get(bcast)
        id_type = t.schema.field("doc_id").type
        if t.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "doc_id": pa.array([], type=id_type),
                    "score": pa.array([], pa.float64()),
                }
            )
        # native-typed ids (int64 doc ids, string urls, ...) — object
        # ndarray only for unique/lexsort carriers
        ids_all = np.asarray(t.column("doc_id").to_pylist(), dtype=object)
        uniq, first_idx, inv = np.unique(ids_all, return_index=True, return_inverse=True)
        dl = t.column("dl").to_numpy(zero_copy_only=False)[first_idx].astype(np.float64)
        tidx = np.array([st["term_idx"][tok] for tok in t.column("tok").to_pylist()], dtype=np.int64)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        # dense (matched_docs x terms) tf matrix — terms is the QUERY
        # vocabulary (tiny), not the corpus vocabulary
        tf_m = np.zeros((len(uniq), len(st["terms"])), dtype=np.float64)
        tf_m[inv, tidx] = tf
        denom = tf_m + kk1 * (1.0 - bb + bb * (dl / st["avgdl"]))[:, None]
        contrib = np.where(tf_m > 0, st["idf"] * tf_m * (kk1 + 1.0) / denom, 0.0)
        scores = contrib @ st["member"]  # (matched_docs x queries)
        doc_ids = uniq
        out_q, out_d, out_s = [], [], []
        r6 = np.round(scores, 6)
        for j in range(n_q):
            col = r6[:, j]
            nz = np.nonzero(col > 0)[0]
            if not len(nz):
                continue
            order = np.lexsort((doc_ids[nz], -col[nz]))[:k]
            sel = nz[order]
            out_q.extend([q_ids[j]] * len(sel))
            out_d.append(doc_ids[sel])
            out_s.append(col[sel])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "doc_id": pa.array([], type=id_type),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "doc_id": pa.array(np.concatenate(out_d).tolist(), type=id_type),
                "score": pa.array(np.concatenate(out_s).astype(np.float64), pa.float64()),
            }
        )

    cands = [
        tb
        for tb in ray.get(
            tfds.map_batches(
                block_topk, batch_format="pyarrow", batch_size=None
            ).materialize().to_arrow_refs()
        )
        if tb.num_rows
    ]
    if not cands:
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    allc = pa.concat_tables(cands).combine_chunks()
    id_type = allc.schema.field("doc_id").type
    qs = np.asarray(allc.column("query_id").to_pylist(), dtype=object)
    dids = np.asarray(allc.column("doc_id").to_pylist(), dtype=object)
    scs = allc.column("score").to_numpy(zero_copy_only=False)
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid in q_ids:
        m = np.nonzero(qs == qid)[0]
        if not len(m):
            continue
        order = np.lexsort((dids[m], -scs[m]))[:k]
        sel = m[order]
        out_q.extend([qid] * len(sel))
        out_r.extend(range(1, len(sel) + 1))
        out_d.extend(dids[sel].tolist())
        out_s.extend(scs[sel].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "rank": pa.array(out_r, pa.int64()),
            "doc_id": pa.array(out_d, type=id_type),
            "score": pa.array(out_s, pa.float64()),
        }
    )
