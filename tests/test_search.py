"""BM25 keyword search tests (functions/search.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.search import bm25_corpus_stats, bm25_search, tokenize_query


def _docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def _bm25_reference(texts, ids, queries, k=10, k1=1.2, b=0.75):
    """Brute-force scalar BM25 (independent of the distributed plan)."""
    tok_docs = [t.split() if t else [] for t in texts]
    n = len(texts)
    dls = [len(d) for d in tok_docs]
    avgdl = sum(dls) / n if sum(dls) else 1.0
    out = {}
    for qid in sorted(queries):
        terms = []
        for t in queries[qid].split():
            if t not in terms:
                terms.append(t)
        scored = []
        for did, toks, dl in zip(ids, tok_docs, dls):
            s = 0.0
            for t in terms:
                tf = toks.count(t)
                if tf == 0:
                    continue
                df = sum(1 for d in tok_docs if t in d)
                idf = math.log1p((n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            s = round(s, 6)
            if s > 0:
                scored.append((-s, did))
        scored.sort()
        out[qid] = [(did, -negs) for negs, did in scored[:k]]
    return out


def test_tokenize_query_dedup_and_order():
    assert tokenize_query("hash join hash") == ["hash", "join"]
    assert tokenize_query("  a\tb  a ") == ["a", "b"]
    assert tokenize_query("") == []


def test_bm25_corpus_stats(ray_session):
    import ray.data as rd

    texts = ["hash join hash", "join scan", "", "scan scan scan"]
    ds = rd.from_arrow(_docs_table(texts)).repartition(3)
    st = bm25_corpus_stats(ds, ["hash", "join", "scan", "missing"])
    assert st["n_docs"] == 4
    assert st["sum_dl"] == 8
    assert st["df"] == {"hash": 1, "join": 2, "scan": 2, "missing": 0}


def test_bm25_matches_reference_and_is_layout_invariant(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = ["hash", "join", "scan", "sort", "merge", "row", "batch", "agg"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(60)
    ] + ["", "hash " * 50]
    ids = list(range(len(texts)))
    queries = {"q1": "hash join", "q2": "sort merge scan", "q3": "absentterm"}
    want = _bm25_reference(texts, ids, queries, k=5)

    results = []
    for parts in (1, 4, 13):
        ds = rd.from_arrow(_docs_table(texts, ids)).repartition(parts)
        out = bm25_search(ds, queries, k=5)
        got = {}
        for qid, rank, did, sc in zip(
            out.column("query_id").to_pylist(),
            out.column("rank").to_pylist(),
            out.column("doc_id").to_pylist(),
            out.column("score").to_pylist(),
        ):
            got.setdefault(qid, []).append((did, sc))
        results.append(got)
    # layout invariance: identical output across block layouts
    assert results[0] == results[1] == results[2]
    got = results[0]
    assert "q3" not in got  # no doc contains the term
    for qid in ("q1", "q2"):
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]]
        for (gd, gs), (wd, ws) in zip(got[qid], want[qid]):
            assert gs == pytest.approx(ws, abs=2e-6)


def test_bm25_rank_ties_break_by_doc_id(ray_session):
    import ray.data as rd

    # four identical docs -> identical scores; ranks must follow doc_id
    ds = rd.from_arrow(_docs_table(["x y"] * 4, [7, 3, 11, 5])).repartition(2)
    out = bm25_search(ds, {"q": "x"}, k=3)
    assert out.column("doc_id").to_pylist() == [3, 5, 7]
    assert out.column("rank").to_pylist() == [1, 2, 3]


def test_bm25_string_doc_ids(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(["u/c", "u/a", "u/b"], pa.string()),
            "text": pa.array(["x y", "x y", "z"]),
        }
    )
    out = bm25_search(rd.from_arrow(t).repartition(2), {"q": "x"}, k=5)
    assert out.column("doc_id").to_pylist() == ["u/a", "u/c"]  # tie -> id order
    assert out.schema.field("doc_id").type == pa.string()


def test_bm25_empty_corpus_and_empty_query(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table([], []))
    out = bm25_search(ds, {"q": "x"}, k=3)
    assert out.num_rows == 0
    ds2 = rd.from_arrow(_docs_table(["a b"]))
    out2 = bm25_search(ds2, {}, k=3)
    assert out2.num_rows == 0
    assert out2.schema.names == ["query_id", "rank", "doc_id", "score"]
