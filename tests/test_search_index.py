"""Persisted inverted-index BM25 serving (functions/search_index.py).

Contracts proven here:
- index search ranks/scores match the inline ``bm25_search`` plan
  (ranking identical; rounded scores equal on the test corpora — the
  fixed-point chain resolves at 2^-40, six decimal rounds coincide),
- build-on-half + append ≡ build-on-union, bit-equal,
- serving reads ONLY the query terms' buckets (non-matching bucket
  dirs deleted → identical answer),
- string doc ids, absent terms, empty corpus / empty query edges.
"""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ddsketch_ray.functions.search import bm25_search, tokenize_query
from ddsketch_ray.functions.search_index import (
    _term_bucket,
    append_to_text_index,
    search_text_index,
    write_text_index,
)

QUERIES = {
    "q1": "hash join",
    "q2": "customer order value",
    "q3": "vector scan",
    "q4": "nosuchterm",
}


def _corpus(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [
        "hash", "join", "vector", "scan", "customer", "order", "value",
        "alpha", "beta", "gamma", "delta", "zeta",
    ]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 40))) for _ in range(n)]
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(docs)}
    )


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_corpus()).repartition(16)


@pytest.fixture(scope="module")
def index_dir(corpus_ds, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tix") / "idx")
    meta = write_text_index(corpus_ds, out, num_buckets=16)
    assert meta["n_docs"] == 2000 and meta["sum_dl"] > 0
    return out


def test_index_matches_inline(corpus_ds, index_dir):
    inline = bm25_search(corpus_ds, QUERIES, k=10).to_pandas()
    idx = search_text_index(index_dir, QUERIES, k=10).to_pandas()
    assert inline[["query_id", "rank", "doc_id"]].equals(
        idx[["query_id", "rank", "doc_id"]]
    )
    # the two plans quantize differently (float sum vs 2^-40 fixed
    # point); on real corpora the 6-decimal rounds coincide
    np.testing.assert_array_equal(
        inline["score"].to_numpy(), idx["score"].to_numpy()
    )
    # q4 has no matching term anywhere
    assert not (idx["query_id"] == "q4").any()


def test_append_equals_full_build(ray_session, index_dir, tmp_path):
    import ray.data as rd

    tbl = _corpus()
    full = search_text_index(index_dir, QUERIES, k=10).to_pandas()
    even = rd.from_arrow(
        tbl.filter(pc.equal(pc.bit_wise_and(tbl.column("doc_id"), 1), 0))
    ).repartition(8)
    odd = rd.from_arrow(
        tbl.filter(pc.equal(pc.bit_wise_and(tbl.column("doc_id"), 1), 1))
    ).repartition(8)
    out = str(tmp_path / "idx_half")
    write_text_index(even, out, num_buckets=16)
    assert append_to_text_index(odd, out) == 1000
    assert search_text_index(out, QUERIES, k=10).to_pandas().equals(full)


def test_serving_reads_only_query_buckets(corpus_ds, tmp_path):
    import glob

    out = str(tmp_path / "idx_prune")
    write_text_index(corpus_ds, out, num_buckets=16)
    want = search_text_index(out, QUERIES, k=10).to_pandas()
    terms = sorted({t for q in QUERIES.values() for t in tokenize_query(q)})
    need = set(_term_bucket(pa.array(terms, pa.string()), 16, 0).tolist())
    removed = 0
    for d in glob.glob(out + "/bucket=*"):
        if int(d.rsplit("=", 1)[1]) not in need:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0  # the corpus vocabulary spans more buckets
    assert search_text_index(out, QUERIES, k=10).to_pandas().equals(want)


def test_string_doc_ids(ray_session, index_dir, tmp_path):
    import ray.data as rd

    tbl = _corpus()
    sds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"u{i:05d}" for i in range(tbl.num_rows)]),
                "text": tbl.column("text"),
            }
        )
    ).repartition(16)
    out = str(tmp_path / "idx_str")
    write_text_index(sds, out, num_buckets=16)
    got = search_text_index(out, QUERIES, k=10).to_pandas()
    want = search_text_index(index_dir, QUERIES, k=10).to_pandas()
    # same corpus, bijective id relabel that preserves order → same ranks
    assert (got["doc_id"] == want["doc_id"].map(lambda i: f"u{i:05d}")).all()
    np.testing.assert_array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_edge_cases(ray_session, index_dir, tmp_path):
    import ray.data as rd

    # empty query set / queries with no indexed term
    assert search_text_index(index_dir, {}, k=5).num_rows == 0
    assert search_text_index(index_dir, {"q": "zzz qqq"}, k=5).num_rows == 0
    # empty corpus builds a servable (empty) index
    out = str(tmp_path / "idx_empty")
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    meta = write_text_index(empty, out, num_buckets=4)
    assert meta["n_docs"] == 0
    assert search_text_index(out, QUERIES, k=5).num_rows == 0
    # k larger than matches: every matching doc ranked, none twice
    big = search_text_index(index_dir, {"q1": "hash"}, k=10_000).to_pandas()
    assert big["doc_id"].is_unique and (big["rank"].to_numpy() == np.arange(1, len(big) + 1)).all()


def test_driver_and_distributed_plans_bit_equal(index_dir):
    """mode='auto' gates to the driver plan; force both plans and
    assert bit-equality (integer sums are order-free, so the two
    physical plans compute literally the same numbers)."""
    a = search_text_index(index_dir, QUERIES, k=10, mode="driver").to_pandas()
    b = search_text_index(index_dir, QUERIES, k=10, mode="distributed").to_pandas()
    assert a.equals(b)
    c = search_text_index(index_dir, QUERIES, k=10, mode="auto").to_pandas()
    assert c.equals(a)
    with pytest.raises(ValueError):
        search_text_index(index_dir, QUERIES, mode="bogus")
