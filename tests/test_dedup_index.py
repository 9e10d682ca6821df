"""write_minhash_index / dedup_against_index: incremental-ingest dedup."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ddsketch_ray.functions.dedup_index import dedup_against_index, write_minhash_index


def _corpus(n=400, seed=2):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(3000)])
    texts = [" ".join(rng.choice(vocab, size=50)) for _ in range(n)]
    return list(range(n)), texts


def test_index_lookup_matches_and_rejects(ray_session, tmp_path):
    ids, texts = _corpus()
    corpus = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
        )
    ).repartition(5)
    idx_dir = str(tmp_path / "mhidx")
    write_minhash_index(corpus, idx_dir, num_buckets=16)

    # new batch: 10 near-copies (one word changed) of known corpus docs,
    # 5 exact copies, 10 fresh docs over a DISJOINT vocabulary
    rng = np.random.default_rng(7)
    new_ids, new_texts, expect = [], [], {}
    nid = 10_000
    for src in range(0, 100, 10):  # near-copies
        toks = texts[src].split()
        toks[7] = "MUTATED"
        new_ids.append(nid)
        new_texts.append(" ".join(toks))
        expect[nid] = src
        nid += 1
    for src in range(200, 205):  # exact copies
        new_ids.append(nid)
        new_texts.append(texts[src])
        expect[nid] = src
        nid += 1
    fresh_vocab = np.array([f"zz{i}" for i in range(500)])
    for _ in range(10):  # fresh
        new_ids.append(nid)
        new_texts.append(" ".join(rng.choice(fresh_vocab, size=40)))
        expect[nid] = None
        nid += 1

    new_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(new_ids, type=pa.int64()),
                "text": pa.array(new_texts),
            }
        )
    ).repartition(3)
    out = (
        dedup_against_index(new_ds, idx_dir)
        .to_pandas()
        .set_index("new_id")
        .sort_index()
    )
    assert len(out) == len(new_ids)
    for nid_, want in expect.items():
        got = out.loc[nid_, "match_id"]
        if want is None:
            assert got is None or (isinstance(got, float) and np.isnan(got)), (nid_, got)
        else:
            assert int(got) == want, (nid_, got, want)
    # exact copies agree on every signature position
    exact_rows = out.loc[[10_010, 10_011, 10_012, 10_013, 10_014]]
    assert (exact_rows.agreement == 1.0).all()


def test_index_lookup_empty_batch(ray_session, tmp_path):
    ids, texts = _corpus(n=50)
    corpus = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})
    )
    idx_dir = str(tmp_path / "mhidx2")
    write_minhash_index(corpus, idx_dir, num_buckets=8)
    new_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
    )
    out = dedup_against_index(new_ds, idx_dir).to_pandas()
    assert len(out) == 0
