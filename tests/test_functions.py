"""Text analysis, dedup, and similarity-search operator tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.dedup import (
    content_hash_batch,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard,
    simhash_dedup,
)
from ddsketch_ray.functions.text import (
    LangId,
    doc_fingerprint_batch,
    fit_lang_profiles,
    quality_features_batch,
    token_count_batch,
)



def _docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def test_token_count_matches_duckdb_definition():
    import duckdb

    texts = ["a b  c", "", "  x ", "one\ttwo\nthree", "solo"]
    t = _docs_table(texts)
    out = token_count_batch(t)
    got = out.column("n_tokens").to_pylist()
    want = [
        duckdb.sql(
            "select len(list_filter(regexp_split_to_array(?, '[ \\t\\n\\r\\f\\v]+'), x -> x <> ''))",
            params=[s],
        ).fetchone()[0]
        for s in texts
    ]
    assert got == want == [3, 0, 1, 3, 1]


def test_quality_features_deterministic():
    t = _docs_table(["Hello, world! 123", "the the the and of", ""])
    out1 = quality_features_batch(t).to_pandas()
    out2 = quality_features_batch(t).to_pandas()
    assert out1.equals(out2)
    assert out1["n_punct"].tolist()[0] == 2  # comma + bang
    assert out1["n_digit"].tolist()[0] == 3
    assert out1["stopword_ratio"].tolist()[1] == 1.0
    assert out1["n_tokens"].tolist() == [3, 5, 0]


def test_doc_fingerprint_properties():
    t = _docs_table(["alpha beta gamma", "alpha beta gamma", "gamma beta alpha", ""])
    fp = doc_fingerprint_batch(t).column("fingerprint").to_pylist()
    assert fp[0] == fp[1]  # identical docs collide
    assert fp[0] != fp[2]  # order-sensitive
    assert fp[3] != fp[0]


def test_lang_id_learns_separable_profiles():
    rng = np.random.default_rng(3)
    vocab = {
        "aa": ["kato", "miru", "sore", "desu"],
        "bb": ["haus", "und", "der", "nicht"],
    }
    texts, langs = [], []
    for lang, words in vocab.items():
        for _ in range(50):
            texts.append(" ".join(rng.choice(words, size=12)))
            langs.append(lang)
    profiles = fit_lang_profiles(texts, langs)
    model = LangId(profiles)
    out = model(_docs_table(texts[:20] + texts[50:70]))
    preds = out.column("lang_pred").to_pylist()
    truth = langs[:20] + langs[50:70]
    acc = np.mean([p == t for p, t in zip(preds, truth)])
    assert acc == 1.0
    assert model(_docs_table([""])).column("lang_pred").to_pylist() == ["und"]


def test_ngram_jaccard():
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    assert ngram_jaccard(a, a) == 1.0
    j = ngram_jaccard(a, b)
    assert 0.0 < j < 0.7
    assert ngram_jaccard("", "") == 1.0


def test_exact_dedup_ray(ray_session):
    import ray.data as rd

    texts = ["dup one", "unique a", "dup one", "unique b", "dup one"]
    ds = rd.from_arrow(_docs_table(texts))
    survivors = sorted(exact_dedup(ds).to_pandas()["doc_id"].tolist())
    assert survivors == [0, 1, 3]


def test_minhash_dedup_ray(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(41)
    words = [f"w{i}" for i in rng.integers(0, 5000, size=200)]
    base = " ".join(words)
    near_words = list(words)
    near_words[100] = "CHANGED"  # ~5 of ~196 shingles differ → J ≈ 0.95
    near = " ".join(near_words)
    far = " ".join(f"z{i}" for i in rng.integers(0, 5000, size=200))
    texts = [base, near, far, base + " extra token"]
    ds = rd.from_arrow(_docs_table(texts))
    out = minhash_dedup(ds, jaccard_threshold=0.5).to_pandas().set_index("doc_id")
    assert out.loc[1, "rep"] == 0  # near-dup clustered with base
    assert out.loc[3, "rep"] == 0
    assert out.loc[2, "rep"] == 2  # far doc survives alone
    assert bool(out.loc[0, "is_survivor"]) and bool(out.loc[2, "is_survivor"])
    assert not bool(out.loc[1, "is_survivor"])


def test_minhash_dedup_poly_token_hash(ray_session):
    """token_hash="poly" (the SQL-oracle mode) must produce the same
    cluster STRUCTURE as the xxhash default on planted near-dups (hash
    values differ, so signatures differ, but J≈0.95 near-dups collide
    and far docs survive under both families)."""
    import ray.data as rd

    rng = np.random.default_rng(41)
    words = [f"w{i}" for i in rng.integers(0, 5000, size=200)]
    base = " ".join(words)
    far = " ".join(f"z{i}" for i in rng.integers(0, 5000, size=200))
    texts = [base, far, base + " extra token", ""]
    ds = rd.from_arrow(_docs_table(texts))
    out = (
        minhash_dedup(ds, jaccard_threshold=0.5, token_hash="poly")
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[2, "rep"] == 0 and not bool(out.loc[2, "is_survivor"])
    assert out.loc[1, "rep"] == 1 and bool(out.loc[1, "is_survivor"])
    assert out.loc[3, "rep"] == 3  # empty doc: polyhash("") shingle, alone
    # poly and xx token hashes must actually differ (independent families)
    from ddsketch_ray.functions.dedup import shingle_hashes

    import polars as pl

    fx, _ = shingle_hashes(pl.Series([base]), token_hash="xx")
    fp, _ = shingle_hashes(pl.Series([base]), token_hash="poly")
    assert not np.array_equal(fx, fp)


def test_simhash_dedup_poly_token_hash(ray_session):
    """token_hash="poly" simhash: exact copies cluster (Hamming 0),
    disjoint-vocab docs survive, empty doc fingerprints to 0 alone."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import simhash_dedup

    rng = np.random.default_rng(7)
    base = " ".join(f"w{i}" for i in rng.integers(0, 5000, size=200))
    far = " ".join(f"z{i}" for i in rng.integers(0, 5000, size=200))
    ds = rd.from_arrow(_docs_table([base, far, base, ""]))
    out = simhash_dedup(ds, token_hash="poly").to_pandas().set_index("doc_id")
    assert out.loc[2, "rep"] == 0 and not bool(out.loc[2, "is_survivor"])
    assert out.loc[1, "rep"] == 1 and out.loc[3, "rep"] == 3


def test_simhash_dedup_ray(ray_session):
    import ray.data as rd

    base = " ".join(f"tok{i}" for i in range(120))
    near = base.replace("tok5 ", "tok5x ", 1)
    far = " ".join(f"other{i}" for i in range(120))
    ds = rd.from_arrow(_docs_table([base, near, far]))
    out = simhash_dedup(ds, max_hamming=6).to_pandas().set_index("doc_id")
    assert out.loc[1, "rep"] == 0
    assert out.loc[2, "rep"] == 2


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.ann import brute_force_topk

    rng = np.random.default_rng(5)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.arange(3, dtype=np.int64), "mat": mat[:3]}
    out = (
        brute_force_topk(ds, queries, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # numpy oracle
    m64 = mat.astype(np.float64)
    m64 /= np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m64[:3] @ m64.T
    for qi in range(3):
        order = np.lexsort((np.arange(n), -sims[qi]))
        want = [i for i in order if i != qi][:5]
        got = out.loc[out["query_id"] == qi, "neighbor_id"].tolist()
        assert got == want, qi


def test_lsh_topk_recall(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.ann import brute_force_topk, lsh_bucketed_topk

    rng = np.random.default_rng(11)
    n, d = 500, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.arange(5, dtype=np.int64), "mat": mat[:5]}
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    approx = lsh_bucketed_topk(ds, queries, k=10, n_planes=4).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact.loc[exact["query_id"] == qi, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == qi, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) > 0.3  # probing a single bucket of 16


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(13)
    base = rng.normal(size=(50, 8))
    dup = base[:5] + rng.normal(scale=0.01, size=(5, 8))  # near-dups of 0..4
    mat = np.vstack([base, dup]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(55), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), 8
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    pairs = embedding_near_dup_pairs(ds, threshold=0.99).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    for i in range(5):
        assert (i, 50 + i) in found


def test_near_dup_recall_vs_brute_force_at_gate_threshold(ray_session):
    """Banded sign-LSH near-dup must recover ≥95% of the exact all-pairs
    result at the gate threshold (VERDICT r1 item 2 done-criterion)."""
    import ray.data as rd
    from ddsketch_ray.functions.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    n, d = 400, 32
    mat = rng.normal(size=(n, d))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # plant correlated pairs across the cosine range above the threshold
    for i in range(0, 60, 2):
        mix = rng.uniform(0.55, 0.95)
        mat[i + 1] = mix * mat[i] + (1 - mix) * mat[i + 1]
        mat[i + 1] /= np.linalg.norm(mat[i + 1])
    sims = mat @ mat.T
    iu = np.triu_indices(n, k=1)
    exact = {
        (int(a), int(b))
        for a, b in zip(iu[0][sims[iu] >= 0.4], iu[1][sims[iu] >= 0.4])
    }
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel().astype(np.float32), type=pa.float32()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    got = embedding_near_dup_pairs(
        ds, threshold=0.4, n_bands=24, planes_per_band=2, max_bucket_pairs=10000
    ).to_pandas()
    found = set(zip(got["a"].astype(int), got["b"].astype(int)))
    assert not (found - exact)  # exact verify → precision 1
    assert len(found & exact) / max(len(exact), 1) >= 0.95


def test_gather_rows_for_ids_is_driver_bounded(ray_session):
    """The dedup verify semi-join must pull only the requested ids."""
    import ray.data as rd
    from ddsketch_ray.functions.dedup import gather_rows_for_ids

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(10_000), type=pa.int64()),
            "payload": pa.array(np.arange(10_000), type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    want = np.array([3, 777, 9_999], dtype=np.int64)
    out = gather_rows_for_ids(ds, want, "doc_id")
    assert sorted(out["doc_id"].tolist()) == want.tolist()
    assert gather_rows_for_ids(ds, np.empty(0, np.int64), "doc_id").empty


def test_minhash_dedup_streams_output(ray_session):
    """Dedup output is a Dataset (the per-doc assignment is emitted
    distributedly from the broadcast rep map, not built on the driver)."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(["a b c d e f g h i j"] * 4 + ["zz yy xx ww vv"]))
    out = minhash_dedup(ds)
    assert isinstance(out, rd.Dataset)
    df = out.to_pandas().set_index("doc_id")
    assert df.loc[0, "is_survivor"] and not df.loc[3, "is_survivor"]
    assert df.loc[4, "is_survivor"]


def _cluster_corpus(n_clusters=12, dups_per=3, n_unique=30, seed=7):
    """Near-dup clusters + unique docs, ids shuffled so cluster members
    land in different blocks after repartition."""
    rng = np.random.default_rng(seed)
    texts = []
    for c in range(n_clusters):
        words = [f"c{c}w{i}" for i in rng.integers(0, 4000, size=150)]
        for d in range(dups_per):
            w = list(words)
            w[10 + d] = f"mut{c}_{d}"  # ~1 of ~146 shingles differs
            texts.append(" ".join(w))
    for u in range(n_unique):
        texts.append(" ".join(f"u{u}x{i}" for i in rng.integers(0, 4000, size=80)))
    ids = rng.permutation(len(texts)).astype(np.int64)
    return _docs_table(texts, ids=ids.tolist())


def test_minhash_dedup_distributed_matches_driver_path(ray_session):
    """The no-O(pairs)-on-driver pipeline (distributed candidates +
    bloom-pruned shuffle-join verify + connected_components + left-join
    emit) must produce the SAME assignment table as minhash_dedup, with
    many small blocks forcing bucket runs to span block edges."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import minhash_dedup_distributed

    tbl = _cluster_corpus()
    ds = rd.from_arrow(tbl).repartition(16)
    want = (
        minhash_dedup(ds, jaccard_threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        minhash_dedup_distributed(ds, jaccard_threshold=0.5, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rep"].tolist() == want["rep"].tolist()
    assert got["is_survivor"].tolist() == want["is_survivor"].tolist()
    # sanity: dedup actually found clusters (not vacuous equality)
    assert (~want["is_survivor"]).sum() >= 12


def test_minhash_dedup_auto_gate_routes_distributed(ray_session):
    """mode='auto' with a band-row count above driver_threshold must take
    the fully distributed plan (checkpointed-job contract) and still
    produce the identical assignment table; mode='driver' pins the old
    plan for comparison."""
    import ray.data as rd

    tbl = _cluster_corpus(n_clusters=8, dups_per=4, n_unique=20, seed=17)
    ds = rd.from_arrow(tbl).repartition(8)
    want = (
        minhash_dedup(ds, jaccard_threshold=0.5, mode="driver")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        minhash_dedup(
            ds, jaccard_threshold=0.5, mode="auto", driver_threshold=1, num_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["rep"].tolist() == want["rep"].tolist()
    assert got["is_survivor"].tolist() == want["is_survivor"].tolist()
    assert (~want["is_survivor"]).sum() >= 8


def test_minhash_dedup_checkpointed_distributed_mode(ray_session, tmp_path):
    """The resumable job routed through the distributed substrate
    (mode='distributed') matches the driver-path assignments — the
    round-4 scale-job wiring."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from ddsketch_ray.functions.dedup import minhash_dedup_checkpointed

    tbl = _cluster_corpus(n_clusters=6, dups_per=3, n_unique=12, seed=29)
    files = []
    n = tbl.num_rows
    per = max(1, n // 4)
    for i in range(0, n, per):
        f = str(tmp_path / f"docs-{i:04d}.parquet")
        pq.write_table(tbl.slice(i, per), f)
        files.append(f)
    out_d, _ = minhash_dedup_checkpointed(
        files, ckpt_dir=str(tmp_path / "ck"), run_id="r1",
        jaccard_threshold=0.5, concurrency=2, mode="distributed", num_buckets=8,
    )
    got = out_d.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        minhash_dedup(rd.read_parquet(files), jaccard_threshold=0.5, mode="driver")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (~want["is_survivor"]).sum() >= 6


def test_lsh_candidate_pairs_distributed_matches_hot_bucket_pairs(ray_session):
    """With no giant buckets both candidate generators implement
    all-pairs-per-bucket — the normalized pair sets must be identical."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import (
        lsh_band_rows,
        lsh_candidate_pairs_distributed,
        minhash_signature_batch,
    )

    tbl = _cluster_corpus(n_clusters=8, dups_per=4, n_unique=20, seed=11)
    ds = rd.from_arrow(tbl).repartition(12)
    sigs = ds.map_batches(
        lambda b: minhash_signature_batch(b).select(["doc_id", "minhash_sig"]),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    band_rows = sigs.map_batches(
        lambda b: lsh_band_rows(b), batch_format="pyarrow", batch_size=None
    ).materialize()
    from ddsketch_ray.functions.dedup import hot_bucket_pairs

    want_df = hot_bucket_pairs(band_rows, "doc_id")
    got_df = lsh_candidate_pairs_distributed(band_rows, id_col="doc_id").to_pandas()

    def norm(df):
        if not len(df):
            return set()
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return set(zip(np.minimum(a, b).tolist(), np.maximum(a, b).tolist()))

    want, got = norm(want_df), norm(got_df)
    assert want, "corpus produced no candidate pairs — test is vacuous"
    assert got == want


def _brute_ngram_jaccard_dedup(tbl, n=3, max_df=8, tau=(7, 10)):
    """Reference semantics in plain Python over n-gram STRINGS: rare-gram
    blocking (2 <= df <= max_df), exact Jaccard with the integer
    threshold rule, union-find with min-id representative."""
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    sets = {}
    for i, txt in zip(ids, texts):
        toks = (txt or "").split()
        sets[i] = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
    df: dict[str, list] = {}
    for i, s in sets.items():
        for g in s:
            df.setdefault(g, []).append(i)
    pairs = set()
    for g, docs in df.items():
        if 2 <= len(docs) <= max_df:
            docs = sorted(docs)
            for x in range(len(docs)):
                for y in range(x + 1, len(docs)):
                    pairs.add((docs[x], docs[y]))
    p, q = tau
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        inter = len(sets[a] & sets[b])
        if q * inter >= p * (len(sets[a]) + len(sets[b]) - inter) and (
            len(sets[a]) + len(sets[b]) > 0
        ):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    import pandas as pd

    rep = {i: find(i) for i in ids}
    out = pd.DataFrame(
        {
            "doc_id": sorted(ids),
            "rep": [rep[i] for i in sorted(ids)],
            "is_survivor": [rep[i] == i for i in sorted(ids)],
        }
    )
    return out.reset_index(drop=True)


def test_shingle_doc_sets_batch_matches_string_sets():
    """Packed per-doc hash sets must be the same SIZE as distinct n-gram
    string sets, sorted, and round-trip through the unpack helper
    (including a sliced column)."""
    from ddsketch_ray.functions.dedup import (
        _unpack_large_binary_u64,
        shingle_doc_sets_batch,
    )

    texts = ["a b c d a b c d", "x y", "", "one two three two one two three"]
    t = _docs_table(texts)
    out = shingle_doc_sets_batch(t, n=3)
    sizes = out.column("sz").to_pylist()
    for txt, sz in zip(texts, sizes):
        toks = txt.split()
        want = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        assert sz == len(want)
    vals, counts = _unpack_large_binary_u64(out.column("shset"))
    assert counts.tolist() == sizes
    off = np.r_[0, np.cumsum(counts)]
    for i in range(len(texts)):
        row = vals[off[i] : off[i + 1]]
        assert len(np.unique(row)) == len(row)  # distinct
        assert np.all(np.sort(row) == row)  # sorted ascending
    sl = out.slice(1, 2)
    v2, c2 = _unpack_large_binary_u64(sl.column("shset"))
    assert c2.tolist() == sizes[1:3]
    assert np.array_equal(v2, vals[off[1] : off[3]])


def test_ngram_jaccard_dedup_distributed_matches_bruteforce(ray_session):
    """The exact Jaccard dedup pipeline must equal the plain-Python
    string-set reference (same blocking, threshold, clustering) on a
    multi-block layout with near-dup clusters."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import ngram_jaccard_dedup_distributed

    tbl = _cluster_corpus(n_clusters=8, dups_per=3, n_unique=20, seed=31)
    want = _brute_ngram_jaccard_dedup(tbl, n=3, max_df=8, tau=(7, 10))
    got = (
        ngram_jaccard_dedup_distributed(
            rd.from_arrow(tbl).repartition(16), n=3, max_df=8, num_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rep"].tolist() == want["rep"].tolist()
    assert got["is_survivor"].tolist() == want["is_survivor"].tolist()
    assert (~want["is_survivor"]).sum() >= 8


def test_ngram_jaccard_dedup_hot_gram_blocking(ray_session):
    """Over-frequent grams (df > max_df) must emit NO pairs — a
    12-copy cluster stays un-deduped while a 3-copy cluster collapses;
    matches the brute-force reference either way. Forces the drop-mode
    boundary/poison path with many tiny blocks."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import ngram_jaccard_dedup_distributed

    rng = np.random.default_rng(5)
    texts = []
    hot = " ".join(f"h{i}" for i in rng.integers(0, 500, size=120))
    for d in range(12):  # 12 near-identical copies: every shared gram df >= 12
        w = hot.split()
        w[30 + d] = f"hm{d}"
        texts.append(" ".join(w))
    cold = " ".join(f"k{i}" for i in rng.integers(0, 500, size=120))
    for d in range(3):
        w = cold.split()
        w[40 + d] = f"km{d}"
        texts.append(" ".join(w))
    for u in range(10):
        texts.append(" ".join(f"u{u}z{i}" for i in rng.integers(0, 4000, size=60)))
    ids = rng.permutation(len(texts)).astype(np.int64).tolist()
    tbl = _docs_table(texts, ids=ids)
    want = _brute_ngram_jaccard_dedup(tbl, n=3, max_df=8, tau=(7, 10))
    got = (
        ngram_jaccard_dedup_distributed(
            rd.from_arrow(tbl).repartition(16), n=3, max_df=8, num_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["rep"].tolist() == want["rep"].tolist()
    assert got["is_survivor"].tolist() == want["is_survivor"].tolist()
    hot_ids = set(ids[:12])
    assert all(want.loc[want.doc_id.isin(hot_ids), "is_survivor"])  # blocked
    assert (~want["is_survivor"]).sum() == 2  # only the cold cluster collapsed


def test_simhash_dedup_distributed_matches_driver_path(ray_session):
    """SimHash flavor of the no-O(pairs)-driver pipeline must equal the
    driver-assisted simhash_dedup across a multi-block layout."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import simhash_dedup_distributed

    tbl = _cluster_corpus(n_clusters=10, dups_per=3, n_unique=25, seed=23)
    ds = rd.from_arrow(tbl).repartition(16)
    want = (
        simhash_dedup(ds, max_hamming=6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        simhash_dedup_distributed(ds, max_hamming=6, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rep"].tolist() == want["rep"].tolist()
    assert got["is_survivor"].tolist() == want["is_survivor"].tolist()
    assert (~want["is_survivor"]).sum() >= 10


def test_minhash_dedup_distributed_no_dups(ray_session):
    """All-unique corpus → every doc survives as its own rep (exercises
    the zero-pair early return)."""
    import ray.data as rd

    from ddsketch_ray.functions.dedup import minhash_dedup_distributed

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"q{u}t{i}" for i in rng.integers(0, 9000, size=60)) for u in range(15)
    ]
    ds = rd.from_arrow(_docs_table(texts)).repartition(4)
    out = minhash_dedup_distributed(ds).to_pandas().set_index("doc_id")
    assert bool(out["is_survivor"].all())
    assert (out["rep"] == out.index).all()


def test_ivf_topk_recall_vs_brute_force(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(17)
    n, d = 600, 24
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.arange(8, dtype=np.int64), "mat": mat[:8]}
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    approx = ivf_topk(ds, queries, k=10, n_centroids=16, n_probe=8).to_pandas()
    recalls = []
    for qi in range(8):
        e = set(exact.loc[exact["query_id"] == qi, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == qi, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # probing half the lists on random data
    # self-probe sanity: each query's own list is its top probe
    assert (approx.groupby("query_id").size() == 10).all()


def test_sorted_group_rollup_matches_groupby(ray_session):
    """Sort-rollup plan must equal a reference groupby (min, count, carry)
    including groups that span sorted block boundaries."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.dedup import sorted_group_rollup

    rng = np.random.default_rng(23)
    n = 20_000
    keys = rng.integers(0, 3_000, size=n).astype(np.int64)  # many spanning groups
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table(
        {
            "k": pa.array(keys),
            "doc_id": pa.array(ids),
            "carry": pa.array((keys * 7).astype(np.int64)),  # constant per key
        }
    )
    ds = rd.from_arrow(tbl).repartition(16)
    got = (
        sorted_group_rollup(ds, "k", "doc_id", carry_cols=("carry",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": keys, "doc_id": ids, "carry": keys * 7})
        .groupby("k", as_index=False)
        .agg(doc_id=("doc_id", "min"), n=("doc_id", "size"), carry=("carry", "first"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].tolist()
    assert got["carry"].tolist() == want["carry"].tolist()


def test_distinct_count_exact(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.dedup import distinct_count

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 500, size=50_000).astype(np.int64)  # heavy spanning
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(16)
    assert distinct_count(ds, "v") == len(np.unique(vals))
    one = rd.from_arrow(pa.table({"v": pa.array(np.zeros(10_000, np.int64))})).repartition(8)
    assert distinct_count(one, "v") == 1


def test_asof_join_broadcast(ray_session):
    """Backward as-of semantics: latest dim row with same key and
    ts <= row ts; rows with no qualifying dim row are dropped."""
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_broadcast

    def ts(h):
        return np.datetime64(f"2025-01-01T{h:02d}:00:00", "us")

    big = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "k": pa.array(["a", "a", "a", "b", "b"]),
            "ts": pa.array([ts(1), ts(5), ts(12), ts(2), ts(3)], type=pa.timestamp("us")),
        }
    )
    dim = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "ts": pa.array([ts(2), ts(10), ts(3)], type=pa.timestamp("us")),
            "v": pa.array([10, 20, 30], type=pa.int64()),
        }
    )
    out = (
        asof_join_broadcast(rd.from_arrow(big).repartition(2), dim, "k", "ts", ["v"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1 (a@1h): no dim <= 1h -> dropped; 2 (a@5h) -> v=10;
    # 3 (a@12h) -> v=20; 4 (b@2h): dropped; 5 (b@3h) -> v=30 (ts equal)
    assert out["event_id"].tolist() == [2, 3, 5]
    assert out["v_ref"].tolist() == [10, 20, 30]


def test_range_join_broadcast(ray_session):
    import pytest
    import ray.data as rd
    from ddsketch_ray.functions.joins import range_join_broadcast

    big = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "v": pa.array([5.0, 10.0, 25.0, 99.0]),
        }
    )
    bands = pa.table(
        {"label": pa.array(["low", "high"]), "lo": pa.array([0.0, 10.0]), "hi": pa.array([10.0, 50.0])}
    )
    out = (
        range_join_broadcast(rd.from_arrow(big).repartition(2), bands, "v")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # [lo, hi): 5->low, 10->high (left-closed), 25->high, 99 drops
    assert out["id"].tolist() == [1, 2, 3]
    assert out["label"].tolist() == ["low", "high", "high"]
    overlapping = pa.table(
        {"label": pa.array(["a", "b"]), "lo": pa.array([0.0, 5.0]), "hi": pa.array([10.0, 20.0])}
    )
    with pytest.raises(ValueError):
        range_join_broadcast(rd.from_arrow(big), overlapping, "v")


def test_asof_join_sorted_matches_duckdb(ray_session):
    """Big-big sorted as-of join vs DuckDB ASOF self-join on a random
    multi-key stream, with many blocks to force carry/spill stitching."""
    import duckdb
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_sorted

    rng = np.random.default_rng(5)
    n = 4000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, size=n).astype(np.int64),
            "ts": base + rng.permutation(n * 60).astype("timedelta64[s]")[:n].astype("timedelta64[us]"),
            "value": rng.normal(size=n),
        }
    )
    left = rd.from_pandas(df[["event_id", "user_id", "ts"]]).repartition(8)
    right = rd.from_pandas(df[["user_id", "ts", "value"]]).repartition(8)
    out = (
        asof_join_sorted(left, right, "user_id", "ts", ["event_id"], ["value"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", df)
    want = con.sql(
        "SELECT e.event_id, d.value FROM ev e ASOF JOIN ev d "
        "ON e.user_id = d.user_id AND e.ts > d.ts ORDER BY e.event_id"
    ).df()
    assert out["event_id"].tolist() == want["event_id"].astype(int).tolist()
    assert np.array_equal(out["value_ref"].to_numpy(), want["value"].to_numpy())


def test_asof_join_sorted_preserves_left_types(ray_session):
    """Review-fix regression: left columns survive with their true Arrow
    types — string columns work and int64 ids above 2^53 round-trip
    exactly (no float64 corruption)."""
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_sorted

    def ts(h):
        return np.datetime64(f"2025-03-01T{h:02d}:00:00", "us")

    big_id = (1 << 62) + 12345  # not representable in float64
    left = pa.table(
        {
            "event_id": pa.array([big_id, big_id + 1], type=pa.int64()),
            "tag": pa.array(["alpha", "beta"]),
            "k": pa.array([1, 1], type=pa.int64()),
            "ts": pa.array([ts(5), ts(9)], type=pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1], type=pa.int64()),
            "ts": pa.array([ts(1), ts(7)], type=pa.timestamp("us")),
            "value": pa.array([1.5, 2.5]),
        }
    )
    out = (
        asof_join_sorted(
            rd.from_arrow(left).repartition(2), rd.from_arrow(right),
            "k", "ts", ["event_id", "tag"], ["value"],
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [big_id, big_id + 1]
    assert out["tag"].tolist() == ["alpha", "beta"]
    assert out["value_ref"].tolist() == [1.5, 2.5]


def test_sorted_group_rollup_dominant_key_skew(ray_session):
    """One key holding 80% of rows spans most sorted blocks — the
    stitching must still produce exact results with tiny driver spill
    (the documented skew posture of the sort plans)."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.dedup import distinct_count, sorted_group_rollup

    rng = np.random.default_rng(41)
    hot = np.zeros(40_000, dtype=np.int64)
    cold = rng.integers(1, 1001, size=10_000).astype(np.int64)
    keys = np.concatenate([hot, cold])
    ids = rng.permutation(len(keys)).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "doc_id": pa.array(ids)})
    ).repartition(16)
    got = sorted_group_rollup(ds, "k", "doc_id").to_pandas().set_index("k")
    want = (
        pd.DataFrame({"k": keys, "doc_id": ids})
        .groupby("k")
        .agg(doc_id=("doc_id", "min"), n=("doc_id", "size"))
    )
    assert int(got.loc[0, "n"]) == 40_000
    assert got["doc_id"].sort_index().tolist() == want["doc_id"].sort_index().tolist()
    assert got["n"].astype(int).sort_index().tolist() == want["n"].sort_index().tolist()
    assert distinct_count(ds, "k") == want.shape[0]


def test_asof_join_sorted_inclusive_semantics(ray_session):
    """strict=False: a right row at the SAME timestamp matches."""
    import duckdb
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_sorted

    rng = np.random.default_rng(3)
    n = 1500
    base = np.datetime64("2024-06-01", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, size=n).astype(np.int64),
            "ts": base + rng.integers(0, 5000, size=n).astype("timedelta64[s]").astype("timedelta64[us]"),
            "value": rng.normal(size=n),
        }
    )
    left = rd.from_pandas(df[["event_id", "user_id", "ts"]]).repartition(6)
    right = rd.from_pandas(df[["user_id", "ts", "value"]]).repartition(6)
    out = (
        asof_join_sorted(left, right, "user_id", "ts", ["event_id"], ["value"], strict=False)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", df)
    want = con.sql(
        "SELECT e.event_id, d.value FROM ev e ASOF JOIN ev d "
        "ON e.user_id = d.user_id AND e.ts >= d.ts ORDER BY e.event_id"
    ).df()
    assert len(out) == n  # every row matches itself at equal ts
    assert out["event_id"].tolist() == want["event_id"].astype(int).tolist()


def test_asof_join_left_variants(ray_session):
    """how='left' keeps unmatched rows with null right columns, for both
    the broadcast and the big-big sorted as-of joins (vs DuckDB ASOF
    LEFT JOIN)."""
    import pandas as pd
    import duckdb
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_broadcast, asof_join_sorted

    rng = np.random.default_rng(9)
    n = 2000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 15, size=n).astype(np.int64),
            "ts": base + rng.permutation(n * 60).astype("timedelta64[s]")[:n].astype("timedelta64[us]"),
            "value": rng.normal(size=n),
        }
    )
    # right side only has users 0..7 -> users 8..14 never match
    rdf = df[df["user_id"] < 8][["user_id", "ts", "value"]]
    con = duckdb.connect()
    con.register("ev", df)
    con.register("dim", rdf)
    want = con.sql(
        "SELECT e.event_id, d.value FROM ev e ASOF LEFT JOIN dim d "
        "ON e.user_id = d.user_id AND e.ts > d.ts ORDER BY e.event_id"
    ).df()

    left = rd.from_pandas(df[["event_id", "user_id", "ts"]]).repartition(7)
    right = rd.from_pandas(rdf).repartition(5)
    out = (
        asof_join_sorted(left, right, "user_id", "ts", ["event_id"], ["value"], how="left")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(out) == n
    assert out["event_id"].tolist() == want["event_id"].astype(int).tolist()
    a, b = out["value_ref"].to_numpy(), want["value"].to_numpy()
    assert np.array_equal(np.isnan(a), np.isnan(b)) and np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])

    # broadcast variant, strict=False equivalent semantics (ts <= left ts
    # inclusive): DuckDB ASOF LEFT JOIN with >= --- matches the kernel
    want2 = con.sql(
        "SELECT e.event_id, d.value FROM ev e ASOF LEFT JOIN dim d "
        "ON e.user_id = d.user_id AND e.ts >= d.ts ORDER BY e.event_id"
    ).df()
    out2 = (
        asof_join_broadcast(
            rd.from_pandas(df[["event_id", "user_id", "ts"]]).repartition(4),
            pa.Table.from_pandas(rdf, preserve_index=False),
            "user_id", "ts", ["value"], how="left",
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(out2) == n
    a2, b2 = out2["value_ref"].to_numpy(), want2["value"].to_numpy()
    assert np.array_equal(np.isnan(a2), np.isnan(b2)) and np.array_equal(a2[~np.isnan(a2)], b2[~np.isnan(b2)])


def test_asof_join_sorted_string_keys(ray_session):
    """Round-3 generalization: string keys (hashed to int64 internally)
    and typed right values (int64 > 2^53 round-trips exactly)."""
    import pandas as pd
    import duckdb
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_sorted

    rng = np.random.default_rng(21)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    keys = np.array(["alpha", "beta", "gamma", "delta"])[rng.integers(0, 4, n)]
    big_ids = (1 << 53) + rng.integers(0, 1 << 52, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "sym": keys,
            "ts": base + rng.permutation(n * 60).astype("timedelta64[s]")[:n].astype("timedelta64[us]"),
            "big_val": big_ids,
        }
    )
    left = rd.from_pandas(df[["event_id", "sym", "ts"]]).repartition(6)
    right = rd.from_pandas(df[["sym", "ts", "big_val"]]).repartition(6)
    out = (
        asof_join_sorted(left, right, "sym", "ts", ["event_id"], ["big_val"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", df)
    want = con.sql(
        "SELECT e.event_id, d.big_val FROM ev e ASOF JOIN ev d "
        "ON e.sym = d.sym AND e.ts > d.ts ORDER BY e.event_id"
    ).df()
    assert out["event_id"].tolist() == want["event_id"].astype(int).tolist()
    # exact int64 equality — the float64 path would corrupt these
    assert out["big_val_ref"].tolist() == want["big_val"].astype(np.int64).tolist()


def test_equi_join_broadcast(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.joins import equi_join_broadcast

    big = pa.table(
        {
            "id": pa.array(np.arange(8, dtype=np.int64)),
            "k": pa.array(["a", "b", "c", "zz", "a", "b", "zz", "c"]),
        }
    )
    dim = pa.table(
        {
            "k": pa.array(["a", "b", "c", "d"]),
            "grp": pa.array(["g1", "g1", "g2", "g3"]),
            "w": pa.array([10, 20, 30, 40], type=pa.int64()),
        }
    )
    inner = (
        equi_join_broadcast(rd.from_arrow(big).repartition(3), dim, "k", ["grp", "w"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert inner["id"].tolist() == [0, 1, 2, 4, 5, 7]
    assert inner["grp"].tolist() == ["g1", "g1", "g2", "g1", "g1", "g2"]
    left = (
        equi_join_broadcast(rd.from_arrow(big).repartition(3), dim, "k", ["w"], how="left")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert len(left) == 8
    assert left.loc[3, "w"] is None or np.isnan(left.loc[3, "w"])
    assert left.loc[0, "w"] == 10

    # duplicate dim keys must be rejected (lookup-join contract)
    dup = pa.table({"k": pa.array(["a", "a"]), "w": pa.array([1, 2], type=pa.int64())})
    with pytest.raises(ValueError):
        equi_join_broadcast(rd.from_arrow(big), dup, "k", ["w"])


def test_equi_join_shuffle_matches_duckdb(ray_session):
    """Big-big many-to-many equi-join vs DuckDB, inner + left."""
    import pandas as pd
    import duckdb
    import ray.data as rd
    from ddsketch_ray.functions.joins import equi_join_shuffle

    rng = np.random.default_rng(17)
    nl, nr = 5000, 3000
    ldf = pd.DataFrame(
        {
            "k": rng.integers(0, 400, nl).astype(np.int64),
            "lid": np.arange(nl, dtype=np.int64),
            "lval": rng.normal(size=nl),
        }
    )
    rdf = pd.DataFrame(
        {
            "k": rng.integers(0, 500, nr).astype(np.int64),  # some keys unmatched
            "rid": (1 << 53) + np.arange(nr, dtype=np.int64),  # >2^53 ids
            "rtag": np.array(["x", "y", "z"])[rng.integers(0, 3, nr)],
        }
    )
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    for how, sql_join in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        out = (
            equi_join_shuffle(
                rd.from_pandas(ldf).repartition(9),
                rd.from_pandas(rdf).repartition(7),
                "k", "k", ["lid", "lval"], ["rid", "rtag"],
                num_buckets=16, how=how,
            )
            .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
        )
        want = con.sql(
            f"SELECT l.k, l.lid, l.lval, r.rid, r.rtag FROM l {sql_join} r USING (k) "
            "ORDER BY lid, rid"
        ).df()
        assert len(out) == len(want), (how, len(out), len(want))
        assert out["lid"].tolist() == want["lid"].astype(int).tolist()
        a, b = out["rid"].to_numpy(dtype=np.float64), want["rid"].to_numpy(dtype=np.float64)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert out.loc[~np.isnan(a), "rid"].astype(np.int64).tolist() == want.loc[~np.isnan(b), "rid"].astype(np.int64).tolist()


def test_range_join_left(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.joins import range_join_broadcast

    big = pa.table(
        {"id": pa.array([1, 2, 3], type=pa.int64()), "v": pa.array([5.0, 99.0, 15.0])}
    )
    bands = pa.table(
        {"label": pa.array(["low", "high"]), "lo": pa.array([0.0, 10.0]), "hi": pa.array([10.0, 50.0])}
    )
    out = (
        range_join_broadcast(rd.from_arrow(big).repartition(2), bands, "v", how="left")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["label"].tolist()[0] == "low"
    assert out["label"].isna().tolist() == [False, True, False]


def test_distinct_count_nan_null(ray_session):
    """NaN/null are dropped (SQL COUNT(DISTINCT) semantics) — NaN used
    to count once per occurrence because NaN != NaN."""
    import ray.data as rd
    from ddsketch_ray.functions.dedup import distinct_count

    v = np.array([1.0, 2.0, np.nan, 2.0, np.nan, np.nan, 3.0])
    ds = rd.from_arrow(pa.table({"v": pa.array(v)})).repartition(3)
    assert distinct_count(ds, "v") == 3
    withnull = pa.table({"v": pa.array([1, None, 2, None, 1], type=pa.int64())})
    assert distinct_count(rd.from_arrow(withnull).repartition(2), "v") == 2


def test_semi_anti_join_broadcast(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.joins import semi_join_broadcast

    big = pa.table(
        {
            "id": pa.array(np.arange(6, dtype=np.int64)),
            "k": pa.array(["a", "b", None, "c", "a", "x"]),
        }
    )
    keys = pa.array(["a", "c", "c", "nope"])  # dupes deduped internally
    semi = (
        semi_join_broadcast(rd.from_arrow(big).repartition(2), keys, "k")
        .to_pandas().sort_values("id")
    )
    assert semi["id"].tolist() == [0, 3, 4]
    anti = (
        semi_join_broadcast(rd.from_arrow(big).repartition(2), keys, "k", anti=True)
        .to_pandas().sort_values("id")
    )
    # null key: not IN -> kept by anti (row 2), dropped by semi
    assert anti["id"].tolist() == [1, 2, 5]


def test_grouped_topk(ray_session):
    """Sort-plan per-group top-k vs a pandas oracle, with groups spanning
    many blocks and duplicate values (tie-break by id)."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.analytics import grouped_topk

    rng = np.random.default_rng(31)
    n = 30_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, n).astype(np.int64),  # groups >> span blocks
            "v": rng.integers(0, 50, n).astype(np.int64),  # many ties
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        grouped_topk(rd.from_pandas(df).repartition(11), "g", "v", 5, "rid")
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "v", "rid"], ascending=[True, False, True], kind="stable")
    exp["rank"] = exp.groupby("g").cumcount() + 1
    exp = exp[exp["rank"] <= 5].sort_values(["g", "rank"]).reset_index(drop=True)
    assert out["g"].tolist() == exp["g"].tolist()
    assert out["v"].tolist() == exp["v"].tolist()
    assert out["rid"].tolist() == exp["rid"].tolist()
    assert out["rank"].tolist() == exp["rank"].tolist()

    # single dominant group (the documented degraded shape) still correct
    one = df.assign(g=np.int64(7))
    o1 = (
        grouped_topk(rd.from_pandas(one).repartition(9), "g", "v", 3, "rid")
        .to_pandas().sort_values("rank")
    )
    e1 = one.sort_values(["v", "rid"], ascending=[False, True]).head(3)
    assert o1["rid"].tolist() == e1["rid"].tolist()


def test_asof_joins_null_keys(ray_session):
    """Review-fix regressions: null join keys match NOTHING (SQL) — they
    must not co-mingle with key 0's timeline — and a left join keeps
    null-key left rows with null rights."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_broadcast, asof_join_sorted

    def us(v):
        return np.datetime64(v, "us")

    # sorted variant: left keys [0, NULL, 5, 0]; rights for keys 0 and 5
    ldf = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "k": pd.array([0, None, 5, 0], dtype="Int64"),
            "ts": [us(10), us(10), us(10), us(2)],
        }
    )
    rdf = pd.DataFrame(
        {
            "k": pd.array([0, 5], dtype="Int64"),
            "ts": [us(1), us(1)],
            "v": [100.0, 500.0],
        }
    )
    left = rd.from_pandas(ldf).repartition(2)
    right = rd.from_pandas(rdf)
    inner = (
        asof_join_sorted(left, right, "k", "ts", ["event_id"], ["v"])
        .to_pandas().sort_values("event_id")
    )
    assert inner["event_id"].tolist() == [0, 2, 3]  # NULL-key row dropped
    assert inner["v_ref"].tolist() == [100.0, 500.0, 100.0]
    lj = (
        asof_join_sorted(left, right, "k", "ts", ["event_id"], ["v"], how="left")
        .to_pandas().sort_values("event_id")
    )
    assert lj["event_id"].tolist() == [0, 1, 2, 3]  # NULL-key row kept...
    assert np.isnan(lj["v_ref"].tolist()[1])  # ...with null right

    # broadcast variant: null DIM key must not shadow key 0's real row
    dim = pa.table(
        {
            "k": pa.array([0, None], type=pa.int64()),
            "ts": pa.array([us(1), us(5)], type=pa.timestamp("us")),
            "v": pa.array([1.0, 99.0]),
        }
    )
    big = pa.table(
        {
            "event_id": pa.array([0], type=pa.int64()),
            "k": pa.array([0], type=pa.int64()),
            "ts": pa.array([us(10)], type=pa.timestamp("us")),
        }
    )
    out = asof_join_broadcast(rd.from_arrow(big), dim, "k", "ts", ["v"]).to_pandas()
    assert out["v_ref"].tolist() == [1.0]  # matched, not dropped


def test_asof_join_sorted_null_valued_right_rows(ray_session):
    """Review-fix regression: a right row whose VALUE columns are all
    null still participates in the as-of match (the carry sentinel must
    not treat it as 'no right rows in block')."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.joins import asof_join_sorted

    base = np.datetime64("2024-01-01", "us")
    n = 400
    # one key; many blocks; values null from ts >= 200 on
    ldf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "k": np.zeros(n, dtype=np.int64),
            "ts": base + (np.arange(n) * 1000).astype("timedelta64[us]"),
        }
    )
    rvals = np.arange(n, dtype=np.float64)
    rdf = pd.DataFrame(
        {
            "k": np.zeros(n, dtype=np.int64),
            "ts": base + (np.arange(n) * 1000).astype("timedelta64[us]"),
            "v": pd.array(np.where(np.arange(n) >= 200, np.nan, rvals)),
        }
    )
    rdf.loc[np.arange(n) >= 200, "v"] = None
    out = (
        asof_join_sorted(
            rd.from_pandas(ldf).repartition(13),
            rd.from_pandas(rdf).repartition(7),
            "k", "ts", ["event_id"], ["v"],
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # strict: event i matches right row i-1; rows >= 201 must match the
    # NULL-valued right rows (not fall back to v=199)
    assert len(out) == n - 1
    got = out["v_ref"].to_numpy()
    assert got[:200].tolist() == rvals[:200].tolist()  # events 1..200 -> v 0..199
    assert np.isnan(got[200:]).all()


def test_equi_join_shuffle_salted(ray_session):
    """salt spreads a hot probe key; output identical to unsalted."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.joins import equi_join_shuffle

    rng = np.random.default_rng(13)
    nl = 4000
    k = np.where(rng.random(nl) < 0.7, 7, rng.integers(0, 50, nl)).astype(np.int64)
    ldf = pd.DataFrame({"k": k, "lid": np.arange(nl, dtype=np.int64)})
    rdf = pd.DataFrame(
        {"k": np.arange(50, dtype=np.int64), "rv": rng.normal(size=50)}
    )
    outs = []
    for salt in (1, 4):
        out = (
            equi_join_shuffle(
                rd.from_pandas(ldf).repartition(5),
                rd.from_pandas(rdf).repartition(2),
                "k", "k", ["lid"], ["rv"], num_buckets=8, how="left", salt=salt,
            )
            .to_pandas().sort_values(["lid"]).reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == nl


def test_chunk_documents_batch():
    from ddsketch_ray.functions.text import chunk_documents_batch

    batch = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g",  # 7 tokens -> 3 chunks of (3,3,3) w/ overlap
                    "",               # empty -> 0 chunks
                    "x  y\tz",        # whitespace runs collapse; 3 tokens -> 1 chunk
                    "one two three four",  # exactly covers 2 chunks (4 tokens)
                ]
            ),
        }
    )
    out = chunk_documents_batch(batch, chunk_tokens=3, overlap=1).to_pandas()
    got = out.set_index(["doc_id", "chunk_id"])["chunk_text"].to_dict()
    assert got == {
        (10, 0): "a b c",
        (10, 1): "c d e",
        (10, 2): "e f g",
        (12, 0): "x y z",
        (13, 0): "one two three",
        (13, 1): "three four",
    }
    assert out.set_index(["doc_id", "chunk_id"])["n_tokens"].to_dict()[(13, 1)] == 2
    # overlap invariant: consecutive chunks share `overlap` tokens
    assert got[(10, 0)].split()[-1:] == got[(10, 1)].split()[:1]

    import pytest
    with pytest.raises(ValueError):
        chunk_documents_batch(batch, chunk_tokens=4, overlap=4)


def test_shingle_hashes_order_sensitive():
    """Round-3 fix: the shingle chain's first combine must not be
    XOR-commutative — token-swapped shingles are different shingles."""
    import polars as pl
    from ddsketch_ray.functions.dedup import shingle_hashes

    a, _ = shingle_hashes(pl.Series(["alpha beta gamma"]), k=3)
    b, _ = shingle_hashes(pl.Series(["beta alpha gamma"]), k=3)
    assert a[0] != b[0]
    # short-doc fallback too
    c, _ = shingle_hashes(pl.Series(["alpha beta"]), k=3)
    d, _ = shingle_hashes(pl.Series(["beta alpha"]), k=3)
    assert c[0] != d[0]


def test_repetition_ratio_batch():
    from ddsketch_ray.functions.text import repetition_ratio_batch

    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["a b a b a", "x y", "p q r p q r p q r", ""]),
        }
    )
    out = repetition_ratio_batch(b).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_ngrams"] == 3 and out.loc[1, "n_distinct"] == 2
    assert out.loc[2, "n_ngrams"] == 0 and out.loc[2, "dup_ratio"] == 0.0
    assert out.loc[3, "n_ngrams"] == 7 and out.loc[3, "n_distinct"] == 3
    assert abs(out.loc[3, "dup_ratio"] - round(1 - 3 / 7, 6)) < 1e-12
    assert out.loc[4, "n_ngrams"] == 0


def test_small_key_rollup(ray_session):
    """Two-level partial rollup vs a pandas oracle: multi-key groups,
    null keys forming their own group (SQL GROUP BY), min/max/sum/count,
    and the schema-less-empty pathology raising cleanly."""
    import pandas as pd
    import pytest
    import ray.data as rd
    from ddsketch_ray.functions.analytics import small_key_rollup

    rng = np.random.default_rng(47)
    n = 20_000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 4, n).astype(np.int64),
            "b": pd.array(
                [None if x == 0 else f"s{x}" for x in rng.integers(0, 3, n)],
                dtype="string",
            ),
            "v": rng.integers(-1000, 1000, n).astype(np.int64),
        }
    )
    out = small_key_rollup(
        rd.from_pandas(df).repartition(13),
        ["a", "b"],
        sums=[("s", "v")],
        count_alias="n",
        mins=[("mn", "v")],
        maxs=[("mx", "v")],
    ).to_pandas()
    exp = (
        df.groupby(["a", "b"], dropna=False)["v"]
        .agg(s="sum", n="count", mn="min", mx="max")
        .reset_index()
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    got = out.sort_values(["a", "b"], na_position="last").reset_index(drop=True)
    assert got["s"].tolist() == exp["s"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["mn"].tolist() == exp["mn"].tolist()
    assert got["mx"].tolist() == exp["mx"].tolist()
    assert got["a"].tolist() == exp["a"].tolist()
    assert got["b"].fillna("␀").tolist() == exp["b"].fillna("␀").tolist()

    # typed-but-empty input: empty result with the right columns
    e = small_key_rollup(
        rd.from_arrow(pa.table({"a": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})),
        ["a"],
        sums=[("s", "v")],
        count_alias="n",
    )
    assert e.num_rows == 0 and e.column_names == ["a", "s", "n"]

    # schema-less empty (Ray filter pathology) raises the documented error
    gone = rd.from_pandas(df.head(5)).filter(lambda r: False).materialize()
    if gone.schema() is None:
        with pytest.raises(ValueError, match="no schema"):
            small_key_rollup(gone, ["a"], sums=[("s", "v")])


def test_hash_split_and_sample(ray_session):
    """Deterministic split/sample: layout-invariant, disjoint+complete
    split, exact membership function reproducible outside Ray."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.sampling import (
        assign_split_batch,
        hash_sample,
        hash_split,
        sample_mask_batch,
    )
    from ddsketch_ray.hashing import hash_ints

    n = 5_000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    w = [("train", 90), ("val", 5), ("test", 5)]
    a = hash_split(rd.from_pandas(df).repartition(7), "doc_id", w).to_pandas()
    b = hash_split(rd.from_pandas(df).repartition(1), "doc_id", w).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a["split"].tolist() == b["split"].tolist()  # layout-invariant
    # external recompute: bucket = hash % 100
    bucket = (hash_ints(df["doc_id"].to_numpy(), 0) % np.uint64(100)).astype(int)
    exp = np.where(bucket < 90, "train", np.where(bucket < 95, "val", "test"))
    assert a["split"].tolist() == exp.tolist()
    counts = a["split"].value_counts()
    assert 0.85 < counts["train"] / n < 0.95  # ≈ the weights

    # sample: subset semantics + rate, same membership at any layout
    s = hash_sample(rd.from_pandas(df).repartition(9), "doc_id", 250_000).to_pandas()
    mask = sample_mask_batch(pa.table({"doc_id": df["doc_id"]}), "doc_id", 250_000)
    assert sorted(s["doc_id"].tolist()) == df["doc_id"][mask].tolist()
    assert 0.2 < len(s) / n < 0.3

    # string ids work; different seeds decorrelate
    sdf = pd.DataFrame({"u": [f"url-{i}" for i in range(1000)]})
    t1 = assign_split_batch(pa.Table.from_pandas(sdf), "u", w, seed=1)["split"]
    t2 = assign_split_batch(pa.Table.from_pandas(sdf), "u", w, seed=2)["split"]
    assert t1.to_pylist() != t2.to_pylist()

    # null ids refuse (membership would be undefined)
    bad = pa.table({"doc_id": pa.array([1, None], pa.int64())})
    with pytest.raises(ValueError, match="non-null"):
        assign_split_batch(bad, "doc_id", w)


def test_rolling_by_key(ray_session):
    """Sort-plan rolling window vs DuckDB window functions: groups
    spanning many blocks, duplicate (key, ts) broken by id, W=1 LAG
    across block edges, string keys."""
    import duckdb
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.windows import rolling_by_key

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 50, n).astype(np.int64),  # long runs
            "ts": rng.integers(0, 200, n).astype(np.int64),  # many (k,ts) dups
            "v_c": rng.integers(-500, 500, n).astype(np.int64),
        }
    )
    for W, key in ((1, "user_id"), (4, "user_id"), (3, "ukey")):
        d = df if key == "user_id" else df.assign(ukey=df.user_id.map("u{:02d}".format))
        out = (
            rolling_by_key(
                rd.from_pandas(d).repartition(11), key, "ts", "event_id", "v_c",
                window_rows=W, roll_alias="rs", count_alias="nw", lag_alias="lg",
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            f"""SELECT event_id, CAST(SUM(v_c) OVER w AS BIGINT) AS rs,
                 CAST(COUNT(*) OVER w AS BIGINT) AS nw,
                 LAG(v_c) OVER (PARTITION BY {key} ORDER BY ts, event_id) AS lg
               FROM d WINDOW w AS (PARTITION BY {key} ORDER BY ts, event_id
                 ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)
               ORDER BY event_id"""
        ).df()
        assert len(out) == n
        assert out["rs"].to_numpy().tolist() == want["rs"].to_numpy().tolist()
        assert out["nw"].to_numpy().tolist() == want["nw"].to_numpy().tolist()
        assert np.array_equal(
            out["lg"].astype("float64").to_numpy(),
            want["lg"].astype("float64").to_numpy(),
            equal_nan=True,
        )

    # guards: null keys and non-integer values refuse
    with pytest.raises(Exception, match="null keys"):
        rolling_by_key(
            rd.from_arrow(
                pa.table(
                    {
                        "k": pa.array([1, None], pa.int64()),
                        "ts": pa.array([1, 2], pa.int64()),
                        "i": pa.array([1, 2], pa.int64()),
                        "v": pa.array([1, 2], pa.int64()),
                    }
                )
            ),
            "k", "ts", "i", "v",
        ).to_pandas()


def test_redact_batch():
    """Regex redaction kernel vs DuckDB's RE2 regexp_replace nesting —
    the two engines must agree byte-for-byte on rule order, greediness,
    and unicode text; counts are per-stage-input sums."""
    import duckdb
    from ddsketch_ray.functions.text import REDACT_RULES, redact_batch

    texts = [
        "mail a.b+c@ex.org and x@y.io, card 4111 1111 1111 1111.",
        "go to https://ex.com/p?q=1#f now",
        "plain words only",
        "",
        "naïve café 42 — ünïcode 7",
        "dots 1.2.3.4.5.6.7.8 mixed-55-66-77-88-9",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = redact_batch(t)
    expr = "text"
    cnt = "0"
    for pat, repl in REDACT_RULES:
        cnt = f"{cnt} + len(regexp_extract_all({expr}, '{pat}'))"
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = duckdb.sql(
        f"SELECT {expr} AS r, ({cnt})::BIGINT AS c FROM t ORDER BY doc_id"
    ).df()
    assert out.column("redacted").to_pylist() == want["r"].tolist()
    assert out.column("n_redactions").to_pylist() == want["c"].tolist()
    # sanity: rules actually fired
    assert "<EMAIL>" in out.column("redacted")[0].as_py()
    assert "<URL>" in out.column("redacted")[1].as_py()
    assert sum(out.column("n_redactions").to_pylist()) >= 6
    # null text treated as empty (library-wide _text_series convention)
    tn = pa.table({"text": pa.array([None, "a 12 b"], pa.string())})
    on = redact_batch(tn)
    assert on.column("redacted").to_pylist() == ["", "a <D> b"]


def test_sorted_sum_rollup_and_vocab(ray_session):
    """High-cardinality sort-plan sum rollup vs pandas, with key groups
    spanning blocks, then the vocab pipeline (pre-agg partials sum
    exactly) — including a downstream sort over the stitched union (the
    mixed-block-type regression)."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.analytics import sorted_sum_rollup
    from ddsketch_ray.functions.text import vocab_stats

    rng = np.random.default_rng(23)
    n = 30_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 500, n).astype(np.int64),
            "a": rng.integers(0, 100, n).astype(np.int64),
            "b": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    out = (
        sorted_sum_rollup(rd.from_pandas(df).repartition(13), "k", ["a", "b"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k", as_index=False)[["a", "b"]].sum().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == exp["k"].tolist()
    assert out["a"].tolist() == exp["a"].tolist()
    assert out["b"].tolist() == exp["b"].tolist()

    # vocab over a small corpus vs a hand count; downstream sort works
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "a b b c",
                "b c c\td",
                "a  a a",
                "",
                "d",
                "c a",
            ],
        }
    )
    v = (
        vocab_stats(rd.from_pandas(docs).repartition(4), top_k=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    # counts: a=5(3 docs), b=3(2), c=4(3), d=2(2) → top3 by occ desc, tok asc
    assert v["tok"].tolist() == ["a", "c", "b"]
    assert v["n_occ"].tolist() == [5, 4, 3]
    assert v["n_docs"].tolist() == [3, 3, 2]


def test_decontaminate(ray_session):
    """Broadcast exact-Jaccard decontamination vs a brute-force oracle:
    multi-eval matches, shared grams across eval docs, short docs
    (empty sets) never flagged, threshold edge exact."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.dedup import decontaminate, ngram_jaccard

    ev_texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "shared words here across evals alpha beta gamma",
    ]
    tr_texts = [
        "alpha beta gamma delta epsilon zeta eta theta",      # exact dup of ev0
        "alpha beta gamma delta epsilon zeta eta thetaX",     # near dup of ev0
        "one two three four five different tail here now",    # partial of ev1
        "completely unrelated text with other words inside",  # no match
        "tiny doc",                                           # < n tokens: never flagged
    ]
    ev = pa.table({"doc_id": pa.array(range(100, 103), pa.int64()),
                   "text": pa.array(ev_texts)})
    tr = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                   "text": pa.array(tr_texts)})
    out = (
        decontaminate(rd.from_arrow(tr).repartition(3), ev, n=3, tau_num=1, tau_den=2)
        .to_pandas().sort_values(["doc_id", "eval_id"]).reset_index(drop=True)
    )
    # brute-force expectation from the scalar kernel
    exp = []
    for ti, tt in enumerate(tr_texts):
        for ei, et in enumerate(ev_texts):
            if len(tt.split()) < 3 or len(et.split()) < 3:
                continue
            j = ngram_jaccard(tt, et, k=3)
            if j >= 0.5:
                exp.append((ti, 100 + ei))
    assert list(zip(out["doc_id"], out["eval_id"])) == sorted(exp)
    # exact dup pair: inter == union
    row0 = out[out["doc_id"] == 0].iloc[0]
    assert row0["inter"] == row0["union"]
    assert 4 not in out["doc_id"].tolist()  # short doc never flagged


def test_profile_numeric_columns(ray_session):
    """One-pass column profiler vs pandas, including an all-null column
    and null-count accounting."""
    import pandas as pd
    import ray.data as rd
    from ddsketch_ray.functions.analytics import profile_numeric_columns

    df = pd.DataFrame(
        {
            "a": [1.5, None, 3.0, -2.0, None],
            "b": pd.array([10, 20, 20, None, 30], dtype="Int64"),
            "c": pd.array([None] * 5, dtype="Int64"),
        }
    )
    out = (
        profile_numeric_columns(
            rd.from_pandas(df).repartition(3), ["a", "b", "c"], distinct_cols=["b"]
        )
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["a", "n_rows"] == 5 and out.loc["a", "n_nulls"] == 2
    assert out.loc["a", "min"] == -2.0 and out.loc["a", "max"] == 3.0
    assert out.loc["b", "n_nulls"] == 1 and out.loc["b", "n_distinct"] == 3
    assert out.loc["c", "n_nulls"] == 5
    assert np.isnan(out.loc["c", "min"]) and np.isnan(out.loc["c", "max"])


def test_integer_corr_exact_and_layout_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import integer_corr, integer_moments

    rng = np.random.default_rng(17)
    x = rng.integers(100, 10_000_000, 5000)
    y = (x // 100 + rng.integers(-50, 50, 5000)).astype(np.int64)
    t = pa.table({"x": pa.array(x.astype(np.int64)), "y": pa.array(y)})

    outs = []
    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(integer_corr(ds, "x", "y"))
    assert outs[0] == outs[1]  # bit-identical across layouts (exact ints)
    got = outs[0]
    # numpy reference on the same exact formula
    n = 5000
    num = float(n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
    dx = float(n * int((x * x).sum()) - int(x.sum()) ** 2)
    dy = float(n * int((y * y).sum()) - int(y.sum()) ** 2)
    assert got["corr"] == num / (np.sqrt(dx) * np.sqrt(dy))
    assert got["corr"] > 0.99  # strongly correlated by construction
    assert got["n"] == n

    # null rows dropped from BOTH columns; constant column -> NaN corr
    t2 = pa.table(
        {"x": pa.array([1, None, 3, 4], pa.int64()), "y": pa.array([7, 8, None, 7], pa.int64())}
    )
    m = integer_moments(rd.from_arrow(t2), "x", "y")
    assert m["n"] == 2 and m["sx"] == 5 and m["sy"] == 14
    c = integer_corr(rd.from_arrow(t2), "x", "y")
    assert np.isnan(c["corr"])  # y constant on valid rows


def test_funnel_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.windows import funnel_counts

    stages = ["view", "click", "purchase"]
    rng = np.random.default_rng(23)
    n = 4000
    users = rng.integers(0, 300, n)
    ts = rng.integers(0, 100_000, n)
    types = rng.choice(stages + ["noise"], n, p=[0.4, 0.25, 0.1, 0.25])
    t = pa.table(
        {
            "user_id": pa.array(users.astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64)),
            "event_type": pa.array(types.tolist(), pa.string()),
        }
    )

    # brute-force reference: first-touch strictly-after chain per user
    import collections

    byuser = collections.defaultdict(list)
    for u, s, e in zip(users, ts, types):
        if e != "noise":
            byuser[u].append((int(s), e))
    want = np.zeros(3, dtype=np.int64)
    for rows in byuser.values():
        t_prev = -(1 << 62)
        for i, st in enumerate(stages):
            cand = [s for s, e in rows if e == st and s > t_prev]
            if not cand:
                break
            t_prev = min(cand)
            want[i] += 1

    for parts in (1, 7, 19):
        ds = rd.from_arrow(t).repartition(parts)
        out = funnel_counts(ds, "user_id", "ts", "event_type", stages)
        assert out.column("n_keys").to_pylist() == want.tolist(), parts
        assert out.column("stage").to_pylist() == stages
    # monotone funnel
    nk = want.tolist()
    assert nk[0] >= nk[1] >= nk[2]


def test_funnel_strictly_after_and_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.windows import funnel_counts

    # same-ts click does NOT qualify (strict >); reversed order doesn't count
    t = pa.table(
        {
            "u": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array([10, 10, 10, 20, 20, 10], pa.int64()),
            "e": pa.array(["view", "click", "view", "click", "view", "click"]),
        }
    )
    out = funnel_counts(rd.from_arrow(t).repartition(3), "u", "ts", "e", ["view", "click"])
    # u1: click at same ts -> no; u2: click after -> yes; u3: click BEFORE view -> no
    assert out.column("n_keys").to_pylist() == [3, 1]


def test_grouped_quantile_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import grouped_quantile_exact

    rng = np.random.default_rng(29)
    n = 6000
    keys = rng.integers(0, 500, n)
    vals = rng.normal(0, 100, n)
    # null values dropped per key; null keys dropped entirely
    t = pa.table(
        {
            "k": pa.array(keys.astype(np.int64)).cast(pa.int64()),
            "v": pa.array(vals),
        }
    )

    def ref(q):
        import collections

        by = collections.defaultdict(list)
        for k, v in zip(keys, vals):
            by[int(k)].append(v)
        return {
            k: sorted(vs)[int(np.floor(q * (len(vs) - 1)))] for k, vs in by.items()
        }

    for q in (0.0, 0.5, 0.9, 1.0):
        want = ref(q)
        for parts in (1, 11):
            ds = rd.from_arrow(t).repartition(parts)
            out = grouped_quantile_exact(ds, "k", "v", q).to_pandas()
            got = dict(zip(out["k"], out["q_value"]))
            assert len(got) == len(want), (q, parts)
            assert got == want, (q, parts)


def test_grouped_quantile_exact_nulls_and_single_key(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import grouped_quantile_exact

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, None, 2], pa.int64()),
            "v": pa.array([5.0, None, 1.0, 9.0, 7.0]),
        }
    )
    out = grouped_quantile_exact(rd.from_arrow(t).repartition(2), "k", "v", 0.5).to_pandas()
    got = dict(zip(out["k"], out["q_value"]))
    assert got == {1: 1.0, 2: 7.0}  # median of [1,5] = index floor(0.5*1)=0 -> 1.0


def test_train_bpe_hand_checked_and_layout_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.text import train_bpe

    # corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3  (the
    # classic Sennrich example family)
    texts = ["low " * 5, "lower " * 2, "newest " * 6, "widest " * 3]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})

    outs = []
    for parts in (1, 4):
        out = train_bpe(rd.from_arrow(t).repartition(parts), num_merges=4)
        outs.append(out)
    assert outs[0]["merges"] == outs[1]["merges"]
    m = outs[0]["merges"]
    # most frequent pair: ('e','s') and ('s','t') and ('t','</w>') all
    # appear 9x (newest+widest); tie-break picks lexicographically
    # smallest: ('e','s'); then ('es','t') 9x ... verify the chain
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t")
    assert m[2] == ("est", "</w>")
    assert outs[0]["n_words"] == 4
    assert outs[0]["truncated_words"] == 0


def test_train_bpe_word_vocab_cap_logged(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.text import train_bpe

    t = pa.table(
        {
            "doc_id": pa.array(range(1), pa.int64()),
            "text": pa.array(["aa bb cc dd ee aa aa bb"]),
        }
    )
    out = train_bpe(rd.from_arrow(t), num_merges=2, max_word_vocab=2)
    assert out["truncated_words"] == 3  # 5 distinct words, kept 2
    # kept: aa (3x), bb (2x); ('a','</w>') and ('a','a') tie at 3 and
    # '<' sorts before 'a' -> lexicographic tie-break picks ('a','</w>')
    assert out["merges"][0] == ("a", "</w>")


def test_bpe_encode(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.text import BPEEncode, train_bpe

    # hand-checked: merge ('a','b') turns "abab" into [ab, ab, </w>] = 3
    enc = BPEEncode([("a", "b")])
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(["abab", "ba"])})
    out = enc(t)
    assert out.column("n_bpe_tokens").to_pylist() == [3, 3]  # ba -> b,a,</w>

    # zero merges: every word costs len(word)+1 symbols
    enc0 = BPEEncode([])
    t2 = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["ab cde"])})
    assert enc0(t2).column("n_bpe_tokens").to_pylist() == [3 + 4]

    # end-to-end through the actor pool: train on the corpus, encode it;
    # more merges can only shrink (or keep) the token count
    texts = ["low low low", "newest widest newest", "", "low newest"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(2)
    fit = train_bpe(ds, num_merges=6)
    out = (
        ds.map_batches(
            BPEEncode,
            fn_constructor_args=(fit["merges"],),
            concurrency=2,
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    base = (
        ds.map_batches(
            BPEEncode, fn_constructor_args=([],), concurrency=2,
            batch_format="pyarrow", batch_size=None,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["n_bpe_tokens"].to_numpy() <= base["n_bpe_tokens"].to_numpy()).all()
    assert out["n_bpe_tokens"].to_numpy()[2] == 0  # empty doc


def test_ivf_persisted_layout_matches_inline(ray_session, tmp_path):
    """write_ivf + read_ivf_probe (the persisted layout) must produce
    the IDENTICAL top-k table as inline ivf_topk with the same params;
    probed reads must open only probed list directories; full probing
    equals brute force (the gate-query oracle contract)."""
    import os

    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.ann import (
        brute_force_topk,
        ivf_topk,
        read_ivf_probe,
        write_ivf,
    )

    rng = np.random.default_rng(19)
    n, d = 500, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.arange(6, dtype=np.int64), "mat": mat[:6]}

    out_dir = str(tmp_path / "ivf")
    write_ivf(ds, out_dir, n_centroids=16, sample_size=256)
    assert os.path.exists(os.path.join(out_dir, "_ivf_centroids.npy"))

    def norm(df):
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    inline = norm(ivf_topk(ds, queries, k=7, n_centroids=16, n_probe=4,
                           sample_size=256).to_pandas())
    persisted = norm(read_ivf_probe(out_dir, queries, k=7, n_probe=4).to_pandas())
    pd.testing.assert_frame_equal(persisted, inline)

    # full probing == brute force (every vector scored, no mask)
    bf = norm(brute_force_topk(ds, queries, k=7).to_pandas())
    full = norm(read_ivf_probe(out_dir, queries, k=7, n_probe=16).to_pandas())
    pd.testing.assert_frame_equal(full, bf)


def test_ivf_append_ingest(ray_session, tmp_path):
    """append_to_ivf (incremental ingest, r4 verdict item 3): new
    vectors assigned to the EXISTING centroids and appended as parquet
    parts; full probing over the grown layout equals brute force over
    the union corpus; appended vectors land in the same list an initial
    write would choose; probe-pruned serving equals the inline kernel
    with the base-trained centroids; an empty append is a no-op."""
    import glob
    import os

    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.ann import (
        _ivf_query,
        _normalize,
        append_to_ivf,
        brute_force_topk,
        read_ivf_probe,
        write_ivf,
    )

    rng = np.random.default_rng(23)
    n, d, n_base = 500, 16, 350
    mat = rng.normal(size=(n, d)).astype(np.float32)

    def make_ds(lo, hi):
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(lo, hi), type=pa.int64()),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat[lo:hi].ravel(), type=pa.float32()), d
                    ),
                }
            )
        ).repartition(4)

    base, extra, union = make_ds(0, n_base), make_ds(n_base, n), make_ds(0, n)
    queries = {"ids": np.arange(6, dtype=np.int64), "mat": mat[:6]}

    out_dir = str(tmp_path / "ivf_append")
    centroids = write_ivf(base, out_dir, n_centroids=16, sample_size=256)
    files_before = set(glob.glob(f"{out_dir}/list=*/*.parquet"))
    assert append_to_ivf(extra, out_dir) == n - n_base
    files_after = set(glob.glob(f"{out_dir}/list=*/*.parquet"))
    assert files_before < files_after  # parts appended, none rewritten

    def norm(df):
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    # full probing over base ∪ appended == brute force over the union
    bf = norm(brute_force_topk(union, queries, k=7).to_pandas())
    full = norm(read_ivf_probe(out_dir, queries, k=7, n_probe=16).to_pandas())
    pd.testing.assert_frame_equal(full, bf)

    # probe-pruned serving == the inline kernel with the SAME
    # (base-trained) centroids over the union corpus
    pruned = norm(read_ivf_probe(out_dir, queries, k=7, n_probe=4).to_pandas())
    inline = norm(
        _ivf_query(union, queries, centroids, "vec_id", "embedding", 7, 4, True)
        .to_pandas()
    )
    pd.testing.assert_frame_equal(pruned, inline)

    # appended vectors sit in the list of their nearest base centroid
    emb = _normalize(mat[n_base:].astype(np.float64))
    want = np.argmax(emb @ centroids.T, axis=1)
    got = np.full(n - n_base, -1, dtype=np.int64)
    import pyarrow.parquet as pq

    for ld in glob.glob(f"{out_dir}/list=*"):
        c = int(os.path.basename(ld).split("=")[1])
        ids = pq.read_table(ld, columns=["vec_id"]).column("vec_id").to_numpy()
        sel = ids >= n_base
        got[ids[sel] - n_base] = c
    assert np.array_equal(got, want)

    # empty append: no-op
    assert append_to_ivf(make_ds(0, 0), out_dir) == 0
    assert set(glob.glob(f"{out_dir}/list=*/*.parquet")) == files_after


def test_embedding_near_dup_assignments_modes_match(ray_session):
    """Dedup flavor #5 completed to assignments: planted near-dup
    clusters, driver vs distributed plan equality, and rep = min id of
    the exact-cosine component (checked vs a python union-find over
    embedding_near_dup_pairs)."""
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.ann import embedding_near_dup, embedding_near_dup_pairs
    from ddsketch_ray.functions.dedup import cluster_pairs

    rng = np.random.default_rng(31)
    n_clusters, per, d = 12, 4, 16
    rows = []
    for c in range(n_clusters):
        base = rng.normal(size=d)
        for j in range(per):
            rows.append(base + rng.normal(scale=0.02, size=d))  # cos ~ 1
    for _ in range(40):
        rows.append(rng.normal(size=d))  # background
    mat = np.array(rows)
    ids = rng.permutation(len(rows)).astype(np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float64()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)

    kw = dict(threshold=0.95, n_bands=16, planes_per_band=3, max_bucket_pairs=256)
    driver = (
        embedding_near_dup(ds, mode="driver", **kw)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    dist = (
        embedding_near_dup(ds, mode="distributed", num_buckets=8, **kw)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, driver)
    assert (~driver["is_survivor"]).sum() >= n_clusters * (per - 1) - 2

    # rep labels == union-find over the verified pair set
    pairs = embedding_near_dup_pairs(ds, **kw).to_pandas()
    pair_ids = np.unique(np.concatenate([pairs["a"], pairs["b"]])) if len(pairs) else np.empty(0, np.int64)
    rep = cluster_pairs(pairs, pair_ids)
    want = driver.set_index("vec_id")["rep"].to_dict()
    for i in ids.tolist():
        assert want[i] == rep.get(i, i)


def test_semantic_dedup_cluster_blocked(ray_session):
    """SemDeDup-style dedup (functions/ann.py::semantic_dedup): kmeans
    clusters are the blocking structure, exact cosine verifies inside
    them; plans bit-equal; rep = min id of each verified component."""
    import ray.data as rd

    from ddsketch_ray.functions.ann import semantic_dedup

    rng = np.random.default_rng(9)
    d, per = 16, 40
    rows = []
    vid = 0
    dup_groups = []
    for axis in range(4):  # DIRECTIONAL clusters (one-hot + noise)
        base = np.zeros(d)
        base[axis] = 1.0
        for j in range(per):
            v = base * 10.0 + rng.normal(0, 0.45, d)
            rows.append((vid, v))
            vid += 1
        # plant one near-dup pair per cluster: copy of the last vector
        src = rows[-1]
        dup = (vid, src[1] + rng.normal(0, 1e-3, d))
        rows.append(dup)
        dup_groups.append((src[0], vid))
        vid += 1
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "embedding": pa.array([r[1].tolist() for r in rows],
                                  type=pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    kw = dict(threshold=0.995, n_clusters=4, sample_size=4096, iters=5, seed=0)
    out = semantic_dedup(ds, plan="pairs", mode="driver", **kw).to_pandas().sort_values("vec_id")
    out_d = semantic_dedup(ds, plan="pairs", mode="distributed", **kw).to_pandas().sort_values("vec_id")
    out_m = semantic_dedup(ds, plan="matrix", **kw).to_pandas().sort_values("vec_id")
    # all three physical plans identical
    assert out.reset_index(drop=True).equals(out_d.reset_index(drop=True))
    assert out.reset_index(drop=True).equals(out_m.reset_index(drop=True))
    by_id = out.set_index("vec_id")
    for keep_id, dup_id in dup_groups:
        assert by_id.loc[dup_id, "rep"] == keep_id  # keep-first by min id
        assert not by_id.loc[dup_id, "is_survivor"]
        assert by_id.loc[keep_id, "is_survivor"]
    # everything not planted survives as its own rep
    planted = {i for _, i in dup_groups}
    others = by_id.drop(index=list(planted))
    assert (others["rep"] == others.index).all() and others["is_survivor"].all()
