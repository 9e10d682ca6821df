"""Published-bound + mergeability tests for HLL, CMS, Bloom, t-digest, KLL,
MinHash, SimHash (SURVEY.md §7 step 3)."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from ddsketch_ray.hashing import clz64, hash_ints, hash_strings, splitmix64
from ddsketch_ray.sketches import (
    BloomFilter,
    CountMin,
    HeavyHitters,
    HyperLogLog,
    KLL,
    MinHashSketch,
    TDigest,
    hamming64,
    minhash_signatures,
    popcount64,
    simhash64,
)
from tests.oracle import REFERENCE_QS, exact_quantile


# ------------------------------------------------------------------ hashing


def test_splitmix64_deterministic_and_mixed():
    x = np.arange(1000, dtype=np.uint64)
    h1, h2 = splitmix64(x), splitmix64(x)
    assert np.array_equal(h1, h2)
    assert len(np.unique(h1)) == 1000
    # bits look balanced
    assert abs(popcount64(h1).mean() - 32) < 1.0


def test_hash_strings_deterministic_across_calls():
    strs = [f"doc-{i}" for i in range(5000)]
    a, b = hash_strings(strs, seed=7), hash_strings(strs, seed=7)
    assert np.array_equal(a, b)
    c = hash_strings(strs, seed=8)
    assert not np.array_equal(a, c)
    assert len(np.unique(a)) == 5000


def test_clz64_exact():
    assert clz64(np.array([0], dtype=np.uint64))[0] == 64
    assert clz64(np.array([1], dtype=np.uint64))[0] == 63
    assert clz64(np.array([1 << 63], dtype=np.uint64))[0] == 0
    vals = np.array([5, 255, 1 << 20, (1 << 64) - 1], dtype=np.uint64)
    expect = [64 - int(v).bit_length() for v in vals.tolist()]
    assert clz64(vals).tolist() == expect


# ---------------------------------------------------------------------- HLL


def test_hll_accuracy_and_merge():
    true_n = 200_000
    hashes = splitmix64(np.arange(true_n, dtype=np.uint64))
    hll = HyperLogLog(p=14)
    hll.add_hashed(hashes)
    est = hll.estimate()
    assert abs(est - true_n) / true_n < 3 * hll.relative_error
    # sharded + merged == monolithic (registers are max-merged)
    parts = [HyperLogLog(p=14) for _ in range(8)]
    for i, chunk in enumerate(np.array_split(hashes, 8)):
        parts[i].add_hashed(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert np.array_equal(merged.registers, hll.registers)
    # duplicates don't change the estimate
    hll2 = HyperLogLog(p=14)
    hll2.add_hashed(np.concatenate([hashes, hashes]))
    assert np.array_equal(hll2.registers, hll.registers)


def test_hll_small_range_linear_counting():
    hll = HyperLogLog(p=14)
    hll.add_hashed(splitmix64(np.arange(100, dtype=np.uint64)))
    assert abs(hll.estimate() - 100) <= 2


def test_hll_roundtrip():
    hll = HyperLogLog(p=12)
    hll.add_hashed(splitmix64(np.arange(5000, dtype=np.uint64)))
    back = HyperLogLog.from_row(hll.to_row())
    assert back.estimate() == hll.estimate()


# ---------------------------------------------------------------------- CMS


def test_countmin_never_undercounts_and_bound():
    rng = np.random.default_rng(5)
    # zipf-ish frequencies over 1000 keys
    keys = rng.zipf(1.3, 100_000) % 1000
    hashes = hash_ints(keys)
    cms = CountMin.from_error(epsilon=0.005, delta=0.01)
    cms.add_hashed(hashes)
    uniq = np.unique(keys)
    true_counts = np.array([(keys == k).sum() for k in uniq.tolist()])
    ests = cms.estimate_hashed(hash_ints(uniq))
    assert (ests >= true_counts).all(), "CMS must never undercount"
    over = ests - true_counts
    eps_n = cms.epsilon * cms.n
    assert (over <= eps_n).mean() > 0.98  # ε·N bound w.p. ≥ 1−δ


def test_countmin_merge_equals_monolithic():
    h = splitmix64(np.arange(50_000, dtype=np.uint64) % 500)
    mono = CountMin(width=1024, depth=4)
    mono.add_hashed(h)
    parts = [CountMin(width=1024, depth=4) for _ in range(4)]
    for p, chunk in zip(parts, np.array_split(h, 4)):
        p.add_hashed(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert np.array_equal(merged.table, mono.table)
    assert merged.n == mono.n


def test_heavy_hitters_skewed():
    # lang-style skew: en dominates
    langs = ["en"] * 6200 + ["zh"] * 1000 + ["es"] * 700 + ["de"] * 500 + ["xx"] * 100
    rng = np.random.default_rng(2)
    arr = np.array(langs)
    rng.shuffle(arr)
    shards = np.array_split(arr, 5)
    parts = []
    for s in shards:
        hh = HeavyHitters(width=2048, depth=5, capacity=64)
        hh.add_keyed(s.tolist(), hash_strings(s))
        parts.append(hh)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    top = merged.top_k(3)
    assert [t[0] for t in top] == ["en", "zh", "es"]
    assert top[0][1] >= 6200  # no undercount
    hh_10pct = merged.heavy_hitters(phi=0.1)
    assert {k for k, _ in hh_10pct} == {"en", "zh"}


# -------------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives_and_fp_rate():
    n = 20_000
    present = splitmix64(np.arange(n, dtype=np.uint64))
    absent = splitmix64(np.arange(n, 2 * n, dtype=np.uint64))
    bf = BloomFilter.from_capacity(n, fp_rate=0.01)
    bf.add_hashed(present)
    assert bf.contains_hashed(present).all(), "no false negatives, ever"
    fp = bf.contains_hashed(absent).mean()
    assert fp < 0.03  # ~3x slack over nominal 1%


def test_bloom_merge_is_union():
    a, b = BloomFilter(m=4096, k=5), BloomFilter(m=4096, k=5)
    ha = splitmix64(np.arange(100, dtype=np.uint64))
    hb = splitmix64(np.arange(100, 200, dtype=np.uint64))
    a.add_hashed(ha)
    b.add_hashed(hb)
    a.merge(b)
    assert a.contains_hashed(np.concatenate([ha, hb])).all()
    back = BloomFilter.from_row(a.to_row())
    assert np.array_equal(back.words, a.words)


# ------------------------------------------------------------------ TDigest


def test_tdigest_quantiles(dist_values):
    name, vals = dist_values
    td = TDigest(delta=200)
    for chunk in np.array_split(vals, 10):
        td.add_array(chunk)
    n = vals.size
    srt = np.sort(vals)
    for q in REFERENCE_QS:
        est = td.quantile(q)
        # rank-space bound: estimated value's rank within ~1.5% of q
        rank = np.searchsorted(srt, est) / n
        assert abs(rank - q) < 0.015, (name, q, est, rank)
    assert td.quantile(0.0) == vals.min()
    assert td.quantile(1.0) == vals.max()


def test_tdigest_merge(dist_values):
    name, vals = dist_values
    parts = []
    for chunk in np.array_split(vals, 8):
        td = TDigest(delta=200)
        td.add_array(chunk)
        parts.append(td)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == vals.size
    srt = np.sort(vals)
    for q in (0.5, 0.95, 0.99):
        rank = np.searchsorted(srt, merged.quantile(q)) / vals.size
        assert abs(rank - q) < 0.02, (name, q)
    back = TDigest.from_row(merged.to_row())
    assert np.allclose(back.quantiles(REFERENCE_QS), merged.quantiles(REFERENCE_QS))
    assert len(merged.means) < 3 * merged.delta  # compression actually bounds state


# ---------------------------------------------------------------------- KLL


def test_kll_rank_error(dist_values):
    name, vals = dist_values
    kll = KLL(k=200)
    for chunk in np.array_split(vals, 20):
        kll.add_array(chunk)
    assert kll.n == vals.size
    srt = np.sort(vals)
    for q in REFERENCE_QS:
        est = kll.quantile(q)
        rank = np.searchsorted(srt, est) / vals.size
        assert abs(rank - q) < 0.03, (name, q, est, rank)
    # bounded state
    total_items = sum(a.size for a in kll.levels)
    assert total_items < 3000


def test_kll_merge(dist_values):
    name, vals = dist_values
    parts = []
    for chunk in np.array_split(vals, 8):
        kl = KLL(k=200)
        kl.add_array(chunk)
        parts.append(kl)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == vals.size
    srt = np.sort(vals)
    for q in (0.5, 0.95, 0.99):
        rank = np.searchsorted(srt, merged.quantile(q)) / vals.size
        assert abs(rank - q) < 0.04, (name, q)
    back = KLL.from_row(merged.to_row())
    assert np.allclose(back.quantiles(REFERENCE_QS), merged.quantiles(REFERENCE_QS))


# ------------------------------------------------------------------ MinHash


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(17)
    a = splitmix64(np.arange(0, 10_000, dtype=np.uint64))
    b = splitmix64(np.arange(5_000, 15_000, dtype=np.uint64))  # true J = 1/3
    sa, sb = MinHashSketch(num_perm=256), MinHashSketch(num_perm=256)
    sa.add_hashed(a)
    sb.add_hashed(b)
    assert abs(sa.jaccard(sb) - 1 / 3) < 0.08
    # merge = union of sets
    su = MinHashSketch(num_perm=256)
    su.add_hashed(np.union1d(a, b))
    sa.merge(sb)
    assert np.array_equal(sa.sig, su.sig)


def test_minhash_signatures_batch_matches_single():
    rng = np.random.default_rng(23)
    docs = [splitmix64(rng.integers(0, 1 << 63, size=s).astype(np.uint64)) for s in (5, 50, 0, 17)]
    flat = np.concatenate([d for d in docs]) if docs else np.empty(0, np.uint64)
    offs = np.cumsum([0] + [d.size for d in docs[:-1]])
    sigs = minhash_signatures(flat, np.asarray(offs), num_perm=64, seed=3)
    for i, d in enumerate(docs):
        sk = MinHashSketch(num_perm=64, seed=3)
        sk.add_hashed(d)
        assert np.array_equal(sigs[i], sk.sig), f"doc {i}"


# ------------------------------------------------------------------ SimHash


def test_simhash_similar_docs_close():
    rng = np.random.default_rng(31)
    base = splitmix64(rng.integers(0, 1 << 63, size=500).astype(np.uint64))
    # doc2 = doc1 with 5% token churn
    churn = base.copy()
    churn[:25] = splitmix64(rng.integers(0, 1 << 63, size=25).astype(np.uint64))
    other = splitmix64(rng.integers(0, 1 << 63, size=500).astype(np.uint64))
    flat = np.concatenate([base, churn, other])
    offs = np.array([0, 500, 1000])
    fp = simhash64(flat, offs)
    d_near = hamming64(fp[0:1], fp[1:2])[0]
    d_far = hamming64(fp[0:1], fp[2:3])[0]
    assert d_near < 12
    assert d_far > 20


def test_all_sketches_pickle():
    for sk in (
        HyperLogLog(p=10),
        CountMin(width=256, depth=3),
        BloomFilter(m=1024, k=3),
        TDigest(),
        KLL(),
        MinHashSketch(num_perm=16),
        HeavyHitters(width=256, depth=3, capacity=8),
    ):
        blob = pickle.dumps(sk)
        assert pickle.loads(blob) is not None


def test_minhash_simhash_trailing_empty_docs():
    """Regression: trailing zero-token docs must not corrupt the previous
    doc's reduceat segment (offset-clamping bug)."""
    rng = np.random.default_rng(51)
    d0 = splitmix64(rng.integers(0, 1 << 63, size=7).astype(np.uint64))
    flat = d0
    offs = np.array([0, 7, 7])  # docs: d0, empty, empty
    sigs = minhash_signatures(flat, offs, num_perm=32, seed=1)
    solo = minhash_signatures(d0, np.array([0]), num_perm=32, seed=1)
    assert np.array_equal(sigs[0], solo[0]), "trailing empties corrupted doc0"
    assert (sigs[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    fp = simhash64(flat, offs)
    fp_solo = simhash64(d0, np.array([0]))
    assert fp[0] == fp_solo[0]
    assert fp[1] == 0 and fp[2] == 0


class TestKMV:
    def test_bottom_k_and_exact_below_saturation(self):
        from ddsketch_ray.hashing import hash_ints
        from ddsketch_ray.sketches import KMV

        vals = np.arange(40, dtype=np.int64)
        sk = KMV(k=64)
        sk.add_hashed(hash_ints(vals), vals)
        assert sk.size == 40 and sk.estimate_distinct() == 40.0
        # duplicates don't grow the sketch
        sk.add_hashed(hash_ints(vals), vals)
        assert sk.size == 40

    def test_estimate_accuracy(self):
        from ddsketch_ray.hashing import hash_ints
        from ddsketch_ray.sketches import KMV

        n, k = 200_000, 1024
        vals = np.arange(n, dtype=np.int64)
        sk = KMV(k=k)
        for chunk in np.array_split(vals, 10):
            sk.add_hashed(hash_ints(chunk), chunk)
        est = sk.estimate_distinct()
        assert abs(est - n) / n < 5 / np.sqrt(k)  # ~1/sqrt(k) rel error

    def test_merge_order_independent(self):
        from ddsketch_ray.hashing import hash_ints
        from ddsketch_ray.sketches import KMV

        rng = np.random.default_rng(2)
        vals = rng.integers(0, 1 << 40, size=30_000)
        parts = np.array_split(vals, 7)

        def build(order):
            sk = KMV(k=128)
            for i in order:
                p = parts[i]
                other = KMV(k=128)
                other.add_hashed(hash_ints(p), p)
                sk.merge(other)
            return sk

        a = build(range(7))
        b = build(reversed(range(7)))
        assert np.array_equal(a.hashes, b.hashes)
        assert [int(x) for x in a.sample()] == [int(x) for x in b.sample()]
        assert a.estimate_distinct() == b.estimate_distinct()

    def test_sample_matches_global_bottom_k(self):
        from ddsketch_ray.hashing import hash_ints
        from ddsketch_ray.sketches import KMV

        vals = np.arange(5000, dtype=np.int64)
        h = hash_ints(vals)
        want = vals[np.argsort(h)][:64]
        sk = KMV(k=64)
        for chunk in np.array_split(vals, 13):
            sk.add_hashed(hash_ints(chunk), chunk)
        assert [int(x) for x in sk.sample()] == want.tolist()


class TestOPHSignatures:
    def test_jaccard_estimate_accuracy(self):
        from ddsketch_ray.sketches.minhash import minhash_signatures_oph

        rng = np.random.default_rng(12)
        union = rng.integers(0, 1 << 62, size=3000).astype(np.uint64)
        for true_j in (0.2, 0.5, 0.8):
            n_shared = int(3000 * true_j / (2 - true_j) / (1 - true_j / (2 - true_j)))
            shared = union[:n_shared]
            only_a = union[n_shared : n_shared + (3000 - n_shared) // 2]
            only_b = union[n_shared + (3000 - n_shared) // 2 : 3000]
            a = np.concatenate([shared, only_a])
            b = np.concatenate([shared, only_b])
            jac = len(shared) / (len(a) + len(b) - len(shared))
            flat = np.concatenate([a, b])
            offs = np.array([0, len(a)], dtype=np.int64)
            sig = minhash_signatures_oph(flat, offs, num_perm=256)
            est = float((sig[0] == sig[1]).mean())
            assert abs(est - jac) < 0.12  # ~4/sqrt(256)

    def test_identical_and_empty_docs(self):
        from ddsketch_ray.sketches.minhash import minhash_signatures_oph

        h = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
        flat = np.concatenate([h, h])
        offs = np.array([0, 100], dtype=np.int64)
        sig = minhash_signatures_oph(flat, offs, num_perm=64)
        assert (sig[0] == sig[1]).all()
        empty = minhash_signatures_oph(np.empty(0, np.uint64), np.array([0], np.int64), 64)
        assert (empty == np.uint64(0xFFFFFFFFFFFFFFFF)).all()

    def test_densification_fills_empty_bins(self):
        from ddsketch_ray.sketches.minhash import minhash_signatures_oph

        # 3 shingles << 128 bins: most bins empty, all must densify
        flat = np.array([7, 99, 12345], dtype=np.uint64)
        offs = np.array([0], dtype=np.int64)
        sig = minhash_signatures_oph(flat, offs, num_perm=128)
        assert (sig != np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        # deterministic
        sig2 = minhash_signatures_oph(flat, offs, num_perm=128)
        assert (sig == sig2).all()

    def test_power_of_two_required(self):
        import pytest

        from ddsketch_ray.sketches.minhash import minhash_signatures_oph

        with pytest.raises(ValueError):
            minhash_signatures_oph(np.empty(0, np.uint64), np.empty(0, np.int64), 100)


# ------------------------------------------------------- WeightedReservoir


def test_wrs_merge_equals_monolithic():
    from ddsketch_ray.sketches.wrs import WeightedReservoir

    rng = np.random.default_rng(3)
    ids = rng.permutation(5000).astype(np.int64)
    ws = rng.gamma(2, 2, 5000)
    mono = WeightedReservoir(k=50, seed=1)
    mono.accumulate(ids, ws)

    parts = [WeightedReservoir(k=50, seed=1) for _ in range(7)]
    for i, p in enumerate(parts):
        sl = slice(i * 720, min((i + 1) * 720, 5000))
        p.accumulate(ids[sl], ws[sl])
    merged = parts[3]
    for i in (6, 0, 5, 1, 4, 2):  # arbitrary merge order
        merged = merged.merge(parts[i])
    a_ids, a_ws = mono.sample()
    b_ids, b_ws = merged.sample()
    assert a_ids.tolist() == b_ids.tolist()
    assert a_ws.tolist() == b_ws.tolist()
    assert len(a_ids) == 50 and merged.n_seen == 5000


def test_wrs_weight_bias_and_dedup():
    from ddsketch_ray.sketches.wrs import WeightedReservoir

    # items 0..99 with weight 1, items 100..109 with weight 50: heavy
    # items should dominate the sample across seeds
    ids = np.arange(110, dtype=np.int64)
    ws = np.r_[np.ones(100), np.full(10, 50.0)]
    heavy_rate = []
    for seed in range(30):
        sk = WeightedReservoir(k=10, seed=seed)
        sk.accumulate(ids, ws)
        s_ids, _ = sk.sample()
        heavy_rate.append(np.mean(s_ids >= 100))
    assert np.mean(heavy_rate) > 0.5  # ~77% expected, 9% if unweighted

    # duplicate ids collapse to one occurrence (best key wins)
    sk = WeightedReservoir(k=5, seed=0)
    sk.accumulate(np.array([7, 7, 7], dtype=np.int64), np.array([1.0, 3.0, 2.0]))
    s_ids, s_ws = sk.sample()
    assert s_ids.tolist() == [7]
    assert s_ws.tolist() == [3.0]  # largest weight has the largest key

    # non-positive / non-finite weights excluded; round-trip
    sk.accumulate(np.array([1, 2, 3], dtype=np.int64), np.array([0.0, -1.0, np.inf]))
    assert sk.sample()[0].tolist() == [7]
    from ddsketch_ray.sketches.wrs import WeightedReservoir as W
    rt = W.from_row(sk.to_row())
    assert rt.sample()[0].tolist() == [7] and rt.n_seen == sk.n_seen


# ------------------------- counting Bloom (turnstile) ----------------------


def test_counting_bloom_insert_delete_membership():
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches.bloom import CountingBloomFilter

    import numpy as np

    keys = np.arange(1000, dtype=np.int64)
    h = hash_ints(keys)
    cbf = CountingBloomFilter.from_capacity(2000)
    cbf.add_hashed(h)
    assert cbf.contains_hashed(h).all()  # no false negatives
    # delete the even keys: they must drop out (their counters return to
    # the pre-insert state exactly, so no residue can keep them present
    # unless colliding ODD keys do — checked via the exact counter state)
    even, odd = h[::2], h[1::2]
    cbf.delete_hashed(even)
    only_odd = CountingBloomFilter(m=cbf.m, k=cbf.k)
    only_odd.add_hashed(odd)
    assert np.array_equal(cbf.counters, only_odd.counters)
    assert cbf.contains_hashed(odd).all()


def test_counting_bloom_merge_and_signed_pass_equal():
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches.bloom import CountingBloomFilter

    import numpy as np

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 5000, 20_000)
    w = rng.choice(np.array([1, 1, 1, -1], dtype=np.int64), 20_000)
    h = hash_ints(keys.astype(np.int64))

    one = CountingBloomFilter.from_capacity(5000)
    one.add_hashed(h, w)

    # chunked + permuted merges are bit-identical
    acc = None
    for idx in np.array_split(rng.permutation(20_000), 7):
        part = CountingBloomFilter.from_capacity(5000)
        part.add_hashed(h[idx], w[idx])
        acc = part if acc is None else acc.merge(part)
    assert np.array_equal(one.counters, acc.counters)
    assert one.n_added == acc.n_added

    # two-phase insert-then-delete equals the signed single pass
    two = CountingBloomFilter.from_capacity(5000)
    two.add_hashed(h[w > 0], w[w > 0])
    two.delete_hashed(h[w < 0], -w[w < 0])
    assert np.array_equal(one.counters, two.counters)

    import pytest

    with pytest.raises(ValueError):
        one.merge(CountingBloomFilter(m=128, k=2))


def test_counting_bloom_negative_contract_visible():
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches.bloom import CountingBloomFilter

    import numpy as np

    cbf = CountingBloomFilter.from_capacity(100)
    h = hash_ints(np.array([42], dtype=np.int64))
    cbf.delete_hashed(h)  # deleting a never-inserted key
    assert (cbf.counters < 0).any()  # visible, not masked
    assert not cbf.contains_hashed(h).any()


def test_counting_bloom_agg_distributed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import CountingBloomAgg, sketch_from_result
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches.bloom import CountingBloomFilter

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 800, 6000).astype(np.int64)
    w = rng.choice(np.array([1, 1, -1], dtype=np.int64), 6000)
    ds = rd.from_arrow(pa.table({"key": keys, "w": w})).repartition(5)
    res = ds.aggregate(
        CountingBloomAgg(on="key", weight_col="w", capacity=1000, alias_name="c")
    )
    dist = sketch_from_result(res["c"])
    seq = CountingBloomFilter.from_capacity(1000)
    seq.add_hashed(hash_ints(keys), w)
    assert np.array_equal(dist.counters, seq.counters)
    assert dist.n_added == seq.n_added
