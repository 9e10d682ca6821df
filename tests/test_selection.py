import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ddsketch_ray.functions.selection import unigram_importance


def test_unigram_importance_prefers_targetlike(ray_session):
    target = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64),
         "text": ["alpha beta gamma", "alpha beta", "beta gamma alpha"]}
    )
    raw = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "alpha beta gamma alpha",   # target-like
                "zzz qqq www",              # not target-like
                "alpha zzz",                # mixed
                "",                         # empty -> iw 0
            ],
        }
    )
    outs = []
    for blocks in (1, 3):
        out = (
            unigram_importance(rd.from_pandas(raw).repartition(blocks), rd.from_pandas(target))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # layout bit-equality
    o = outs[0]
    assert o.loc[0, "iw"] > o.loc[2, "iw"] > o.loc[1, "iw"]
    assert o.loc[3, "iw"] == 0.0 and o.loc[3, "n_tokens"] == 0
    # external recompute of doc 0 (fixed-point math)
    import collections
    ct = collections.Counter("alpha beta gamma alpha beta beta gamma alpha".split())
    cr = collections.Counter(" ".join(raw["text"]).split())
    vocab = set(ct) | set(cr)
    V, Tt, Tr = len(vocab), sum(ct.values()), sum(cr.values())
    scale = float(1 << 20)
    lrq = {t: np.rint((np.log((ct[t] + 1.0) / (Tt + V)) - np.log((cr[t] + 1.0) / (Tr + V))) * scale) for t in vocab}
    toks0 = raw.loc[0, "text"].split()
    want = sum(lrq[t] for t in toks0) / (scale * len(toks0))
    assert o.loc[0, "iw"] == want


def test_polyhash_strings_matches_scalar_reference():
    """Vectorized byte-polynomial hash == the per-string scalar reference
    (the contract the DuckDB oracle replays)."""
    from ddsketch_ray.hashing import polyhash_strings

    P, M = 1099511628211, 1 << 64

    def sm(z):
        z = (z + 0x9E3779B97F4A7C15) % M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
        return z ^ (z >> 31)

    def ref(s, seed):
        h = 0
        for b in s.encode("utf-8"):
            h = (h * P + b) % M
        return sm(h ^ sm(seed))

    toks = ["", "a", "hello", "wörld", "日本語テキスト", "x" * 500, "tab\tsep"]
    for seed in (0, 7, 123456789):
        got = polyhash_strings(toks, seed=seed)
        assert [int(g) for g in got] == [ref(t, seed) for t in toks]
    # sliced-array offset safety
    import pyarrow as pa

    arr = pa.array(toks, type=pa.large_string()).slice(2, 4)
    got = polyhash_strings(arr, seed=3)
    assert [int(g) for g in got] == [ref(t, 3) for t in toks[2:6]]


def test_hashed_unigram_importance_bounded_and_layout_stable(ray_session):
    """Feature-hashed DSIR: constant-size ratio table (n_buckets), ranks
    target-like docs above junk, bit-identical across block layouts, and
    agrees with a pure-python recompute of the same bucketed math."""
    import collections

    from ddsketch_ray.functions.selection import hashed_unigram_importance
    from ddsketch_ray.hashing import polyhash_strings

    target = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64),
         "text": ["alpha beta gamma", "alpha beta", "beta gamma alpha"]}
    )
    raw = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "alpha beta gamma alpha",
                "zzz qqq www",
                "alpha zzz",
                "",
            ],
        }
    )
    B = 64  # tiny space -> collisions exercised
    outs = []
    for blocks in (1, 3):
        out = (
            hashed_unigram_importance(
                rd.from_pandas(raw).repartition(blocks),
                rd.from_pandas(target),
                n_buckets=B,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    o = outs[0]
    assert o.loc[0, "iw"] > o.loc[1, "iw"]
    assert o.loc[3, "iw"] == 0.0 and o.loc[3, "n_tokens"] == 0
    # pure-python recompute with the same bucketing
    def bucket(t):
        # int() BEFORE the mod: numpy uint64 % python-int promotes to
        # float64 and corrupts the low bits
        return int(polyhash_strings([t])[0]) % B

    ct = np.zeros(B, np.int64)
    for t in " ".join(target["text"]).split():
        ct[bucket(t)] += 1
    cr = np.zeros(B, np.int64)
    for t in " ".join(raw["text"]).split():
        cr[bucket(t)] += 1
    Tt, Tr = ct.sum(), cr.sum()
    scale = float(1 << 20)
    lrq = np.rint(
        (np.log((ct + 1.0) / (Tt + B)) - np.log((cr + 1.0) / (Tr + B))) * scale
    ).astype(np.int64)
    toks0 = raw.loc[0, "text"].split()
    want = sum(int(lrq[bucket(t)]) for t in toks0) / (scale * len(toks0))
    assert o.loc[0, "iw"] == want


def test_unigram_importance_auto_gate(ray_session):
    """mode="auto" (r4 verdict item 4): below the vocab limit the gated
    entry point IS the exact path; above it, it routes to the hashed
    estimator without pulling the vocabulary to the driver."""
    target = pd.DataFrame(
        {"doc_id": np.arange(2, dtype=np.int64), "text": ["alpha beta", "beta gamma"]}
    )
    raw = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["alpha beta gamma", "alpha uniq1 uniq2 uniq3", "zzz qqq"],
        }
    )
    raw_ds, tgt_ds = rd.from_pandas(raw).repartition(2), rd.from_pandas(target)

    def norm(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    from ddsketch_ray.functions.selection import hashed_unigram_importance

    auto = norm(unigram_importance(raw_ds, tgt_ds))
    exact = norm(unigram_importance(raw_ds, tgt_ds, mode="exact"))
    pd.testing.assert_frame_equal(auto, exact)  # small vocab -> exact route

    # raw corpus has 8 distinct tokens: a limit of 4 forces the fallover
    routed = norm(unigram_importance(raw_ds, tgt_ds, exact_vocab_limit=4))
    hashed = norm(hashed_unigram_importance(raw_ds, tgt_ds))
    pd.testing.assert_frame_equal(routed, hashed)

    with pytest.raises(ValueError, match="mode"):
        unigram_importance(raw_ds, tgt_ds, mode="bogus")
