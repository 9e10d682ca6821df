"""bigram_nll / bigram_nll_hashed: brute-force oracle + properties."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from ddsketch_ray.functions.lm import bigram_nll, bigram_nll_hashed

SCALE = float(1 << 20)


def _brute_nll(raw: dict[int, str], target: list[str]):
    """Pure-python recompute of the documented exact-mode semantics."""
    tb: dict[tuple, int] = {}
    uni = set()
    for txt in target:
        ts = [t for t in txt.split() if t]
        uni.update(ts)
        for a, b in zip(ts, ts[1:]):
            tb[(a, b)] = tb.get((a, b), 0) + 1
    pre: dict[str, int] = {}
    for (a, _), n in tb.items():
        pre[a] = pre.get(a, 0) + n
    V = len(uni)
    out = {}
    for i, txt in raw.items():
        ts = [t for t in txt.split() if t]
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            out[i] = (0, 0.0)
            continue
        s = 0
        for a, b in bgs:
            if (a, b) in tb:
                q = round(-math.log((tb[(a, b)] + 1.0) / (pre[a] + V)) * SCALE)
            elif a in pre:
                q = round(math.log(pre[a] + V) * SCALE)
            else:
                q = round(math.log(float(V)) * SCALE)
            s += int(q)
        out[i] = (len(bgs), round(s / (SCALE * len(bgs)), 6))
    return out


def _mk(rng, vocab, n_docs, n_words):
    return [" ".join(rng.choice(vocab, size=rng.integers(2, n_words))) for _ in range(n_docs)]


def test_bigram_nll_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(60)])
    target = _mk(rng, vocab, 80, 30)
    raw = {i: t for i, t in enumerate(_mk(rng, vocab, 60, 25))}
    raw[60] = "zz qq totally unseen tokens here"
    raw[61] = "single"  # < 2 tokens
    raw[62] = ""
    raw_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(raw), type=pa.int64()),
                "text": pa.array([raw[i] for i in sorted(raw)]),
            }
        )
    ).repartition(4)
    tgt_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(target), dtype=np.int64)),
                "text": pa.array(target),
            }
        )
    ).repartition(3)
    out = bigram_nll(raw_ds, tgt_ds).to_pandas().sort_values("doc_id")
    exp = _brute_nll(raw, target)
    for _, r in out.iterrows():
        n, nll = exp[r.doc_id]
        assert r.n_bigrams == n, (r.doc_id, r.n_bigrams, n)
        assert abs(r.avg_nll - nll) < 1e-9, (r.doc_id, r.avg_nll, nll)


def test_bigram_nll_hashed_properties(ray_session):
    rng = np.random.default_rng(9)
    vocab = np.array([f"w{i}" for i in range(60)])
    target = _mk(rng, vocab, 120, 30)
    # raw = half target-like, half gibberish over a disjoint vocab
    gib_vocab = np.array([f"x{i}" for i in range(500)])
    raw_texts = _mk(rng, vocab, 50, 25) + _mk(rng, gib_vocab, 50, 25)
    raw = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "text": pa.array(raw_texts),
        }
    )
    tgt_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(target), dtype=np.int64)),
                "text": pa.array(target),
            }
        )
    )
    a = (
        bigram_nll_hashed(rd.from_arrow(raw).repartition(5), tgt_ds, n_buckets=1 << 12)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bigram_nll_hashed(rd.from_arrow(raw).repartition(2), tgt_ds, n_buckets=1 << 12)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)  # layout-invariant
    target_like = a[a.doc_id < 50].avg_nll.mean()
    gibberish = a[a.doc_id >= 50].avg_nll.mean()
    # hashed smoothing (cp + B in the denominator) compresses the
    # range relative to exact mode, but the ordering must hold clearly
    assert gibberish > target_like + 0.2  # the filter separates


def test_bigram_nll_auto_gate(ray_session):
    """mode="auto" (r4 verdict item 4): small targets take the exact
    path; above exact_bigram_limit distinct target bigrams the gated
    entry point routes to the hashed estimator."""
    import pandas as pd
    import pytest

    target = ["the cat sat", "the cat ran", "a dog sat"]
    raw = {0: "the cat sat", 1: "zz qq ww", 2: ""}
    tgt_ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(target)), pa.int64()),
                  "text": pa.array(target, pa.string())})
    )
    raw_ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(sorted(raw), pa.int64()),
                  "text": pa.array([raw[i] for i in sorted(raw)], pa.string())})
    ).repartition(2)

    def norm(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    auto = norm(bigram_nll(raw_ds, tgt_ds))
    exact = norm(bigram_nll(raw_ds, tgt_ds, mode="exact"))
    pd.testing.assert_frame_equal(auto, exact)

    # target has 6 distinct bigrams: a limit of 3 forces the fallover
    routed = norm(bigram_nll(raw_ds, tgt_ds, exact_bigram_limit=3))
    hashed = norm(bigram_nll_hashed(raw_ds, tgt_ds))
    pd.testing.assert_frame_equal(routed, hashed)

    with pytest.raises(ValueError, match="mode"):
        bigram_nll(raw_ds, tgt_ds, mode="bogus")
