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
