"""Segment-level (CCNet-style line/paragraph) dedup — exact-oracle tests.

Brute-force Python recomputation is the oracle everywhere; layout
invariance is asserted by re-running the distributed plan at a
different block count."""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ray.functions.segdedup import (
    common_segments_report,
    html_paragraph_segments,
    line_segments,
    segment_dedup,
    token_window_segments,
)

DOCS = [
    (0, "Home | About\nalpha beta gamma\nshared line one\n\n  "),
    (1, "Home | About\ndelta epsilon\nshared line one\nshared line one"),  # in-doc repeat
    (2, "Home | About\nunique middle text\nzeta eta"),
    (3, "Home | About"),  # everything removed
    (4, ""),  # no segments -> dropped from output
    (5, "totally unique document\nwith two lines"),
]


def brute_line_dedup(docs, min_docs=2):
    from collections import Counter

    df = Counter()
    for _, text in docs:
        lines = [ln.strip() for ln in text.split("\n")]
        df.update({ln for ln in lines if ln})
    common = {ln for ln, c in df.items() if c >= min_docs}
    out = {}
    for did, text in docs:
        lines = [ln.strip() for ln in text.split("\n")]
        lines = [ln for ln in lines if ln]
        if not lines:
            continue
        kept = [ln for ln in lines if ln not in common]
        out[did] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    return common, out


def _docs_table():
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )


@pytest.mark.parametrize("blocks", [1, 4])
def test_line_dedup_matches_bruteforce(ray_session, blocks):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(blocks)
    out, info = segment_dedup(ds, line_segments, id_col="doc_id", min_docs=2, join_sep="\n")
    common, expect = brute_line_dedup(DOCS)
    assert info["n_common_segments"] == len(common)
    got = {
        r["doc_id"]: (r["n_segs"], r["n_common"], r["kept_text"])
        for r in out.to_pandas().to_dict("records")
    }
    assert got == expect


def test_token_window_segments_boundaries():
    b = pa.table({"doc_id": [1, 2], "text": ["a b c d e", None]})
    t = token_window_segments(b, chunk_tokens=2)
    assert t.column("seg").to_pylist() == ["a b", "c d", "e"]
    assert t.column("doc_row").to_pylist() == [0, 0, 0]
    assert t.column("seg_idx").to_pylist() == [0, 1, 2]


def test_within_doc_repeat_counts_once(ray_session):
    import ray.data as rd

    # "dup seg" repeats 3x inside doc 0 but exists in only one doc
    t = pa.table({"doc_id": [0, 1], "text": ["dup seg\ndup seg\ndup seg", "other"]})
    out, info = segment_dedup(
        rd.from_arrow(t), line_segments, id_col="doc_id", min_docs=2, join_sep="\n"
    )
    assert info["n_common_segments"] == 0
    df = out.to_pandas().set_index("doc_id")
    assert df.loc[0, "n_common"] == 0 and df.loc[0, "kept_text"].count("dup seg") == 3


def test_html_paragraph_dedup_strips_boilerplate(ray_session):
    from ddsketch_ray.synth import generate_webpages

    ds = generate_webpages(120, seed=42, override_num_blocks=3)
    out, info = segment_dedup(
        ds, html_paragraph_segments, id_col="url", min_docs=2, join_sep="\n"
    )
    assert info["n_common_segments"] >= 1
    df = out.to_pandas()
    assert len(df) == 120
    assert not df["kept_text"].str.contains("Home | About | Contact", regex=False).any()
    assert (df["n_common"] >= 1).all()  # every page had the nav bar
    rep = common_segments_report(ds, html_paragraph_segments, top_k=3).to_pandas()
    assert rep.iloc[0]["seg"] == "Home | About | Contact"
    assert rep.iloc[0]["n_docs"] == 120
    # tie-break: n_docs DESC then seg ASC
    assert list(rep.columns) == ["seg", "n_docs"]
    assert (rep["n_docs"].to_numpy()[:-1] >= rep["n_docs"].to_numpy()[1:]).all()


def test_paragraph_segments_match_extractor_content():
    """Paragraph segments, space-joined, must reproduce the byte-exact
    extractor's text (same strip/entity chain, boundaries aside)."""
    from ddsketch_ray.extract import extract_text
    from ddsketch_ray.synth import webpages_table

    t = webpages_table(0, 50, seed=42)
    segs = html_paragraph_segments(t)
    d = segs.column("doc_row").to_numpy()
    ss = np.array(segs.column("seg").to_pylist(), dtype=object)
    for i, html in enumerate(t.column("html").to_pylist()):
        joined = " ".join(ss[d == i])
        assert joined == extract_text(html)


def test_layout_invariance_chunks(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    words = np.array(["w%d" % i for i in range(30)])
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 40))) for _ in range(200)]
    texts += texts[:20]  # planted exact dups -> shared windows
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    seg = partial(token_window_segments, chunk_tokens=4)
    res = []
    for blocks in (1, 7):
        out, info = segment_dedup(
            rd.from_arrow(t).repartition(blocks), seg, id_col="doc_id", min_docs=2
        )
        res.append((info, out.to_pandas().sort_values("doc_id").reset_index(drop=True)))
    assert res[0][0] == res[1][0]
    assert res[0][1].equals(res[1][1])
    assert res[0][1]["n_common"].sum() > 0


def test_max_common_cap_raises(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [0, 1], "text": ["same line", "same line"]})
    with pytest.raises(ValueError, match="max_common"):
        segment_dedup(
            rd.from_arrow(t), line_segments, id_col="doc_id", min_docs=2, max_common=0
        )
