"""End-to-end pretrain_corpus_job: stage chaining, resume semantics,
and cold ≡ resumed manifest bit-equality (pipelines/pretrain_corpus.py)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ddsketch_ray.pipelines.pretrain_corpus import pretrain_corpus_job


def _write_corpus(d, n_files=3, docs_per_file=40):
    """Small deterministic corpus: mixed langs, planted exact dups,
    planted near-dups, a repeated boilerplate sentence, short docs."""
    os.makedirs(d)
    langs = ["en", "en", "en", "zh", "es"]
    boiler = "subscribe to our newsletter for updates every single day"

    def w(n):  # letters only: the PII redaction rewrites digit runs
        return "".join(chr(97 + int(c)) for c in str(n))
    files = []
    k = 0
    for f in range(n_files):
        ids, texts, lng = [], [], []
        for j in range(docs_per_file):
            i = k
            k += 1
            base = " ".join(f"tok{w(i)}x{w(t)}" for t in range(30))  # doc-unique
            if i % 11 == 3:
                txt = texts[-1] if texts else base  # exact dup of neighbor
            elif i % 11 == 7:
                txt = base + " nearly"  # near-dup shape
            elif i % 13 == 5:
                txt = "tiny doc"  # gated out (< min_tokens)
            else:
                txt = base + " " + boiler
            ids.append(i)
            texts.append(txt)
            lng.append(langs[i % len(langs)])
        p = os.path.join(d, f"part-{f}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(lng, pa.string()),
                }
            ),
            p,
        )
        files.append(p)
    return files


def _manifest_df(manifest_dir):
    files = sorted(glob.glob(os.path.join(manifest_dir, "**", "*.parquet"), recursive=True))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    return df.sort_values(["seq_id", "seq_off"]).reset_index(drop=True)


def _corpus_df(corpus_dir):
    files = sorted(glob.glob(os.path.join(corpus_dir, "**", "*.parquet"), recursive=True))
    df = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    # hive split column lives in the path
    return df.sort_values("doc_id").reset_index(drop=True)


def test_pretrain_corpus_cold_resume_and_stages(ray_session, tmp_path):
    files = _write_corpus(str(tmp_path / "docs"))
    kw = dict(
        min_tokens=10,
        window=8,
        mixture=[("en", 3), ("zh", 1)],
        num_merges=8,
        seq_len=64,
        seqs_per_shard=8,
        concurrency=2,
        num_buckets=8,
    )

    cold = pretrain_corpus_job(
        files, ckpt_dir=str(tmp_path / "ck1"), out_dir=str(tmp_path / "o1"),
        run_id="r1", **kw,
    )
    assert all(not s["skipped"] for s in cold["stages"].values())
    cold_corpus = _corpus_df(cold["corpus_dir"])
    cold_manifest = _manifest_df(cold["manifest_dir"])
    assert len(cold_corpus) > 0 and len(cold_manifest) > 0
    # prep gate dropped the tiny docs; mixture kept only en/zh
    assert set(cold_corpus["lang"].unique()) <= {"en", "zh"}
    # exact dups are gone: every text is unique
    assert cold_corpus["text"].is_unique

    # second identical invocation: every stage skips, outputs untouched
    again = pretrain_corpus_job(
        files, ckpt_dir=str(tmp_path / "ck1"), out_dir=str(tmp_path / "o1"),
        run_id="r1", **kw,
    )
    assert all(s["skipped"] for s in again["stages"].values())

    # resume after a mid-chain kill: drop stage-4/5 markers + one
    # minhash signature part — the resumed run must rebuild only those
    # and land a BIT-IDENTICAL corpus and pack manifest
    o1 = str(tmp_path / "o1")
    os.remove(os.path.join(o1, "stage4-corpus", "_STAGE_COMPLETE.json"))
    os.remove(os.path.join(o1, "stage5-pack", "_STAGE_COMPLETE.json"))
    resumed = pretrain_corpus_job(
        files, ckpt_dir=str(tmp_path / "ck1"), out_dir=o1, run_id="r1", **kw,
    )
    assert resumed["stages"]["stage1-prep"]["skipped"]
    assert resumed["stages"]["stage3-minhash"]["skipped"]
    assert not resumed["stages"]["stage4-corpus"]["skipped"]
    assert not resumed["stages"]["stage5-pack"]["skipped"]
    pd.testing.assert_frame_equal(_corpus_df(resumed["corpus_dir"]), cold_corpus)
    pd.testing.assert_frame_equal(_manifest_df(resumed["manifest_dir"]), cold_manifest)

    # a fully cold second run in fresh dirs is bit-identical too
    cold2 = pretrain_corpus_job(
        files, ckpt_dir=str(tmp_path / "ck2"), out_dir=str(tmp_path / "o2"),
        run_id="r2", **kw,
    )
    pd.testing.assert_frame_equal(_corpus_df(cold2["corpus_dir"]), cold_corpus)
    pd.testing.assert_frame_equal(_manifest_df(cold2["manifest_dir"]), cold_manifest)


def test_pretrain_corpus_param_change_rebuilds(ray_session, tmp_path):
    """A changed stage parameter must invalidate that stage's marker
    (and downstream stages recompute from the new output)."""
    files = _write_corpus(str(tmp_path / "docs"), n_files=2, docs_per_file=25)
    kw = dict(
        min_tokens=5, window=8, mixture=None, num_merges=5,
        seq_len=32, seqs_per_shard=8, concurrency=2, num_buckets=8,
    )
    out = str(tmp_path / "o")
    first = pretrain_corpus_job(
        files, ckpt_dir=str(tmp_path / "ck"), out_dir=out, run_id="r", **kw
    )
    assert not first["stages"]["stage5-pack"]["skipped"]
    kw2 = dict(kw, seq_len=16)  # stage-5 param change only
    second = pretrain_corpus_job(
        files, ckpt_dir=str(tmp_path / "ck"), out_dir=out, run_id="r", **kw2
    )
    assert second["stages"]["stage4-corpus"]["skipped"]
    assert not second["stages"]["stage5-pack"]["skipped"]
    m = _manifest_df(second["manifest_dir"])
    assert (m["seq_off"] + m["take_n"] <= 16).all()


def test_pretrain_validate_stage_gates_input(ray_session, tmp_path):
    """stage0-validate: clean rules pass (counts recorded, stage marker
    written, resume skips it); a violated rule ABORTS before stage 1
    spends anything."""
    from ddsketch_ray.pipelines.pretrain_corpus import pretrain_corpus_job

    files = _write_corpus(tmp_path / "in", n_files=2, docs_per_file=40)
    rules = [
        {"rule": "not_null", "col": "doc_id"},
        {"rule": "unique", "col": "doc_id"},
        {"rule": "in_set", "col": "lang", "values": ["en", "zh", "es"]},
    ]
    out = str(tmp_path / "out")
    s = pretrain_corpus_job(
        files,
        ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=out,
        run_id="v1",
        num_merges=5,
        seq_len=64,
        validate_rules=rules,
    )
    st0 = s["stages"]["stage0-validate"]
    assert not st0["skipped"] and st0["rule_counts"]["unique:doc_id"] == 0
    assert os.path.exists(os.path.join(out, "stage0-validate", "report.parquet"))
    # resume: every stage including validation is marker-skipped
    s2 = pretrain_corpus_job(
        files,
        ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=out,
        run_id="v1",
        num_merges=5,
        seq_len=64,
        validate_rules=rules,
    )
    assert all(v["skipped"] for v in s2["stages"].values())

    # violated rule: abort before stage 1
    bad_rules = [{"rule": "in_set", "col": "lang", "values": ["en"]}]  # zh/es violate
    out_bad = str(tmp_path / "out_bad")
    with pytest.raises(ValueError, match="input validation failed"):
        pretrain_corpus_job(
            files,
            ckpt_dir=str(tmp_path / "ckpt_bad"),
            out_dir=out_bad,
            run_id="v2",
            validate_rules=bad_rules,
        )
    assert not os.path.exists(os.path.join(out_bad, "stage1-prep"))
