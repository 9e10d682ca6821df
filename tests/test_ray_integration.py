"""Ray Data E2E tests: aggregate adapters, flagship pipeline, grouped
quantiles, checkpoint/resume, parallelism-invariance (SURVEY.md §5)."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ddsketch_ray.agg import (
    BloomAgg,
    DDSketchAgg,
    HeavyHittersAgg,
    HLLAgg,
    KLLAgg,
    TDigestAgg,
    sketch_from_result,
)
from tests.oracle import exact_quantile, rel_error

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice", "l_returnflag"])


def test_global_ddsketch_agg_matches_oracle(ray_session, lineitem):
    res = lineitem.aggregate(
        DDSketchAgg(on="l_extendedprice", qs=[0.5, 0.95, 0.99], alias_name="q")
    )
    vals = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])[
        "l_extendedprice"
    ].to_numpy()
    for q, est in zip([0.5, 0.95, 0.99], res["q"]):
        assert rel_error(est, exact_quantile(vals, q)) <= 0.008 + 1e-9


def test_global_agg_equals_local_sketch(ray_session, lineitem):
    """Distributed tree-merge == single local sketch (bins identical when
    no collapse occurs)."""
    from ddsketch_ray.sketches import DDSketch

    res = lineitem.aggregate(DDSketchAgg(on="l_extendedprice", alias_name="sk"))
    dist = sketch_from_result(res["sk"])
    vals = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])[
        "l_extendedprice"
    ].to_numpy()
    local = DDSketch(alpha=0.008, bin_limit=2048)
    local.add_array(vals)
    assert dist.bins == local.bins
    assert dist.n == local.n


def test_grouped_ddsketch_agg(ray_session, lineitem):
    out = (
        lineitem.groupby("l_returnflag")
        .aggregate(DDSketchAgg(on="l_extendedprice", qs=[0.5], alias_name="q50"))
        .to_pandas()
    )
    full = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    assert set(out["l_returnflag"]) == set(full["l_returnflag"].unique())
    for _, row in out.iterrows():
        vals = full.loc[full["l_returnflag"] == row["l_returnflag"], "l_extendedprice"].to_numpy()
        assert rel_error(row["q50"][0], exact_quantile(vals, 0.5)) <= 0.008 + 1e-9


def test_multi_sketch_single_pass(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    res = orders.aggregate(
        HLLAgg(on="o_custkey", alias_name="distinct_cust"),
        TDigestAgg(on="o_totalprice", qs=[0.5], alias_name="td_q50"),
        KLLAgg(on="o_totalprice", qs=[0.5], alias_name="kll_q50"),
        BloomAgg(on="o_custkey", capacity=20_000, alias_name="bloom"),
    )
    t = pq.read_table(f"{SF}/orders.parquet")
    exact_distinct = len(set(t["o_custkey"].to_pylist()))
    assert abs(res["distinct_cust"] - exact_distinct) / exact_distinct < 0.05
    prices = t["o_totalprice"].to_numpy()
    srt = np.sort(prices)
    for key in ("td_q50", "kll_q50"):
        rank = np.searchsorted(srt, res[key][0]) / len(prices)
        assert abs(rank - 0.5) < 0.03
    from ddsketch_ray.hashing import hash_ints

    bloom = sketch_from_result(res["bloom"])
    assert bloom.contains_hashed(hash_ints(t["o_custkey"].to_numpy())).all()


def test_heavy_hitters_agg(ray_session):
    import ray.data as rd

    events = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
    res = events.aggregate(HeavyHittersAgg(on="event_type", alias_name="hh"))
    hh = sketch_from_result(res["hh"])
    import duckdb

    exact = duckdb.sql(
        f"select event_type, count(*) c from '{SF}/events.parquet' group by 1 order by c desc, event_type"
    ).fetchall()
    top = hh.top_k(len(exact))
    assert dict(top) == {k: c for k, c in exact}  # small key space → exact


def test_webpages_flagship_pipeline(ray_session, tmp_path):
    from ddsketch_ray.synth import write_webpages_fixture
    from ddsketch_ray.pipelines import webpages_sketch_report
    import ray.data as rd

    path = str(tmp_path / "webpages.parquet")
    write_webpages_fixture(path, 2000, seed=42)
    ds = rd.read_parquet(path)
    report = webpages_sketch_report(ds)
    assert report["rows"] == 2000
    assert report["extract_byte_identical"], "distributed extraction must be byte-identical"
    assert report["distinct_urls"] == pytest.approx(2000, rel=0.05)
    t = pq.read_table(path)
    text_lens = np.array([len(x.encode()) for x in t["text"].to_pylist()], dtype=np.float64)
    for q, est in zip(report["qs"], report["text_len_quantiles"]):
        assert rel_error(est, exact_quantile(text_lens, q)) <= 0.008 + 1e-9
    langs = [k for k, _ in report["top_langs"]]
    assert langs[0] == "en"


def test_quantiles_by_group_long_format(ray_session, tmp_path):
    from ddsketch_ray.synth import write_webpages_fixture
    from ddsketch_ray.pipelines import derive_page_features, quantiles_by_group
    import ray.data as rd

    path = str(tmp_path / "webpages.parquet")
    write_webpages_fixture(path, 3000, seed=7)
    feats = rd.read_parquet(path).map_batches(derive_page_features, batch_format="pyarrow")
    out = quantiles_by_group(feats, "text_len", "lang", qs=(0.5, 0.95)).to_pandas()
    assert set(out.columns) == {"lang", "q", "est"}
    t = pq.read_table(path)
    df = t.to_pandas()
    df["text_len"] = df["text"].str.encode("utf-8").str.len()
    assert set(out["lang"]) == set(df["lang"].unique())
    for (lang, q), grp in out.groupby(["lang", "q"]):
        vals = df.loc[df["lang"] == lang, "text_len"].to_numpy(dtype=np.float64)
        est = grp["est"].iloc[0]
        assert rel_error(est, exact_quantile(vals, q)) <= 0.008 + 1e-9, (lang, q)


def test_parallelism_invariance(ray_session, tmp_path):
    """Same job at 1 block vs 16 blocks → identical sketch answers
    (the sandbox stand-in for cluster-size invariance)."""
    from ddsketch_ray.synth import write_webpages_fixture
    from ddsketch_ray.pipelines import webpages_sketch_report
    import ray.data as rd

    path = str(tmp_path / "webpages.parquet")
    write_webpages_fixture(path, 2000, seed=11)
    r1 = webpages_sketch_report(rd.read_parquet(path, override_num_blocks=1))
    r16 = webpages_sketch_report(rd.read_parquet(path, override_num_blocks=16))
    assert r1["text_len_quantiles"] == r16["text_len_quantiles"]
    assert r1["html_len_quantiles"] == r16["html_len_quantiles"]
    assert r1["distinct_urls"] == r16["distinct_urls"]
    assert dict(r1["top_langs"]) == dict(r16["top_langs"])


def test_distributed_generation_matches_local(ray_session):
    from ddsketch_ray.synth import generate_webpages, webpages_table

    ds = generate_webpages(500, seed=42, override_num_blocks=8)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    want = webpages_table(0, 500, seed=42).to_pandas().sort_values("url").reset_index(drop=True)
    assert got.equals(want)


def test_checkpoint_resume(ray_session, tmp_path):
    from ddsketch_ray.state import CheckpointedSketchJob
    from ddsketch_ray.synth import webpages_table
    from ddsketch_ray.sketches import DDSketch

    files = []
    for i in range(6):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(webpages_table(i * 500, 500, seed=3), p)
        files.append(p)

    def build(tbl: pa.Table):
        sk = DDSketch(alpha=0.008, bin_limit=2048)
        lens = np.array([len(x) for x in tbl.column("html").to_pylist()], dtype=np.float64)
        sk.add_array(lens)
        return sk

    job = CheckpointedSketchJob(
        files, build, columns=["html"], ckpt_dir=str(tmp_path / "ckpt"), run_id="r1"
    )
    assert len(job.pending_partitions()) == 6
    merged = job.run(concurrency=2)
    assert merged.n == 3000
    assert job.pending_partitions() == []

    # simulate partial failure: delete two part files, resume recomputes only them
    os.remove(job._part_path(1))
    os.remove(job._part_path(4))
    job2 = CheckpointedSketchJob(
        files, build, columns=["html"], ckpt_dir=str(tmp_path / "ckpt"), run_id="r1"
    )
    assert job2.pending_partitions() == [1, 4]
    merged2 = job2.run(concurrency=2)
    assert merged2.n == 3000
    assert merged2.bins == merged.bins

    man = job2.manifest().to_pandas()
    assert len(man) == 6
    assert man["row_count"].sum() == 3000
    assert (man["wall_s"] > 0).all()


def test_deterministic_sketch_quantiles(ray_session, tmp_path):
    """pipelines/deterministic.py: output is a pure function of the input
    multiset — identical across block layouts — and rank-accurate."""
    import ray.data as rd

    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.pipelines.deterministic import (
        deterministic_quantiles_by_group,
        deterministic_sketch_quantiles,
    )
    from ddsketch_ray.sketches.kll import KLL
    from ddsketch_ray.sketches.tdigest import TDigest

    rng = np.random.default_rng(11)
    n = 20_000
    vals = rng.gamma(2, 2, n)
    t = pa.table({"rid": pa.array(np.arange(n, dtype=np.int64)), "v": pa.array(vals)})
    path = str(tmp_path / "det.parquet")
    pq.write_table(t, path)

    def rowkey(batch: pa.Table) -> np.ndarray:
        return hash_ints(batch.column("rid").to_numpy(zero_copy_only=False).astype(np.int64))

    qs = [0.1, 0.5, 0.9, 0.99]
    outs = []
    for blocks in (3, 11):  # different block layouts, same multiset
        ds = rd.read_parquet(path, override_num_blocks=blocks)
        for cls in (TDigest, KLL):
            outs.append(
                deterministic_sketch_quantiles(ds, "v", rowkey, cls, qs=qs, partitions=8)
            )
    for a, b in ((0, 2), (1, 3)):  # tdigest vs tdigest, kll vs kll
        assert outs[a]["est"].tolist() == outs[b]["est"].tolist()  # bit-identical
    for df in outs[:2]:  # rank accuracy vs exact order statistics
        for q, est in zip(qs, df["est"]):
            exact_rank = (vals <= est).mean()
            assert abs(exact_rank - q) < 0.05

    # grouped variant: deterministic across layouts too
    g = pa.table(
        {
            "grp": pa.array((np.arange(n) % 3).astype(np.int64)),
            "v": pa.array(vals),
        }
    )
    gpath = str(tmp_path / "detg.parquet")
    pq.write_table(g, gpath)
    grouped = [
        deterministic_quantiles_by_group(
            rd.read_parquet(gpath, override_num_blocks=blocks), "v", "grp", TDigest, qs=[0.5, 0.95]
        )
        .to_pandas()
        .sort_values(["grp", "q"])
        .reset_index(drop=True)
        for blocks in (2, 7)
    ]
    assert grouped[0]["est"].tolist() == grouped[1]["est"].tolist()


def test_minhash_dedup_checkpointed_resume(ray_session, tmp_path):
    """Signature stage checkpoints per input shard; a killed run resumes
    from the finished shards and the final assignments are identical."""
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.dedup import minhash_dedup, minhash_dedup_checkpointed

    rng = np.random.default_rng(23)
    words = np.array([f"w{i}" for i in range(120)])
    base = [" ".join(words[rng.integers(0, 120, 40)]) for _ in range(40)]
    texts, ids = [], []
    did = 0
    for t in base:
        texts.append(t)
        ids.append(did)
        did += 1
        if rng.random() < 0.5:  # near-dup: same text, one word changed
            toks = t.split()
            toks[5] = "changed"
            texts.append(" ".join(toks))
            ids.append(did)
            did += 1
    files = []
    per = max(1, len(ids) // 6)
    for i in range(0, len(ids), per):
        f = str(tmp_path / f"docs-{i:04d}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids[i : i + per], type=pa.int64()),
                      "text": pa.array(texts[i : i + per])}),
            f,
        )
        files.append(f)

    out1, job = minhash_dedup_checkpointed(
        files, ckpt_dir=str(tmp_path / "ckpt"), run_id="j1", concurrency=2
    )
    df1 = out1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert job.pending_partitions() == []
    man = job.manifest()
    assert len(man) == len(files) and sum(m["row_count"] for m in man) == len(ids)

    # matches the non-checkpointed pipeline on the same corpus
    whole = rd.read_parquet(files)
    df_ref = minhash_dedup(whole).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df1, df_ref)
    assert (~df1["is_survivor"]).sum() > 0  # planted dups were caught

    # simulate partial failure: two part files lost -> only those recompute
    os.remove(job._part_path(1))
    os.remove(job._part_path(3))
    out2, job2 = minhash_dedup_checkpointed(
        files, ckpt_dir=str(tmp_path / "ckpt"), run_id="j1", concurrency=2
    )
    # job2 recomputed exactly the missing parts (pending computed before run)
    df2 = out2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df2, df1)

    # stale lineage: change a partition's input file set -> that part redone
    extra = str(tmp_path / "docs-extra.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([9999], type=pa.int64()),
                             "text": pa.array(["lonely new document"])}), extra)
    out3, job3 = minhash_dedup_checkpointed(
        files + [extra], ckpt_dir=str(tmp_path / "ckpt"), run_id="j1", concurrency=2
    )
    n3 = out3.to_pandas()
    assert len(n3) == len(ids) + 1


def test_checkpointed_map_job_empty_partition(ray_session, tmp_path):
    """A zero-row input shard still produces a valid (empty) part file
    and a resumable manifest."""
    from ddsketch_ray.state.checkpoint import CheckpointedMapJob

    full = str(tmp_path / "a.parquet")
    empty = str(tmp_path / "b.parquet")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["x", "y"])}), full)
    pq.write_table(schema.empty_table(), empty)

    def mfn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"doc_id": t.column("doc_id"),
                         "n": pc.cast(pc.binary_length(t.column("text")), pa.int64())})

    job = CheckpointedMapJob([full, empty], mfn, columns=["doc_id", "text"],
                             ckpt_dir=str(tmp_path / "c"), run_id="e1")
    files = job.run(concurrency=1)
    assert job.pending_partitions() == []
    import ray.data as rd
    out = rd.read_parquet(files).to_pandas()
    assert len(out) == 2 and sorted(out.columns) == ["doc_id", "n"]


def test_exact_dedup_emit(ray_session):
    """Survivor-row dedup: the min-id row's OWN values win for columns
    that vary within a duplicate group (the split-carry trap), across
    block-spanning groups and any layout."""
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.dedup import exact_dedup_emit

    rng = np.random.default_rng(5)
    n = 9_000
    df = pd.DataFrame(
        {
            "h": rng.integers(0, 900, n).astype(np.int64),  # ~10 rows/group
            "doc_id": rng.permutation(n).astype(np.int64),
            # varies WITHIN a group (keyed on doc_id, not h):
            "split": np.where(rng.integers(0, 2, n) == 0, "train", "val"),
        }
    )
    for parts in (1, 7, 23):
        out = (
            exact_dedup_emit(rd.from_pandas(df).repartition(parts), "h", "doc_id")
            .to_pandas()
            .sort_values("h")
            .reset_index(drop=True)
        )
        exp = (
            df.sort_values(["h", "doc_id"], kind="stable")
            .groupby("h", as_index=False)
            .first()
            .sort_values("h")
            .reset_index(drop=True)
        )
        assert out["h"].tolist() == exp["h"].tolist()
        assert out["doc_id"].tolist() == exp["doc_id"].tolist()
        assert out["split"].tolist() == exp["split"].tolist()  # survivor's own

    # null-mixing regression: when the MIN-ID row holds a null, the
    # output must keep the null — not backfill from a later duplicate
    t = pa.table(
        {
            "h": pa.array([7, 7, 7], pa.int64()),
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "val": pa.array([None, "later", "latest"], pa.string()),
        }
    )
    o = exact_dedup_emit(
        rd.from_arrow(t).repartition(2), "h", "doc_id"
    ).to_pandas()
    assert len(o) == 1 and o["doc_id"].iloc[0] == 1 and pd.isna(o["val"].iloc[0])


def test_corpus_prep_job_resume(ray_session, tmp_path):
    """End-to-end resumable corpus prep: cold run == resumed run after a
    lost part; output is split-partitioned and dedup keeps min-id
    survivors with their own split."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import duckdb

    from ddsketch_ray.pipelines.corpus_prep import corpus_prep_job

    # tiny corpus with planted exact duplicates ACROSS shards (letter
    # ids — digits would be redacted to <D>, collapsing every doc!)
    base = [f"doc {'x' * (i + 1)} " + "word " * 30 for i in range(40)]
    texts = base + base[:10]  # ids 40..49 duplicate ids 0..9
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(2):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i * 25 : (i + 1) * 25]),
            shard_dir / f"s{i}.parquet",
        )
    files = sorted(str(p) for p in shard_dir.glob("*.parquet"))

    out1 = tmp_path / "out1"
    s1, job = corpus_prep_job(
        files, ckpt_dir=str(tmp_path / "ckpt"), out_dir=str(out1), run_id="t1",
        concurrency=2,
    )
    assert s1["partitions"] == 2 and s1["prep_rows"] == 50
    assert s1["survivor_rows"] == 40  # 10 duplicate texts collapsed
    # survivors of duplicated texts are the low ids (min-id wins)
    got = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out1}/*/*.parquet', hive_partitioning=1) ORDER BY doc_id"
    ).df()
    assert got["doc_id"].max() < 40

    # lose a part -> resume recomputes exactly one partition, same output
    os.remove(job.output_files()[1])
    out2 = tmp_path / "out2"
    s2, _ = corpus_prep_job(
        files, ckpt_dir=str(tmp_path / "ckpt"), out_dir=str(out2), run_id="t1",
        concurrency=2,
    )
    assert s2["recomputed_partitions"] == 1
    a = duckdb.sql(
        f"SELECT * FROM read_parquet('{out1}/*/*.parquet', hive_partitioning=1) ORDER BY doc_id"
    ).df()
    b = duckdb.sql(
        f"SELECT * FROM read_parquet('{out2}/*/*.parquet', hive_partitioning=1) ORDER BY doc_id"
    ).df()
    assert a.equals(b)


def test_tokenize_pack_cold_vs_resumed(ray_session, tmp_path):
    """tokenize_pack (round-4 last-mile job): BPE merges checkpoint
    reloads on lineage match, encode parts resume per shard, and the
    resumed run's manifest is identical to the cold run's."""
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.pipelines.tokenize_pack import tokenize_pack

    rng = np.random.default_rng(41)
    words = np.array([f"tok{i}" for i in range(80)])
    texts = [" ".join(words[rng.integers(0, 80, rng.integers(3, 60))]) for _ in range(90)]
    files = []
    for i in range(0, 90, 30):
        f = str(tmp_path / f"docs-{i:04d}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array(range(i, i + 30), type=pa.int64()),
                      "text": pa.array(texts[i : i + 30])}), f)
        files.append(f)

    out1 = str(tmp_path / "out1")
    m1, info1 = tokenize_pack(
        files, ckpt_dir=str(tmp_path / "ck"), run_id="tp1",
        num_merges=12, seq_len=64, seqs_per_shard=4, out_dir=out1, concurrency=2,
    )
    df1 = m1.to_pandas().sort_values(["seq_id", "seq_off"]).reset_index(drop=True)
    assert not info1["merges_resumed"] and info1["encode_recomputed"] == 3

    # invariants: per doc take_n sums to its count; per full seq to seq_len
    per_seq = df1.groupby("seq_id")["take_n"].sum()
    assert (per_seq.iloc[:-1] == 64).all() and per_seq.iloc[-1] <= 64
    assert (df1["shard"] == df1["seq_id"] // 4).all()
    # hive layout on disk
    assert sorted(p for p in os.listdir(out1) if p.startswith("shard="))

    # kill one encode part; resume must redo exactly that part, reuse merges
    import glob as _glob

    enc_dirs = _glob.glob(str(tmp_path / "ck" / "tp1" / "enc-*"))
    assert len(enc_dirs) == 1
    os.remove(os.path.join(enc_dirs[0], "map-part-00001.parquet"))
    m2, info2 = tokenize_pack(
        files, ckpt_dir=str(tmp_path / "ck"), run_id="tp1",
        num_merges=12, seq_len=64, seqs_per_shard=4, concurrency=2,
    )
    df2 = m2.to_pandas().sort_values(["seq_id", "seq_off"]).reset_index(drop=True)
    assert info2["merges_resumed"] and info2["encode_recomputed"] == 1
    pd.testing.assert_frame_equal(df2, df1)

    # changed hyperparameter -> lineage mismatch -> retrain, not stale reuse
    m3, info3 = tokenize_pack(
        files, ckpt_dir=str(tmp_path / "ck"), run_id="tp1",
        num_merges=13, seq_len=64, seqs_per_shard=4, concurrency=2,
    )
    assert not info3["merges_resumed"] and info3["n_merges"] == 13
    # retrained tokenizer -> new encode fingerprint dir -> FULL re-encode
    # (stale counts from the 12-merge tokenizer must never be reused)
    assert info3["encode_recomputed"] == 3
    assert len(_glob.glob(str(tmp_path / "ck" / "tp1" / "enc-*"))) == 2
