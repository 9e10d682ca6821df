"""Sources, actor-pool builders, multimodal stages, windows, salting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def test_sketch_parquet_roundtrip(tmp_path):
    from ddsketch_ray.sketches import DDSketch, HyperLogLog, KLL, TDigest, BloomFilter
    from ddsketch_ray.sources import read_sketch_parquet, write_sketch_parquet

    rng = np.random.default_rng(5)
    vals = rng.gamma(2, 2, 20_000)
    for sk in (DDSketch(), TDigest(), KLL()):
        sk.add_array(vals)
        p = str(tmp_path / f"{type(sk).__name__}.parquet")
        write_sketch_parquet(sk, p)
        back = read_sketch_parquet(p)
        assert np.allclose(back.quantiles([0.5, 0.95]), sk.quantiles([0.5, 0.95]))
    from ddsketch_ray.hashing import splitmix64

    h = splitmix64(np.arange(10_000, dtype=np.uint64))
    for sk in (HyperLogLog(p=12), BloomFilter(m=4096, k=4)):
        sk.add_hashed(h)
        p = str(tmp_path / f"{type(sk).__name__}.parquet")
        write_sketch_parquet(sk, p)
        back = read_sketch_parquet(p)
        if hasattr(sk, "estimate"):
            assert back.estimate() == sk.estimate()
        else:
            assert np.array_equal(back.words, sk.words)


def test_read_values_csv(ray_session, tmp_path):
    from ddsketch_ray.sources import read_values_csv

    p = tmp_path / "vals.csv"
    p.write_text("value\n1.5\n2.5\nnot_a_number\n-3.25\n")
    out = read_values_csv(str(p)).to_pandas()
    got = out["value"].tolist()  # block order is not guaranteed -> multiset compare
    assert sorted(v for v in got if not pd.isna(v)) == [-3.25, 1.5, 2.5]
    assert sum(pd.isna(v) for v in got) == 1  # stod failure -> null


def test_actor_pool_builder_equals_aggregate(ray_session):
    import ray.data as rd

    from ddsketch_ray.agg import DDSketchAgg, sketch_from_result
    from ddsketch_ray.sketches import DDSketch
    from ddsketch_ray.stages import sketch_via_actor_pool

    ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])

    def factory():
        return DDSketch(alpha=0.008, bin_limit=4096)

    def accumulate(sk, batch):
        sk.add_array(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))

    via_pool = sketch_via_actor_pool(ds, factory, accumulate, concurrency=2)
    via_agg = sketch_from_result(
        ds.aggregate(DDSketchAgg(on="l_extendedprice", bin_limit=4096, alias_name="sk"))["sk"]
    )
    assert via_pool.bins == via_agg.bins
    assert via_pool.n == via_agg.n


def test_media_stages(ray_session):
    import ray.data as rd

    from ddsketch_ray.stages.multimodal import (
        AudioFrameSampleStage,
        ImageResizeStage,
        MediaDecodeStage,
        decode_fake_media,
        media_table,
    )

    t = media_table(40, seed=3)
    ds = rd.from_arrow(t).repartition(2)
    decoded = ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert len(decoded) == 40
    assert set(decoded["kind"]) == {"image", "audio"}
    # deterministic: same input -> same features
    decoded2 = ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert decoded.sort_values("media_id").reset_index(drop=True).equals(
        decoded2.sort_values("media_id").reset_index(drop=True)
    )
    # resize: all images land at 8x8
    resized = ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": 8, "height": 8},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    for _, row in resized.iterrows():
        if row["kind"] == "image":
            _, (w, h, c), arr = decode_fake_media(row["payload"])
            assert (w, h) == (8, 8) and arr.shape == (8, 8, c)
    # audio frame sampling emits (media_id, frame_idx, frame_mean)
    frames = ds.map_batches(
        AudioFrameSampleStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert len(frames) > 0
    assert set(frames.columns) == {"media_id", "frame_idx", "frame_mean"}


def test_media_unknown_payload_raises():
    from ddsketch_ray.stages.multimodal import decode_fake_media

    with pytest.raises(NotImplementedError):
        decode_fake_media(b"\x89PNG\r\n\x1a\nxxxx")


def test_tumbling_and_sliding_windows():
    from ddsketch_ray.functions.windows import (
        US_PER_HOUR,
        add_tumbling_window,
        explode_sliding_windows,
    )

    ts = pa.array(
        np.array([0, 10, 3600, 3601, 7200], dtype="int64") * 1_000_000
    ).cast(pa.timestamp("us"))
    t = pa.table({"ts": ts, "v": pa.array([1, 2, 3, 4, 5])})
    out = add_tumbling_window(t, size_us=US_PER_HOUR)
    starts = out.column("window_start").cast(pa.int64()).to_pylist()
    assert starts == [0, 0, 3600_000_000, 3600_000_000, 7200_000_000]
    slid = explode_sliding_windows(t, size_us=US_PER_HOUR, hop_us=US_PER_HOUR // 4)
    # every event appears in exactly size/hop = 4 windows
    assert slid.num_rows == 4 * t.num_rows
    # each window containing the event satisfies start <= ts < start+size
    ts_out = slid.column("ts").cast(pa.int64()).to_numpy()
    ws = slid.column("window_start").cast(pa.int64()).to_numpy()
    assert ((ws <= ts_out) & (ts_out < ws + US_PER_HOUR)).all()


def test_session_counts(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.windows import session_counts

    m = 60 * 1_000_000
    rows = []
    for u, offsets in [(1, [0, 5, 10, 100, 105]), (2, [0]), (3, [0, 50, 100, 150])]:
        for o in offsets:
            rows.append({"user_id": u, "ts": np.datetime64(o * m, "us")})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = session_counts(ds, gap_us=30 * m).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2  # gap 10->100 splits
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[3, "n_sessions"] == 4  # every gap is 50min > 30min


def test_sessionize_matches_pandas(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.windows import sessionize

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime(np.sort(rng.integers(0, 400_000_000, n)), unit="us"),
        }
    )
    gap = 10_000_000
    out = (
        sessionize(rd.from_pandas(df, override_num_blocks=11), "user_id", "ts", "event_id", gap_us=gap)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # pandas reference: FIRST_VALUE(event_id) per (user, session-run)
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ts_us = ref["ts"].astype("int64") // 1000  # ns -> us
    brk = (ref["user_id"] != ref["user_id"].shift()) | (ts_us - ts_us.shift() > gap)
    ref["run"] = brk.cumsum()
    ref["session_id"] = ref.groupby("run")["event_id"].transform("first")
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (out["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    assert (out["session_id"].to_numpy() == ref["session_id"].to_numpy()).all()


def test_sessionize_block_spanning_session(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.windows import sessionize

    # one key, gap never exceeded, many blocks: all rows one session
    n = 1500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n, dtype=np.int64) * 1_000_000, unit="us"),
        }
    )
    out = sessionize(
        rd.from_pandas(df, override_num_blocks=8), "user_id", "ts", "event_id", gap_us=5_000_000
    ).to_pandas()
    assert len(out) == n
    assert out["session_id"].nunique() == 1
    assert out["session_id"].iloc[0] == 0


def test_salted_equals_unsalted(ray_session):
    import ray.data as rd
    from ddsketch_ray.pipelines import quantiles_by_group
    from ddsketch_ray.pipelines.skew import quantiles_by_group_salted

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    a = (
        quantiles_by_group(ds, "value", "event_type", qs=(0.5, 0.95))
        .to_pandas()
        .sort_values(["event_type", "q"])
        .reset_index(drop=True)
    )
    b = (
        quantiles_by_group_salted(ds, "value", "event_type", qs=(0.5, 0.95), salt=8)
        .to_pandas()
        .sort_values(["event_type", "q"])
        .reset_index(drop=True)
    )
    assert a.equals(b), "salting must not change results (merge associativity)"


def test_sliding_windows_non_divisible():
    """Regression: size not a multiple of hop must still emit every
    covering window (ceiling fan-out + mask)."""
    from ddsketch_ray.functions.windows import explode_sliding_windows

    m = 60 * 1_000_000
    ts = pa.array(np.array([100 * m], dtype="int64")).cast(pa.timestamp("us"))
    t = pa.table({"ts": ts})
    out = explode_sliding_windows(t, size_us=60 * m, hop_us=25 * m)
    starts = sorted(out.column("window_start").cast(pa.int64()).to_pylist())
    assert starts == [50 * m, 75 * m, 100 * m]


def test_heavy_hitters_parquet_roundtrip_keeps_key_types(tmp_path):
    from ddsketch_ray.hashing import hash_ints
    from ddsketch_ray.sketches import HeavyHitters
    from ddsketch_ray.sources import read_sketch_parquet, write_sketch_parquet

    hh = HeavyHitters(width=256, depth=3, capacity=16)
    keys = np.array([7, 7, 7, 42, 42, 99], dtype=np.int64)
    hh.add_keyed(keys.tolist(), hash_ints(keys))
    p = str(tmp_path / "hh.parquet")
    write_sketch_parquet(hh, p)
    back = read_sketch_parquet(p)
    assert back.top_k(2) == hh.top_k(2)
    assert isinstance(back.top_k(1)[0][0], int)  # int keys stay int


def test_checkpoint_empty_partition(ray_session, tmp_path):
    import pyarrow.parquet as pqt

    from ddsketch_ray.sketches import DDSketch
    from ddsketch_ray.state import CheckpointedSketchJob

    full = pa.table({"v": pa.array(np.arange(100, dtype=np.float64))})
    empty = full.slice(0, 0)
    f1, f2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pqt.write_table(full, f1)
    pqt.write_table(empty, f2)

    def build(tbl):
        sk = DDSketch(alpha=0.008, bin_limit=2048)
        sk.add_array(tbl.column("v").to_numpy(zero_copy_only=False))
        return sk

    job = CheckpointedSketchJob(
        [f1, f2], build, columns=["v"], ckpt_dir=str(tmp_path / "ck"), run_id="e"
    )
    sk = job.run(concurrency=2)  # must not crash on the empty partition
    assert sk.n == 100


def test_streaming_sketch_service(ray_session):
    import math

    import ray.data as rd

    from ddsketch_ray.stages.streaming import StreamingSketchService

    rng = np.random.default_rng(77)
    keys = rng.choice(["a", "b", "c", "d", "e"], size=20_000).tolist()
    vals = rng.gamma(2, 2, 20_000)
    svc = StreamingSketchService(num_shards=3)

    # incremental: quantile visible after first batch, refined after more
    svc.ingest_batch(keys[:5000], vals[:5000])
    q_mid = svc.quantile("a", 0.5)
    assert not math.isnan(q_mid)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys[5000:]), "v": pa.array(vals[5000:])}))
    svc.ingest_dataset(ds, "k", "v", batch_size=4096)
    assert svc.keys() == ["a", "b", "c", "d", "e"]

    # final state equals a batch DDSketch per key (order-insensitivity)
    from ddsketch_ray.sketches import DDSketch

    for key in ("a", "e"):
        mask = np.array([k == key for k in keys])
        ref = DDSketch(alpha=0.008, bin_limit=2048)
        ref.add_array(vals[mask])
        assert svc.quantile(key, 0.95) == ref.quantile(0.95)
    assert math.isnan(svc.quantile("zz", 0.5))


def test_vectorized_extractor_byte_identical():
    """extract_text_series (polars Rust-regex chain) must reproduce the
    per-row spec extract_text byte-for-byte — on the synthetic corpus
    and on adversarial entity/tag edge cases."""
    import numpy as np
    import pyarrow as pa

    from ddsketch_ray.extract import extract_text, extract_text_series
    from ddsketch_ray.synth import webpages_table_for_indices

    tbl = webpages_table_for_indices(np.arange(0, 4000, 7), seed=7)
    vec = extract_text_series(tbl.column("html")).to_pylist()
    ref = [extract_text(h) for h in tbl.column("html").to_pylist()]
    assert vec == ref
    cases = [
        "&amp;lt;", "a &amp; b", "<script>x</script>tail",
        "<!--<script>--><b>k</b>", "&nbsp;&copy;", "<style a=b>s</style>ok",
        "&amp;amp;", "&quot;q&quot;", "<SCRIPT>js</SCRIPT>z",
        "m <style>a</style><script>b</script> c", "", "no tags at all",
        "<unclosed", "a  \t\n  b",
    ]
    ct = pa.array([c.encode() for c in cases], type=pa.binary())
    assert extract_text_series(ct).to_pylist() == [extract_text(c.encode()) for c in cases]


def test_real_codec_branch_when_pil_present():
    """Exercises the PIL decode path when the library exists (skipped in
    this container); always verifies the no-codec guard raises."""
    import pytest

    from ddsketch_ray.stages import multimodal as mm

    if not mm._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_fake_media(b"\x89PNG\r\n\x1a\nnot-really")
        pytest.skip("PIL not available in this container")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 4), (10, 20, 30)).save(buf, format="PNG")
    kind, (w, h, c), arr = mm.decode_fake_media(buf.getvalue())
    assert (kind, w, h, c) == (mm.KIND_IMAGE, 8, 4, 3)
    assert arr.shape == (4, 8, 3) and arr[0, 0].tolist() == [10, 20, 30]


def test_streaming_service_mixed_type_keys(ray_session):
    """Mixed int/str keys in one shard must not crash the actor (ADVICE
    r1): grouping and keys() use a canonical (type, repr) ordering."""
    import numpy as np

    from ddsketch_ray.stages.streaming import StreamingSketchService

    svc = StreamingSketchService(num_shards=1)
    svc.ingest_batch([1, "1", 2, "a", 1], np.array([1.0, 2.0, 3.0, 4.0, 5.0]))
    ks = svc.keys()
    assert set(map(str, ks)) == {"1", "2", "a"} and len(ks) == 4
    assert svc.quantile(1, 0.5) > 0  # int key 1 got values 1.0 and 5.0
    svc.shutdown() if hasattr(svc, "shutdown") else None


def test_session_counts_sort_plan_matches_oracle(ray_session):
    """Block-edge stitching property test: many users spanning many
    blocks, random gaps, vs a pandas per-user oracle."""
    import ray.data as rd
    from ddsketch_ray.functions.windows import session_counts

    rng = np.random.default_rng(5)
    n = 20_000
    gap = 1000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 300, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 500_000, n), unit="us"),
        }
    )
    ds = rd.from_pandas(df).repartition(13)  # force spanning key groups
    out = (
        session_counts(ds, gap_us=gap)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    def oracle(g):
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        return 1 + int((np.diff(ts) > gap).sum())

    exp = (
        df.groupby("user_id")
        .apply(oracle, include_groups=False)
        .rename("n_sessions")
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == exp["user_id"].tolist()
    assert out["n_sessions"].tolist() == exp["n_sessions"].tolist()


def test_streaming_distributed_ingest(ray_session):
    """Multi-client ingest: map tasks push to shard actors directly;
    per-key and global quantiles match a direct sketch build."""
    import ray.data as rd
    from ddsketch_ray.sketches import DDSketch
    from ddsketch_ray.stages.streaming import StreamingSketchService

    rng = np.random.default_rng(41)
    n = 40_000
    keys = rng.integers(0, 20, n).astype(np.int64)
    vals = rng.gamma(2, 10, n)
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})).repartition(8)

    svc = StreamingSketchService(num_shards=3)
    ingested = svc.ingest_dataset_distributed(ds, "k", "v", concurrency=3)
    assert ingested == n

    for k in (0, 7, 19):
        direct = DDSketch(alpha=0.008, bin_limit=2048)
        direct.add_array(vals[keys == k])
        assert svc.quantile(int(k), 0.5) == direct.quantile(0.5)

    glob = DDSketch(alpha=0.008, bin_limit=2048)
    glob.add_array(vals)
    est = svc.global_quantile(0.95)
    exact = np.quantile(vals, 0.95)
    assert abs(est - exact) / exact < 0.01  # within sketch error


def test_streaming_ingest_retry_idempotent(ray_session):
    """A re-pushed identical batch (what a Ray task retry does) is
    ignored by the shard thanks to the content-derived token."""
    import ray
    from ddsketch_ray.stages.streaming import SketchShard, _batch_token

    shard = SketchShard.remote()
    keys = [1, 1, 2]
    vals = np.array([10.0, 20.0, 30.0])
    tok = _batch_token(keys, vals)
    ray.get(shard.add.remote(keys, vals, token=tok))
    ray.get(shard.add.remote(keys, vals, token=tok))  # "retry"
    row = ray.get(shard.snapshot.remote(1))
    from ddsketch_ray.sketches import DDSketch
    assert DDSketch.from_row(row).n == 2  # not 4

    # distinct content produces a distinct token -> ingested
    vals2 = np.array([11.0, 21.0, 31.0])
    ray.get(shard.add.remote(keys, vals2, token=_batch_token(keys, vals2)))
    assert DDSketch.from_row(ray.get(shard.snapshot.remote(1))).n == 4


def test_host_batch_edge_cases():
    import pyarrow as pa

    from ddsketch_ray.extract import host_batch

    t = pa.table(
        {
            "url": pa.array(
                [
                    "https://Host0340.example.com/p/1",
                    "http://a.b:8080/x?q=1#f",
                    "ftp://user:pw@H.io:21/z",
                    "not a url",
                    None,
                    "https://plain",
                ]
            )
        }
    )
    got = host_batch(t).column("host").to_pylist()
    assert got == ["host0340.example.com", "a.b", "h.io", None, None, "plain"]
