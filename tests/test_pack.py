import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.pack import exclusive_offsets, pack_sequences


def _mk(df: pd.DataFrame, blocks: int):
    return rd.from_pandas(df).repartition(blocks)


def _ref(df: pd.DataFrame) -> pd.DataFrame:
    o = df.sort_values("doc_id").reset_index(drop=True)
    o["offset"] = o["n"].cumsum().shift(1, fill_value=0).astype(np.int64)
    return o


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_exclusive_offsets_matches_pandas(ray_session, blocks):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(200).astype(np.int64),
            "n": rng.integers(0, 50, 200).astype(np.int64),
        }
    )
    out = (
        exclusive_offsets(_mk(df, blocks), "doc_id", "n")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _ref(df)[["doc_id", "n", "offset"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_exclusive_offsets_zero_and_blockwide_runs(ray_session):
    # zero-count rows and a whole block of zeros must not shift offsets
    df = pd.DataFrame(
        {"doc_id": np.arange(30, dtype=np.int64), "n": np.r_[np.zeros(10, np.int64), np.arange(20)]}
    )
    out = (
        exclusive_offsets(_mk(df, 5), "doc_id", "n")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _ref(df)[["doc_id", "n", "offset"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_exclusive_offsets_rejects_nulls_and_negatives(ray_session):
    bad = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, None], pa.int64()), "n": pa.array([1, 2], pa.int64())})
    )
    with pytest.raises(Exception):
        exclusive_offsets(bad, "doc_id", "n").to_pandas()
    neg = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "n": pa.array([1, -2], pa.int64())})
    )
    with pytest.raises(Exception):
        exclusive_offsets(neg, "doc_id", "n").to_pandas()


def test_pack_sequences_boundaries(ray_session):
    # L=10: doc sizes chosen to hit exact-boundary, spanning, and empty cases
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "n": np.array([10, 5, 0, 7, 20, 1], dtype=np.int64),
        }
    )
    out = (
        pack_sequences(_mk(df, 3), "doc_id", "n", seq_len=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # offsets: 0,10,15,15,22,42
    assert out["tok_start"].tolist() == [0, 10, 15, 15, 22, 42]
    assert out["seq_first"].tolist() == [0, 1, 1, 1, 2, 4]
    # doc0 fills seq0 exactly; doc2 is empty (0 seqs); doc3 spans 1→2; doc4 spans 2..4
    assert out["n_seqs"].tolist() == [1, 1, 0, 2, 3, 1]


@pytest.mark.parametrize("blocks", [1, 4])
def test_pack_sequences_matches_sql_shape(ray_session, blocks):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(120).astype(np.int64),
            "n": rng.integers(0, 40, 120).astype(np.int64),
        }
    )
    L = 16
    out = (
        pack_sequences(_mk(df, blocks), "doc_id", "n", seq_len=L)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _ref(df)
    first = ref["offset"] // L
    nseq = np.where(ref["n"] == 0, 0, (ref["offset"] + np.maximum(ref["n"], 1) - 1) // L - first + 1)
    assert out["tok_start"].tolist() == ref["offset"].tolist()
    assert out["seq_first"].tolist() == first.tolist()
    assert out["n_seqs"].tolist() == nseq.tolist()


@pytest.mark.parametrize("blocks", [1, 3, 7])
@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_matches_row_number(ray_session, blocks, descending):
    from ddsketch_ray.functions.pack import global_rank

    rng = np.random.default_rng(17)
    # heavy duplicate values so runs span blocks
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(400).astype(np.int64),
            "score": rng.integers(0, 12, 400).astype(np.int64),
        }
    )
    out = (
        global_rank(_mk(df, blocks), "score", "doc_id", descending=descending)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["score", "doc_id"], ascending=[not descending, True]).reset_index(drop=True)
    ref["rank"] = np.arange(1, len(ref) + 1, dtype=np.int64)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert out["rank"].tolist() == ref["rank"].tolist()
    assert out["score"].tolist() == ref["score"].tolist()


def test_global_rank_string_values_and_null_raise(ray_session):
    from ddsketch_ray.functions.pack import global_rank

    df = pd.DataFrame(
        {"doc_id": np.arange(6, dtype=np.int64), "w": ["b", "a", "c", "a", "b", "a"]}
    )
    out = (
        global_rank(_mk(df, 3), "w", "doc_id")
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out["w"].tolist() == ["a", "a", "a", "b", "b", "c"]
    assert out[out.w == "a"]["doc_id"].tolist() == [1, 3, 5]
    bad = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "w": pa.array(["x", None])})
    )
    with pytest.raises(Exception):
        global_rank(bad, "w", "doc_id").to_pandas()


@pytest.mark.parametrize("blocks", [1, 4])
def test_pack_manifest_invariants(ray_session, blocks):
    from ddsketch_ray.functions.pack import pack_manifest

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(150).astype(np.int64),
            "n": rng.integers(0, 40, 150).astype(np.int64),
        }
    )
    L = 16
    out = pack_manifest(_mk(df, blocks), "doc_id", "n", L).to_pandas()
    # per-doc take_n sums to its token count (zero-token docs absent)
    per_doc = out.groupby("doc_id")["take_n"].sum()
    ref = df.set_index("doc_id")["n"]
    for d, s in per_doc.items():
        assert s == ref[d]
    assert set(ref[ref > 0].index) == set(per_doc.index)
    # per-seq take_n sums to L except the last sequence
    per_seq = out.groupby("seq_id")["take_n"].sum().sort_index()
    total = int(ref.sum())
    assert (per_seq.iloc[:-1] == L).all()
    assert per_seq.iloc[-1] == total - L * (len(per_seq) - 1)
    # slices tile each sequence without overlap
    for sid, g in out.groupby("seq_id"):
        g = g.sort_values("seq_off")
        pos = 0
        for _, r in g.iterrows():
            assert r["seq_off"] == pos
            pos += r["take_n"]


def test_exclusive_offsets_duplicate_ids_raise(ray_session):
    from ddsketch_ray.functions.pack import exclusive_offsets

    df = pd.DataFrame({"doc_id": np.array([1, 2, 2, 3], dtype=np.int64),
                       "n": np.ones(4, dtype=np.int64)})
    with pytest.raises(Exception):
        exclusive_offsets(_mk(df, 2), "doc_id", "n").to_pandas()
