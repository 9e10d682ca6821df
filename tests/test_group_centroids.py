import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ddsketch_ray.functions.cluster import group_centroids


def _mk(n=300, d=8, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "label": rng.integers(0, 4, n).astype(np.int64),
            "embedding": list(rng.normal(size=(n, d)).astype(np.float32)),
        }
    )


def test_group_centroids_matches_reference_and_layouts(ray_session):
    df = _mk()
    outs = []
    for blocks in (1, 5):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(group_centroids(ds, "label"))
    # bit-identical across layouts (fixed-point partials)
    for a, b in zip(outs[0]["centroid"], outs[1]["centroid"]):
        assert a == b
    assert outs[0]["n"].tolist() == outs[1]["n"].tolist()
    # matches the sequential fixed-point reference
    scale = float(1 << 20)
    for _, row in outs[0].iterrows():
        X = np.stack(df[df.label == row["label"]]["embedding"].to_numpy()).astype(np.float64)
        fp = np.rint(X * scale).astype(np.int64).sum(axis=0)
        want = [float(x) / (scale * len(X)) for x in fp]
        assert row["centroid"] == want
        # and is within fixed-point quantization of the true float mean
        assert np.allclose(row["centroid"], X.mean(axis=0), atol=1e-5)


def test_group_centroids_drops_nulls(ray_session):
    t = pa.table(
        {
            "label": pa.array([1, 1, None, 2], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0], None],
                                  pa.list_(pa.float32())),
        }
    )
    out = group_centroids(rd.from_arrow(t), "label")
    assert out["label"].tolist() == [1]
    assert out["centroid"].iloc[0] == [2.0, 3.0]


def test_top_tokens_by_group(ray_session):
    from ddsketch_ray.functions.text import top_tokens_by_group

    df = pd.DataFrame(
        {
            "lang": ["en"] * 4 + ["de"] * 3,
            "text": [
                "the cat sat", "the dog", "the cat", "a cat",
                "der hund", "der hund bellt", "die katze",
            ],
        }
    )
    outs = []
    for blocks in (1, 4):
        out = (
            top_tokens_by_group(rd.from_pandas(df).repartition(blocks), "lang", 2)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    en = outs[0][outs[0].lang == "en"]
    assert en["tok"].tolist() == ["cat", "the"]  # tie (3,3) broken by tok asc
    assert en["n_occ"].tolist() == [3, 3]
    de = outs[0][outs[0].lang == "de"]
    assert de["tok"].tolist() == ["der", "hund"]
    assert de["n_occ"].tolist() == [2, 2]


def test_normalize_text_batch_stages(ray_session):
    import pyarrow as pa
    from ddsketch_ray.functions.text import normalize_text_batch

    decomposed = "E\u0301cole"  # E + combining acute (decomposed)
    t = pa.table({"text": [decomposed, "  A \t B\n\nC ", None, ""]})
    out = normalize_text_batch(t).column("norm_text").to_pylist()
    assert out == ["\u00e9cole", "a b c", None, ""]  # composed e-acute, lowered
    # stages independently switchable
    raw = normalize_text_batch(t, nfc=False, lowercase=False, collapse_ws=False)
    assert raw.column("norm_text").to_pylist() == t.column("text").to_pylist()
