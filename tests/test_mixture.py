import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ddsketch_ray.functions.sampling import mixture_rates, resample_to_mixture
from ddsketch_ray.hashing import hash_ints


def test_mixture_rates_math():
    # group b is the binding constraint: T = min(1000*3//2, 100*3//1) = 300
    T, r = mixture_rates({"a": 1000, "b": 100}, [("a", 2), ("b", 1)])
    assert T == 300
    assert r == {"a": 300 * 2 * 1_000_000 // (3 * 1000), "b": 1_000_000}
    # exact-fit corpus: every rate 1e6
    T, r = mixture_rates({"a": 200, "b": 100}, [("a", 2), ("b", 1)])
    assert T == 300 and r == {"a": 1_000_000, "b": 1_000_000}


def test_mixture_rates_rejects_missing_group_and_bad_weights():
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, [("a", 1), ("zz", 1)])
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, [("a", 0)])


def _df(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], n, p=[0.7, 0.2, 0.1]),
        }
    )


@pytest.mark.parametrize("blocks", [1, 6])
def test_resample_matches_external_recompute(ray_session, blocks):
    df = _df()
    weights = [("en", 1), ("de", 1)]  # fr dropped entirely
    out = (
        resample_to_mixture(rd.from_pandas(df).repartition(blocks), "doc_id", "lang", weights)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    counts = df["lang"].value_counts().to_dict()
    _, rates = mixture_rates(counts, weights)
    h = hash_ints(df["doc_id"].to_numpy(), 0) % np.uint64(1_000_000)
    keep = h.astype(np.int64) < df["lang"].map(lambda g: rates.get(g, 0)).to_numpy()
    want = df[keep].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)
    assert (out["lang"] != "fr").all()
    # kept mixture is close to 50/50 (hash-Bernoulli noise at ~600/group)
    vc = out["lang"].value_counts()
    assert abs(vc["en"] - vc["de"]) / max(vc["en"], vc["de"]) < 0.2


def test_resample_layout_invariance(ray_session):
    df = _df(n=1200, seed=9)
    weights = [("en", 3), ("de", 1), ("fr", 1)]
    outs = []
    for blocks in (1, 5):
        outs.append(
            resample_to_mixture(
                rd.from_pandas(df).repartition(blocks), "doc_id", "lang", weights
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_stratified_sample_exact_k(ray_session):
    from ddsketch_ray.functions.sampling import stratified_sample
    from ddsketch_ray.hashing import hash_ints

    df = _df(n=2000, seed=13)
    outs = []
    for blocks in (1, 6):
        out = (
            stratified_sample(rd.from_pandas(df).repartition(blocks), "lang", "doc_id", 7)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        outs.append(out)
        assert (out.groupby("lang").size() == 7).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # external recompute: bottom-7 ids per lang by SplitMix64 order
    h = hash_ints(df["doc_id"].to_numpy(), 0)
    ref = df.assign(h=h).sort_values(["lang", "h", "doc_id"])
    ref["rank"] = ref.groupby("lang").cumcount() + 1
    ref = ref[ref["rank"] <= 7]
    want = ref.sort_values(["lang", "rank"])["doc_id"].tolist()
    assert outs[0]["doc_id"].tolist() == want


def test_stratified_sample_small_group(ray_session):
    from ddsketch_ray.functions.sampling import stratified_sample

    df = pd.DataFrame(
        {"doc_id": np.arange(12, dtype=np.int64), "lang": ["en"] * 10 + ["zz"] * 2}
    )
    out = stratified_sample(rd.from_pandas(df).repartition(3), "lang", "doc_id", 5).to_pandas()
    sz = out.groupby("lang").size()
    assert sz["en"] == 5 and sz["zz"] == 2


def test_pivot_rollup_counts_and_sums(ray_session):
    from ddsketch_ray.functions.analytics import pivot_rollup

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 500),
            "p": rng.choice(["x", "y", "z"], 500),
            "v": rng.integers(0, 50, 500).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = pivot_rollup(ds, "g", "p", ["x", "y"]).to_pandas()
    want = (
        df.assign(n_x=(df.p == "x").astype(int), n_y=(df.p == "y").astype(int))
        .groupby("g", as_index=False)[["n_x", "n_y"]]
        .sum()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.astype({"n_x": np.int64, "n_y": np.int64}), want)
    outs = pivot_rollup(ds, "g", "p", ["x", "y"], sum_col="v").to_pandas()
    wants = (
        df.assign(n_x=df.v.where(df.p == "x", 0), n_y=df.v.where(df.p == "y", 0))
        .groupby("g", as_index=False)[["n_x", "n_y"]]
        .sum()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(outs.astype({"n_x": np.int64, "n_y": np.int64}), wants)


def test_resample_token_weighted(ray_session):
    from ddsketch_ray.functions.sampling import mixture_rates, resample_to_mixture
    from ddsketch_ray.hashing import hash_ints

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype=np.int64),
            "lang": rng.choice(["en", "de"], 3000, p=[0.8, 0.2]),
            "n_tokens": rng.integers(1, 400, 3000).astype(np.int64),
        }
    )
    weights = [("en", 1), ("de", 1)]
    out = (
        resample_to_mixture(
            rd.from_pandas(df).repartition(5), "doc_id", "lang", weights,
            weight_col="n_tokens",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # external recompute on token sums
    sums = df.groupby("lang")["n_tokens"].sum().to_dict()
    _, rates = mixture_rates(sums, weights)
    h = hash_ints(df["doc_id"].to_numpy(), 0) % np.uint64(1_000_000)
    keep = h.astype(np.int64) < df["lang"].map(rates).to_numpy()
    want = df[keep].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)
    # kept TOKEN mass is ~50/50 (Bernoulli noise)
    ts = out.groupby("lang")["n_tokens"].sum()
    assert abs(ts["en"] - ts["de"]) / max(ts["en"], ts["de"]) < 0.15


def test_equiwidth_histogram(ray_session):
    from ddsketch_ray.functions.analytics import equiwidth_histogram

    df = pd.DataFrame({"v": [0.0, 0.5, 0.999, 1.0, 5.0, 9.999, 10.0, -3.0, np.nan]})
    out = equiwidth_histogram(rd.from_pandas(df).repartition(3), "v", 0.0, 10.0, 10)
    got = dict(zip(out.column("bin").to_pylist(), out.column("n").to_pylist()))
    # bins: 0 -> {0,0.5,0.999}, 1 -> {1.0}, 5 -> {5.0}, 9 -> {9.999},
    # overflow(10) -> {10.0, nan}, underflow(-1) -> {-3.0}
    assert got == {-1: 1, 0: 3, 1: 1, 5: 1, 9: 1, 10: 2}
