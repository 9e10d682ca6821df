import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ddsketch_ray.functions.ml import logreg_fit


def _blob(n=2000, seed=11):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 2 * X[:, 1] + 0.2 > 0).astype(np.int64)
    return pd.DataFrame({"f0": X[:, 0], "f1": X[:, 1], "y": y})


def test_logreg_separates_and_is_layout_invariant(ray_session):
    df = _blob()
    fits = []
    for blocks in (1, 6):
        ds = rd.from_pandas(df).repartition(blocks)
        fits.append(logreg_fit(ds, ["f0", "f1"], "y", iters=30, lr=0.5))
    # bit-identical across layouts
    assert (fits[0]["weights"] == fits[1]["weights"]).all()
    assert fits[0]["bias"] == fits[1]["bias"]
    assert fits[0]["loss"] == fits[1]["loss"]
    # recovers the separating direction (w1/w0 ~ 2) and classifies well
    w = fits[0]["weights"]
    assert w[1] / w[0] == pytest.approx(2.0, rel=0.3)
    z = df[["f0", "f1"]].to_numpy() @ w + fits[0]["bias"]
    acc = ((z > 0).astype(int) == df["y"]).mean()
    assert acc > 0.95
    assert fits[0]["loss"] < 0.4


def test_logreg_matches_sequential_reference(ray_session):
    # the distributed fixed-point iteration == a sequential recompute of
    # the same fixed-point math
    df = _blob(400, seed=3)
    out = logreg_fit(rd.from_pandas(df).repartition(4), ["f0", "f1"], "y", iters=5, lr=0.5)
    scale = float(1 << 20)
    X, y = df[["f0", "f1"]].to_numpy(), df["y"].to_numpy().astype(np.float64)
    w = np.zeros(3)
    for _ in range(5):
        z = X @ w[:2] + w[2]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        gx = np.rint(r[:, None] * X * scale).astype(np.int64).sum(axis=0)
        gb = np.rint(r * scale).astype(np.int64).sum()
        g = np.r_[gx, gb].astype(np.float64) / scale
        w = w - 0.5 * g / len(df)
    assert (out["weights"] == w[:2]).all() and out["bias"] == w[2]


def test_logreg_empty_raises(ray_session):
    import pyarrow as pa

    empty = rd.from_arrow(
        pa.table({"f0": pa.array([], pa.float64()), "y": pa.array([], pa.int64())})
    )
    with pytest.raises(Exception):
        logreg_fit(empty, ["f0"], "y", iters=1)


def test_logreg_checkpoint_resume_bit_identical(ray_session, tmp_path):
    import shutil

    from ddsketch_ray.functions.ml import logreg_fit_checkpointed

    df = _blob(600, seed=5)
    ds = rd.from_pandas(df).repartition(3)
    cold_dir = str(tmp_path / "cold")
    cold = logreg_fit_checkpointed(ds, cold_dir, ["f0", "f1"], "y", iters=8, lr=0.5)
    assert cold["resumed_from_iteration"] == 0 and cold["iterations_run"] == 8
    # run 5 iters, then resume to 8 — must equal the cold 8-iter run bitwise
    part_dir = str(tmp_path / "part")
    logreg_fit_checkpointed(ds, part_dir, ["f0", "f1"], "y", iters=5, lr=0.5)
    resumed = logreg_fit_checkpointed(ds, part_dir, ["f0", "f1"], "y", iters=8, lr=0.5)
    assert resumed["resumed_from_iteration"] == 5 and resumed["iterations_run"] == 3
    assert (resumed["weights"] == cold["weights"]).all()
    assert resumed["bias"] == cold["bias"] and resumed["loss"] == cold["loss"]
    # param mismatch refuses
    import pytest as _pytest

    with _pytest.raises(ValueError):
        logreg_fit_checkpointed(ds, part_dir, ["f0", "f1"], "y", iters=8, lr=0.9)
    # completed run re-invoked: zero work
    again = logreg_fit_checkpointed(ds, part_dir, ["f0", "f1"], "y", iters=8, lr=0.5)
    assert again["iterations_run"] == 0 and (again["weights"] == cold["weights"]).all()
