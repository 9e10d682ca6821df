"""per_key_rank / cap_per_key vs a pandas ROW_NUMBER oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.keyrank import cap_per_key, per_key_rank


def _mk(n=20_000, n_keys=50, dominant_frac=0.55, seed=3):
    """Random (key, order, id) rows with ONE dominant key holding >half
    the rows — after the distributed sort it spans several blocks, so
    the cross-block base-offset stitch is exercised, not just in-block
    ranking."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(1, n_keys, size=n)
    keys[: int(n * dominant_frac)] = 0  # dominant key
    order = rng.integers(0, 1000, size=n)  # heavy ties -> id tiebreak
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame(
        {"host": [f"h{k:03d}" for k in keys], "o": order.astype(np.int64), "id": ids}
    )
    return df.sample(frac=1.0, random_state=1).reset_index(drop=True)


def _oracle(df):
    d = df.sort_values(["host", "o", "id"]).copy()
    d["key_rank"] = d.groupby("host").cumcount() + 1
    return d.set_index("id")["key_rank"]


def test_per_key_rank_matches_pandas(ray_session):
    df = _mk()
    ds = rd.from_pandas(df).repartition(13)
    out = per_key_rank(ds, "host", "o", "id").to_pandas().set_index("id")["key_rank"]
    exp = _oracle(df)
    assert len(out) == len(exp)
    pd.testing.assert_series_equal(out.sort_index(), exp.sort_index())


def test_cap_per_key(ray_session):
    df = _mk(n=5_000, n_keys=10)
    ds = rd.from_pandas(df).repartition(7)
    kept = cap_per_key(ds, "host", "o", "id", n=25).to_pandas()
    exp = _oracle(df)
    assert (kept.key_rank <= 25).all()
    assert set(kept.id) == set(exp[exp <= 25].index)


def test_per_key_rank_rejects_null_keys(ray_session):
    df = pd.DataFrame({"host": ["a", None], "o": [1, 2], "id": [1, 2]})
    ds = rd.from_pandas(df)
    with pytest.raises(Exception, match="null keys"):
        per_key_rank(ds, "host", "o", "id").materialize()
