"""Declarative validation suite (functions/validate.py) — every rule's
count equals the SQL-semantics count computed driver-side in pandas,
including null handling (nulls violate not_null only), the sort-plan
unique count, and the Bloom-anti referential check."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ddsketch_ray.functions.validate import validate_table


@pytest.fixture(scope="module")
def frame(ray_session):
    import ray.data as rd

    n = 20_000
    rng = np.random.default_rng(9)
    ids = list(range(n))
    ids[7] = 8
    ids[901] = None  # one dup pair + one null
    vals = rng.integers(-10, 200, n)
    cat = [None if i % 400 == 0 else ("ok" if i % 5 else "BAD!") for i in range(n)]
    fk = [None if i % 777 == 0 else int(v) for i, v in enumerate(rng.integers(0, 500, n))]
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "v": pa.array(vals, pa.int64()),
            "cat": pa.array(cat, pa.string()),
            "fk": pa.array(fk, pa.int64()),
        }
    )
    ref = rd.from_arrow(pa.table({"k": pa.array(range(0, 500, 2), pa.int64())}))
    return rd.from_arrow(tbl).repartition(7), tbl.to_pandas(), ref


def test_all_rules_match_sql_semantics(frame):
    ds, df, ref = frame
    rules = [
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
        {"rule": "in_range", "col": "v", "lo": 0, "hi": 150},
        {"rule": "positive", "col": "v"},
        {"rule": "regex", "col": "cat", "pattern": "^[a-z]+$"},
        {"rule": "in_set", "col": "cat", "values": ["ok"]},
        {"rule": "ref", "col": "fk", "ref_col": "k"},
    ]
    out = validate_table(ds, rules, refs={6: ref}).to_pandas()
    evens = set(range(0, 500, 2))
    want = [
        int(df["id"].isna().sum()),
        int(df["id"].notna().sum() - df["id"].dropna().nunique()),
        int(((df["v"] < 0) | (df["v"] > 150)).sum()),
        int((df["v"] <= 0).sum()),
        int((df["cat"].notna() & ~df["cat"].str.contains("^[a-z]+$", regex=True, na=False)).sum()),
        int((df["cat"].notna() & ~df["cat"].isin(["ok"])).sum()),
        int((df["fk"].notna() & ~df["fk"].isin(evens)).sum()),
    ]
    assert out["n_violations"].tolist() == want
    assert out["rule_id"].tolist() == list(range(7))
    # the synthetic frame genuinely violates every rule
    assert all(n > 0 for n in want)


def test_clean_table_reports_zero(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"a": pa.array([1, 2, 3], pa.int64()), "s": pa.array(["x", "y", "z"])})
    )
    out = validate_table(
        ds,
        [
            {"rule": "not_null", "col": "a"},
            {"rule": "unique", "col": "a"},
            {"rule": "positive", "col": "a"},
            {"rule": "regex", "col": "s", "pattern": "^[a-z]$"},
        ],
    ).to_pandas()
    assert (out["n_violations"] == 0).all()


def test_errors(frame):
    ds, _, _ = frame
    with pytest.raises(ValueError, match="unknown rule"):
        validate_table(ds, [{"rule": "bogus", "col": "id"}])
    with pytest.raises(ValueError, match="reference Dataset"):
        validate_table(ds, [{"rule": "ref", "col": "fk", "ref_col": "k"}])


def test_sample_violations_lowest_ids(frame):
    import ray.data as rd  # noqa: F401

    from ddsketch_ray.functions.validate import sample_violations

    ds, df, _ = frame
    got = sample_violations(
        ds, {"rule": "in_range", "col": "v", "lo": 0, "hi": 150}, "id", k=7,
        extra_cols=("cat",),
    ).to_pandas()
    bad = df[(df["v"] < 0) | (df["v"] > 150)].dropna(subset=["id"])
    want = bad.sort_values("id").head(7)[["id", "v", "cat"]].reset_index(drop=True)
    got["id"] = got["id"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want.astype({"id": np.int64}))
    # not_null: the violating rows carry the null value itself
    nulls = sample_violations(ds, {"rule": "not_null", "col": "id"}, "v", k=5).to_pandas()
    assert nulls["id"].isna().all()
    # non-row-local rules are rejected
    with pytest.raises(ValueError, match="row-local"):
        sample_violations(ds, {"rule": "unique", "col": "id"}, "id")
