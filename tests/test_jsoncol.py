"""JSON-column extraction + JSONL source."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_json_extract_batch_types_and_nulls():
    from ddsketch_ray.functions.jsoncol import json_extract_batch

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "props": pa.array(
                [
                    '{"k": 69, "f": 1.5, "s": "hi", "b": true}',
                    '{"k": -3, "b": false}',
                    None,
                    "not json at all",
                    '{"k": "not-an-int", "s": ""}',
                ]
            ),
        }
    )
    out = json_extract_batch(
        t,
        "props",
        {
            "k": ("$.k", "int64"),
            "f": ("$.f", "float64"),
            "s": ("$.s", "string"),
            "b": ("$.b", "bool"),
        },
    )
    assert "props" not in out.column_names
    assert out.column("k").to_pylist() == [69, -3, None, None, None]
    assert out.column("f").to_pylist() == [1.5, None, None, None, None]
    assert out.column("s").to_pylist() == ["hi", None, None, None, ""]
    assert out.column("b").to_pylist() == [True, False, None, None, None]
    # keep=True retains the source column
    kept = json_extract_batch(t, "props", {"k": ("$.k", "int64")}, keep=True)
    assert "props" in kept.column_names


def test_json_extract_rejects_bad_dtype():
    from ddsketch_ray.functions.jsoncol import json_extract_batch

    t = pa.table({"props": pa.array(['{"k":1}'])})
    with pytest.raises(ValueError):
        json_extract_batch(t, "props", {"k": ("$.k", "decimal")})


def test_flatten_json_column_dataset(ray_session):
    import ray.data as rd
    from ddsketch_ray.functions.jsoncol import flatten_json_column

    df = pd.DataFrame(
        {"id": np.arange(100, dtype=np.int64), "props": ['{"k": %d}' % i for i in range(100)]}
    )
    ds = rd.from_pandas(df, override_num_blocks=4)
    out = flatten_json_column(ds, "props", {"k": ("$.k", "int64")}).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert (out["k"].to_numpy() == np.arange(100)).all()


def test_read_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from ddsketch_ray.sources.readers import read_jsonl

    df = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "lang": ["en", "fr"] * 25,
            "text": [f"line one\nline\ttwo {i} — ünïcode" for i in range(50)],
        }
    )
    p1, p2 = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    df.iloc[:30].to_json(p1, orient="records", lines=True)
    df.iloc[30:].to_json(p2, orient="records", lines=True)
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string()), ("absent", pa.float64())]
    )
    out = read_jsonl([str(p1), str(p2)], schema=schema).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "lang", "text", "absent"]
    assert (out["doc_id"].to_numpy() == df["doc_id"].to_numpy()).all()
    assert (out["text"] == df["text"]).all()  # escapes survive the round trip
    assert out["absent"].isna().all()


def test_json_key_stats(ray_session):
    import ray.data as rd

    from ddsketch_ray.functions.jsoncol import json_key_stats

    rows = [
        {"j": '{"a": 1, "b": {"c": 2}}'},
        {"j": '{"a": 5}'},
        {"j": None},
        {"j": "not json"},
    ]
    out = (
        json_key_stats(rd.from_items(rows).repartition(2), "j")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    got = dict(zip(out["key"], out["n_occ"]))
    assert got == {"a": 2, "b": 1, "c": 1}
