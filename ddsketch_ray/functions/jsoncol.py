"""Semi-structured (JSON string) column extraction.

Web-scale event logs and crawl metadata carry JSON side-columns (the
``events.props`` column here; WARC metadata, page headers in practice).
The engine treats them as opaque strings everywhere else; this module
projects typed columns OUT of them so the rest of the pipeline stays
columnar — extraction is one vectorized polars ``str.json_path_match``
(Rust simd-json) per requested field inside ``map_batches``; no Python
``json.loads`` per row anywhere.

A capability gap of the reference (gmorleo/DDSketch is a pure numeric
sketch — SURVEY.md §2.3); the operator family belongs to the
training-data-pipeline set the driver instructions require.

Semantics match SQL ``json_extract_string(col, path)`` + ``CAST``:
missing key, invalid JSON, or null input → null; a failed numeric cast
→ null (polars ``cast(strict=False)``, DuckDB ``TRY_CAST``).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

_CASTS = {
    "int64": pl.Int64,
    "float64": pl.Float64,
    "string": pl.String,
    "bool": pl.Boolean,
}


def json_extract_batch(
    t: pa.Table, col: str, fields: dict[str, tuple[str, str]], keep: bool = False
) -> pa.Table:
    """Extract ``fields`` = {out_name: (json_path, dtype)} from the JSON
    string column ``col``. dtype ∈ {int64, float64, string, bool}.
    Appends the typed columns; drops ``col`` unless ``keep``."""
    s = pl.from_arrow(t.column(col).combine_chunks().cast(pa.large_string()))
    if isinstance(s, pl.DataFrame):  # from_arrow(Table) vs (Array)
        s = s.to_series()
    out = t.drop_columns([col]) if not keep else t
    for name, (path, dtype) in fields.items():
        if dtype not in _CASTS:
            raise ValueError(f"unsupported dtype {dtype!r}")
        extracted = s.str.json_path_match(path)
        if dtype == "bool":
            # JSON booleans arrive as "true"/"false" strings
            typed = extracted.replace_strict(
                {"true": True, "false": False}, default=None, return_dtype=pl.Boolean
            )
        else:
            typed = extracted.cast(_CASTS[dtype], strict=False)
        arr = typed.to_arrow()
        if dtype == "string":
            arr = arr.cast(pa.string())
        out = out.append_column(name, arr)
    return out


def flatten_json_column(ds, col: str, fields: dict[str, tuple[str, str]], keep: bool = False):
    """Dataset-level wrapper: one streaming map_batches, zero shuffles."""
    from functools import partial

    return ds.map_batches(
        partial(json_extract_batch, col=col, fields=fields, keep=keep),
        batch_format="pyarrow",
        batch_size=None,
    )


def json_key_stats(ds, col: str):
    """Schema discovery for a JSON string column: how often does each
    TOP-LEVEL key appear — the first question against an unknown
    crawl-metadata column, answered without parsing objects into Python.
    Keys are pulled with one vectorized Rust regex per batch
    (``"key"␣*:`` occurrences at any nesting depth — documented
    approximation: nested keys count too, exactly like the SQL oracle's
    ``regexp_extract_all``), pre-aggregated per block, then the
    high-cardinality sort-plan rollup. Returns a Dataset
    (key, n_occ:int64)."""
    from ddsketch_ray.functions.analytics import sorted_sum_rollup

    def partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column(col).combine_chunks().cast(pa.large_string()))
        keys = s.fill_null("").str.extract_all(r'"([^"]+)"\s*:')
        df = pl.DataFrame({"k": keys}).explode("k").drop_nulls()
        # strip the quotes/colon the match carries
        df = df.with_columns(pl.col("k").str.extract(r'"([^"]+)"', 1))
        g = df.group_by("k").agg(n_occ=pl.len().cast(pl.Int64))
        return pa.table(
            {
                "key": g["k"].to_arrow().cast(pa.string()),
                "n_occ": pa.array(g["n_occ"].to_numpy(), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return sorted_sum_rollup(partials, "key", ["n_occ"])
