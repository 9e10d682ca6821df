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
