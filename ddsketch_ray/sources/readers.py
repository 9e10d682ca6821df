"""Sources & sinks.

Reference parity: the reference's only inputs are a one-column CSV of
doubles parsed line-by-line with ``stod`` (``/root/reference/main.cpp:
1073-1106``) and its only sinks are CSV dumps of datasets and sketch bins
(``main.cpp:208-237``, ``ddsketch.cc:908-949``). Here those become:

- ``read_values_csv``    — Ray-native CSV read of a numeric value column
  (malformed rows → null, dropped downstream with a counter — the stod
  exception path, made explicit);
- ``read_webpages``      — pruned parquet read of the north-star table;
- ``write_sketch_parquet`` / ``read_sketch_parquet`` — serialize ANY
  MergeableSketch's ``to_row`` form to a (portable, language-agnostic)
  one-row parquet file — the DDS_PrintCSV equivalent plus lossless
  round-trip, used by the checkpoint layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def read_values_csv(paths, column: str = "value"):
    """Dataset with one float64 column ``column``; unparseable entries
    become null (read as strings first, cast with safe=False semantics)."""
    import ray.data as rd
    import pyarrow.compute as pc

    ds = rd.read_csv(paths)

    def coerce(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if not pa.types.is_floating(col.type):
            # permissive parse: failures -> null (the stod error path)
            def _parse(v):
                try:
                    return float(v)
                except (TypeError, ValueError):
                    return None

            col = pa.array([_parse(v) for v in col.to_pylist()], type=pa.float64())
        else:
            col = pc.cast(col, pa.float64())
        return pa.table({column: col})

    return ds.map_batches(coerce, batch_format="pyarrow", batch_size=None)


def read_jsonl(paths, schema: pa.Schema | None = None):
    """JSONL source — the interchange format web-scale text corpora
    actually arrive in (one JSON object per line). Ray-native
    ``read_json`` (arrow JSON reader, block-parallel over files); when
    ``schema`` is given each batch is column-projected and cast to it,
    so downstream operators see the same schema as the parquet path
    (absent keys → null columns, extra keys dropped)."""
    import ray.data as rd

    ds = rd.read_json(paths)
    if schema is None:
        return ds

    def conform(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(schema.names, cols)))

    return ds.map_batches(conform, batch_format="pyarrow", batch_size=None)


def strip_schema_metadata(ds):
    """Drop schema-level metadata from every block (zero-copy map).

    Parquet written through pandas carries a ``pandas`` metadata blob in
    its Arrow schema; pyarrow 16's ``Schema.__hash__`` raises on any
    metadata ("unhashable type: 'dict'"), so Ray's schema unification
    logs ``Failed to hash the schemas (for deduplication)`` on every
    union/shuffle over such blocks and falls back to the slow unify
    path.  Stripping at the read boundary gives downstream stages a
    clean, hashable, typed schema — no behavior change."""

    def strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(strip, batch_format="pyarrow", batch_size=None)


def read_webpages(paths, columns=None, **kwargs):
    """Pruned read of the Common-Crawl-style table (BASELINE input_hint).
    Always pass ``columns`` in production — reading 4 MiB html blobs for
    a length-only pipeline is the canonical scale mistake."""
    import ray.data as rd

    return strip_schema_metadata(rd.read_parquet(paths, columns=columns, **kwargs))


def _row_to_arrays(row: dict) -> dict:
    out = {}
    for k, v in row.items():
        if isinstance(v, np.ndarray):
            out[k] = pa.array([v.tolist()], type=pa.list_(pa.from_numpy_dtype(v.dtype)))
        elif isinstance(v, dict):  # nested sketch row (e.g. HeavyHitters.cms)
            out[k] = pa.array([__import__("json").dumps({kk: vv.tolist() if isinstance(vv, np.ndarray) else vv for kk, vv in v.items()})])
        elif isinstance(v, list):
            out[k] = pa.array([v])
        else:
            out[k] = pa.array([v])
    return out


def write_sketch_parquet(sketch, path: str) -> str:
    """Persist a sketch's Arrow-friendly ``to_row`` form (one-row parquet).
    Language-agnostic: keys/counts/registers are plain list columns."""
    row = sketch.to_row()
    pq.write_table(pa.table(_row_to_arrays(row)), path)
    return path


_KIND_REGISTRY = None


def _registry():
    global _KIND_REGISTRY
    if _KIND_REGISTRY is None:
        from ddsketch_ray.sketches import (
            BloomFilter,
            CountMin,
            DDSketch,
            HeavyHitters,
            HyperLogLog,
            KLL,
            MinHashSketch,
            TDigest,
        )

        _KIND_REGISTRY = {
            "ddsketch": DDSketch,
            "hll": HyperLogLog,
            "countmin": CountMin,
            "heavy_hitters": HeavyHitters,
            "bloom": BloomFilter,
            "tdigest": TDigest,
            "kll": KLL,
            "minhash": MinHashSketch,
        }
    return _KIND_REGISTRY


def read_sketch_parquet(path: str):
    """Load a sketch written by write_sketch_parquet (dispatch on 'kind')."""
    import json

    t = pq.read_table(path)
    row = {}
    for name in t.column_names:
        v = t.column(name)[0].as_py()
        if isinstance(v, str) and name == "cms":
            v = json.loads(v)
        row[name] = v
    cls = _registry()[row["kind"]]
    return cls.from_row(row)


def read_csv_table(paths, schema: pa.Schema | None = None):
    """General CSV table source (the reference reads single-column CSV —
    ``read_values_csv``; this is the full-table counterpart): Ray-native
    block-parallel arrow CSV reader, plus the same schema conformance
    contract as ``read_jsonl`` (project/cast/null-fill) so CSV, JSONL
    and parquet inputs are interchangeable."""
    import ray.data as rd

    ds = rd.read_csv(paths)
    if schema is None:
        return ds

    def conform(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(schema.names, cols)))

    return ds.map_batches(conform, batch_format="pyarrow", batch_size=None)
