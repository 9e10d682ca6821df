"""Sketch cube: persist per-cell mergeable sketch partials ONCE, then
serve any rollup — slice, dice, rolling time window — by MERGING cells,
never re-reading raw data.

This is the materialized-aggregate pattern the north rule's mergeable
UDAFs exist for: a (lang × day) cube over 10^12 web pages is a few MB
of sketch bytes while the corpus is 100 TB; every dashboard question
(distinct users for one type, any 7-day window, a quarter roll-up)
becomes a merge over a handful of KB-sized cells. Correctness comes
from merge algebra, not re-aggregation:

- HLL cells merge by register max — the merged sketch is BIT-IDENTICAL
  to a direct build over the union rows (tested), so a cube answer
  equals the raw-data answer exactly;
- DDSketch cells with a shared α and no collapse merge by bucket-count
  addition — again bit-identical to direct (tested); with collapse the
  standard DDSketch merge guarantee applies instead;
- any `sketches/` type works: the cube stores the aggregate's raw
  serialized bytes (`DDSketchAgg(qs=None)`, `HLLAgg(raw=True)`,
  `KMVAgg`, `MomentsAgg`, `DyadicCMAgg`, ... — everything whose
  finalize returns the pickled sketch).

Layout: one parquet directory of (dim..., sketch:binary) rows, sorted
by dims (row-group pruning on dim predicates), plus a manifest JSON
recording dims / sketch column / cell count. Query path: pruned read →
per-block partial merge (map_batches) → driver merges O(blocks) bytes.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MANIFEST = "_cube_manifest.json"


def write_sketch_cube(ds, dims: list[str], agg, out_dir: str) -> dict:
    """Build and persist the cube: ``groupby(dims).aggregate(agg)`` →
    sorted parquet of (dims..., <agg alias>: binary) + manifest.

    ``agg`` must be a sketch aggregate whose finalize returns the
    serialized sketch bytes (see module docstring). Returns the
    manifest dict. Overwrites ``out_dir``."""
    dims = list(dims)
    if not dims:
        raise ValueError("cube needs at least one dim column")
    name = agg.name if isinstance(getattr(agg, "name", None), str) else agg._name
    cells = ds.groupby(dims).aggregate(agg)

    def to_binary(t: pa.Table) -> pa.Table:
        cols = {d: t.column(d) for d in dims}
        sk = t.column(name)
        if not pa.types.is_binary(sk.type) and not pa.types.is_large_binary(sk.type):
            sk = sk.cast(pa.binary())
        cols["sketch"] = sk
        return pa.table(cols)

    cells = cells.map_batches(to_binary, batch_format="pyarrow", batch_size=None)
    # one sort: clusters each dim value into few row groups so dim
    # predicates prune at the read (the sorted-layout rule, CLAUDE.md)
    cells = cells.sort(dims)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    cells.write_parquet(out_dir)
    import pyarrow.dataset as pads

    n_cells = int(
        pads.dataset(
            [os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")]
        ).count_rows()
    )
    manifest = {"dims": dims, "sketch_col": "sketch", "n_cells": n_cells}
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_cube_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        return json.load(f)


def _where_expr(where: dict | None):
    if not where:
        return None
    expr = None
    for col, vals in where.items():
        if not isinstance(vals, (list, tuple, set, np.ndarray)):
            vals = [vals]
        e = pc.field(col).isin(list(vals))
        expr = e if expr is None else (expr & e)
    return expr


def query_sketch_cube(out_dir: str, where: dict | None = None):
    """Merge every cell matching ``where`` ({dim: value-or-list}) into
    one sketch. Pruned parquet read → per-block merge → the driver sees
    O(blocks) sketch blobs, never cells. Returns the merged sketch
    object, or None if nothing matches."""
    import ray.data as rd

    files = [
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    ]
    ds = rd.read_parquet(files, columns=["sketch"], filter=_where_expr(where))

    def block_merge(t: pa.Table) -> pa.Table:
        blobs = t.column("sketch").to_pylist()
        if not blobs:
            return pa.table({"sketch": pa.array([], type=pa.binary())})
        acc = pickle.loads(blobs[0])
        for b in blobs[1:]:
            acc.merge(pickle.loads(b))
        return pa.table(
            {"sketch": pa.array([pickle.dumps(acc, protocol=pickle.HIGHEST_PROTOCOL)],
                                type=pa.binary())}
        )

    parts = ds.map_batches(block_merge, batch_format="pyarrow", batch_size=None)
    blobs = [r["sketch"] for r in parts.take_all()]  # O(blocks) rows
    if not blobs:
        return None
    acc = pickle.loads(blobs[0])
    for b in blobs[1:]:
        acc.merge(pickle.loads(b))
    return acc


def grouped_cube_merge(out_dir: str, group_dims: list[str], where: dict | None = None) -> dict:
    """Per-group merged sketches: {group-key-tuple: sketch} for every
    distinct ``group_dims`` combination among matching cells. Driver
    holds O(groups) sketches — the cube contract (cells ≪ raw rows);
    the grouped-dashboard query path."""
    import ray.data as rd

    group_dims = list(group_dims)
    files = [
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    ]
    ds = rd.read_parquet(
        files, columns=group_dims + ["sketch"], filter=_where_expr(where)
    )

    def block_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {**{d: pa.array([], type=t.schema.field(d).type) for d in group_dims},
                 "sketch": pa.array([], type=pa.binary())}
            )
        keys = list(zip(*(t.column(d).to_pylist() for d in group_dims)))
        blobs = t.column("sketch").to_pylist()
        merged: dict = {}
        for k, b in zip(keys, blobs):
            sk = pickle.loads(b)
            if k in merged:
                merged[k].merge(sk)
            else:
                merged[k] = sk
        ks = sorted(merged)
        return pa.table(
            {**{d: pa.array([k[i] for k in ks]) for i, d in enumerate(group_dims)},
             "sketch": pa.array(
                 [pickle.dumps(merged[k], protocol=pickle.HIGHEST_PROTOCOL) for k in ks],
                 type=pa.binary())}
        )

    parts = ds.map_batches(block_merge, batch_format="pyarrow", batch_size=None)
    out: dict = {}
    for r in parts.take_all():  # O(blocks × groups) rows
        k = tuple(r[d] for d in group_dims)
        sk = pickle.loads(r["sketch"])
        if k in out:
            out[k].merge(sk)
        else:
            out[k] = sk
    return out


def rolling_cube_merge(
    out_dir: str,
    time_dim: str,
    window: int,
    parse=None,
    where: dict | None = None,
) -> dict:
    """Rolling-window merge over the cube's time dimension: for every
    distinct time value t, merge all cells with time in the CLOSED
    calendar window [t - (window-1), t] (missing days simply contribute
    nothing). ``parse`` maps a time value to an integer day ordinal
    (default: 'YYYY-MM-DD' strings via numpy datetime64).

    Returns {time_value: merged sketch}, driver memory O(times ×
    groups-matching-where) — cube-sized, not data-sized."""
    cells = grouped_cube_merge(out_dir, [time_dim], where=where)
    if parse is None:
        parse = lambda s: int(np.datetime64(s, "D").astype(np.int64))  # noqa: E731
    times = sorted(cells, key=lambda k: parse(k[0]))
    ords = {t: parse(t[0]) for t in times}
    out: dict = {}
    for t in times:
        acc = None
        for u in times:
            if ords[t] - (window - 1) <= ords[u] <= ords[t]:
                sk = pickle.loads(pickle.dumps(cells[u]))  # copy: cells reused
                acc = sk if acc is None else acc.merge(sk)
        out[t[0]] = acc
    return out


class CellMap:
    """A mergeable MAP of sketches keyed by cell tuple — the cube as a
    single MergeableSketch, so the per-partition checkpoint machinery
    (state/checkpoint.py) runs cube builds unchanged: build a CellMap
    per partition, merge = per-key sketch merge (associative and
    commutative because each cell's merge is). Cell count must honor
    the cube contract (cells ≪ rows; dashboards, not raw keys)."""

    __slots__ = ("cells",)

    def __init__(self, cells: dict | None = None):
        self.cells = cells or {}

    def merge(self, other: "CellMap") -> "CellMap":
        for k, sk in other.cells.items():
            mine = self.cells.get(k)
            if mine is None:
                self.cells[k] = sk
            else:
                mine.merge(sk)
        return self

    @property
    def size(self) -> int:
        return len(self.cells)


def build_cell_map(tbl: pa.Table, dims: list[str], make_sketch, add) -> CellMap:
    """One partition's CellMap from an Arrow table: pyarrow C++ hash
    group assignment, then one vectorized ``add(sketch, values)`` per
    cell slice (sorted indices — no Python row loop)."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return CellMap()
    keys = list(zip(*(tbl.column(d).to_pylist() for d in dims)))
    # group rows by cell via sort indices over the dim columns
    order = pc.sort_indices(tbl, sort_keys=[(d, "ascending") for d in dims])
    order_np = order.to_numpy()
    sorted_keys = [keys[i] for i in order_np]
    cells: dict = {}
    start = 0
    for i in range(1, len(sorted_keys) + 1):
        if i == len(sorted_keys) or sorted_keys[i] != sorted_keys[start]:
            sk = make_sketch()
            add(sk, tbl, order_np[start:i])
            cells[sorted_keys[start]] = sk
            start = i
    return CellMap(cells)


def write_cube_from_map(cmap: CellMap, dims: list[str], out_dir: str) -> dict:
    """Persist a merged CellMap as a functions/cube.py-compatible layout
    (sorted (dims, sketch) parquet + manifest) — the final step of a
    checkpointed cube job."""
    import shutil

    import pyarrow.parquet as pq

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ks = sorted(cmap.cells)
    cols = {d: pa.array([k[i] for k in ks]) for i, d in enumerate(dims)}
    cols["sketch"] = pa.array(
        [pickle.dumps(cmap.cells[k], protocol=pickle.HIGHEST_PROTOCOL) for k in ks],
        type=pa.binary(),
    )
    pq.write_table(pa.table(cols), os.path.join(out_dir, "cells-00000.parquet"))
    manifest = {"dims": list(dims), "sketch_col": "sketch", "n_cells": len(ks)}
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def append_to_sketch_cube(ds, agg, out_dir: str) -> dict:
    """Incremental ingest: aggregate NEW rows into cell partials and
    append them as extra parquet files — the query paths merge duplicate
    cell keys across files, so cube-after-append ≡ cube-over-union with
    no rebuild (the grow-without-rebuild contract of the MinHash index /
    IVF append). Dims come from the manifest; returns the updated
    manifest (``n_cells`` counts cell ROWS, ≥ distinct cells after an
    append)."""
    manifest = read_cube_manifest(out_dir)
    dims = manifest["dims"]
    name = agg.name
    cells = ds.groupby(dims).aggregate(agg)

    def to_binary(t: pa.Table) -> pa.Table:
        cols = {d: t.column(d) for d in dims}
        sk = t.column(name)
        if not pa.types.is_binary(sk.type) and not pa.types.is_large_binary(sk.type):
            sk = sk.cast(pa.binary())
        cols["sketch"] = sk
        return pa.table(cols)

    cells = cells.map_batches(to_binary, batch_format="pyarrow", batch_size=None)
    cells = cells.sort(dims)
    n_new = cells.count()
    cells.write_parquet(out_dir)
    manifest["n_cells"] = int(manifest["n_cells"]) + int(n_new)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def hll_cell(col: str, p: int = 14, seed: int = 0):
    """(make, add) pair for HLL cells over ``col`` — the distinct-count
    cube kind. Mirrors HLLAgg's null/hash semantics exactly."""
    from ddsketch_ray.agg import drop_nulls, hash_any_column
    from ddsketch_ray.sketches import HyperLogLog

    def make():
        return HyperLogLog(p=p)

    def add(sk, tbl, idx):
        c = drop_nulls(tbl.column(col).take(pa.array(idx)), True)
        sk.add_hashed(hash_any_column(c, True, seed=seed))

    return make, add


def dds_cell(col: str, alpha: float = 0.008, bin_limit: int = 4096):
    """(make, add) pair for DDSketch cells over a numeric ``col``."""
    from ddsketch_ray.sketches import DDSketch

    def make():
        return DDSketch(alpha=alpha, bin_limit=bin_limit)

    def add(sk, tbl, idx):
        sk.add_array(tbl.column(col).take(pa.array(idx)).to_numpy(zero_copy_only=False))

    return make, add


def dyadic_cell(col: str, levels: int = 16, width: int = 1024, depth: int = 5, seed: int = 0):
    """(make, add) pair for dyadic-range count-min cells over an integer
    ``col`` — the range-count / rank / quantile-by-count cube kind
    (latency-band dashboards). Merge is exact per-level table ADDITION
    (sketches/dyadic.py), so a cube cell is BIT-IDENTICAL to a direct
    build over that cell's rows under any block order — which makes the
    cube servable estimates replayable by the SAME exact-integer SQL
    oracle as the direct dyadic queries (grouped by the cube dims)."""
    from ddsketch_ray.sketches import DyadicCountMin

    def make():
        return DyadicCountMin(levels=levels, width=width, depth=depth, seed=seed)

    def add(sk, tbl, idx):
        v = tbl.column(col).take(pa.array(idx)).to_numpy(zero_copy_only=False)
        sk.add_values(v)

    return make, add


def write_sketch_cube_partials(ds, dims: list[str], make_sketch, add, out_dir: str) -> dict:
    """The at-scale cube build: per-block CellMaps tree-merged by Ray's
    GLOBAL aggregate — no row shuffle (Ray's groupby costs ~20 µs/row
    regardless of group count; the cube contract is low cell
    cardinality, so shuffling rows to co-locate cells is pure waste).
    Only KB–MB CellMap accumulators ever move. Produces the identical
    layout (and bit-identical cells, tested) as `write_sketch_cube`."""
    from ddsketch_ray.agg import CellMapAgg

    dims = list(dims)
    if not dims:
        raise ValueError("cube needs at least one dim column")
    res = ds.aggregate(CellMapAgg(dims, make_sketch, add, alias_name="cmap"))
    cmap = pickle.loads(res["cmap"])
    return write_cube_from_map(cmap, dims, out_dir)
