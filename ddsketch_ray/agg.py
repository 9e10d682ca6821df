"""Ray Data ``AggregateFnV2`` adapters for the mergeable sketch family.

This is the architectural heart of the engine (SURVEY.md §1.2): the
reference's per-shard build + ``DDS_MergeCollapse*`` reduction
(``/root/reference/main.cpp:516-529``) maps exactly onto Ray Data's
aggregate protocol — ``aggregate_block`` builds a partial sketch per Arrow
block (map-side combine: only KB-sized sketch bytes ever enter the
shuffle, never rows), ``combine`` tree-merges partials, ``finalize``
answers the query.

Accumulators travel as **pickled bytes**, not sketch objects: Ray stores
intermediate accumulators in blocks between shuffle rounds, and a binary
column stays on the zero-copy Arrow path while arbitrary Python objects
force a pandas object-dtype fallback.

Works for both ``ds.aggregate(...)`` (global) and
``ds.groupby(key).aggregate(...)`` (per-group sketches).
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFnV2

from ddsketch_ray.hashing import hash_floats, hash_ints, hash_strings
from ddsketch_ray.sketches import (
    BloomFilter,
    DDSketch,
    HeavyHitters,
    HyperLogLog,
    KLL,
    KMV,
    MinHashSketch,
    MisraGries,
    TDigest,
    WeightedReservoir,
)


def _column_values(block, col: str):
    """Extract a column from a Ray block (pyarrow Table or pandas DataFrame)
    as (arrow_array_or_numpy, is_arrow)."""
    if isinstance(block, pa.Table):
        return block.column(col), True
    return block[col].to_numpy(), False  # pandas fallback path


def _to_float64(col, is_arrow: bool) -> np.ndarray:
    if is_arrow:
        # zero-copy when no nulls; nulls become NaN (dropped+counted downstream)
        return col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return np.asarray(col, dtype=np.float64)


def drop_nulls(col, is_arrow: bool):
    """Null rows removed (aggregates here are ignore_nulls=True: a null
    key must not hash as 0/NaN/"" and leak into distinct/membership)."""
    if is_arrow:
        return col.drop_null()
    arr = np.asarray(col)
    if arr.dtype.kind == "f":
        return arr[~np.isnan(arr)]
    if arr.dtype.kind == "O":
        import pandas as pd

        return arr[~pd.isna(arr)]
    return arr


def hash_any_column(col, is_arrow: bool, seed: int = 0) -> np.ndarray:
    """uint64-hash a column of any type (string/int/float), null-safe."""
    if is_arrow:
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return hash_strings(col, seed=seed)
        if pa.types.is_integer(typ):
            # fill nulls BEFORE to_numpy: a nullable int column otherwise
            # converts to float64, corrupting values above 2^53 (their
            # hashes would then differ from null-free batches). Null
            # hashes as hash(0) — callers needing SQL null semantics
            # must drop/verify nulls explicitly (the joins all do).
            if col.null_count:
                col = pa.compute.fill_null(col, 0)
            arr = col.to_numpy(zero_copy_only=False)
            return hash_ints(arr.astype(np.int64, copy=False), seed=seed)
        if pa.types.is_floating(typ):
            return hash_floats(col.to_numpy(zero_copy_only=False), seed=seed)
        return hash_strings(col.cast(pa.string()), seed=seed)
    arr = np.asarray(col)
    if arr.dtype.kind in ("i", "u"):
        return hash_ints(arr, seed=seed)
    if arr.dtype.kind == "f":
        return hash_floats(arr, seed=seed)
    return hash_strings(arr, seed=seed)


class _SketchAggBase(AggregateFnV2):
    """Shared mechanics: bytes accumulators, unpickle-merge-repickle combine."""

    def __init__(self, factory: Callable[[], object], name: str, on: Optional[str]):
        self._factory = factory
        zero = pickle.dumps(factory(), protocol=pickle.HIGHEST_PROTOCOL)
        super().__init__(
            name=name,
            zero_factory=lambda: zero,
            on=on,
            ignore_nulls=True,
        )

    def _accumulate(self, sketch, block) -> None:  # override per sketch kind
        raise NotImplementedError

    def aggregate_block(self, block) -> bytes:
        sk = self._factory()
        self._accumulate(sk, block)
        return pickle.dumps(sk, protocol=pickle.HIGHEST_PROTOCOL)

    def combine(self, current: bytes, new: bytes) -> bytes:
        a, b = pickle.loads(current), pickle.loads(new)
        return pickle.dumps(a.merge(b), protocol=pickle.HIGHEST_PROTOCOL)

    def finalize(self, accumulator: bytes):
        return accumulator  # default: the serialized sketch itself


class DDSketchAgg(_SketchAggBase):
    """DDSketch over a numeric column. finalize → quantile estimates
    (list<double> per the ``qs`` arg) or the serialized sketch if qs=None."""

    def __init__(
        self,
        on: str,
        qs: Optional[Sequence[float]] = None,
        alpha: float = 0.008,
        bin_limit: int = 2048,
        mode: str = "collapse",
        alias_name: Optional[str] = None,
    ):
        self._qs = list(qs) if qs is not None else None
        super().__init__(
            factory=lambda: DDSketch(alpha=alpha, bin_limit=bin_limit, mode=mode),
            name=alias_name or f"ddsketch({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        sk.add_array(_to_float64(col, is_arrow))

    def finalize(self, accumulator: bytes):
        if self._qs is None:
            return accumulator
        sk = pickle.loads(accumulator)
        return [float(v) for v in sk.quantiles(self._qs)]


class DDSketchWeightedAgg(_SketchAggBase):
    """DDSketch over ``on`` with integer weights from ``weight_col``
    (bucket count += weight — a weight-w value is w unit inserts, so
    merge/quantile/oracle math is unchanged). Rows with null value or
    null weight are dropped; weights must be integral and >= 0."""

    def __init__(
        self,
        on: str,
        weight_col: str,
        qs: Optional[Sequence[float]] = None,
        alpha: float = 0.008,
        bin_limit: int = 2048,
        mode: str = "collapse",
        alias_name: Optional[str] = None,
    ):
        self._qs = list(qs) if qs is not None else None
        self._value_col = on
        self._weight_col = weight_col
        super().__init__(
            factory=lambda: DDSketch(alpha=alpha, bin_limit=bin_limit, mode=mode),
            name=alias_name or f"ddsketch_w({on},{weight_col})",
            on=None,
        )

    def _accumulate(self, sk, block):
        v_col, ia = _column_values(block, self._value_col)
        w_col, _ = _column_values(block, self._weight_col)
        if ia:
            valid = pa.compute.and_(
                pa.compute.is_valid(v_col), pa.compute.is_valid(w_col)
            )
            vs = v_col.filter(valid).to_numpy(zero_copy_only=False).astype(np.float64)
            ws = w_col.filter(valid).to_numpy(zero_copy_only=False)
        else:
            vs = np.asarray(v_col, dtype=np.float64)
            ws = np.asarray(w_col)
            ok = ~np.isnan(vs)
            if ws.dtype.kind == "f":
                ok &= ~np.isnan(ws)
            vs, ws = vs[ok], ws[ok]
        sk.add_weighted(vs, ws)

    def finalize(self, accumulator: bytes):
        if self._qs is None:
            return accumulator
        return [float(v) for v in pickle.loads(accumulator).quantiles(self._qs)]


class TDigestAgg(_SketchAggBase):
    def __init__(self, on: str, qs=None, delta: int = 200, alias_name=None):
        self._qs = list(qs) if qs is not None else None
        super().__init__(
            factory=lambda: TDigest(delta=delta),
            name=alias_name or f"tdigest({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        sk.add_array(_to_float64(col, is_arrow))

    def finalize(self, accumulator: bytes):
        if self._qs is None:
            return accumulator
        return [float(v) for v in pickle.loads(accumulator).quantiles(self._qs)]


class KLLAgg(_SketchAggBase):
    def __init__(self, on: str, qs=None, k: int = 200, alias_name=None):
        self._qs = list(qs) if qs is not None else None
        super().__init__(
            factory=lambda: KLL(k=k), name=alias_name or f"kll({on})", on=on
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        sk.add_array(_to_float64(col, is_arrow))

    def finalize(self, accumulator: bytes):
        if self._qs is None:
            return accumulator
        return [float(v) for v in pickle.loads(accumulator).quantiles(self._qs)]


class HLLAgg(_SketchAggBase):
    """Distinct count of any column. finalize → int64 estimate, or the
    serialized sketch when ``raw=True`` (cube cells / re-mergeable
    partials — use ``sketch_from_result``)."""

    def __init__(self, on: str, p: int = 14, seed: int = 0, alias_name=None,
                 raw: bool = False):
        self._seed = seed
        self._raw = bool(raw)
        super().__init__(
            factory=lambda: HyperLogLog(p=p),
            name=alias_name or f"hll({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        sk.add_hashed(hash_any_column(col, is_arrow, seed=self._seed))

    def finalize(self, accumulator: bytes):
        if self._raw:
            return accumulator
        return pickle.loads(accumulator).cardinality()


class KMVAgg(_SketchAggBase):
    """KMV bottom-k distinct sample + distinct estimate over any column.
    finalize → serialized sketch (use ``sketch_from_result``); the
    bottom-k sample and the (k-1)/U_(k) estimate are exactly
    reproducible by a SQL oracle (SplitMix64 in mod-2^64 arithmetic)."""

    def __init__(self, on: str, k: int = 256, seed: int = 0, alias_name=None):
        self._seed = seed
        super().__init__(
            factory=lambda: KMV(k=k),
            name=alias_name or f"kmv({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        values = col.to_numpy(zero_copy_only=False) if is_arrow else np.asarray(col)
        sk.add_hashed(hash_any_column(col, is_arrow, seed=self._seed), values)


class WRSAgg(_SketchAggBase):
    """Weighted reservoir sample (A-Res): k items drawn without
    replacement with probability proportional to ``weight_col``, item
    identity from ``id_col``. finalize -> serialized sketch (use
    ``sketch_from_result``); sample exactly reproducible by a SQL
    oracle (SplitMix64 u-values recomputed in mod-2^64 arithmetic,
    key = ln(u)/w ranking)."""

    def __init__(self, id_col: str, weight_col: str, k: int = 64, seed: int = 0, alias_name=None):
        self._id_col = id_col
        self._weight_col = weight_col
        super().__init__(
            factory=lambda: WeightedReservoir(k=k, seed=seed),
            name=alias_name or f"wrs({id_col},{weight_col})",
            on=None,
        )

    def _accumulate(self, sk, block):
        ids_col, ia = _column_values(block, self._id_col)
        w_col, _ = _column_values(block, self._weight_col)
        if ia:  # drop null ids/weights BEFORE to_numpy (no float64
            # round-trip that would corrupt int64 ids above 2^53)
            valid = pa.compute.and_(
                pa.compute.is_valid(ids_col), pa.compute.is_valid(w_col)
            )
            ids = ids_col.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
            ws = w_col.filter(valid).to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            ids = np.asarray(ids_col)
            ws = np.asarray(w_col, dtype=np.float64)
            ok = ~np.isnan(ws)
            if ids.dtype.kind == "f":
                ok &= ~np.isnan(ids)
            ids, ws = ids[ok].astype(np.int64), ws[ok]
        sk.accumulate(ids, ws)


class HeavyHittersAgg(_SketchAggBase):
    """Count-min + candidates over a key column. finalize → serialized
    sketch bytes (use ``topk_from_bytes`` / the pipeline helpers to read)."""

    def __init__(
        self,
        on: str,
        width: int = 8192,
        depth: int = 5,
        capacity: int = 256,
        seed: int = 0,
        hash_fn: str = "xx",
        alias_name=None,
    ):
        if hash_fn not in ("xx", "poly"):
            raise ValueError(f"hash_fn must be 'xx' or 'poly', got {hash_fn!r}")
        self._seed = seed
        # "poly": hash string keys with the SQL-replayable byte
        # polynomial (hashing.polyhash_strings) instead of xxhash, so an
        # independent DuckDB oracle can recompute every CMS bucket —
        # same ε/δ guarantees, different (equally random) bucket layout
        self._hash_fn = hash_fn
        super().__init__(
            factory=lambda: HeavyHitters(width=width, depth=depth, capacity=capacity),
            name=alias_name or f"heavy_hitters({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        if self._hash_fn == "poly":
            from ddsketch_ray.hashing import polyhash_strings

            hashes = polyhash_strings(
                col if is_arrow else pa.array(list(col), type=pa.large_string()),
                seed=self._seed,
            )
        else:
            hashes = hash_any_column(col, is_arrow, seed=self._seed)
        sk.cms.add_hashed(hashes)
        # candidate set touches only UNIQUE keys (vectorized dedup on the
        # hashes; labels materialized for the uniques alone, by index so
        # they can never misalign with hashes[first_idx])
        _, first_idx = np.unique(hashes, return_index=True)
        if is_arrow:
            labels = col.take(first_idx).to_pylist()
        else:
            labels = [col[i] for i in first_idx.tolist()]
        sk.candidates.update(zip(labels, hashes[first_idx].tolist()))
        sk._prune()


class MisraGriesAgg(_SketchAggBase):
    """Misra-Gries frequent-items summary (sketches/mg.py) over a key
    column, optionally weighted. finalize → serialized sketch (use
    ``sketch_from_result``): at most ``k`` candidate values + counter
    lower bounds + the realized undercount ``offset``; every value with
    true weight > n/(k+1) is guaranteed present — the exact-superset
    pass-1 of ``functions.analytics.frequent_items``. Hash-free: the
    candidate VALUES travel in the summary, so there are no collision
    overcounts (contrast HeavyHittersAgg)."""

    def __init__(self, on: str, k: int = 256, weight_col: str | None = None, alias_name=None):
        self._weight_col = weight_col
        self._key_col = on
        super().__init__(
            factory=lambda: MisraGries(k=k),
            name=alias_name or f"misra_gries({on})",
            # weighted needs two columns in the block: Ray projects to
            # `on` when set, so pass on=None there (the WRSAgg pattern)
            on=None if weight_col is not None else on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._key_col)
        if self._weight_col is None:
            col = drop_nulls(col, is_arrow)
            if is_arrow:
                vc = pa.compute.value_counts(
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                )
                vals = vc.field("values").to_numpy(zero_copy_only=False)
                cnts = vc.field("counts").to_numpy(zero_copy_only=False)
            else:
                vals, cnts = np.unique(np.asarray(col), return_counts=True)
            sk.add_counts(vals, cnts)
            return
        w_col, _ = _column_values(block, self._weight_col)
        if is_arrow:
            t = pa.table({"v": col, "w": pa.compute.cast(w_col, pa.int64())})
            t = t.drop_null()
            g = t.group_by("v").aggregate([("w", "sum")])
            sk.add_counts(
                g.column("v").to_numpy(zero_copy_only=False),
                g.column("w_sum").to_numpy(zero_copy_only=False),
            )
        else:
            import pandas as pd

            s = pd.Series(np.asarray(w_col), index=np.asarray(col)).groupby(level=0).sum()
            sk.add_counts(s.index.to_numpy(), s.to_numpy())


class BloomAgg(_SketchAggBase):
    """Bloom filter of a key column. finalize → serialized filter bytes."""

    def __init__(
        self, on: str, capacity: int, fp_rate: float = 0.01, seed: int = 0, alias_name=None
    ):
        self._seed = seed
        super().__init__(
            factory=lambda: BloomFilter.from_capacity(capacity, fp_rate),
            name=alias_name or f"bloom({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        sk.add_hashed(hash_any_column(col, is_arrow, seed=self._seed))


class CountingBloomAgg(_SketchAggBase):
    """Counting Bloom (turnstile membership — sketches/bloom.py::
    CountingBloomFilter) of a key column, with optional SIGNED weights
    from ``weight_col`` (+1 insert / −1 delete rows in one distributed
    pass — the membership analogue of the reference's delete streams).
    finalize → serialized filter bytes (``sketch_from_result``)."""

    def __init__(
        self,
        on: str,
        capacity: int,
        weight_col: Optional[str] = None,
        fp_rate: float = 0.01,
        seed: int = 0,
        alias_name=None,
    ):
        from ddsketch_ray.sketches.bloom import CountingBloomFilter

        self._seed = seed
        self._key_col = on
        self._weight_col = weight_col
        super().__init__(
            factory=lambda: CountingBloomFilter.from_capacity(capacity, fp_rate),
            name=alias_name or f"cbloom({on})",
            on=on if weight_col is None else None,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._key_col)
        if self._weight_col is None:
            col = drop_nulls(col, is_arrow)
            sk.add_hashed(hash_any_column(col, is_arrow, seed=self._seed))
            return
        w_col, _ = _column_values(block, self._weight_col)
        if is_arrow:
            valid = pa.compute.and_(
                pa.compute.is_valid(col), pa.compute.is_valid(w_col)
            )
            keys = col.filter(valid)
            ws = w_col.filter(valid).to_numpy(zero_copy_only=False)
        else:
            keys = col
            ws = np.asarray(w_col)
        sk.add_hashed(
            hash_any_column(keys, is_arrow, seed=self._seed),
            np.asarray(ws, dtype=np.int64),
        )


class MinHashAgg(_SketchAggBase):
    """MinHash signature of a column-as-set (e.g. corpus-level similarity)."""

    def __init__(self, on: str, num_perm: int = 128, seed: int = 0, alias_name=None):
        self._seed = seed
        super().__init__(
            factory=lambda: MinHashSketch(num_perm=num_perm, seed=seed),
            name=alias_name or f"minhash({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        sk.add_hashed(hash_any_column(col, is_arrow, seed=self._seed))


def sketch_from_result(result) -> object:
    """Unpickle a sketch from an aggregate result value (bytes)."""
    return pickle.loads(result)


class AMSAgg(_SketchAggBase):
    """AMS tug-of-war sketch over an integer key column (sketches/ams.py)
    — F2 / join-size estimation. finalize -> serialized sketch (use
    ``sketch_from_result``); counters are exactly reproducible by a SQL
    oracle (SplitMix64 per row-seed in mod-2^64 arithmetic)."""

    def __init__(self, on: str, rows: int = 9, buckets: int = 512, seed: int = 0,
                 alias_name=None):
        from ddsketch_ray.sketches.ams import AMSSketch

        super().__init__(
            factory=lambda: AMSSketch(rows=rows, buckets=buckets, seed=seed),
            name=alias_name or f"ams({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        if is_arrow:
            v = col.to_numpy(zero_copy_only=False)
        else:
            v = np.asarray(col)
        sk.add_hashed(v.astype(np.int64, copy=False).view(np.uint64))


class DyadicCMAgg(_SketchAggBase):
    """Dyadic-range count-min (sketches/dyadic.py — Cormode &
    Muthukrishnan 2005 §4.2) over an INTEGER column in [0, 2^levels):
    range counts / ranks / tree-descent quantiles by COUNT. Merge is
    elementwise table addition, so the distributed sketch is
    bit-identical under any tree order; every downstream estimate is an
    exact-integer chain reproducible by a SQL oracle (SplitMix64 +
    double-hash columns in mod-2^64 arithmetic, exact bucket sums, MIN
    over depth, constant dyadic node lists). finalize -> serialized
    sketch (use ``sketch_from_result``)."""

    def __init__(
        self,
        on: str,
        levels: int = 16,
        width: int = 1024,
        depth: int = 5,
        seed: int = 0,
        alias_name=None,
    ):
        from ddsketch_ray.sketches.dyadic import DyadicCountMin

        super().__init__(
            factory=lambda: DyadicCountMin(
                levels=levels, width=width, depth=depth, seed=seed
            ),
            name=alias_name or f"dyadic_cm({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        v = col.to_numpy(zero_copy_only=False) if is_arrow else np.asarray(col)
        sk.add_values(v.astype(np.int64, copy=False))


class MomentsAgg(_SketchAggBase):
    """Moments sketch (sketches/moments.py — Gan et al., VLDB 2018) over
    an INTEGER-QUANTIZED column (e.g. prices in cents): exact big-int
    power sums S1..S4 + min/max; merge is elementwise addition, so the
    distributed result is bit-identical under any tree order. finalize
    -> serialized sketch (use ``sketch_from_result``); every downstream
    estimate (mean/std/skew/kurt, Cornish-Fisher quantiles) is exactly
    reproducible by a SQL oracle (HUGEINT sums + the mirrored double
    expression chain in ``moments_sql_exprs``/``cf_quantile_sql``)."""

    def __init__(self, on: str, alias_name=None):
        from ddsketch_ray.sketches.moments import MomentsSketch

        super().__init__(
            factory=MomentsSketch,
            name=alias_name or f"moments({on})",
            on=on,
        )

    def _accumulate(self, sk, block):
        col, is_arrow = _column_values(block, self._target_col_name)
        col = drop_nulls(col, is_arrow)
        v = col.to_numpy(zero_copy_only=False) if is_arrow else np.asarray(col)
        sk.add_array(v)


class CellMapAgg(_SketchAggBase):
    """Global aggregate building a cube's CellMap (functions/cube.py):
    ``aggregate_block`` builds a per-block map of per-cell sketches via
    pyarrow sort-slice grouping, ``combine`` tree-merges maps per cell —
    the low-cell-cardinality grouped-sketch plan with NO row shuffle
    (vs ~20 µs/row for Ray's groupby regardless of group count).
    finalize -> pickled CellMap."""

    def __init__(self, dims, make_sketch, add, alias_name=None):
        from ddsketch_ray.functions.cube import CellMap, build_cell_map

        self._dims = list(dims)
        self._make = make_sketch
        self._add = add
        self._build = build_cell_map
        super().__init__(
            factory=CellMap,
            name=alias_name or f"cellmap({','.join(self._dims)})",
            on=None,
        )

    def _accumulate(self, cmap, block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        cmap.merge(self._build(block, self._dims, self._make, self._add))
