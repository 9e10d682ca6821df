"""Stateful actor-pool sketch builders (SURVEY.md §7 step 5).

The alternative physical plan to ``ds.aggregate(SketchAgg)``: a callable
CLASS passed to ``map_batches(..., concurrency=N)`` — Ray keeps one
instance per actor, ``__init__`` runs once (where nontrivial setup like
model loads or broadcast fetches belong), ``__call__`` per batch emits a
serialized partial-sketch row. A tiny second aggregate tree-merges the
rows. Use this path when per-worker setup is expensive or when you want
explicit control of the pool size (e.g. pinning heavy extract+sketch
stages to ``concurrency × num_cpus`` of the node).

Equivalence with the aggregate path is asserted in tests (identical
DDSketch bins when no collapse occurs).
"""

from __future__ import annotations

import pickle

import pyarrow as pa

from ray.data.aggregate import AggregateFnV2


class SketchBuilder:
    """map_batches actor: builds one partial sketch per batch.

    factory: picklable () -> MergeableSketch
    accumulate: picklable (sketch, pa.Table) -> None
    """

    def __init__(self, factory, accumulate):
        self.factory = factory
        self.accumulate = accumulate
        self.batches_seen = 0  # per-actor state, demonstrably persistent

    def __call__(self, batch: pa.Table) -> pa.Table:
        sk = self.factory()
        self.accumulate(sk, batch)
        self.batches_seen += 1
        return pa.table(
            {
                "sketch": pa.array(
                    [pickle.dumps(sk, protocol=pickle.HIGHEST_PROTOCOL)], type=pa.binary()
                ),
                "rows": pa.array([batch.num_rows], type=pa.int64()),
            }
        )


class MergeSketchBytesAgg(AggregateFnV2):
    """Tree-merges a column of pickled sketches into one (bytes in/out)."""

    def __init__(self, on: str = "sketch", alias_name: str = "merged"):
        super().__init__(
            name=alias_name, zero_factory=lambda: b"", on=on, ignore_nulls=True
        )

    def aggregate_block(self, block) -> bytes:
        merged = None
        for blob in block.column(self._target_col_name).to_pylist():
            if not blob:  # null / empty cell: nothing to merge
                continue
            sk = pickle.loads(blob)
            merged = sk if merged is None else merged.merge(sk)
        if merged is None:
            return b""  # zero value; combine() treats b"" as identity
        return pickle.dumps(merged, protocol=pickle.HIGHEST_PROTOCOL)

    def combine(self, cur: bytes, new: bytes) -> bytes:
        a = pickle.loads(cur) if cur else None
        b = pickle.loads(new) if new else None
        if a is None:
            return new
        if b is None:
            return cur
        return pickle.dumps(a.merge(b), protocol=pickle.HIGHEST_PROTOCOL)


def sketch_via_actor_pool(ds, factory, accumulate, concurrency=2, batch_size=None):
    """Full actor-pool plan: pool builds partials → aggregate tree-merge.
    Returns the merged sketch object."""
    rows = ds.map_batches(
        SketchBuilder,
        fn_constructor_kwargs={"factory": factory, "accumulate": accumulate},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    res = rows.aggregate(MergeSketchBytesAgg(on="sketch", alias_name="merged"))
    blob = res["merged"]
    if not blob:
        return factory()  # empty input -> empty sketch, not None
    return pickle.loads(blob)
