"""Merge-order-DETERMINISTIC sketch builds.

t-digest and KLL are compacting sketches: their exact output depends on
the order values are inserted and partial sketches are merged, so a
plain ``ds.aggregate(TDigestAgg)`` is only reproducible up to the rank
error bound — Ray's combine order is scheduling-dependent. These plans
make the distributed output a pure function of the input MULTISET, so
the result is bit-identical across sessions, CPU counts, and block
layouts (and can therefore be frozen as a determinism oracle):

1. every row gets a partition id ``pid = rowkey_hash % P`` — a pure
   function of the row, never of block boundaries or scheduling;
2. ``groupby(pid).map_groups`` builds ONE sketch per partition from its
   values sorted ascending — a deterministic insertion sequence. This
   map_groups is over P ≈ dozens of LARGE partitions, not the
   per-singleton-key trap (CLAUDE.md); each task holds one partition's
   values (choose P ≈ total_bytes / target_task_bytes at scale);
3. the P serialized sketches (KB each) come back to the driver and are
   merged in ascending pid order — a fixed merge sequence.

The order-free ``aggregate(...)`` path stays the default (map-side
partials, no value shuffle, faster); use these when reproducibility is
a job requirement. Reference context: the same trade the reference
faces with its data-dependent γ²-collapse escalation (ddsketch.cc:
828-906) — merged bins are order-dependent, only the error bound is
order-free (SURVEY.md §4).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa


def deterministic_sketch_quantiles(
    ds,
    value_col: str,
    rowkey_fn,
    make_sketch,
    qs=(0.5, 0.95, 0.99),
    partitions: int = 32,
    alias: str = "est",
) -> pd.DataFrame:
    """Global quantiles from a compacting sketch, bit-reproducibly.

    ``rowkey_fn(batch: pa.Table) -> np.uint64 array`` must derive a
    deterministic per-row key (e.g. a hash of the row's unique id) —
    it fixes which partition each value lands in independent of block
    boundaries. Returns a DataFrame (q, {alias}).
    """
    qs = [float(q) for q in qs]

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pid = (rowkey_fn(batch) % np.uint64(partitions)).astype(np.int64)
        return pa.table({"_pid": pa.array(pid), "_v": pa.array(v)})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(g["_v"].to_numpy(), kind="stable")
        sk = make_sketch()
        sk.add_array(vals)
        return pd.DataFrame(
            {"_pid": [int(g["_pid"].iloc[0])], "_blob": [pickle.dumps(sk.to_row())]}
        )

    rows = (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_pid")
        .map_groups(build, batch_format="pandas")
        .to_pandas()  # ≤ P rows of KB-sized sketch blobs — driver O(P)
    )
    rows = rows.sort_values("_pid").reset_index(drop=True)
    cls = make_sketch().__class__
    merged = None
    for blob in rows["_blob"]:
        sk = cls.from_row(pickle.loads(blob))
        merged = sk if merged is None else merged.merge(sk)
    est = (
        np.asarray(merged.quantiles(qs), dtype=np.float64)
        if merged is not None
        else np.full(len(qs), np.nan)
    )
    return pd.DataFrame({"q": qs, alias: est})


def deterministic_quantiles_by_group(
    ds,
    value_col: str,
    group_col: str,
    make_sketch,
    qs=(0.5, 0.95, 0.99),
    alias: str = "est",
):
    """Grouped variant: one sketch per group built from that group's
    sorted values — deterministic with no driver merge at all. Groups
    must be few-and-large (event types, languages); for high-cardinality
    or skew-heavy keys use the order-free salted plan
    (pipelines/skew.py) and accept bound-level reproducibility.
    Returns a Dataset (group_col, q, {alias})."""
    qs = [float(q) for q in qs]

    def build(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(g[value_col].to_numpy().astype(np.float64), kind="stable")
        sk = make_sketch()
        sk.add_array(vals)
        est = np.asarray(sk.quantiles(qs), dtype=np.float64)
        return pd.DataFrame(
            {group_col: [g[group_col].iloc[0]] * len(qs), "q": qs, alias: est}
        )

    return ds.groupby(group_col).map_groups(build, batch_format="pandas")
