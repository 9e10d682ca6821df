"""Skew-aware grouped aggregation (north rule: "skew-aware splitting of
hot partitions").

A grouped sketch aggregate is already skew-light — map-side combine
reduces every block to ≤ one sketch per (block, group) before the
shuffle — but a pathologically hot group (62% `en` at 10¹² rows) still
funnels all its partials through one reducer. Salting splits each group
into ``salt`` sub-groups with a deterministic per-row salt, aggregates
per (group, salt) in parallel reducers, then tree-merges the ≤``salt``
sub-sketches per group in a second, tiny stage. Merge associativity
(ddsketch.cc:558-630 semantics) makes the split free: results are
IDENTICAL to the unsalted plan when no collapse occurs (asserted in
tests and cross-checked against the same SQL oracle as the unsalted
query).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from ddsketch_ray.agg import DDSketchAgg
from ddsketch_ray.hashing import hash_floats
from ddsketch_ray.stages.builders import MergeSketchBytesAgg


def quantiles_by_group_salted(
    ds,
    value_col: str,
    group_col: str,
    qs=(0.5, 0.95, 0.99),
    alpha: float = 0.008,
    salt: int = 8,
    alias: str = "est",
    bin_limit: int = 2048,
):
    """Long-format (group_col, q, alias) like pipelines.quantiles_by_group,
    via the salted two-stage plan."""
    qs = [float(q) for q in qs]

    def add_salt(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        s = (hash_floats(v, seed=7) % np.uint64(salt)).astype(np.int64)
        return batch.append_column("_salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)
    stage1 = salted.groupby([group_col, "_salt"]).aggregate(
        DDSketchAgg(on=value_col, alpha=alpha, bin_limit=bin_limit, alias_name="_sk")  # bytes finalize
    )
    stage2 = stage1.groupby(group_col).aggregate(
        MergeSketchBytesAgg(on="_sk", alias_name="_merged")
    )

    def explode(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        blobs = batch.column("_merged").to_pylist()
        g_out, q_out, v_out = [], [], []
        for g, blob in zip(groups, blobs):
            sk = pickle.loads(blob)
            for q, v in zip(qs, sk.quantiles(qs)):
                g_out.append(g)
                q_out.append(q)
                v_out.append(float(v))
        return pa.table(
            {
                group_col: pa.array(g_out, type=batch.schema.field(group_col).type),
                "q": pa.array(q_out, type=pa.float64()),
                alias: pa.array(v_out, type=pa.float64()),
            }
        )

    return stage2.map_batches(explode, batch_format="pyarrow", batch_size=None)
