"""Persisted edge-layout propagation substrate for iterative graph plans.

The r4 shuffle plans for PageRank / HyperANF / label propagation
(``graph._pr_shuffle_iteration``, ``anf._shuffle_round``) re-shuffled the
STATIC edge list through ``equi_join_shuffle`` every round — measured
~3 all-to-alls per iteration and 59 s/iter at 5M nodes (BASELINE.md),
with the fixed per-execution cost dominating.  This module is the fix
the r4 verdict named: pay the edge shuffle ONCE, as a persisted layout,
and make each round's only all-to-all the small state rollup.

Design (shared by all three algorithms):

- ``write_edge_layout`` — the static ``(key, payload)`` edge list is
  hash-bucketed by the join key (SplitMix64, the repo-wide family —
  ``sources/sinks.py::write_bucketed``'s contract), sorted by
  ``[bucket, key]`` (one all-to-all, paid once per job) and written as
  hive ``bucket=i/`` parquet directories.  The sort means every file
  covers a disjoint key range, so parquet row-group statistics make
  key-range reads prunable.
- State rides a Dataset ``(bucket, node, *vals)`` CLUSTERED by
  ``[bucket, node]`` (``cluster_state`` establishes the invariant once;
  the round's rollup re-establishes it for free because it sorts on
  exactly that key).
- ``propagation_round`` — phase A is a ZERO-SHUFFLE ``map_batches``
  over the state: each block walks its bucket runs, reads ONLY the
  matching ``bucket=i/`` edge directory (with a key-range predicate, so
  a tiny run — e.g. the rollup's O(blocks) boundary-fix rows — touches
  only the row groups it needs), joins by vectorized
  searchsorted-membership, PRE-AGGREGATES messages per destination with
  ``ufunc.reduceat``, and emits message + carry rows.  Phase B is one
  ``sort(["bucket", node])`` + run-rollup + O(blocks)-driver boundary
  stitch — the single all-to-all of the round, carrying ≲ 2·n small
  integer rows instead of n + |E|.

Correctness is unchanged: messages are associative integer reductions
(sum / min / max), so local pre-aggregation and the re-ordered exchange
produce BIT-IDENTICAL state to the r4 join plan (the cross-plan
equality tests in tests/test_pagerank.py / test_anf.py /
test_label_propagation.py pin this against the broadcast plans).
Membership semantics match the old inner join: an edge whose key is not
in the node set matches no state segment anywhere and is dropped.

Reference scope: gmorleo/DDSketch has no graphs — this is north-rule
scale coverage (the >16M-node regime where the broadcast plans' driver
state no longer fits).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ddsketch_ray.hashing import hash_ints

LAYOUT_META = "layout_meta.json"


def _bucket_of(ids: np.ndarray, num_buckets: int, seed: int) -> np.ndarray:
    return (hash_ints(ids.astype(np.int64), seed=seed) % np.uint64(num_buckets)).astype(
        np.int64
    )


def write_edge_layout(
    edges_ds,
    key_col: str,
    payload_col: str,
    layout_dir: str,
    num_buckets: int,
    seed: int = 0,
) -> None:
    """Persist the static edge list hash-bucketed by ``key_col`` (module
    docstring).  Idempotent per directory: a complete layout (marker
    file with matching params) is reused, a partial one is rebuilt —
    the resume contract ``pagerank_checkpointed`` relies on."""
    import shutil

    meta_path = os.path.join(layout_dir, LAYOUT_META)
    params = {
        "key_col": key_col,
        "payload_col": payload_col,
        "num_buckets": int(num_buckets),
        "seed": int(seed),
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == params:
                return
    if os.path.exists(layout_dir):
        shutil.rmtree(layout_dir)

    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(k, num_buckets, seed)),
                key_col: pa.array(k),
                payload_col: t.column(payload_col),
            }
        )

    edges_ds.map_batches(tag, batch_format="pyarrow", batch_size=None).sort(
        ["bucket", key_col]
    ).write_parquet(layout_dir, partition_cols=["bucket"])
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, meta_path)  # marker lands atomically, LAST


def cluster_state(state_ds, node_col: str, num_buckets: int, seed: int = 0):
    """(Re)compute the ``bucket`` column and establish the
    ``[bucket, node]`` clustering invariant — one sort, run once at
    init/resume; every subsequent round re-clusters for free.  A
    pre-existing bucket column is DROPPED and recomputed: a checkpoint
    written under a different ``num_buckets`` would otherwise cluster
    against the wrong layout and silently miss edges."""

    def add_bucket(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:
            t = t.drop_columns(["bucket"])
        ids = t.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = _bucket_of(ids, num_buckets, seed)
        return t.add_column(0, "bucket", pa.array(b))

    return (
        state_ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .sort(["bucket", node_col])
        .materialize()
    )


def _runs(a: np.ndarray) -> np.ndarray:
    return np.nonzero(np.r_[True, a[1:] != a[:-1]])[0]


def propagation_round(
    state_ds,
    *,
    layout_dir: str | None,
    num_buckets: int,
    key_col: str,
    payload_col: str,
    node_col: str,
    msg_cols: list[str],
    msg_fn,
    carry_fn,
    ufunc,
    pd_agg: str,
    seed: int = 0,
):
    """One propagation round over a persisted edge layout (module
    docstring).  ``msg_fn(state_tbl) -> {col: int64 ndarray}`` gives the
    per-state-row message values (indexed per matching edge);
    ``carry_fn(state_tbl) -> {col: int64 ndarray}`` gives each node's
    carry row (what it keeps regardless of incoming messages).  Returns
    the rolled ``(bucket, node, *msg_cols)`` Dataset, clustered, NOT yet
    materialized — callers map their update transform on top and
    materialize.  ``layout_dir=None`` means an edge-free graph: the
    round reduces to the carry."""
    msg_cols = list(msg_cols)

    empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            node_col: pa.array([], pa.int64()),
            **{c: pa.array([], pa.int64()) for c in msg_cols},
        }
    )

    def phase_a(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if t.num_rows == 0:
            return empty
        buckets = t.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = t.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_tables = []
        if layout_dir is not None:
            msgs = msg_fn(t)
            order = np.lexsort((nodes, buckets))
            b_s, n_s = buckets[order], nodes[order]
            msg_s = {c: np.asarray(msgs[c], dtype=np.int64)[order] for c in msg_cols}
            starts = _runs(b_s)
            ends = np.r_[starts[1:], len(b_s)]
            pay_parts, val_parts = [], {c: [] for c in msg_cols}
            for s0, s1 in zip(starts, ends):
                b = int(b_s[s0])
                path = os.path.join(layout_dir, f"bucket={b}")
                if not os.path.isdir(path):  # empty bucket writes no dir
                    continue
                seg = n_s[s0:s1]
                et = pq.read_table(
                    path,
                    columns=[key_col, payload_col],
                    # sorted-by-key files -> row-group pruning; a tiny
                    # segment (the rollup's boundary-fix rows) reads
                    # only its key range, not the whole bucket
                    filters=[
                        (key_col, ">=", int(seg[0])),
                        (key_col, "<=", int(seg[-1])),
                    ],
                )
                if et.num_rows == 0:
                    continue
                ek = et.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ep = (
                    et.column(payload_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                idx = np.searchsorted(seg, ek)
                idx_c = np.minimum(idx, len(seg) - 1)
                valid = (idx < len(seg)) & (seg[idx_c] == ek)
                if not valid.any():
                    continue
                sel = idx_c[valid] + s0
                pay = ep[valid]
                po = np.argsort(pay, kind="stable")
                pay = pay[po]
                p_starts = _runs(pay)
                pay_parts.append(pay[p_starts])
                for c in msg_cols:
                    val_parts[c].append(
                        ufunc.reduceat(msg_s[c][sel][po], p_starts).astype(np.int64)
                    )
            if pay_parts:
                pay_all = np.concatenate(pay_parts)
                out_tables.append(
                    pa.table(
                        {
                            "bucket": pa.array(_bucket_of(pay_all, num_buckets, seed)),
                            node_col: pa.array(pay_all),
                            **{
                                c: pa.array(np.concatenate(val_parts[c]))
                                for c in msg_cols
                            },
                        }
                    )
                )
        carry = carry_fn(t)
        out_tables.append(
            pa.table(
                {
                    "bucket": pa.array(buckets),
                    node_col: pa.array(nodes),
                    **{
                        c: pa.array(np.asarray(carry[c], dtype=np.int64))
                        for c in msg_cols
                    },
                }
            )
        )
        return pa.concat_tables(out_tables)

    pool = state_ds.map_batches(phase_a, batch_format="pyarrow", batch_size=None)
    return _state_rollup(pool, node_col, msg_cols, ufunc, pd_agg)


def _state_rollup(ds, node_col: str, cols: list[str], ufunc, pd_agg: str):
    """Per-node integer reduction keeping the bucket column and the
    ``[bucket, node]`` clustering — the state-shaped sibling of
    ``anf._sorted_ufunc_rollup``: one sort on [bucket, node] (nodes are
    contiguous under it — bucket is a function of node), per-block
    ``ufunc.reduceat`` over node runs, boundary groups (≤ 2 partial
    rows/block) re-reduced on the driver and unioned back as one tiny
    clustered block whose rows phase A range-prunes individually."""
    import pyarrow.compute as pc
    import ray.data as rd

    cols = list(cols)
    s = ds.sort(["bucket", node_col])

    def block_rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    node_col: pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in cols},
                    "boundary": pa.array([], pa.bool_()),
                }
            )
        k = t.column(node_col).to_numpy(zero_copy_only=False)
        starts = _runs(k)
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        out = {
            "bucket": t.column("bucket").take(pa.array(starts)),
            node_col: t.column(node_col).take(pa.array(starts)),
        }
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            out[c] = pa.array(ufunc.reduceat(v, starts).astype(np.int64))
        out["boundary"] = pa.array(boundary)
        return pa.table(out)

    rep = s.map_batches(block_rollup, batch_format="pyarrow", batch_size=None).materialize()
    keep = ["bucket", node_col] + cols
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).select(keep),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(keep),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 partial rows per block
    if len(edge):
        agg = {c: pd_agg for c in cols}
        agg["bucket"] = "first"  # bucket is a function of node
        edge = (
            edge.groupby(node_col, as_index=False)
            .agg(agg)
            .sort_values(["bucket", node_col])
        )
        fix = pa.table(
            {
                "bucket": pa.array(edge["bucket"].to_numpy().astype(np.int64)),
                node_col: pa.array(edge[node_col].to_numpy().astype(np.int64)),
                **{
                    c: pa.array(edge[c].to_numpy().astype(np.int64), pa.int64())
                    for c in cols
                },
            }
        )
        return internal.union(rd.from_arrow(fix))
    return internal
