"""Deterministic epoch shuffle — the training-loader reshuffle as data.

A multi-epoch training run needs a DIFFERENT global permutation of the
corpus each epoch, the same permutation on every re-run/resume, and no
materialized shuffled copy per epoch. ``epoch_shuffle_order`` computes
the permutation as a manifest: rank r of document d in epoch e is the
position of ``hash(d, e)`` in the corpus-wide sort — a pure function of
(id, epoch, seed), so any node, any cluster size, any retry derives the
identical order (the property `ray.data.Dataset.random_shuffle` cannot
give: its permutation depends on the physical block layout).

Plan: one vectorized hash map + the ``global_rank`` sort plan
(functions/pack.py — ONE distributed sort, O(blocks) driver stitch).
The hash is SplitMix64 — mod-2^64 arithmetic a DuckDB oracle replays
exactly (`epoch_shuffle_docs`).

Reference scope note: gmorleo/DDSketch is a numeric sketch library
(`ddsketch.h:58-252`); this operator is part of the LLM-data-pipeline
surface this engine adds on top.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ray.hashing import hash_ints


def epoch_shuffle_order(
    ds,
    id_col: str = "doc_id",
    epoch: int = 0,
    seed: int = 0,
    rank_alias: str = "epoch_rank",
):
    """Returns a Dataset (id_col, rank_alias): a deterministic global
    permutation of the corpus for the given (epoch, seed) — rank is
    1-based, dense, and a pure function of the ids (layout/cluster-size
    invariant). Distinct epochs give decorrelated permutations (an
    independent SplitMix64 hash family per (epoch, seed)). ``id_col``
    must be unique non-null int64 (validated by the underlying sort
    plan's stitch)."""
    from ddsketch_ray.functions.pack import global_rank

    epoch_seed = int(seed) * 1_000_003 + int(epoch)

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = hash_ints(ids, seed=epoch_seed)
        # int64 bit-view: the sort key (an arbitrary total order over
        # the hashes — only determinism matters, not unsignedness)
        return pa.table(
            {id_col: pa.array(ids), "_eh": pa.array(h.view(np.int64))}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)
    ranked = global_rank(hashed, "_eh", id_col, rank_alias=rank_alias)
    return ranked.map_batches(
        lambda t: t.select([id_col, rank_alias]),
        batch_format="pyarrow",
        batch_size=None,
    )
