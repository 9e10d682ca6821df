"""Per-key rank and per-key caps — ROW_NUMBER() OVER (PARTITION BY key).

The corpus-curation op behind "keep at most N documents per domain"
(Common-Crawl pipelines cap per-host document counts so megasites don't
dominate the mixture): rank every row within its key by a deterministic
order, then filter rank ≤ N. Ray Data has no partitioned window
functions; this is the sort-plan construction (same family as
``rolling_by_key`` / ``sorted_group_rollup``):

ONE distributed sort on (key, order, id) — id is the REQUIRED unique
tiebreaker — then each block computes in-run positions vectorized. A
key's rows are globally contiguous after the sort, so only a block's
FIRST run can continue a key from earlier blocks; each block emits one
summary row (first/last key, run lengths, first-row identity), the
driver walks the O(blocks) summaries in block order accumulating the
carried run length per chained key, and broadcasts {block → base} into
one vectorized add. Nothing per-key on the driver; keys must be
non-null (SQL PARTITION BY would group nulls — raise instead of
guessing).

Reference scope note: gmorleo/DDSketch is a numeric sketch library
(`ddsketch.h:58-252`); this operator is part of the LLM-data-pipeline
surface this engine adds on top.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def per_key_rank(
    ds,
    key_col: str,
    order_col: str,
    id_col: str,
    rank_alias: str = "key_rank",
):
    """Dataset (id_col, rank_alias): 1-based dense rank of each row
    within its key, ordered by (order_col, id_col) ascending — exactly
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_col, id)``.
    For a descending order, negate the (integer) order column upstream.
    """
    import ray
    import ray.data as rd

    def project(t: pa.Table) -> pa.Table:
        if t.column(key_col).null_count:
            raise ValueError("per_key_rank: null keys not supported")
        i = t.column(id_col).cast(pa.int64())
        if i.null_count:
            raise ValueError("per_key_rank: id_col must be non-null")
        return pa.table(
            {
                "k": t.column(key_col),
                "o": t.column(order_col).cast(pa.int64()),
                "i": i,
            }
        )

    s = ds.map_batches(project, batch_format="pyarrow", batch_size=None).sort(
        ["k", "o", "i"]
    )

    def block_rank(t: pa.Table) -> pa.Table:
        ktype = t.schema.field("k").type
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    rank_alias: pa.array([], pa.int64()),
                    "_in_first_run": pa.array([], pa.bool_()),
                    "_summary": pa.array([], pa.bool_()),
                    "_fk": pa.array([], ktype),
                    "_lk": pa.array([], ktype),
                    "_fo": pa.array([], pa.int64()),
                    "_fi": pa.array([], pa.int64()),
                    "_frun": pa.array([], pa.int64()),
                    "_lrun": pa.array([], pa.int64()),
                    "_one_run": pa.array([], pa.bool_()),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        o = t.column("o").to_numpy()
        ids = t.column("i").to_numpy()
        n = len(k)
        kchg = np.r_[True, k[1:] != k[:-1]]
        gstart = np.maximum.accumulate(np.where(kchg, np.arange(n), 0))
        local = np.arange(n) - gstart + 1
        in_first = gstart == 0
        frun = int(in_first.sum())
        last_start = int(gstart[-1])
        nulls = pa.nulls(n, ktype)
        return pa.table(
            {
                id_col: pa.array(ids),
                rank_alias: pa.array(local.astype(np.int64)),
                "_in_first_run": pa.array(in_first),
                "_summary": pa.array(np.r_[True, np.zeros(n - 1, dtype=bool)]),
                "_fk": pa.concat_arrays(
                    [t.column("k").combine_chunks().slice(0, 1), nulls.slice(0, n - 1)]
                ),
                "_lk": pa.concat_arrays(
                    [
                        t.column("k").combine_chunks().slice(n - 1, 1),
                        nulls.slice(0, n - 1),
                    ]
                ),
                "_fo": pa.array(
                    np.r_[o[0], np.zeros(n - 1, dtype=np.int64)], pa.int64()
                ),
                "_fi": pa.array(
                    np.r_[ids[0], np.zeros(n - 1, dtype=np.int64)], pa.int64()
                ),
                "_frun": pa.array(
                    np.r_[frun, np.zeros(n - 1, dtype=np.int64)], pa.int64()
                ),
                "_lrun": pa.array(
                    np.r_[n - last_start, np.zeros(n - 1, dtype=np.int64)],
                    pa.int64(),
                ),
                "_one_run": pa.array(np.r_[last_start == 0, np.zeros(n - 1, dtype=bool)]),
            }
        )

    rep = s.map_batches(block_rank, batch_format="pyarrow", batch_size=None).materialize()
    # driver stitch: ONE summary row per block, ordered by the block's
    # first sorted row (k, o, i) — reconstructible because ids are unique
    summ = (
        rep.map_batches(
            lambda t: t.filter(t.column("_summary")).select(
                ["_fk", "_lk", "_fo", "_fi", "_frun", "_lrun", "_one_run"]
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_arrow_refs()
    )
    import ray as _ray

    # tiny inputs: upstream all-to-alls (e.g. a shuffle join feeding this)
    # can emit schema-LESS empty blocks that pass through map_batches
    # untouched — drop them before the concat
    _parts = [p for p in (_ray.get(r) for r in summ) if p.num_columns]
    if not _parts:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    rank_alias: pa.array([], pa.int64()),
                }
            )
        )
    summ_t = pa.concat_tables(_parts)
    summ_t = summ_t.sort_by([("_fk", "ascending"), ("_fo", "ascending"), ("_fi", "ascending")])
    fi = summ_t.column("_fi").to_pylist()
    if len(set(fi)) != len(fi):
        raise ValueError("per_key_rank: duplicate block-identity ids — id_col not unique")
    fk = summ_t.column("_fk").to_pylist()
    lk = summ_t.column("_lk").to_pylist()
    frun = summ_t.column("_frun").to_pylist()
    lrun = summ_t.column("_lrun").to_pylist()
    one = summ_t.column("_one_run").to_pylist()
    bases: dict[int, int] = {}
    carry_key, carry_cum = object(), 0
    for j in range(len(fi)):
        base = carry_cum if fk[j] == carry_key else 0
        bases[fi[j]] = base
        if one[j]:
            carry_key, carry_cum = fk[j], base + frun[j]
        else:
            carry_key, carry_cum = lk[j], lrun[j]
    bases_ref = ray.put(bases)

    def finish(t: pa.Table) -> pa.Table:
        b = ray.get(bases_ref)
        r = t.column(rank_alias).to_numpy().copy()
        if t.num_rows:
            first_id = int(t.column(id_col)[0].as_py()) if bool(
                t.column("_summary")[0].as_py()
            ) else None
            base = b.get(first_id, 0) if first_id is not None else 0
            if base:
                mask = t.column("_in_first_run").to_numpy()
                r[mask] += base
        return pa.table(
            {id_col: t.column(id_col), rank_alias: pa.array(r.astype(np.int64))}
        )

    return rep.map_batches(finish, batch_format="pyarrow", batch_size=None)


def cap_per_key(
    ds,
    key_col: str,
    order_col: str,
    id_col: str,
    n: int,
):
    """Keep at most ``n`` rows per key — the per-domain document cap.
    Returns the (id_col, key_rank) rows with rank ≤ n; semi-join the
    ids back onto the full table to materialize the capped corpus."""
    import pyarrow.compute as pc

    ranked = per_key_rank(ds, key_col, order_col, id_col)
    return ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("key_rank"), n)),
        batch_format="pyarrow",
        batch_size=None,
    )
