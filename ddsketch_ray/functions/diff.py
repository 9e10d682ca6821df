"""Corpus diff — the dataset-versioning audit between two big tables.

``corpus_diff(old_ds, new_ds, id_col, hash_col)`` classifies every id
across two corpus versions as ``removed`` (old only), ``added`` (new
only), ``changed`` (both, content hash differs) or ``same`` — the
"what moved between crawl snapshots / pipeline versions" question
every 100-TB curation run asks before re-spending compute downstream.

Plan (same co-partition substrate as ``semi_join_shuffle``,
functions/joins.py): both sides project to (id, content_hash), tag
bucket = id_hash % num_buckets, union — the shuffle carries two int64
columns per row and nothing else — then one vectorized kernel per
bucket (sort by id within side, searchsorted membership + hash
compare). Ids must be unique per side (duplicate ids make "the row
with this id changed" ill-posed — first occurrence wins, documented).

No reference counterpart (gmorleo/DDSketch, SURVEY.md §2.3 "Set ops:
none") — north-rule / webtext addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

STATUSES = ("same", "changed", "removed", "added")


def corpus_diff(old_ds, new_ds, id_col: str, hash_col: str, num_buckets: int = 64, seed: int = 0):
    """Returns a Dataset (id_col:int64, status:string), one row per id
    present in either version. ``hash_col`` is an int64 content hash
    (e.g. ``dedup.content_hash_batch``); null ids raise."""
    from ddsketch_ray.agg import hash_any_column

    def make_tag(side: int):
        def tag(t: pa.Table) -> pa.Table:
            if t.column(id_col).null_count:
                raise ValueError("corpus_diff: null ids not supported")
            ids = t.column(id_col).cast(pa.int64())
            b = (hash_any_column(ids, is_arrow=True, seed=seed) % np.uint64(num_buckets)).astype(np.int64)
            return pa.table(
                {
                    "_b": pa.array(b),
                    "_side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                    "i": ids,
                    "h": t.column(hash_col).cast(pa.int64()),
                }
            )

        return tag

    tagged = old_ds.map_batches(make_tag(0), batch_format="pyarrow", batch_size=None).union(
        new_ds.map_batches(make_tag(1), batch_format="pyarrow", batch_size=None)
    )

    def bucket_diff(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        ids = g.column("i").to_numpy()
        hs = g.column("h").to_numpy()
        li, lh = ids[side == 0], hs[side == 0]
        ri, rh = ids[side == 1], hs[side == 1]
        # first occurrence wins on duplicate ids within a side
        def uniq(i, h):
            if not len(i):
                return i, h
            o = np.argsort(i, kind="stable")
            i, h = i[o], h[o]
            k = np.r_[True, i[1:] != i[:-1]]
            return i[k], h[k]

        li, lh = uniq(li, lh)
        ri, rh = uniq(ri, rh)
        pos = np.searchsorted(li, ri)
        posc = np.clip(pos, 0, max(len(li) - 1, 0))
        in_old = (li[posc] == ri) if len(li) else np.zeros(len(ri), bool)
        changed = in_old & (lh[posc] != rh if len(li) else False)
        new_status = np.where(~in_old, "added", np.where(changed, "changed", "same"))
        rpos = np.searchsorted(ri, li)
        rposc = np.clip(rpos, 0, max(len(ri) - 1, 0))
        in_new = (ri[rposc] == li) if len(ri) else np.zeros(len(li), bool)
        out_ids = np.concatenate([ri, li[~in_new]])
        out_st = np.concatenate([new_status, np.full((~in_new).sum(), "removed")])
        return pa.table(
            {
                id_col: pa.array(out_ids.astype(np.int64)),
                "status": pa.array(out_st.astype(object), type=pa.string()),
            }
        )

    return tagged.groupby("_b").map_groups(bucket_diff, batch_format="pyarrow")
