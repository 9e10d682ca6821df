"""Compaction for hive-bucketed parquet layouts.

Every persisted layout in this repo grows by APPENDING parts —
``search_index.append_to_text_index``, ``ann.append_to_ivf``,
``dedup_index`` ingest, ``cube`` append all write new UUID-named files
inside existing ``bucket=<i>/`` (or ``list=<i>/``) directories. That is
the right write path (no rewrite, no collision), but after many ingest
batches a bucket holds one file per (append × block), each
individually sorted but collectively interleaved: reads pay per-file
open/metadata overhead (the 8,234-tiny-files lesson recorded on
``write_bucketed``) and the within-bucket sort key no longer prunes row
groups across files. Compaction is the standard maintenance op:
rewrite each bucket directory as ONE file, globally re-sorted on the
layout's sort key, without changing a single row.

Plan: buckets are independent, so each is one Ray task (a task pool —
NOT an actor pool: the task carries no reusable state and the
per-bucket work is one read-sort-write). Per bucket the task follows a
crash-safe three-step protocol driven by a per-bucket checkpoint
record, so a killed run resumes without data loss or duplication:

    1. merge: read the bucket's parts, sort, write ``compact-<run>.tmp``
       (a non-``.parquet`` suffix — no reader glob can see it early)
    2. record {parts, tmp} in the checkpoint with state="written"
    3. delete the old parts, rename tmp → ``compact-<run>.parquet``,
       state="done"

Resume rules (``_finish_bucket``): state "done" → skip; state
"written" with the tmp present → redo step 3 (idempotent: deleting
already-deleted parts and renaming are both safe to repeat); tmp
already renamed → just clear leftovers. A bucket never observed in
the checkpoint simply re-runs step 1 — the tmp write is invisible to
readers, so a crash there costs work, never correctness.

At 100 TB this is the periodic job that keeps serving layouts honest:
each task touches exactly one bucket directory (local read + one
sequential write), nothing shuffles, and the checkpoint bounds re-work
after preemption to the in-flight buckets.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["compact_bucketed_layout"]


def _bucket_dirs(root: str) -> list[str]:
    out = [
        d
        for d in sorted(_glob.glob(os.path.join(root, "*=*")))
        if os.path.isdir(d)
    ]
    return out


def _load_ckpt(path: str | None) -> dict:
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save_ckpt(path: str | None, state: dict) -> None:
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def _merge_bucket(bucket_dir: str, sort_cols: list[str], run_id: str, row_group_size: int = 64_000) -> dict:
    """Step 1: read parts → one sorted table → tmp file. Returns the
    checkpoint record (state='written')."""
    parts = sorted(_glob.glob(os.path.join(bucket_dir, "*.parquet")))
    tmp = os.path.join(bucket_dir, f"compact-{run_id}.tmp")
    rec = {"parts": [os.path.basename(p) for p in parts], "tmp": os.path.basename(tmp)}
    if len(parts) <= 1:
        rec["state"] = "noop"
        return rec
    t = pa.concat_tables([pq.read_table(p) for p in parts]).combine_chunks()
    if sort_cols:
        t = t.sort_by([(c, "ascending") for c in sort_cols])
    # small row groups keep predicate pruning effective after the
    # merge (the layouts this compacts are read with column filters)
    pq.write_table(t, tmp, row_group_size=row_group_size)
    rec["state"] = "written"
    return rec


def _finish_bucket(bucket_dir: str, rec: dict, run_id: str) -> None:
    """Step 3 (idempotent): delete recorded parts, rename tmp."""
    final = os.path.join(bucket_dir, f"compact-{run_id}.parquet")
    tmp = os.path.join(bucket_dir, rec["tmp"])
    if not os.path.exists(tmp) and not os.path.exists(final):
        raise RuntimeError(
            f"compaction checkpoint says 'written' but neither tmp nor "
            f"final exists in {bucket_dir} — refusing to delete parts"
        )
    for name in rec["parts"]:
        p = os.path.join(bucket_dir, name)
        if os.path.exists(p):
            os.remove(p)
    if os.path.exists(tmp):
        os.replace(tmp, final)


def compact_bucketed_layout(
    root: str,
    sort_cols,
    ckpt_path: str | None = None,
    run_id: str = "r0",
    parallelism: int = 8,
    row_group_size: int = 64_000,
) -> dict:
    """Compact every ``key=value`` bucket directory under ``root`` to a
    single file sorted by ``sort_cols``. Re-runnable with the same
    ``ckpt_path``/``run_id``: finished buckets are skipped, interrupted
    buckets are finished or redone per the protocol above. Returns
    {"buckets": n, "compacted": n_rewritten, "skipped": n_skipped,
    "files_before": n, "files_after": n}."""
    import ray

    sort_cols = list(sort_cols)
    dirs = _bucket_dirs(root)
    ckpt = _load_ckpt(ckpt_path)
    files_before = sum(len(_glob.glob(os.path.join(d, "*.parquet"))) for d in dirs)

    # resume pass: finish (or clear) anything the checkpoint recorded
    todo: list[str] = []
    skipped = 0
    for d in dirs:
        key = os.path.basename(d)
        rec = ckpt.get(key)
        if rec is None:
            todo.append(d)
            continue
        if rec["state"] == "written":
            _finish_bucket(d, rec, run_id)
            rec["state"] = "done"
            _save_ckpt(ckpt_path, ckpt)
            skipped += 1  # finished from checkpoint, not re-merged
        elif rec["state"] in ("done", "noop"):
            skipped += 1
        else:  # unknown state: re-merge from scratch (tmp is invisible)
            todo.append(d)

    merge = ray.remote(num_cpus=1)(_merge_bucket)
    for i in range(0, len(todo), max(1, parallelism)):
        batch = todo[i : i + max(1, parallelism)]
        recs = ray.get([merge.remote(d, sort_cols, run_id, row_group_size) for d in batch])
        for d, rec in zip(batch, recs):
            key = os.path.basename(d)
            ckpt[key] = rec
            _save_ckpt(ckpt_path, ckpt)  # durable BEFORE any delete
            if rec["state"] == "written":
                _finish_bucket(d, rec, run_id)
                rec["state"] = "done"
                _save_ckpt(ckpt_path, ckpt)
    files_after = sum(len(_glob.glob(os.path.join(d, "*.parquet"))) for d in dirs)
    return {
        "buckets": len(dirs),
        "compacted": sum(1 for r in ckpt.values() if r["state"] == "done"),
        "skipped": skipped,
        "files_before": files_before,
        "files_after": files_after,
    }
