"""End-to-end training-corpus preparation as a resumable production job.

The composition `__ray_entry__.q_train_corpus_prep` verifies against SQL
at gate scale, packaged for the 100-TB shape:

1. **Per-partition prep (checkpointed)** — split assignment, PII
   redaction, token counting, quality gate, content hashing — is a pure
   per-batch map, so it runs under ``CheckpointedMapJob``: one output
   parquet part per input shard, lineage in file metadata, a killed run
   recomputes only missing/stale parts. The part rows ARE the cleaned
   corpus (redacted text included).
2. **Global exact dedup emit** — one distributed sort on
   (content_hash, id) keeping each text group's min-id survivor row
   (``exact_dedup_emit``: the survivor's OWN split/lang/counters win —
   id-keyed columns vary within a duplicate group, so a first-sorted-row
   carry would be nondeterministic). This is the only wide stage and the
   only one that moves text bytes; for very wide rows, dedup on
   (hash, id) first and re-join by id instead (``equi_join_shuffle``) —
   same result, two cheaper shuffles.
3. **Partitioned output** — ``write_parquet(partition_cols=["split"])``:
   one directory per split, many files, resumable downstream.

Reference scope note: gmorleo/DDSketch has no pipeline surface
(SURVEY.md §2.2 is a fixed experiment driver); this is the north-rule
training-data composition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_WEIGHTS: list[tuple[str, int]] = [("train", 90), ("val", 5), ("test", 5)]


def prep_corpus_batch(
    t: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    weights: list[tuple[str, int]] = DEFAULT_WEIGHTS,
    min_tokens: int = 10,
    seed: int = 0,
) -> pa.Table:
    """The per-shard prep map (module-level and arg-closed via
    functools.partial — picklable for CheckpointedMapJob): split →
    redact → token gate → content hash. Returns
    (id_col, lang_col, split, redacted, n_tokens, content_hash)."""
    from ddsketch_ray.functions.dedup import content_hash_batch
    from ddsketch_ray.functions.sampling import assign_split_batch
    from ddsketch_ray.functions.text import redact_batch, token_count_batch

    t = assign_split_batch(t, id_col, weights, seed=seed)
    t = redact_batch(t, text_col=text_col, count_col="n_redactions")
    t = token_count_batch(t, text_col="redacted")
    t = t.filter(pc.greater_equal(t.column("n_tokens"), min_tokens))
    t = content_hash_batch(t, text_col="redacted")
    return t.select(
        [id_col, lang_col, "split", "redacted", "n_tokens", "n_redactions", "content_hash"]
    )


def dedup_survivors(parts_ds, id_col: str = "doc_id"):
    """Global exact dedup over prep parts, emitting the min-id
    survivor's FULL row per identical redacted text (one sort; ≤ 2
    driver candidate rows per block). ``exact_dedup_emit`` — not
    ``sorted_group_rollup`` — because columns like ``split`` are keyed
    on the doc id and so VARY within a duplicate group: the survivor's
    own values must win, deterministically."""
    from ddsketch_ray.functions.dedup import exact_dedup_emit

    return exact_dedup_emit(parts_ds, key_col="content_hash", id_col=id_col)


def corpus_prep_job(
    input_files: list[str],
    ckpt_dir: str,
    out_dir: str | None = None,
    run_id: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    weights: list[tuple[str, int]] = DEFAULT_WEIGHTS,
    min_tokens: int = 10,
    seed: int = 0,
    files_per_partition: int = 1,
    concurrency: int = 8,
):
    """Run the full resumable pipeline. Returns (summary dict, job).

    Re-running with the same ``run_id`` skips completed prep parts; the
    dedup + write phase is recomputed from the parts (it is a pure
    function of them, and the partitioned write is atomic-per-file).
    """
    import functools
    import time

    import ray.data as rd

    from ddsketch_ray.state.checkpoint import CheckpointedMapJob

    t0 = time.perf_counter()
    job = CheckpointedMapJob(
        input_files,
        functools.partial(
            prep_corpus_batch,
            id_col=id_col,
            text_col=text_col,
            lang_col=lang_col,
            weights=weights,
            min_tokens=min_tokens,
            seed=seed,
        ),
        columns=[id_col, text_col, lang_col],
        ckpt_dir=ckpt_dir,
        run_id=run_id,
        files_per_partition=files_per_partition,
    )
    pending_before = len(job.pending_partitions())
    part_files = job.run(concurrency=concurrency)
    parts_ds = rd.read_parquet(part_files)
    survivors = dedup_survivors(parts_ds, id_col=id_col)
    n_out = None
    if out_dir is not None:
        survivors = survivors.materialize()
        survivors.drop_columns(["content_hash"]).write_parquet(
            out_dir, partition_cols=["split"], min_rows_per_file=10_000
        )
        n_out = survivors.count()
    summary = {
        "run_id": job.run_id,
        "partitions": len(job.partitions),
        "recomputed_partitions": pending_before,
        "prep_rows": sum(m["row_count"] for m in job.manifest()),
        "survivor_rows": n_out if n_out is not None else survivors.count(),
        "wall_s": round(time.perf_counter() - t0, 3),
        "out": out_dir,
    }
    return summary, job
