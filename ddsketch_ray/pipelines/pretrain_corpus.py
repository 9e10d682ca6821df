"""The full 100-TB pretraining-corpus story as ONE resumable driver:

    prep (split → redact → gate → exact dedup)
      → duplicated-substring removal (Lee et al. 2022)
      → MinHash near-dup dedup
      → [optional] target-mixture resample by language
      → BPE tokenize-and-pack manifest (the training-loader artifact)

Every stage already exists and is individually resumable
(pipelines/corpus_prep.py, functions/substring.py, functions/dedup.py,
functions/sampling.py, pipelines/tokenize_pack.py); this module chains
them with STAGE-LEVEL lineage markers on top of each stage's own
per-partition checkpoints:

- each stage writes its output under ``out_dir/stageN-<name>/`` and,
  on success, a ``_STAGE_COMPLETE.json`` marker recording the stage's
  parameters (written atomically, LAST);
- a re-run skips a stage iff its marker exists AND the recorded params
  match the current run (else the stage directory is wiped and
  recomputed — a changed parameter can never silently reuse stale
  output);
- inside a recomputed stage, the per-partition checkpoints
  (CheckpointedMapJob parts, BPE merges JSON) still apply, so even the
  first pass through a stage resumes mid-stage after a crash.

Every stage is a pure deterministic function of its input files and
parameters (hash splits, fixed-seed MinHash, integer mixture rates,
deterministic BPE), so a resumed run's final pack manifest is
BIT-IDENTICAL to a cold run's — pinned by
tests/test_pretrain_corpus_job.py and the 1M-doc stress row in
BASELINE.md.

Reference scope: gmorleo/DDSketch has no pipeline surface (SURVEY.md
§2.2 is a fixed experiment driver); this is the north-rule/webtext
composition the engine exists to serve.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

_MARKER = "_STAGE_COMPLETE.json"


def _stage_done(stage_dir: str, params: dict) -> bool:
    p = os.path.join(stage_dir, _MARKER)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        return json.load(f) == params


def _stage_begin(stage_dir: str) -> None:
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)  # stale params or marker-less partial
    os.makedirs(stage_dir)


def _stage_finish(stage_dir: str, params: dict) -> None:
    tmp = os.path.join(stage_dir, _MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, os.path.join(stage_dir, _MARKER))  # atomically, LAST


def _files(d: str) -> list[str]:
    return sorted(
        f for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )


def pretrain_corpus_job(
    input_files: list[str],
    ckpt_dir: str,
    out_dir: str,
    run_id: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_tokens: int = 10,
    window: int = 8,
    mixture: list[tuple[str, int]] | None = None,
    num_merges: int = 30,
    seq_len: int = 512,
    seqs_per_shard: int = 1024,
    seed: int = 0,
    concurrency: int = 8,
    files_per_partition: int = 1,
    num_buckets: int = 64,
    jaccard_threshold: float = 0.7,
    validate_rules: list[dict] | None = None,
    max_violations: int = 0,
) -> dict:
    """Run (or resume) the whole chain. Returns a summary dict with
    per-stage wall times, row counts, and resume accounting. The final
    artifacts are ``out_dir/stage4-corpus/split=*/`` (the cleaned,
    mixed corpus) and ``out_dir/stage5-pack/shard=*/`` (the pack
    manifest a training loader consumes)."""
    import uuid

    import ray.data as rd

    from ddsketch_ray.functions.dedup import minhash_dedup_checkpointed
    from ddsketch_ray.functions.joins import equi_join_shuffle
    from ddsketch_ray.functions.sampling import resample_to_mixture
    from ddsketch_ray.functions.substring import substring_dedup_checkpointed
    from ddsketch_ray.pipelines.corpus_prep import corpus_prep_job
    from ddsketch_ray.pipelines.tokenize_pack import tokenize_pack

    run_id = run_id or uuid.uuid4().hex[:12]
    input_files = sorted(input_files)
    os.makedirs(out_dir, exist_ok=True)
    summary: dict = {"run_id": run_id, "stages": {}}

    def stage(name: str, params: dict, build) -> str:
        """Marker-gated stage runner: returns the stage output dir."""
        sdir = os.path.join(out_dir, name)
        # json round-trip so tuples (e.g. mixture pairs) compare equal
        # to their reloaded-list form
        full = json.loads(json.dumps(dict(params, _inputs=input_files, _run_id=run_id)))
        t0 = time.perf_counter()
        if _stage_done(sdir, full):
            summary["stages"][name] = {"skipped": True, "wall_s": 0.0}
            return sdir
        _stage_begin(sdir)
        extra = build(sdir) or {}
        _stage_finish(sdir, full)
        summary["stages"][name] = dict(
            extra, skipped=False, wall_s=round(time.perf_counter() - t0, 3)
        )
        return sdir

    # ---- stage 0 (optional): fail-fast input validation ----
    # a 100-TB run must refuse bad input BEFORE paying five stages of
    # work: one shared scan for the row-local rules (+ the sort-plan
    # unique / Bloom-anti ref rules if configured), report persisted,
    # job ABORTS when any rule exceeds max_violations
    if validate_rules:
        def build_validate(sdir: str) -> dict:
            import pyarrow.parquet as pq

            from ddsketch_ray.functions.validate import validate_table

            ds_in = rd.read_parquet(input_files)
            rep = validate_table(ds_in, validate_rules)
            pq.write_table(rep, os.path.join(sdir, "report.parquet"))
            worst = {
                r["rule"] + ":" + r["col"]: int(n)
                for r, n in zip(validate_rules, rep.column("n_violations").to_pylist())
            }
            bad = {k: v for k, v in worst.items() if v > max_violations}
            if bad:
                raise ValueError(
                    f"input validation failed (> {max_violations} violations): {bad}"
                )
            return {"rule_counts": worst}

        stage(
            "stage0-validate",
            {"rules": validate_rules, "max_violations": max_violations},
            build_validate,
        )

    # ---- stage 1: prep (split → redact → token gate → exact dedup) ----
    def build_prep(sdir: str) -> dict:
        s, _job = corpus_prep_job(
            input_files,
            ckpt_dir=os.path.join(ckpt_dir, "prep"),
            out_dir=os.path.join(sdir, "corpus"),
            run_id=run_id,
            id_col=id_col,
            text_col=text_col,
            lang_col=lang_col,
            min_tokens=min_tokens,
            seed=seed,
            files_per_partition=files_per_partition,
            concurrency=concurrency,
        )
        return {"rows": s["survivor_rows"], "recomputed_parts": s["recomputed_partitions"]}

    p_prep = {"min_tokens": min_tokens, "seed": seed, "cols": [id_col, text_col, lang_col]}
    s1 = stage("stage1-prep", p_prep, build_prep)
    s1_files = _files(s1)

    # ---- stage 2: duplicated-substring removal over the redacted text ----
    def build_substring(sdir: str) -> dict:
        out, job = substring_dedup_checkpointed(
            s1_files,
            ckpt_dir=os.path.join(ckpt_dir, "substring"),
            run_id=run_id,
            id_col=id_col,
            text_col="redacted",
            window=window,
            seed=seed,
            concurrency=concurrency,
            files_per_partition=files_per_partition,
            num_buckets=num_buckets,
        )
        out.select_columns([id_col, "clean_text", "n_tokens", "dup_covered"]).write_parquet(
            os.path.join(sdir, "report")
        )
        return {"parts": len(job.partitions)}

    s2 = stage("stage2-substring", {"window": window, "seed": seed}, build_substring)
    s2_files = _files(s2)

    # ---- stage 3: MinHash near-dup dedup over the cleaned text ----
    def build_minhash(sdir: str) -> dict:
        assigns, job = minhash_dedup_checkpointed(
            s2_files,
            ckpt_dir=os.path.join(ckpt_dir, "minhash"),
            run_id=run_id,
            text_col="clean_text",
            id_col=id_col,
            jaccard_threshold=jaccard_threshold,
            seed=seed,
            concurrency=concurrency,
            files_per_partition=files_per_partition,
            num_buckets=num_buckets,
        )
        assigns.write_parquet(os.path.join(sdir, "assignments"))
        return {"parts": len(job.partitions)}

    s3 = stage(
        "stage3-minhash",
        {"jaccard_threshold": jaccard_threshold, "seed": seed},
        build_minhash,
    )

    # ---- stage 4: survivors ⋈ metadata [+ mixture] → final corpus ----
    def build_corpus(sdir: str) -> dict:
        import ray.data as rd

        surv = rd.read_parquet(_files(s3)).filter(expr="is_survivor == True")
        clean = rd.read_parquet(s2_files, columns=[id_col, "clean_text"])
        meta = rd.read_parquet(s1_files, columns=[id_col, lang_col, "split"])
        kept = equi_join_shuffle(
            clean, surv, id_col, id_col, ["clean_text"], [],
            num_buckets=num_buckets,
        )
        rows = equi_join_shuffle(
            kept, meta, id_col, id_col, ["clean_text"], [lang_col, "split"],
            num_buckets=num_buckets,
        )
        if mixture is not None:
            rows = resample_to_mixture(rows, id_col, lang_col, mixture, seed=seed)
        rows = rows.map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    lang_col: t.column(lang_col),
                    "split": t.column("split"),
                    text_col: t.column("clean_text"),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()
        n = rows.count()
        # sort by the partition column first (CLAUDE.md: unsorted hive
        # writes emit blocks × values files)
        rows.sort("split").write_parquet(
            os.path.join(sdir, "corpus"), partition_cols=["split"],
            min_rows_per_file=10_000,
        )
        return {"rows": n}

    s4 = stage(
        "stage4-corpus",
        {"mixture": mixture, "seed": seed},
        build_corpus,
    )
    train_files = sorted(
        glob.glob(os.path.join(s4, "corpus", "split=train", "*.parquet"))
    )

    # ---- stage 5: BPE tokenize-and-pack the train split ----
    def build_pack(sdir: str) -> dict:
        _manifest, info = tokenize_pack(
            train_files,
            ckpt_dir=os.path.join(ckpt_dir, "pack"),
            run_id=run_id,
            text_col=text_col,
            id_col=id_col,
            num_merges=num_merges,
            seq_len=seq_len,
            seqs_per_shard=seqs_per_shard,
            out_dir=os.path.join(sdir, "manifest"),
            concurrency=concurrency,
            files_per_partition=files_per_partition,
        )
        return {
            "n_merges": info["n_merges"],
            "encode_recomputed": info["encode_recomputed"],
        }

    s5 = stage(
        "stage5-pack",
        {"num_merges": num_merges, "seq_len": seq_len, "seqs_per_shard": seqs_per_shard},
        build_pack,
    )
    summary["corpus_dir"] = os.path.join(s4, "corpus")
    summary["manifest_dir"] = os.path.join(s5, "manifest")
    return summary
