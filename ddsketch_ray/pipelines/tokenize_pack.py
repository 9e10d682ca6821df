"""Tokenize-and-pack: the last mile of a pretraining data pipeline.

Composes the repo's BPE tokenizer (functions/text.py:train_bpe /
BPEEncode) with the distributed prefix-scan packer
(functions/pack.py:pack_sequences / pack_manifest) into ONE resumable,
checkpointed job emitting hive-partitioned token-shard manifests — the
artifact a training loader actually consumes (which token span of which
doc fills which slice of which fixed-length sequence, sharded by
sequence range so the loader reads one shard directory per worker).

Checkpoint layout under ``ckpt_dir/run_id/``:

- ``bpe_merges.json`` — trained merge list + lineage (input file set,
  num_merges, max_word_vocab); reloaded when lineage matches, retrained
  otherwise (atomic tmp+rename write).
- ``map-part-NNNNN.parquet`` — per-input-shard (id, n_bpe_tokens)
  encode parts via state/checkpoint.py:CheckpointedMapJob (the dominant
  cost: per-word BPE merge application; resumable per shard, lineage in
  parquet metadata).

The pack/manifest phase is a pure recompute over the encode parts (two
narrow distributed sorts — cheap relative to encoding), so a crashed
run re-runs it after skipping finished train/encode work.

No reference counterpart (gmorleo/DDSketch is a sketch library;
SURVEY.md §2.3) — this is a north-rule/webtext training-data addition.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa


def _merges_ckpt_path(job_dir: str) -> str:
    return os.path.join(job_dir, "bpe_merges.json")


def train_bpe_checkpointed(
    input_files: list[str],
    job_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 30,
    max_word_vocab: int | None = None,
) -> dict:
    """train_bpe with a lineage-checked JSON checkpoint: if
    ``job_dir/bpe_merges.json`` exists and its lineage (sorted input
    file list, num_merges, max_word_vocab) matches, the stored merges
    load instead of retraining. Returns the train_bpe dict + "resumed"
    flag."""
    import ray.data as rd

    from ddsketch_ray.functions.text import train_bpe

    lineage = {
        "input_files": sorted(input_files),
        "num_merges": int(num_merges),
        "max_word_vocab": max_word_vocab,
    }
    path = _merges_ckpt_path(job_dir)
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
        if stored.get("lineage") == lineage:
            fit = stored["fit"]
            fit["merges"] = [tuple(p) for p in fit["merges"]]
            fit["resumed"] = True
            return fit
    ds = rd.read_parquet(sorted(input_files), columns=[id_col, text_col])
    fit = train_bpe(
        ds,
        num_merges=num_merges,
        text_col=text_col,
        doc_id_col=id_col,
        max_word_vocab=max_word_vocab,
    )
    os.makedirs(job_dir, exist_ok=True)
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"lineage": lineage, "fit": {**fit, "merges": [list(p) for p in fit["merges"]]}}, f)
    os.replace(tmp, path)  # atomic
    fit["resumed"] = False
    return fit


def _make_encode_fn(merges, text_col: str, id_col: str):
    """Picklable per-chunk encode fn with a lazily built BPEEncode —
    the encoder (merge-rank table + word→length memo) is constructed
    ONCE per worker process and shared across that worker's chunks."""
    from ddsketch_ray.functions.text import BPEEncode

    holder: dict = {}

    def encode_fn(t: pa.Table) -> pa.Table:
        enc = holder.get("enc")
        if enc is None:
            enc = holder["enc"] = BPEEncode(merges, text_col=text_col, doc_id_col=id_col)
        return enc(t)

    return encode_fn


def tokenize_pack(
    input_files: list[str],
    ckpt_dir: str,
    run_id: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 30,
    max_word_vocab: int | None = None,
    seq_len: int = 512,
    seqs_per_shard: int = 1024,
    out_dir: str | None = None,
    concurrency: int = 8,
    files_per_partition: int = 1,
):
    """Resumable train→encode→pack pipeline. Returns
    (manifest Dataset, info dict). Manifest columns: ``shard``
    (= seq_id // seqs_per_shard — the hive partition key), ``seq_id``,
    id_col, ``doc_off``, ``seq_off``, ``take_n``. With ``out_dir``, the
    manifest is written hive-partitioned by ``shard`` (one directory
    per sequence range — resumable downstream, never one giant file).
    """
    import ray.data as rd

    from ddsketch_ray.functions.pack import pack_manifest
    from ddsketch_ray.state.checkpoint import CheckpointedMapJob

    run_id = run_id or uuid.uuid4().hex[:12]
    job_dir = os.path.join(ckpt_dir, run_id)

    fit = train_bpe_checkpointed(
        input_files,
        job_dir,
        text_col=text_col,
        id_col=id_col,
        num_merges=num_merges,
        max_word_vocab=max_word_vocab,
    )

    # encode parts live under a directory keyed by the TOKENIZER
    # fingerprint: a changed merge list (retrained after a lineage
    # mismatch) must invalidate every encode part, not silently reuse
    # counts from the old tokenizer — CheckpointedMapJob's own lineage
    # tracks input files only
    import hashlib

    digest = hashlib.md5(
        json.dumps([list(p) for p in fit["merges"]]).encode()
    ).hexdigest()[:12]
    job = CheckpointedMapJob(
        list(input_files),
        _make_encode_fn(fit["merges"], text_col, id_col),
        columns=[id_col, text_col],
        ckpt_dir=ckpt_dir,
        run_id=os.path.join(run_id, f"enc-{digest}"),
        files_per_partition=files_per_partition,
    )
    pending_before = len(job.pending_partitions())
    part_files = job.run(concurrency=concurrency)

    counts = rd.read_parquet(part_files)
    manifest = pack_manifest(counts, id_col, "n_bpe_tokens", seq_len)

    def with_shard(t: pa.Table) -> pa.Table:
        sid = t.column("seq_id").to_numpy()
        return t.append_column(
            "shard", pa.array((sid // seqs_per_shard).astype(np.int64))
        )

    manifest = manifest.map_batches(with_shard, batch_format="pyarrow", batch_size=None)
    if out_dir:
        manifest.write_parquet(out_dir, partition_cols=["shard"])

    info = {
        "run_id": run_id,
        "merges_resumed": bool(fit.get("resumed")),
        "n_merges": len(fit["merges"]),
        "n_words": fit["n_words"],
        "truncated_words": fit["truncated_words"],
        "encode_partitions": len(job.partitions),
        "encode_recomputed": pending_before,
        "encode_manifest": job.manifest(),
        "seq_len": seq_len,
        "seqs_per_shard": seqs_per_shard,
        "out_dir": out_dir,
    }
    return manifest, info
