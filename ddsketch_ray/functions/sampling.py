"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need splits and samples that are (a) stable
across runs, cluster sizes, and block layouts, (b) computable per batch
with no coordination, and (c) reproducible by an external oracle. Both
operators here derive everything from ``hashing.hash_ints`` /
``hash_strings`` (SplitMix64 family — the same hash the KMV/WRS SQL
oracles recompute in mod-2^64 arithmetic), so membership is a pure
function of (id, seed): re-running on 1 CPU or 256 nodes yields the
identical split.

- ``assign_split_batch`` / ``hash_split`` — integer-weighted
  train/val/test assignment: ``bucket = h % sum(weights)`` and a
  cumulative-weight lookup. Integer math end-to-end; no float
  thresholds, so the SQL oracle (CASE over the same modulus) matches
  bit-for-bit.
- ``hash_sample`` — deterministic Bernoulli-style sample: keep iff
  ``h % 1_000_000 < rate_ppm``. Rate is parts-per-million (exact).

Scale: both are embarrassingly parallel map stages — no shuffle, no
driver state; composing with ``small_key_rollup`` keeps split audits at
O(blocks × splits) driver rows.

Reference scope note: gmorleo/DDSketch has no sampling surface
(SURVEY.md §2.3 "Sorts/limits/top-k/sampling: none"); this is
north-rule / training-pipeline coverage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ray.hashing import hash_ints, hash_strings


def _id_hashes(col: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    """uint64 hash of an id column (integer or string)."""
    if col.null_count:
        raise ValueError("id column must be non-null for hash split/sample")
    if pa.types.is_integer(col.type):
        arr = col.to_numpy(zero_copy_only=False)
        return hash_ints(arr.astype(np.int64), seed)
    return hash_strings(col, seed)


def assign_split_batch(
    batch: pa.Table,
    id_col: str,
    weights: list[tuple[str, int]],
    seed: int = 0,
    out_col: str = "split",
) -> pa.Table:
    """Append ``out_col``: the split label for each row.

    ``weights`` is an ordered list of (label, integer_weight); a row
    lands in label i iff ``h % total`` falls in i's cumulative-weight
    interval. Order matters (it defines the intervals) — keep it fixed
    across runs.
    """
    labels = [l for l, _ in weights]
    w = np.array([int(n) for _, n in weights], dtype=np.int64)
    if (w <= 0).any():
        raise ValueError("weights must be positive integers")
    cum = np.cumsum(w)
    h = _id_hashes(batch.column(id_col), seed)
    bucket = (h % np.uint64(cum[-1])).astype(np.int64)
    idx = np.searchsorted(cum, bucket, side="right")
    lab = pa.DictionaryArray.from_arrays(
        pa.array(idx, type=pa.int32()), pa.array(labels, type=pa.string())
    ).cast(pa.string())
    return batch.append_column(out_col, lab)


def hash_split(ds, id_col: str, weights: list[tuple[str, int]], seed: int = 0, out_col: str = "split"):
    """Dataset-level split assignment: adds ``out_col`` via one
    narrow map stage. Filter on it downstream (predicate pushdown keeps
    each split a streaming view of the same read)."""
    return ds.map_batches(
        lambda t: assign_split_batch(t, id_col, weights, seed, out_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def sample_mask_batch(
    batch: pa.Table, id_col: str, rate_ppm: int, seed: int = 0
) -> np.ndarray:
    """Boolean keep-mask for a deterministic ``rate_ppm``/1e6 sample."""
    if not (0 <= rate_ppm <= 1_000_000):
        raise ValueError("rate_ppm must be in [0, 1_000_000]")
    h = _id_hashes(batch.column(id_col), seed)
    return (h % np.uint64(1_000_000)).astype(np.int64) < rate_ppm


def hash_sample(ds, id_col: str, rate_ppm: int, seed: int = 0):
    """Deterministic sample of ≈ rate_ppm/1e6 of the rows (exact
    membership function, approximate fraction). Pure filter — streams."""
    return ds.map_batches(
        lambda t: t.filter(pa.array(sample_mask_batch(t, id_col, rate_ppm, seed))),
        batch_format="pyarrow",
        batch_size=None,
    )

def mixture_rates(counts: dict, weights: list[tuple[str, int]]) -> tuple[int, dict]:
    """Given per-group row counts and integer target-mixture weights,
    compute the LARGEST total T achievable at proportions w_g/W without
    up-sampling any group, and the per-group keep rate in ppm:

        T          = min_g floor(N_g * W / w_g)
        rate_ppm_g = floor(T * w_g * 1_000_000 / (W * N_g))

    Pure Python-int math (no float, no overflow at any corpus size);
    groups named in ``weights`` but absent (or empty) in the data raise
    — the target mixture is unreachable. Returns (T, {group: ppm})."""
    W = sum(int(w) for _, w in weights)
    if W <= 0 or any(int(w) <= 0 for _, w in weights):
        raise ValueError("mixture weights must be positive integers")
    for g, _ in weights:
        if int(counts.get(g, 0)) <= 0:
            raise ValueError(f"mixture group {g!r} has no rows")
    T = min(int(counts[g]) * W // int(w) for g, w in weights)
    rates = {
        g: min(1_000_000, T * int(w) * 1_000_000 // (W * int(counts[g])))
        for g, w in weights
    }
    return T, rates


def resample_to_mixture(
    ds,
    id_col: str,
    group_col: str,
    weights: list[tuple[str, int]],
    seed: int = 0,
    weight_col: str | None = None,
):
    """Deterministic down-sampling to a target group mixture (the
    corpus data-mixing op: "make the kept corpus w_g/W parts group g,
    keeping as much data as possible"). Two passes: one tiny counting
    rollup (O(blocks × groups) driver rows via the two-level partial
    plan), then a pure vectorized filter — keep iff
    ``SplitMix64(id) % 1e6 < rate_ppm[group]``. Membership is a pure
    function of (id, seed), so the result is identical across block
    layouts and cluster sizes, and a SQL oracle can recompute it
    bit-for-bit. Groups not named in ``weights`` are dropped. The input
    is scanned twice — pass a materialized/cheaply-re-readable Dataset.
    Returns the filtered Dataset (same schema).

    ``weight_col`` switches the mixture unit from rows to that int64
    column's mass — e.g. TOKENS, the unit LLM data mixtures are
    actually specified in: group sizes become SUM(weight), the rate
    math is unchanged, and the Bernoulli row filter keeps each group's
    EXPECTED kept mass at w_g·T/W (exact proportions in expectation;
    per-doc weights make the realized mass hash-noise around it)."""
    from ddsketch_ray.functions.analytics import small_key_rollup

    keep_cols = [group_col] + ([weight_col] if weight_col else [])
    keyed = ds.map_batches(
        lambda t: t.select(keep_cols),
        batch_format="pyarrow",
        batch_size=None,
    )
    if weight_col:
        part = small_key_rollup(keyed, [group_col], sums=[("n", weight_col)])
    else:
        part = small_key_rollup(keyed, [group_col], count_alias="n")
    counts = {
        g: int(n)
        for g, n in zip(
            part.column(group_col).to_pylist(), part.column("n").to_pylist()
        )
    }
    _, rates = mixture_rates(counts, weights)
    labels = pa.array([g for g, _ in weights], type=pa.string())
    ppm = np.array([rates[g] for g, _ in weights], dtype=np.int64)

    def keep(t: pa.Table) -> pa.Table:
        if t.column(group_col).null_count:
            raise ValueError("resample_to_mixture: null group values")
        idx = pa.compute.index_in(t.column(group_col), value_set=labels)
        iv = idx.to_numpy(zero_copy_only=False)
        known = ~np.isnan(iv) if iv.dtype.kind == "f" else np.ones(len(iv), bool)
        rate = np.where(known, ppm[np.where(known, iv, 0).astype(np.int64)], 0)
        h = _id_hashes(t.column(id_col), seed)
        m = (h % np.uint64(1_000_000)).astype(np.int64) < rate
        return t.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)

def stratified_sample(ds, group_col: str, id_col: str, k: int, seed: int = 0):
    """EXACTLY k rows per group (fewer only if the group is smaller) —
    the eval-set-per-stratum shape when quotas must be exact, unlike the
    Bernoulli ``hash_sample`` (approximate size) or grouped KMV (global
    k split across groups). Deterministic coordinated sample: rank =
    position in SplitMix64(id) order within the group, keep rank ≤ k.

    Plan: one hash column (order-preserving uint64→int64 shift so the
    distributed sort ranks identically to the unsigned hash), then the
    ``grouped_topk`` sort plan in ascending mode — one distributed
    sort, per-block first-k, O(blocks·k) edge stitching. Returns a
    Dataset (group_col, _h, id_col, rank); rank is 1-based by hash
    order, reproducible by a SQL oracle (ROW_NUMBER over the recomputed
    hash)."""
    from ddsketch_ray.functions.analytics import grouped_topk

    def add_hash(t: pa.Table) -> pa.Table:
        h = _id_hashes(t.column(id_col), seed)
        shifted = (h ^ np.uint64(1 << 63)).view(np.int64)
        return t.append_column("_h", pa.array(shifted))

    hd = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)
    return grouped_topk(hd, group_col, "_h", k, id_col, ascending=True)
