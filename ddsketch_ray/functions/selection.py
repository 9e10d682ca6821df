"""Data selection by importance weighting (DSIR-style).

``unigram_importance`` — score every raw document by how target-like it
is: the mean per-token log-likelihood ratio between a TARGET unigram
language model and the RAW-corpus unigram model (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023 — the hashed-ngram variant uses feature hashing; this
implementation keeps EXACT token identities so an independent SQL
oracle can recompute every count and every log term).

Plan: two distributed token-count passes (the ``vocab_stats`` per-block
polars pre-agg + sort-plan rollup — shuffles carry pre-aggregated
(token, count) rows only), one tiny driver table of add-1-smoothed
log ratios, then a pure scoring map: per batch, polars explode + join
against the broadcast ratio table, per-doc integer sums.

Determinism: the per-token log ratio is quantized ONCE driver-side to
``rint(lr × 2^20)`` int64, so per-doc sums are order-independent
integer adds — bit-identical across layouts/cluster sizes, and the SQL
oracle mirrors the same ``round_even`` quantization.

Footprint: the broadcast ratio table is O(vocab) — fine to ~10^7
tokens; beyond that use ``hashed_unigram_importance`` (the paper's
feature-hashing formulation): tokens hash into a FIXED ``n_buckets``
space, so the driver ratio table and the broadcast are constant-size
regardless of raw-web vocabulary growth. The bucket hash
(``hashing.polyhash_strings``) is mod-2^64 arithmetic a DuckDB oracle
replays exactly, so the hashed variant keeps a REAL SQL oracle too.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ddsketch_ray.functions.text import TOKEN_PATTERN


def _token_counts(ds, text_col: str):
    """Distributed exact (token, n_occ) table via the vocab machinery."""
    from ddsketch_ray.functions.analytics import sorted_sum_rollup

    def partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column(text_col).cast(pa.large_string())).fill_null("")
        toks = pl.DataFrame({"tok": s.str.extract_all(TOKEN_PATTERN)}).explode("tok")
        toks = toks.filter(pl.col("tok").is_not_null())
        g = toks.group_by("tok").agg(n=pl.len().cast(pl.Int64))
        return pa.table(
            {"tok": g["tok"].to_arrow().cast(pa.string()),
             "n": pa.array(g["n"].to_numpy(), pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return sorted_sum_rollup(partials, "tok", ["n"])


def unigram_importance(
    raw_ds,
    target_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    frac_bits: int = 20,
    mode: str = "auto",
    exact_vocab_limit: int = 2_000_000,
    n_buckets: int = 1 << 18,
    seed: int = 0,
):
    """Returns a Dataset (id_col, n_tokens:int64, iw:float64) scoring
    every raw doc: iw = Σ_occurrences lr_q(token) / (2^frac_bits ·
    n_tokens), lr(t) = ln((ct(t)+1)/(Tt+V)) − ln((cr(t)+1)/(Tr+V))
    with V = |union vocab|; zero-token docs get iw = 0. Both corpora
    are scanned once for counts; raw is scanned again for scoring.

    ``mode`` (the dedup-substrate ``auto`` pattern, r4 verdict item 4):
    ``"exact"`` always pulls the O(vocab) ratio table to the driver;
    ``"hashed"`` always routes to ``hashed_unigram_importance``;
    ``"auto"`` (default) counts the raw corpus's distinct tokens
    DISTRIBUTED first (one O(blocks) ``count()`` over the materialized
    rollup — the vocabulary never crosses the driver to be measured)
    and falls over to the hashed estimator above ``exact_vocab_limit``
    (default 2M distinct tokens ≈ ~0.3 GB of driver table + broadcast —
    measured in BASELINE.md's dsir-gate stress row; raw web text
    exceeds this fast, which is exactly the accidental-OOM this gate
    removes).  The hashed route is the estimator Xie et al. 2023 run
    at scale — scores differ from exact by design; callers that need
    the exact formulation on a big vocab must pass ``mode="exact"``
    knowingly."""
    import ray

    if mode not in ("auto", "exact", "hashed"):
        raise ValueError("mode must be 'auto', 'exact' or 'hashed'")
    if mode == "hashed":
        return hashed_unigram_importance(
            raw_ds, target_ds, id_col, text_col, n_buckets, frac_bits, seed
        )
    cr_ds = _token_counts(raw_ds, text_col).materialize()
    if mode == "auto" and cr_ds.count() > exact_vocab_limit:
        return hashed_unigram_importance(
            raw_ds, target_ds, id_col, text_col, n_buckets, frac_bits, seed
        )
    ct = _token_counts(target_ds, text_col).to_pandas()
    cr = cr_ds.to_pandas()
    merged = cr.merge(ct, on="tok", how="outer", suffixes=("_r", "_t")).fillna(0)
    V = len(merged)
    Tt = int(merged["n_t"].sum())
    Tr = int(merged["n_r"].sum())
    lr = np.log((merged["n_t"].to_numpy(np.float64) + 1.0) / (Tt + V)) - np.log(
        (merged["n_r"].to_numpy(np.float64) + 1.0) / (Tr + V)
    )
    scale = float(1 << frac_bits)
    lrq = np.rint(lr * scale).astype(np.int64)
    table = pl.DataFrame({"tok": merged["tok"].to_numpy(), "lrq": lrq})
    ref = ray.put(table)

    def score(t: pa.Table) -> pa.Table:
        lrt = ray.get(ref)
        s = pl.from_arrow(t.column(text_col).cast(pa.large_string())).fill_null("")
        df = pl.DataFrame(
            {
                "i": pl.from_arrow(t.column(id_col).cast(pa.int64())),
                "tok": s.str.extract_all(TOKEN_PATTERN),
            }
        )
        ex = df.explode("tok").filter(pl.col("tok").is_not_null())
        ex = ex.join(lrt, on="tok", how="left").with_columns(
            pl.col("lrq").fill_null(0)
        )
        agg = ex.group_by("i").agg(
            n=pl.len().cast(pl.Int64), s=pl.col("lrq").sum().cast(pl.Int64)
        )
        base = pl.DataFrame({"i": pl.from_arrow(t.column(id_col).cast(pa.int64()))})
        out = base.join(agg, on="i", how="left").with_columns(
            pl.col("n").fill_null(0), pl.col("s").fill_null(0)
        )
        n = out["n"].to_numpy().astype(np.int64)
        sm = out["s"].to_numpy().astype(np.float64)
        iw = np.where(n > 0, sm / (scale * np.maximum(n, 1)), 0.0)
        return pa.table(
            {
                id_col: pa.array(out["i"].to_numpy().astype(np.int64)),
                "n_tokens": pa.array(n),
                "iw": pa.array(iw),
            }
        )

    return raw_ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def _bucket_counts(ds, text_col: str, n_buckets: int, seed: int) -> np.ndarray:
    """Dense int64 occurrence counts over the fixed bucket space.

    Per-block partial: tokenize → polyhash → ``bincount`` into the
    constant-size bucket vector, emit only the nonzero (bucket, n) rows;
    the sort-plan rollup then sums per bucket, so the shuffle carries at
    most ``n_buckets`` pre-aggregated rows per block and the driver pull
    is ≤ ``n_buckets`` rows — constant by construction, never O(vocab)."""
    from ddsketch_ray.functions.analytics import sorted_sum_rollup
    from ddsketch_ray.hashing import polyhash_strings

    def partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column(text_col).cast(pa.large_string())).fill_null("")
        toks = s.str.extract_all(TOKEN_PATTERN).explode().drop_nulls()
        if toks.len() == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        bk = (polyhash_strings(toks.to_arrow(), seed=seed) % np.uint64(n_buckets)).astype(
            np.int64
        )
        cnt = np.bincount(bk, minlength=n_buckets)
        nzb = np.nonzero(cnt)[0]
        return pa.table(
            {"bucket": pa.array(nzb.astype(np.int64)), "n": pa.array(cnt[nzb].astype(np.int64))}
        )

    rolled = sorted_sum_rollup(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), "bucket", ["n"]
    ).to_pandas()  # ≤ n_buckets rows — constant-size by design
    dense = np.zeros(n_buckets, dtype=np.int64)
    if len(rolled):
        dense[rolled["bucket"].to_numpy().astype(np.int64)] = rolled["n"].to_numpy()
    return dense


def hashed_unigram_importance(
    raw_ds,
    target_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    frac_bits: int = 20,
    seed: int = 0,
):
    """DSIR importance weighting with FEATURE HASHING (the formulation
    Xie et al. 2023 actually run at scale): tokens map to a fixed
    ``n_buckets`` space via ``polyhash_strings``, so the smoothed
    log-ratio table is a constant-size dense int64 vector — broadcast
    once, indexed per token — and nothing grows with the raw-web
    vocabulary. Returns (id_col, n_tokens:int64, iw:float64) with
    iw = Σ_occ lr_q(bucket(tok)) / (2^frac_bits · n_tokens),
    lr(b) = ln((ct(b)+1)/(Tt+B)) − ln((cr(b)+1)/(Tr+B)), B = n_buckets.

    Same determinism contract as ``unigram_importance``: ratios are
    quantized ONCE driver-side (rint → int64), per-doc sums are
    order-independent integer adds, and every step — including the
    bucket hash — is recomputed by a real DuckDB oracle
    (``dsir_hashed_importance_docs``)."""
    import ray

    from ddsketch_ray.hashing import polyhash_strings

    ct = _bucket_counts(target_ds, text_col, n_buckets, seed)
    cr = _bucket_counts(raw_ds, text_col, n_buckets, seed)
    Tt, Tr = int(ct.sum()), int(cr.sum())
    lr = np.log((ct + 1.0) / (Tt + n_buckets)) - np.log((cr + 1.0) / (Tr + n_buckets))
    scale = float(1 << frac_bits)
    lrq_ref = ray.put(np.rint(lr * scale).astype(np.int64))

    def score(t: pa.Table) -> pa.Table:
        lrq = ray.get(lrq_ref)  # dense n_buckets vector, zero-copy per task
        s = pl.from_arrow(t.column(text_col).cast(pa.large_string())).fill_null("")
        toks = s.str.extract_all(TOKEN_PATTERN)
        lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        sums = np.zeros(len(lens), dtype=np.int64)
        flat = toks.explode().drop_nulls()
        if flat.len():
            bk = (polyhash_strings(flat.to_arrow(), seed=seed) % np.uint64(n_buckets)).astype(
                np.int64
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nz = lens > 0
            sums[nz] = np.add.reduceat(lrq[bk], starts[nz])
        iw = np.where(lens > 0, sums / (scale * np.maximum(lens, 1)), 0.0)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "n_tokens": pa.array(lens),
                "iw": pa.array(iw),
            }
        )

    return raw_ds.map_batches(score, batch_format="pyarrow", batch_size=None)
