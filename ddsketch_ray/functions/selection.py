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
tokens; beyond that use feature hashing (the paper's variant) at the
cost of SQL checkability. Logged, never silent.
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
):
    """Returns a Dataset (id_col, n_tokens:int64, iw:float64) scoring
    every raw doc: iw = Σ_occurrences lr_q(token) / (2^frac_bits ·
    n_tokens), lr(t) = ln((ct(t)+1)/(Tt+V)) − ln((cr(t)+1)/(Tr+V))
    with V = |union vocab|; zero-token docs get iw = 0. Both corpora
    are scanned once for counts; raw is scanned again for scoring."""
    import ray

    ct = _token_counts(target_ds, text_col).to_pandas()
    cr = _token_counts(raw_ds, text_col).to_pandas()
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
