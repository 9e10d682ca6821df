"""The flagship webpages sketch pipeline (north star / SURVEY.md §3).

Replaces the reference's three sequential entry points
(``/root/reference/main.cpp:402-945``: build per-shard sketches →
``DDS_MergeCollapse*`` → quantile-vs-oracle) with the Ray Data lifecycle:

    read_parquet (pruned columns) → map_batches derive (zero-copy Arrow)
      → ds.aggregate(multi-sketch)        [one shuffle, KB-sized partials]
      → driver-side query                 [quantiles / distincts / top-k]

Scale notes (the 100 TB design intent):
- the derive step projects away `html`/`text` IMMEDIATELY after computing
  byte lengths, so the only bytes that cross stage boundaries afterwards
  are (url-hash-sized) smalls — wide binary never enters the shuffle;
- all sketch aggregation is map-side combined: one partial sketch per
  block per aggregate, merged in Ray's hierarchical reduce (the shuffle
  moves KBs, independent of row count);
- grouped quantiles pre-aggregate per (block, lang) the same way; the
  dominant `en` group is safe because partials are per-block (bounded by
  #blocks × #langs rows into the final shuffle).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ddsketch_ray.agg import (
    DDSketchAgg,
    HeavyHittersAgg,
    HLLAgg,
    sketch_from_result,
)
from ddsketch_ray.extract import extract_text_series


def derive_page_features(batch: pa.Table) -> pa.Table:
    """Derive (url, lang, text_len, html_len, text_extracted_len) and DROP
    the wide columns. If `text` is absent, extracts it from `html` first.

    The extracted-vs-stored comparison feeds the byte-identical invariant:
    `extract_ok` is per-row equality of the pipeline's own extraction with
    the stored reference `text` column.
    """
    cols = batch.column_names
    out: dict = {}
    if "url" in cols:
        out["url"] = batch.column("url")
    if "lang" in cols:
        out["lang"] = batch.column("lang")
    if "html" in cols:
        out["html_len"] = pc.cast(pc.binary_length(batch.column("html")), pa.int64())
    if "text" in cols:
        text = batch.column("text")
        out["text_len"] = pc.cast(pc.binary_length(text), pa.int64())
        if "html" in cols:
            # vectorized Rust-regex extractor — byte-identical to the
            # per-row spec (extract.py: extract_text), asserted in tests
            extracted = extract_text_series(batch.column("html"))
            out["extract_ok"] = pc.cast(pc.equal(extracted, text), pa.int64())
    elif "html" in cols:
        extracted = extract_text_series(batch.column("html"))
        out["text_len"] = pc.cast(pc.binary_length(extracted), pa.int64())
    return pa.table(out)


def webpages_sketch_report(
    ds,
    qs=(0.5, 0.95, 0.99),
    alpha: float = 0.008,
    top_langs: int = 10,
) -> dict:
    """One aggregate pass → all headline sketch answers.

    ds: Dataset with webpages schema (url/html/text/lang at minimum).
    Returns {text_len_quantiles, html_len_quantiles, distinct_urls,
    top_langs, extract_ok_count, rows}.
    """
    schema_names = ds.schema().names
    if "text_len" in schema_names:  # caller already derived (fused path)
        feats = ds
    else:
        feats = ds.map_batches(derive_page_features, batch_format="pyarrow", batch_size=None)
    aggs = [
        DDSketchAgg(on="text_len", qs=list(qs), alpha=alpha, alias_name="q_text_len"),
        DDSketchAgg(on="html_len", qs=list(qs), alpha=alpha, alias_name="q_html_len"),
        HLLAgg(on="url", alias_name="distinct_urls"),
        HeavyHittersAgg(on="lang", alias_name="hh_langs"),
    ]
    from ray.data.aggregate import Count, Sum

    has_extract = "extract_ok" in feats.schema().names
    if has_extract:
        aggs.append(Sum(on="extract_ok", alias_name="extract_ok_count"))
    aggs.append(Count(alias_name="rows"))
    res = feats.aggregate(*aggs)
    hh = sketch_from_result(res["hh_langs"])
    report = {
        "qs": list(qs),
        "text_len_quantiles": res["q_text_len"],
        "html_len_quantiles": res["q_html_len"],
        "distinct_urls": int(res["distinct_urls"]),
        "top_langs": hh.top_k(top_langs),
        "rows": int(res["rows"]),
    }
    if has_extract:
        report["extract_ok_count"] = int(res["extract_ok_count"])
        report["extract_byte_identical"] = report["extract_ok_count"] == report["rows"]
    return report


def quantiles_by_group(
    ds,
    value_col: str,
    group_col: str,
    qs=(0.5, 0.95, 0.99),
    alpha: float = 0.008,
    alias: str = "est",
    agg_cls=None,
    **agg_kwargs,
):
    """Grouped quantile sketch → long-format Dataset
    (group_col, q, {alias}) with one row per (group, quantile).

    agg_cls: any quantile sketch aggregate with the (on, qs, alias_name)
    interface — DDSketchAgg (default), TDigestAgg, KLLAgg.

    The groupby shuffles only per-block partial sketches (map-side
    combined by Ray's aggregate), so group skew costs nothing extra.
    """
    qs = [float(q) for q in qs]
    if agg_cls is None or agg_cls is DDSketchAgg:
        agg_kwargs.setdefault("alpha", alpha)
        agg = DDSketchAgg(on=value_col, qs=qs, alias_name="_qvals", **agg_kwargs)
    else:
        agg = agg_cls(on=value_col, qs=qs, alias_name="_qvals", **agg_kwargs)
    grouped = ds.groupby(group_col).aggregate(agg)

    def explode(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        vals = batch.column("_qvals").to_pylist()
        g_out, q_out, v_out = [], [], []
        for g, vlist in zip(groups, vals):
            for q, v in zip(qs, vlist):
                g_out.append(g)
                q_out.append(q)
                v_out.append(v)
        return pa.table(
            {
                group_col: pa.array(g_out, type=batch.schema.field(group_col).type),
                "q": pa.array(q_out, type=pa.float64()),
                alias: pa.array(v_out, type=pa.float64()),
            }
        )

    return grouped.map_batches(explode, batch_format="pyarrow", batch_size=None)
