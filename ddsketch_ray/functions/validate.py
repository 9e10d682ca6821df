"""Declarative data-quality validation over a Dataset.

The operator a 100-TB ingest pipeline runs BEFORE the expensive stages:
a rule list in, one exact violation count per rule out, computed with
the cheapest plan each rule class admits —

- **row-local rules** (`not_null`, `in_range`, `in_set`, `regex`,
  `positive`): ONE shared streaming `map_batches` pass evaluates every
  such rule with pyarrow C++ kernels and emits per-block counts; the
  driver folds O(blocks × rules) integers. Zero shuffle, zero
  materialization, all rules amortize the same scan.
- **`unique`**: violations = n_rows − n_nulls − COUNT(DISTINCT), via
  the existing sort-plan `dedup.distinct_count` (driver payload
  3 values/block — never the values themselves). SQL semantics: nulls
  don't participate in uniqueness here (count them with `not_null`).
- **`ref`** (referential integrity): orphan rows = non-null keys absent
  from the reference table, counted through
  ``joins.semi_join_bloom(anti=True)`` — the Bloom-pruned anti join,
  so the all-to-all carries only the ~orphan sliver even when the
  reference side is millions of keys.

Every rule's count is exactly the COUNT(*) a SQL WHERE would produce —
the gate queries `validate_orders` / `validate_sample_orders` replay
each rule in DuckDB.

Rules are dicts (JSON-serializable, so a validation suite can live in
config): ``{"rule": "not_null", "col": c}``, ``{"rule": "in_range",
"col": c, "lo": x, "hi": y}`` (inclusive; violations = value outside
OR null excluded — nulls are NOT range violations, match SQL
three-valued logic), ``{"rule": "in_set", "col": c, "values": [...]}``,
``{"rule": "regex", "col": c, "pattern": p}`` (full-match NOT
required; violation = no match anywhere; nulls skipped),
``{"rule": "positive", "col": c}``, ``{"rule": "unique", "col": c}``,
``{"rule": "ref", "col": c, "ref_col": c2}`` + the reference Dataset
passed via ``refs={rule_index: ref_ds}`` or inline ``ref_ds`` key.

Returns a pyarrow Table (rule_id, rule, col, n_violations) ordered by
rule_id. Reference scope note: gmorleo/DDSketch has no validation
operators — north-rule pipeline addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["validate_table", "sample_violations"]

_ROW_LOCAL = ("not_null", "in_range", "in_set", "regex", "positive")


def _row_local_counts(ds, rules: list[tuple[int, dict]]) -> dict[int, int]:
    """One streaming pass; per block one count per rule; driver folds
    O(blocks × rules) ints."""
    import ray

    specs = [(i, dict(r)) for i, r in rules]

    def block_counts(t: pa.Table) -> pa.Table:
        out_ids = []
        out_ns = []
        for rid, r in specs:
            col = t.column(r["col"])
            kind = r["rule"]
            if kind == "not_null":
                n = col.null_count
            elif kind == "in_range":
                valid = pc.is_valid(col)
                bad = pc.or_(
                    pc.less(col, r["lo"]), pc.greater(col, r["hi"])
                )
                n = pc.sum(pc.and_(valid, pc.fill_null(bad, False))).as_py() or 0
            elif kind == "in_set":
                valid = pc.is_valid(col)
                miss = pc.invert(pc.is_in(col, value_set=pa.array(r["values"])))
                n = pc.sum(pc.and_(valid, pc.fill_null(miss, False))).as_py() or 0
            elif kind == "regex":
                valid = pc.is_valid(col)
                nomatch = pc.invert(pc.match_substring_regex(col, r["pattern"]))
                n = pc.sum(pc.and_(valid, pc.fill_null(nomatch, False))).as_py() or 0
            elif kind == "positive":
                valid = pc.is_valid(col)
                bad = pc.less_equal(col, 0)
                n = pc.sum(pc.and_(valid, pc.fill_null(bad, False))).as_py() or 0
            else:  # pragma: no cover — filtered by caller
                n = 0
            out_ids.append(rid)
            out_ns.append(int(n))
        return pa.table(
            {"rid": pa.array(out_ids, pa.int64()), "n": pa.array(out_ns, pa.int64())}
        )

    totals: dict[int, int] = {i: 0 for i, _ in specs}
    if not specs:
        return totals
    for tb in ray.get(
        ds.map_batches(block_counts, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    ):
        if tb.num_rows == 0 or "rid" not in tb.column_names:
            continue  # empty input skips the UDF, keeps input schema
        for rid, n in zip(tb.column("rid").to_pylist(), tb.column("n").to_pylist()):
            totals[rid] += n
    return totals


def validate_table(ds, rules: list[dict], refs: dict[int, object] | None = None) -> pa.Table:
    """Run every rule, return (rule_id, rule, col, n_violations). See
    module docstring for plans per rule class. ``refs`` maps a rule's
    index in ``rules`` to the reference Dataset for ``ref`` rules
    (alternatively pass the Dataset inline under the ``ref_ds`` key)."""
    refs = dict(refs or {})
    rules = [dict(r) for r in rules]
    for r in rules:
        if r["rule"] not in _ROW_LOCAL + ("unique", "ref"):
            raise ValueError(f"unknown rule {r['rule']!r}")

    row_local = [(i, r) for i, r in enumerate(rules) if r["rule"] in _ROW_LOCAL]
    counts = _row_local_counts(ds, row_local)

    for i, r in enumerate(rules):
        if r["rule"] == "unique":
            from ddsketch_ray.functions.dedup import distinct_count

            col = r["col"]
            stats = _row_local_counts(ds, [(0, {"rule": "not_null", "col": col})])
            n_nulls = stats[0]
            n_rows = ds.count()
            counts[i] = int(n_rows - n_nulls - distinct_count(ds, col))
        elif r["rule"] == "ref":
            from ddsketch_ray.functions.joins import semi_join_bloom

            ref_ds = r.get("ref_ds") or refs.get(i)
            if ref_ds is None:
                raise ValueError(f"rule {i} (ref) needs a reference Dataset")
            col = r["col"]
            orphans = semi_join_bloom(
                ds, ref_ds, col, r["ref_col"], [], anti=True
            )
            # anti keeps null-key rows (NOT EXISTS) but a null FK is not
            # an integrity violation — count only non-null orphans
            n = 0
            import ray

            for tb in ray.get(
                orphans.map_batches(
                    lambda t: pa.table(
                        {
                            "n": pa.array(
                                [t.num_rows - t.column(col).null_count], pa.int64()
                            )
                        }
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
                .materialize()
                .to_arrow_refs()
            ):
                if tb.num_rows == 0 or "n" not in tb.column_names:
                    continue
                n += sum(tb.column("n").to_pylist())
            counts[i] = int(n)

    return pa.table(
        {
            "rule_id": pa.array(range(len(rules)), pa.int64()),
            "rule": pa.array([r["rule"] for r in rules], pa.string()),
            "col": pa.array([r["col"] for r in rules], pa.string()),
            "n_violations": pa.array(
                [int(counts[i]) for i in range(len(rules))], pa.int64()
            ),
        }
    )


def sample_violations(
    ds,
    rule: dict,
    id_col: str,
    k: int = 10,
    extra_cols: tuple = (),
) -> pa.Table:
    """Deterministic examples for a ROW-LOCAL rule: the k violating
    rows with the LOWEST ``id_col`` (not "first seen" — that would
    depend on block layout). Per block: evaluate the rule mask, keep
    the block's k lowest ids; driver merges O(blocks × k) rows and
    truncates — the grouped-top-k candidate argument. SQL replay:
    ``WHERE <violation> ORDER BY id LIMIT k``. Returns
    (id_col, col, *extra_cols) with the checked column's values intact
    (nulls included for not_null)."""
    import ray

    kind = rule["rule"]
    if kind not in _ROW_LOCAL:
        raise ValueError(
            f"sample_violations covers row-local rules only, not {kind!r}"
        )
    col = rule["col"]
    keep_cols = [id_col, col] + [c for c in extra_cols if c not in (id_col, col)]

    def block_sample(t: pa.Table) -> pa.Table:
        c = t.column(col)
        if kind == "not_null":
            mask = pc.is_null(c)
        elif kind == "in_range":
            mask = pc.and_(
                pc.is_valid(c),
                pc.fill_null(
                    pc.or_(pc.less(c, rule["lo"]), pc.greater(c, rule["hi"])), False
                ),
            )
        elif kind == "in_set":
            mask = pc.and_(
                pc.is_valid(c),
                pc.fill_null(
                    pc.invert(pc.is_in(c, value_set=pa.array(rule["values"]))), False
                ),
            )
        elif kind == "regex":
            mask = pc.and_(
                pc.is_valid(c),
                pc.fill_null(
                    pc.invert(pc.match_substring_regex(c, rule["pattern"])), False
                ),
            )
        else:  # positive
            mask = pc.and_(
                pc.is_valid(c), pc.fill_null(pc.less_equal(c, 0), False)
            )
        bad = t.filter(mask).select(keep_cols)
        if bad.num_rows > k:
            bad = bad.sort_by(id_col).slice(0, k)
        return bad

    parts = [
        tb
        for tb in ray.get(
            ds.map_batches(block_sample, batch_format="pyarrow", batch_size=None)
            .materialize()
            .to_arrow_refs()
        )
        if tb.num_rows and set(keep_cols) <= set(tb.column_names)
    ]
    if not parts:
        empty_types = {}
        base = getattr(ds.schema(), "base_schema", ds.schema())
        for c in keep_cols:
            empty_types[c] = pa.array([], type=base.field(c).type)
        return pa.table(empty_types)
    allp = pa.concat_tables(parts).combine_chunks()
    return allp.sort_by(id_col).slice(0, k).select(keep_cols)
