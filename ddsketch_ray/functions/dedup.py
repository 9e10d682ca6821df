"""Deduplication operators for training-data pipelines.

Five flavors (driver instructions), each expressed Ray-Data-first:

- **exact**        — content-hash in map_batches → groupby(hash) →
                     first-per-group (hash-partitioned; only (hash, id)
                     pairs enter the shuffle, never text);
- **MinHash-LSH**  — shingle → minhash signatures (vectorized reduceat
                     kernel) → explode to (band, band_hash) rows →
                     groupby bands → candidate pairs → Jaccard verify →
                     greedy cluster (min-id representative);
- **SimHash**      — 64-bit fingerprints, near-dup = Hamming ≤ t,
                     banded by fingerprint chunks for candidate gen;
- **n-gram Jaccard** — exact verification kernel used by both LSH paths;
- **embedding cosine** — see functions/ann.py (near-dup = cos ≥ τ).

At 100 TB the shuffled payload is always a fixed-width projection
(id + 8-byte hash, or id + num_perm×8-byte signature), never documents.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ddsketch_ray.functions.text import TOKEN_PATTERN
from ddsketch_ray.hashing import hash_strings, splitmix64
from ddsketch_ray.sketches.minhash import (
    hamming64,
    minhash_signatures,
    minhash_signatures_oph,
    simhash64,
)


# ------------------------------------------------------------------- exact


def content_hash_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "content_hash", seed: int = 0
) -> pa.Table:
    h = hash_strings(batch.column(text_col), seed=seed)
    return batch.append_column(out_col, pa.array(h.astype(np.int64), type=pa.int64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", seed: int = 0):
    """Survivor ids (min id per identical-content group), as a Dataset of
    (id_col). Shuffle payload = (hash, id) pairs only.

    Physical plan: distributed SORT on the content hash, then a
    per-block ``minimum.reduceat`` over the now-contiguous groups. A
    block's first/last group may span into neighbors, so each block
    emits its per-block min for those two groups tagged ``boundary`` and
    the driver resolves them (≤ 2 tiny rows per block). High-cardinality
    ``groupby().aggregate(Min)`` measures 7× slower than this sort plan
    at 600k rows and 60× at 9.6M (BASELINE.md r2) — the sort IS the
    hash-partition, without the per-key aggregation machinery."""
    import ray.data as rd

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col=text_col, seed=seed).select(
            ["content_hash", id_col]
        ),
        batch_format="pyarrow", batch_size=None,
    )
    s = hashed.sort("content_hash")

    def block_mins(t: pa.Table) -> pa.Table:
        h = t.column("content_hash").to_numpy()
        ids = t.column(id_col).to_numpy()
        if len(h) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "content_hash": pa.array([], type=pa.int64()),
                    "boundary": pa.array([], type=pa.bool_()),
                }
            )
        starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
        mins = np.minimum.reduceat(ids, starts)
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        return pa.table(
            {
                id_col: pa.array(mins.astype(np.int64)),
                "content_hash": pa.array(h[starts]),
                "boundary": pa.array(boundary),
            }
        )

    rep = s.map_batches(block_mins, batch_format="pyarrow", batch_size=None).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("boundary"))).select([id_col]),
        batch_format="pyarrow", batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(["content_hash", id_col]),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()  # ≤ 2 rows per block
    edge_ids = edge.groupby("content_hash")[id_col].min().to_numpy().astype(np.int64)
    return internal.union(
        rd.from_arrow(pa.table({id_col: pa.array(np.sort(edge_ids))}))
    )


def sorted_group_rollup(ds, key_col: str, id_col: str, carry_cols=()):
    """Per-key (min id, count, carried columns) via the sort plan —
    the scale-safe replacement for a high-cardinality
    ``groupby(key).aggregate(Min, Count)`` (7-60× faster, BASELINE.md
    r2). ``carry_cols`` must be constant within a key group (e.g.
    features derived from the key's content); they are taken from the
    group's first sorted row. Returns a Dataset
    (key_col, id_col=min, n=count, *carry_cols); block-spanning groups
    are resolved on the driver (≤ 2 per-block partial rows each)."""
    import pandas as pd
    import ray.data as rd

    carry_cols = list(carry_cols)
    s = ds.sort(key_col)

    def block_rollup(t: pa.Table) -> pa.Table:
        h = t.column(key_col).to_numpy()
        cols = {
            key_col: pa.array([], type=t.schema.field(key_col).type),
            id_col: pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            **{c: pa.array([], type=t.schema.field(c).type) for c in carry_cols},
            "boundary": pa.array([], type=pa.bool_()),
        }
        if len(h) == 0:
            return pa.table(cols)
        ids = t.column(id_col).to_numpy()
        starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
        counts = np.diff(np.r_[starts, len(h)])
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        out = {
            key_col: pa.array(h[starts]),
            id_col: pa.array(np.minimum.reduceat(ids, starts).astype(np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        }
        for c in carry_cols:
            out[c] = t.column(c).take(pa.array(starts))
        out["boundary"] = pa.array(boundary)
        return pa.table(out)

    rep = s.map_batches(block_rollup, batch_format="pyarrow", batch_size=None).materialize()
    keep_cols = [key_col, id_col, "n"] + carry_cols
    internal = rep.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("boundary"))).select(keep_cols),
        batch_format="pyarrow", batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(keep_cols),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()  # ≤ 2 partial rows per block
    if len(edge):
        agg = {id_col: "min", "n": "sum", **{c: "first" for c in carry_cols}}
        edge = edge.groupby(key_col, as_index=False).agg(agg)[keep_cols]
    return internal.union(rd.from_pandas(edge[keep_cols]))


def distinct_count(ds, col: str) -> int:
    """Exact distributed COUNT(DISTINCT col) via the sort plan: each
    sorted block counts its adjacent-distinct values and reports its
    first/last value (in the column's NATIVE type — no lossy casts);
    the driver subtracts one per equal adjacent block edge (a value
    spanning blocks was counted once per block). Driver payload = 3
    values per block — unlike ``Dataset.unique``, which materializes
    every distinct value driver-side.

    Nulls and float NaN are DROPPED before counting (SQL
    COUNT(DISTINCT) semantics): NaN != NaN would otherwise count every
    NaN occurrence as distinct within a block, and null/NaN edges can
    never match across blocks."""
    s = ds.select_columns([col]).sort(col)

    def block_stats(t: pa.Table) -> pa.Table:
        v = t.column(col).drop_null()
        if pa.types.is_floating(v.type) and len(v):
            v = v.filter(pa.compute.invert(pa.compute.is_nan(v)))
        if len(v) == 0:
            return pa.table(
                {
                    "n_distinct": pa.array([], type=pa.int64()),
                    "first": pa.array([], type=v.type),
                    "last": pa.array([], type=v.type),
                }
            )
        vn = v.to_numpy(zero_copy_only=False)
        n = int(np.count_nonzero(np.r_[True, vn[1:] != vn[:-1]]))
        edges = v.take(pa.array([0, len(vn) - 1]))
        return pa.table(
            {
                "n_distinct": pa.array([n], type=pa.int64()),
                "first": edges.slice(0, 1),
                "last": edges.slice(1, 1),
            }
        )

    rep = s.map_batches(block_stats, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(rep) == 0:
        return 0
    # to_pandas does not guarantee block order — reconstruct it from the
    # (disjoint-or-touching) per-block value ranges before edge-matching
    rep = rep.sort_values(["first", "last"]).reset_index(drop=True)
    total = int(rep["n_distinct"].sum())
    lasts = rep["last"].to_numpy()
    firsts = rep["first"].to_numpy()
    total -= int((lasts[:-1] == firsts[1:]).sum())
    return total


# ------------------------------------------------------------- shingling


def shingle_hashes(texts: pl.Series, k: int = 5, seed: int = 0, token_hash: str = "xx"):
    """Per-doc k-gram (word) shingle hashes → (flat uint64, offsets int64).

    A shingle hash is a SplitMix64 chain over the k consecutive token
    hashes (order-sensitive rolling combine) — equivalent discriminating
    power to hashing the joined string, but fully vectorized: tokens are
    hashed once by the Rust kernel and every window position combines in
    O(k) numpy passes over the whole batch (no per-document Python; the
    old string-join implementation spent ~100 µs/doc building shingle
    strings, the dominant cost of dedup at the 600k-doc stress scale).
    Docs with fewer than k tokens get one whole-doc chained shingle.

    token_hash="xx" (default) hashes tokens with xxhash (fast Rust
    kernel); "poly" uses ``hashing.polyhash_strings`` — slower mixing
    but every step is plain mod-2^64 arithmetic an independent DuckDB
    oracle can replay exactly (the SQL-oracle mode; see the
    ``minhash_dedup_sqlhash_documents`` gate query).
    """
    if token_hash == "poly":
        from ddsketch_ray.hashing import polyhash_strings as _tok_hash
    else:
        _tok_hash = hash_strings
    toks = texts.fill_null("").str.to_lowercase().str.extract_all(TOKEN_PATTERN)
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    n_docs = len(lens)
    flat_toks = toks.explode().drop_nulls()
    th = (
        _tok_hash(flat_toks.to_arrow(), seed=seed)
        if flat_toks.len()
        else np.empty(0, np.uint64)
    )
    n_sh = np.where(lens >= k, lens - k + 1, 1)
    offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(n_sh[:-1], out=offsets[1:])
    out = np.empty(int(n_sh.sum()), dtype=np.uint64)
    tok_off = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=tok_off[1:])

    full = lens >= k
    counts = n_sh[full]
    if counts.size:
        # window start index per shingle, all docs at once
        ar = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        starts = np.repeat(tok_off[full], counts) + ar
        # pre-mix the first token: a plain chain's first step
        # sm(h_t0 ^ h_t1) is XOR-commutative, systematically colliding
        # token-swapped shingles (a,b,…) with (b,a,…) — which inflated
        # Jaccard similarity between word-swapped documents (found via
        # the repetition-ratio SQL oracle, round 3)
        acc = splitmix64(th[starts])
        for j in range(1, k):
            acc = splitmix64(acc ^ th[starts + j])
        out[np.repeat(offsets[full], counts) + ar] = acc

    empty_hash = _tok_hash([""], seed=seed)[0]
    for d in np.nonzero(~full)[0].tolist():  # short docs are rare
        t0, ln = int(tok_off[d]), int(lens[d])
        if ln == 0:
            out[offsets[d]] = empty_hash
        else:
            a = splitmix64(np.asarray(th[t0]))  # same pre-mix as above
            for j in range(1, ln):
                a = splitmix64(a ^ th[t0 + j])
            out[offsets[d]] = a
    return out, offsets


def ngram_jaccard(text_a: str, text_b: str, k: int = 5, seed: int = 0) -> float:
    """Exact k-gram Jaccard similarity between two documents."""
    fa, _ = shingle_hashes(pl.Series([text_a]), k=k, seed=seed)
    fb, _ = shingle_hashes(pl.Series([text_b]), k=k, seed=seed)
    sa, sb = set(fa.tolist()), set(fb.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ------------------------------------------------ exact n-gram Jaccard dedup


def shingle_doc_sets_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    seed: int = 0,
) -> pa.Table:
    """Per-document SORTED DISTINCT word n-gram hash set, packed as one
    ``large_binary`` value per row → (id_col, shset, sz).

    Uses the same n-gram identity as ``repetition_ratio_batch``
    (text.py): case-sensitive ASCII-whitespace tokens, SplitMix64 chain
    with a pre-mixed first token — so a SQL oracle that builds distinct
    n-gram STRINGS (``t || ' ' || lead(t,1) …``) counts the same sets
    up to 64-bit collisions (which that oracle has matched bit-for-bit
    on every test corpus). Docs with fewer than ``n`` tokens get an
    empty set (sz = 0): they can never be near-dup candidates.

    Fully vectorized: one Rust tokenize + hash pass, windowed chain
    combine, one lexsort for the per-doc distinct sets, zero-copy
    buffer assembly of the packed column.
    """
    from ddsketch_ray.functions.text import _text_series

    s = _text_series(batch, text_col)
    toks = s.str.extract_all(TOKEN_PATTERN)
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    ndocs = len(lens)
    n_grams = np.maximum(lens - n + 1, 0)
    sizes = np.zeros(ndocs, dtype=np.int64)
    g = np.empty(0, np.uint64)
    total = int(n_grams.sum())
    if total:
        flat = toks.explode().drop_nulls()
        th = hash_strings(flat.to_arrow(), seed=seed)
        tok_off = np.zeros(ndocs, dtype=np.int64)
        np.cumsum(lens[:-1], out=tok_off[1:])
        has = n_grams > 0
        counts = n_grams[has]
        ar = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        starts = np.repeat(tok_off[has], counts) + ar
        # pre-mix the first token (XOR-commutativity fix, see
        # repetition_ratio_batch / shingle_hashes)
        gram = splitmix64(th[starts])
        for j in range(1, n):
            gram = splitmix64(gram ^ th[starts + j])
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64)[has], counts)
        order = np.lexsort((gram, doc_of))
        gs, d = gram[order], doc_of[order]
        new = np.r_[True, (d[1:] != d[:-1]) | (gs[1:] != gs[:-1])]
        g, d = gs[new], d[new]
        sizes = np.bincount(d, minlength=ndocs).astype(np.int64)
    off = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(sizes * 8, out=off[1:])
    shset = pa.Array.from_buffers(
        pa.large_binary(),
        ndocs,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(g.tobytes())],
    )
    return pa.table(
        {id_col: batch.column(id_col), "shset": shset, "sz": pa.array(sizes)}
    )


def _unpack_large_binary_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column of packed uint64 items → (flat values in row
    order, item count per row). Zero-copy reads of the offsets/data
    buffers (handles sliced/offset arrays)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.frombuffer(
        col.buffers()[1], dtype=np.int64, count=len(col) + 1 + col.offset
    )[col.offset :]
    lo, hi = int(off[0]), int(off[-1])
    values = np.frombuffer(
        col.buffers()[2], dtype=np.uint64, offset=lo, count=(hi - lo) // 8
    )
    counts = ((off[1:] - off[:-1]) // 8).astype(np.int64)
    return values, counts


def _shset_band_rows(t: pa.Table, id_col: str) -> pa.Table:
    """Packed shingle sets → (band, band_hash, id) rows for the shared
    candidate-pair machinery (band is constant 0: the 'bands' here are
    the n-grams themselves). Never shuffled in this shape — the caller
    fuses it into the pre-sort projection."""
    vals, counts = _unpack_large_binary_u64(t.column("shset"))
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "band": pa.array(np.zeros(len(vals), np.int64)),
            "band_hash": pa.array(vals.view(np.int64)),
            id_col: pa.array(np.repeat(ids, counts)),
        }
    )


def _distinct_sorted_pairs(pairs):
    """Mass-dedup of duplicate (a, b) rows (rare-gram blocking emits one
    copy per shared rare gram): one narrow 16-byte-row sort + per-block
    consecutive dedup. A pair whose copies straddle a block edge can
    keep ≤ 2 copies; those co-locate again at the verify stage, which
    finishes with an in-batch unique."""
    s = pairs.sort(["a", "b"])

    def block_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return t.filter(pa.array(keep))

    return s.map_batches(block_dedup, batch_format="pyarrow", batch_size=None)


def ngram_jaccard_dedup_distributed(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int = 8,
    tau_num: int = 7,
    tau_den: int = 10,
    seed: int = 0,
    num_buckets: int = 64,
    bloom_fp_rate: float = 0.001,
):
    """EXACT n-gram Jaccard near-dedup → (id_col, rep, is_survivor).

    The non-sketch member of the dedup family (reference scope: driver
    brief; cf. minhash_dedup_distributed): candidate pairs are documents
    sharing at least one RARE n-gram (document frequency in
    [2, max_df] — hot boilerplate n-grams generate no pairs, the
    standard rare-shingle blocking), verification computes the exact
    Jaccard over the FULL distinct n-gram sets, the threshold
    ``J ≥ tau_num/tau_den`` is evaluated as an integer
    cross-multiplication (``tau_den·|A∩B| ≥ tau_num·(|A|+|B|−|A∩B|)``
    — no float compare for the oracle to chase), and clustering is
    distributed connected components. Because nothing here is a sketch,
    the output is checked by a REAL DuckDB oracle (distinct n-gram
    strings + recursive-CTE closure), equal up to 64-bit n-gram hash
    collisions.

    Scale shape (nothing O(pairs) on the driver): one sort of the
    (gram_hash, id) rows for blocking, one narrow sort for pair dedup,
    bloom-pruned shuffle joins attach the two packed shingle sets, the
    verify kernel intersects sorted sets with one lexsort per batch.
    Requires non-negative integer ids (-1 is the overflow sentinel in
    the blocking pass).
    """
    packed = ds.map_batches(
        lambda b: shingle_doc_sets_batch(
            b, text_col=text_col, id_col=id_col, n=n, seed=seed
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()  # tokenize once; reused (banding + payload attach + ids)

    banded = packed.map_batches(
        lambda t: _shset_band_rows(t, id_col), batch_format="pyarrow", batch_size=None
    )
    pairs = _distinct_sorted_pairs(
        lsh_candidate_pairs_distributed(
            banded, id_col=id_col, max_bucket_pairs=max_df, overflow="drop"
        )
    ).materialize()  # reused: bloom build + join probe
    n_pairs = pairs.count()
    if n_pairs == 0:
        return packed.map_batches(
            lambda t: _all_survivors_table(t, id_col),
            batch_format="pyarrow",
            batch_size=None,
        )

    with_sets = _attach_pair_payloads(
        pairs,
        packed.map_batches(
            lambda t: t.select([id_col, "shset"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        id_col,
        "shset",
        n_pairs,
        num_buckets=num_buckets,
        seed=seed,
        bloom_fp_rate=bloom_fp_rate,
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        # finish the pair dedup (block-edge survivors land together here)
        order = np.lexsort((b, a))
        first = np.r_[
            True, (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        ]
        t = t.take(pa.array(order[first]))
        a, b = a[order[first]], b[order[first]]
        va, ca = _unpack_large_binary_u64(t.column("shset_a"))
        vb, cb = _unpack_large_binary_u64(t.column("shset_b"))
        npairs = len(a)
        pidx = np.concatenate(
            [
                np.repeat(np.arange(npairs, dtype=np.int64), ca),
                np.repeat(np.arange(npairs, dtype=np.int64), cb),
            ]
        )
        vals = np.concatenate([va, vb])
        o = np.lexsort((vals, pidx))
        v, p = vals[o], pidx[o]
        # each side is distinct within a pair → an adjacent equal value
        # inside one pair is exactly one cross-side match
        dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
        inter = np.bincount(p[1:][dup], minlength=npairs).astype(np.int64)
        keep = (
            (tau_den * inter >= tau_num * (ca + cb - inter))
            & (a != b)
            & (ca + cb > 0)
        )
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    verified = with_sets.map_batches(verify, batch_format="pyarrow", batch_size=None)
    ids_ds = packed.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow", batch_size=None
    )
    return _emit_assignments_distributed(ids_ds, verified, id_col, num_buckets)


# --------------------------------------------------------------- MinHash-LSH


def minhash_signature_batch(
    batch: pa.Table,
    text_col: str = "text",
    k_shingle: int = 5,
    num_perm: int = 128,
    seed: int = 0,
    method: str = "classic",
    token_hash: str = "xx",
) -> pa.Table:
    """method="classic": one mix+reduceat pass PER permutation (exact
    Broder minhash); method="oph": one-permutation hashing — a single
    pass regardless of num_perm (2× on the full stage at stress scale;
    tokenization dominates once the loop is gone). Same Jaccard
    contract, different signature values — don't mix within an index,
    and see minhash_signatures_oph's SCOPE note before LSH-banding OPH
    signatures."""
    texts = pl.from_arrow(batch.column(text_col)).fill_null("")
    flat, offs = shingle_hashes(texts, k=k_shingle, seed=seed, token_hash=token_hash)
    kernel = minhash_signatures_oph if method == "oph" else minhash_signatures
    sigs = kernel(flat, offs, num_perm=num_perm, seed=seed)
    return batch.append_column(
        "minhash_sig",
        pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.astype(np.int64).ravel(), type=pa.int64()), num_perm
        ),
    )


def lsh_band_rows(
    batch: pa.Table,
    id_col: str = "doc_id",
    sig_col: str = "minhash_sig",
    bands: int = 16,
) -> pa.Table:
    """Explode signatures to (band, band_hash, id) rows for the LSH
    groupby. rows_out = rows_in × bands (fixed-width)."""
    sigs = np.asarray(batch.column(sig_col).combine_chunks().flatten().to_numpy()).reshape(
        batch.num_rows, -1
    )
    num_perm = sigs.shape[1]
    rows_per_band = num_perm // bands
    ids = batch.column(id_col)
    band_hashes = np.empty((batch.num_rows, bands), dtype=np.int64)
    u = sigs.astype(np.uint64)
    for b in range(bands):
        chunk = u[:, b * rows_per_band : (b + 1) * rows_per_band]
        acc = np.zeros(batch.num_rows, dtype=np.uint64)
        for j in range(rows_per_band):
            acc = splitmix64(acc ^ chunk[:, j])
        band_hashes[:, b] = acc.astype(np.int64)
    n = batch.num_rows
    return pa.table(
        {
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n)),
            "band_hash": pa.array(band_hashes.T.ravel()),
            id_col: pa.concat_arrays([ids.combine_chunks()] * bands),
        }
    )


def _chain_pairs(df, id_col: str, max_bucket_pairs: int = 64):
    """Within each (band, band_hash) bucket, emit candidate pairs.

    Because every candidate pair is later VERIFIED (Jaccard / Hamming)
    before clustering, adjacent-chain pairs are not enough: an unrelated
    bucket collision sorted between two true near-dups would break the
    chain. So buckets up to ``max_bucket_pairs`` members emit ALL pairs
    (true-dup buckets are small); larger buckets — overwhelmingly hash
    collisions — fall back to the sorted chain and are counted so
    callers can log the coverage cap (no silent truncation).

    Vectorized: one lexsort + reduceat sizing; size-2 buckets (the
    overwhelming majority — true near-dup pairs) emit in one slice, and
    only ≥3-member buckets loop (rare). The r2 per-bucket pandas loop
    measured ~35 s on 800k buckets at the 1M-doc stress; this is < 1 s.
    """
    import pandas as pd

    if len(df) == 0:
        return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
    band = df["band"].to_numpy().astype(np.int64)
    bh = df["band_hash"].to_numpy().astype(np.int64)
    ids = df[id_col].to_numpy().astype(np.int64)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    gchg = np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])]
    starts = np.nonzero(gchg)[0]
    sizes = np.diff(np.r_[starts, len(ids)])
    s2 = starts[sizes == 2]
    a_parts = [ids[s2]]  # sorted within bucket -> a < b already
    b_parts = [ids[s2 + 1]]
    capped = 0
    for s, sz in zip(starts[sizes > 2], sizes[sizes > 2]):  # rare buckets
        members = np.unique(ids[s : s + sz])
        if len(members) < 2:
            continue
        if len(members) <= max_bucket_pairs:
            iu, ju = np.triu_indices(len(members), k=1)
            a_parts.append(members[iu])
            b_parts.append(members[ju])
        else:  # giant collision bucket: chain only (documented cap)
            capped += 1
            a_parts.append(members[:-1])
            b_parts.append(members[1:])
    out = pd.DataFrame(
        {"a": np.concatenate(a_parts), "b": np.concatenate(b_parts)}
    ).drop_duplicates()
    if capped:
        import logging

        logging.getLogger(__name__).warning(
            "lsh candidate generation: %d buckets over %d members used chain "
            "pairs only (possible recall loss in those buckets)",
            capped,
            max_bucket_pairs,
        )
    return out


def hot_bucket_pairs(
    band_rows,
    id_col: str,
    driver_threshold: int = 2_000_000,
    max_bucket_pairs: int = 64,
):
    """Candidate (a, b) pairs from band rows.

    Small-table fast path (≤ driver_threshold rows — 3 int64 columns, so
    ≤ ~50 MB): pull to the driver and find duplicate buckets with one
    vectorized pandas pass. At scale, the distributed path:

    1. a distributed SORT on the combined bucket key makes equal keys
       globally contiguous — this is the only full-data exchange, and a
       Ray Data sort of the single int64 key column measures ~60× faster
       than groupby().aggregate(Count) at this shape (BASELINE.md r2);
    2. each sorted block reports its internal adjacent-duplicate keys
       plus its first/last key (block-boundary stitching: a bucket
       spanning blocks shows its key at ≥2 block edges) — the driver
       receives only hot keys + 2 keys per block;
    3. the hot-bucket key set (near-dup buckets only — tiny for real
       corpora) is broadcast and band rows are filtered to it per batch;
    4. the surviving candidate rows are pair-chained (sorted-adjacent,
       vectorized) — no per-group Python ever runs on singleton buckets.
    """
    import pandas as pd
    import ray

    if band_rows.count() <= driver_threshold:
        df = band_rows.to_pandas()
        cand = df[df.duplicated(["band", "band_hash"], keep=False)]
        return _chain_pairs(cand, id_col, max_bucket_pairs=max_bucket_pairs)

    def _combined(bands_np: np.ndarray, hashes_np: np.ndarray) -> np.ndarray:
        # (band, band_hash) -> one uint64 key; collisions only ADD
        # candidates (verified later), never lose them
        return splitmix64(
            hashes_np.astype(np.int64).view(np.uint64)
            ^ splitmix64(bands_np.astype(np.int64).view(np.uint64))
        )

    def to_ck(t: pa.Table) -> pa.Table:
        ck = _combined(t.column("band").to_numpy(), t.column("band_hash").to_numpy())
        return pa.table({"ck": pa.array(ck.astype(np.int64))})

    sorted_ck = band_rows.map_batches(to_ck, batch_format="pyarrow", batch_size=None).sort("ck")

    def block_hot(t: pa.Table) -> pa.Table:
        ck = t.column("ck").to_numpy()
        if len(ck) == 0:
            return pa.table(
                {"ck": pa.array([], type=pa.int64()), "boundary": pa.array([], type=pa.bool_())}
            )
        eq = ck[1:] == ck[:-1]
        internal = np.unique(ck[:-1][eq])
        # a single-row block has one edge, not two — emitting its key
        # twice would fake a multiplicity-2 "hot" bucket for a possibly
        # globally-singleton key (wasted downstream work)
        edges = (
            np.array([ck[0], ck[-1]], dtype=np.int64)
            if len(ck) > 1
            else np.array([ck[0]], dtype=np.int64)
        )
        n_edges = len(edges)
        return pa.table(
            {
                "ck": pa.array(np.concatenate([internal, edges])),
                "boundary": pa.array(
                    np.concatenate([np.zeros(len(internal), bool), np.ones(n_edges, bool)])
                ),
            }
        )

    rep = sorted_ck.map_batches(block_hot, batch_format="pyarrow", batch_size=None).to_pandas()
    internal_hot = rep.loc[~rep["boundary"], "ck"].to_numpy()
    edge = rep.loc[rep["boundary"], "ck"].to_numpy()
    edge_vals, edge_counts = np.unique(edge, return_counts=True)
    hot_i64 = np.union1d(internal_hot, edge_vals[edge_counts >= 2])
    if len(hot_i64) == 0:
        return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
    hot_keys = np.sort(hot_i64.astype(np.int64).view(np.uint64))
    hot_ref = ray.put(hot_keys)

    def hot_filter(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)  # sorted uint64 array, zero-copy per task
        ck = _combined(t.column("band").to_numpy(), t.column("band_hash").to_numpy())
        idx = np.searchsorted(keys, ck)
        idx = np.minimum(idx, len(keys) - 1)
        mask = keys[idx] == ck  # vectorized membership
        return t.filter(pa.array(mask))

    cand = band_rows.map_batches(hot_filter, batch_format="pyarrow", batch_size=None).to_pandas()
    return _chain_pairs(cand, id_col, max_bucket_pairs=max_bucket_pairs)


def cluster_pairs(pairs_df, all_ids: np.ndarray) -> dict[int, int]:
    """Union-find over candidate pairs → {id: representative(min id)}.
    Driver-side: the pair set is tiny relative to the corpus (only
    near-dup groups). For adversarial corpora whose pair set exceeds
    driver memory, use the distributed equivalent
    ``functions.graph.connected_components`` (alternating star
    contraction — same min-id labels, pairs stay a Dataset)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs_df["a"].tolist(), pairs_df["b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {int(i): find(int(i)) for i in all_ids.tolist()}


def gather_rows_for_ids(ds, ids: np.ndarray, id_col: str):
    """Distributed semi-join: filter ``ds`` to rows whose ``id_col`` is in
    ``ids`` (broadcast once via ray.put, binary-searched per batch) and
    pull ONLY those rows to the driver as a pandas frame.

    This is the scale-safe replacement for ``ds.to_pandas()`` in the
    dedup verify stages: the driver holds O(candidate ids), never
    O(corpus). Returns an empty frame with the dataset's schema when
    ``ids`` is empty."""
    import ray

    if len(ids) == 0:
        return ds.limit(0).to_pandas()
    key_ref = ray.put(np.sort(np.asarray(ids, dtype=np.int64)))

    # stateless tasks (not an actor pool): the broadcast id set is a
    # plasma object fetched zero-copy per task — no pool spawn latency
    def id_filter(t: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)  # sorted int64 ids (shared memory)
        v = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, v)
        idx = np.minimum(idx, len(keys) - 1)
        return t.filter(pa.array(keys[idx] == v))

    return ds.map_batches(id_filter, batch_format="pyarrow", batch_size=None).to_pandas()


def emit_cluster_assignments(ds, rep: dict[int, int], id_col: str):
    """Distributed final stage of every dedup flavor: broadcast the
    (small — non-self entries only) representative map and emit one
    ``(id_col, rep, is_survivor)`` row per input row via map_batches.
    Returns a streaming Dataset; nothing O(corpus) touches the driver."""
    import ray

    nontrivial = {i: r for i, r in rep.items() if r != i}
    keys = np.array(sorted(nontrivial), dtype=np.int64)
    vals = np.array([nontrivial[int(k)] for k in keys], dtype=np.int64)
    map_ref = ray.put((keys, vals))

    def rep_map(t: pa.Table) -> pa.Table:
        mkeys, mvals = ray.get(map_ref)  # zero-copy per stateless task
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(mkeys):
            idx = np.searchsorted(mkeys, ids)
            idx = np.minimum(idx, len(mkeys) - 1)
            hit = mkeys[idx] == ids
            reps = np.where(hit, mvals[idx], ids)
        else:
            reps = ids
        return pa.table(
            {
                id_col: pa.array(ids),
                "rep": pa.array(reps),
                "is_survivor": pa.array(ids == reps),
            }
        )

    return ds.map_batches(rep_map, batch_format="pyarrow", batch_size=None)


def _banded_dedup_assignments(
    feats,
    band_fn,
    id_col: str,
    verify_driver,
    pack_fn,
    payload_name: str,
    verify_dist,
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    max_bucket_pairs: int = 64,
    num_buckets: int = 64,
    bloom_fp_rate: float = 0.001,
    seed: int = 0,
):
    """The ONE candidate→verify→cluster→emit substrate behind every
    banded dedup flavor (MinHash-LSH and SimHash route here; the n-gram
    Jaccard flavor reuses the same distributed pieces directly with
    rare-key blocking semantics). ``feats`` is a materialized narrow
    Dataset (id_col, payload column); ``band_fn`` maps a feats table to
    (band, band_hash, id) rows.

    ``mode`` selects the physical plan — both produce IDENTICAL output
    (paired pytest equality + the paired gate queries prove it), so the
    gate is purely a footprint/latency tradeoff:

    - ``"driver"`` — candidate pairs, verification payloads and the
      union-find land on the driver (fastest at test/gate scale;
      footprint O(candidate pairs));
    - ``"distributed"`` — pairs stay a Dataset end-to-end
      (``lsh_candidate_pairs_distributed`` → bloom-pruned shuffle-join
      verify → ``connected_components`` → shuffle left-join emit);
      driver footprint O(blocks);
    - ``"auto"`` (default) — gate on the band-row count:
      ≤ ``driver_threshold`` rows (3 int64 columns → ≤ ~50 MB) takes the
      driver path, above it the distributed path. This is what the
      checkpointed 100-TB job uses: small shards stay driver-fast, real
      corpora never put O(pairs) on one process.
    """
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError("mode must be 'auto', 'driver' or 'distributed'")
    band_rows = feats.map_batches(
        band_fn, batch_format="pyarrow", batch_size=None
    ).materialize()  # scanned 1-2× below
    if mode == "auto":
        mode = "driver" if band_rows.count() <= driver_threshold else "distributed"

    if mode == "driver":
        pairs = hot_bucket_pairs(
            band_rows,
            id_col,
            driver_threshold=driver_threshold,
            max_bucket_pairs=max_bucket_pairs,
        )
        if len(pairs):
            # pull ONLY the candidate-pair payloads to the driver
            # (semi-join via broadcast id set, O(pairs) rows — the whole
            # corpus never materializes), then one vectorized compare
            cand_ids = np.unique(
                np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()])
            )
            cand = gather_rows_for_ids(feats, cand_ids, id_col)
            pairs = verify_driver(pairs, cand)
        pair_ids = (
            np.unique(np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
            if len(pairs)
            else np.empty(0, np.int64)
        )
        rep = cluster_pairs(pairs, pair_ids)  # rep map over clustered ids only
        return emit_cluster_assignments(feats, rep, id_col)

    # Global pair dedup BEFORE the payload joins: a true near-dup pair
    # collides in most of its bands, so the raw candidate stream is
    # ~bands× redundant (measured 12× at 1M docs / 20% dups). One narrow
    # 16-byte-row sort here cuts the 2×payload shuffle-join and the
    # connected-components input by that factor (attach 121 s → ~10 s).
    pairs_ds = _distinct_sorted_pairs(
        lsh_candidate_pairs_distributed(
            band_rows, id_col=id_col, max_bucket_pairs=max_bucket_pairs
        )
    ).materialize()  # object-store resident; reused (bloom build + join)
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return feats.map_batches(
            lambda t: _all_survivors_table(t, id_col),
            batch_format="pyarrow",
            batch_size=None,
        )
    with_payloads = _attach_pair_payloads(
        pairs_ds,
        feats.map_batches(pack_fn, batch_format="pyarrow", batch_size=None),
        id_col,
        payload_name,
        n_pairs,
        num_buckets=num_buckets,
        seed=seed,
        bloom_fp_rate=bloom_fp_rate,
    )
    verified = with_payloads.map_batches(
        verify_dist, batch_format="pyarrow", batch_size=None
    )
    ids_ds = feats.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow", batch_size=None
    )
    return _emit_assignments_distributed(ids_ds, verified, id_col, num_buckets)


def _minhash_verify_driver(jaccard_threshold: float, id_col: str):
    """Driver-side signature-agreement verify for candidate pairs."""

    def verify(pairs, cand):
        order = np.argsort(cand[id_col].to_numpy(), kind="stable")
        sorted_ids = cand[id_col].to_numpy()[order]
        smat = np.stack(
            [np.asarray(s, dtype=np.int64) for s in cand["minhash_sig"].to_numpy()[order]]
        )
        ai = np.searchsorted(sorted_ids, pairs["a"].to_numpy())
        bi = np.searchsorted(sorted_ids, pairs["b"].to_numpy())
        agree = (smat[ai] == smat[bi]).mean(axis=1)
        return pairs[agree >= jaccard_threshold]

    return verify


def _minhash_pack_fn(num_perm: int, id_col: str):
    """Signatures → fixed_size_binary(num_perm×8) for the shuffle-join
    verify (a packed value shuffles as one 8·num_perm-byte cell)."""
    width = num_perm * 8

    def pack(t: pa.Table) -> pa.Table:
        n = t.num_rows
        mat = np.ascontiguousarray(
            np.asarray(
                t.column("minhash_sig").combine_chunks().flatten().to_numpy()
            ).reshape(n, num_perm),
            dtype=np.int64,
        )
        arr = pa.Array.from_buffers(
            pa.binary(width), n, [None, pa.py_buffer(mat.tobytes())]
        )
        return pa.table({id_col: t.column(id_col), "sigbin": arr})

    return pack


def _minhash_verify_dist(num_perm: int, jaccard_threshold: float):
    """Per-batch signature-agreement verify over joined pair payloads."""

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        sa = _unpack_fsb(t.column("sig_a"), num_perm)
        sb = _unpack_fsb(t.column("sig_b"), num_perm)
        agree = (sa == sb).mean(axis=1) if len(a) else np.empty(0)
        keep = (agree >= jaccard_threshold) & (a != b)
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return verify


def _infer_num_perm(sigs, sig_col: str = "minhash_sig") -> int:
    """Signature width from the schema (fixed_size_list) or, for plain
    list columns (e.g. a parquet checkpoint roundtrip), from one row."""
    sch = getattr(sigs.schema(), "base_schema", sigs.schema())
    typ = sch.field(sig_col).type
    if pa.types.is_fixed_size_list(typ):
        return typ.list_size
    return len(sigs.limit(1).take_batch(1, batch_format="pyarrow").column(sig_col)[0])


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    seed: int = 0,
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    num_buckets: int = 64,
    max_bucket_pairs: int = 64,
    bloom_fp_rate: float = 0.001,
    token_hash: str = "xx",
):
    """Full MinHash-LSH near-dup pipeline → streaming Dataset of
    (id_col, rep: int64, is_survivor: bool), rep = min id of the cluster.

    Candidates sharing an LSH bucket are verified by estimated Jaccard
    (signature agreement) ≥ threshold before clustering. The physical
    plan is size-gated (see ``_banded_dedup_assignments``): small band
    sets verify/cluster on the driver, large ones stay fully
    distributed — identical output either way.
    """
    sigs = ds.map_batches(
        lambda b: minhash_signature_batch(
            b,
            text_col=text_col,
            k_shingle=k_shingle,
            num_perm=num_perm,
            seed=seed,
            token_hash=token_hash,
        ).select([id_col, "minhash_sig"]),
        batch_format="pyarrow", batch_size=None,
    ).materialize()  # signatures are small (id + num_perm*8B); reused twice
    return dedup_from_signatures(
        sigs,
        id_col=id_col,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        mode=mode,
        driver_threshold=driver_threshold,
        num_buckets=num_buckets,
        max_bucket_pairs=max_bucket_pairs,
        bloom_fp_rate=bloom_fp_rate,
        seed=seed,
    )


def dedup_from_signatures(
    sigs,
    id_col: str = "doc_id",
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    num_buckets: int = 64,
    max_bucket_pairs: int = 64,
    bloom_fp_rate: float = 0.001,
    seed: int = 0,
):
    """LSH-candidate → verify → cluster → emit phase of minhash_dedup,
    over an existing signature Dataset (id_col, minhash_sig) — e.g. one
    rebuilt from checkpoint part files (minhash_dedup_checkpointed).
    Size-gated driver/distributed plan; see _banded_dedup_assignments."""
    num_perm = _infer_num_perm(sigs)
    return _banded_dedup_assignments(
        sigs,
        lambda b: lsh_band_rows(b, id_col=id_col, bands=bands),
        id_col,
        verify_driver=_minhash_verify_driver(jaccard_threshold, id_col),
        pack_fn=_minhash_pack_fn(num_perm, id_col),
        payload_name="sig",
        verify_dist=_minhash_verify_dist(num_perm, jaccard_threshold),
        mode=mode,
        driver_threshold=driver_threshold,
        max_bucket_pairs=max_bucket_pairs,
        num_buckets=num_buckets,
        bloom_fp_rate=bloom_fp_rate,
        seed=seed,
    )


def minhash_dedup_checkpointed(
    input_files,
    ckpt_dir: str,
    run_id: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    seed: int = 0,
    concurrency: int = 8,
    files_per_partition: int = 1,
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    num_buckets: int = 64,
    max_bucket_pairs: int = 64,
):
    """Resumable MinHash dedup for big corpora: the signature stage —
    the dominant cost (shingle + minhash over every byte of text) — runs
    as a CheckpointedMapJob writing one signature parquet per input
    shard, so a killed run resumes from the finished shards instead of
    recomputing them. The LSH/verify/emit phase then streams from the
    signature parts (cheap relative to signatures; re-running it after a
    crash re-reads, never re-tokenizes).

    The LSH phase is size-gated (``mode="auto"``): above
    ``driver_threshold`` band rows it runs the fully distributed
    candidate→verify→cluster→emit substrate, so the scale job's driver
    footprint is O(blocks) — never O(candidate pairs) — on real
    (30-50 % duplicate) web corpora. Output is identical across modes.

    Returns (assignments Dataset, job) — job.manifest() carries the
    per-partition lineage + metrics.
    """
    import ray.data as rd

    from ddsketch_ray.state.checkpoint import CheckpointedMapJob

    def sig_fn(t: pa.Table) -> pa.Table:
        return minhash_signature_batch(
            t, text_col=text_col, k_shingle=k_shingle, num_perm=num_perm, seed=seed
        ).select([id_col, "minhash_sig"])

    job = CheckpointedMapJob(
        list(input_files),
        sig_fn,
        columns=[id_col, text_col],
        ckpt_dir=ckpt_dir,
        run_id=run_id,
        files_per_partition=files_per_partition,
    )
    part_files = job.run(concurrency=concurrency)
    # materialize once: the LSH/verify/emit phase scans signatures three
    # times (band rows, candidate gather, assignment emit) — object-store
    # blocks beat three parquet re-reads (id + 128×8B per row)
    sigs = rd.read_parquet(part_files).materialize()
    out = dedup_from_signatures(
        sigs,
        id_col=id_col,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        mode=mode,
        driver_threshold=driver_threshold,
        num_buckets=num_buckets,
        max_bucket_pairs=max_bucket_pairs,
        seed=seed,
    )
    return out, job


# ----------------------------------- fully distributed (no O(pairs) driver)


def lsh_candidate_pairs_distributed(
    band_rows, id_col: str = "doc_id", max_bucket_pairs: int = 64,
    overflow: str = "chain",
):
    """Candidate (a, b) pairs as a DATASET — the variant of
    ``hot_bucket_pairs`` for corpora whose candidate-pair set itself may
    not fit driver memory (boilerplate-heavy web crawls with huge LSH
    buckets).

    1. (band, band_hash) → one combined int64 key ``ck`` (same mix as
       hot_bucket_pairs — ck collisions only ADD verified-later
       candidates, never lose them); ONE distributed sort on (ck, id)
       makes buckets globally contiguous in deterministic order. This
       is the only O(corpus×bands) exchange.
    2. Each sorted block emits pairs for its INTERNAL runs inline with
       the ``_chain_pairs`` cap semantics (all-pairs for ≤
       max_bucket_pairs unique members, sorted chain above, capped
       buckets logged). Runs touching a block edge ship to the driver
       instead: full membership when ≤ max_bucket_pairs, else inline
       chain pairs plus the run's two edge members (chains from
       adjacent blocks connect through the shared edge members).
    3. The driver stitches the boundary buckets — ≤ 2 runs ×
       max_bucket_pairs rows per block, so O(blocks), never O(pairs) —
       and the stitched pairs union back in as a tiny Dataset.

    Self/duplicate pairs can appear near block edges; downstream
    verification drops self pairs and ``connected_components``
    tolerates duplicates, so no global dedup pass is spent on them.

    ``overflow`` controls buckets larger than ``max_bucket_pairs``
    members: ``"chain"`` (default, LSH semantics — sorted chain keeps
    recall through giant collision buckets at O(members) pairs) or
    ``"drop"`` (rare-key blocking semantics — the bucket emits NOTHING,
    exactly mirroring a SQL ``HAVING COUNT(*) <= max`` document-
    frequency filter; requires ids ≥ 0, -1 is the overflow sentinel a
    block ships when its PORTION of an edge-spanning run already
    exceeds the cap).
    """
    import logging

    import pandas as pd
    import ray.data as rd

    if overflow not in ("chain", "drop"):
        raise ValueError("overflow must be 'chain' or 'drop'")

    def to_ck_id(t: pa.Table) -> pa.Table:
        ck = splitmix64(
            t.column("band_hash").to_numpy().astype(np.int64).view(np.uint64)
            ^ splitmix64(t.column("band").to_numpy().astype(np.int64).view(np.uint64))
        )
        return pa.table({"ck": pa.array(ck.astype(np.int64)), "id": t.column(id_col)})

    s = band_rows.map_batches(
        to_ck_id, batch_format="pyarrow", batch_size=None
    ).sort(["ck", "id"])

    def _emit(kind: np.ndarray, x: np.ndarray, y: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(kind.astype(np.int8)),
                "x": pa.array(x.astype(np.int64)),
                "y": pa.array(y.astype(np.int64)),
            }
        )

    def block_emit(t: pa.Table) -> pa.Table:
        ck = t.column("ck").to_numpy()
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ck)
        if n == 0:
            z = np.empty(0, np.int64)
            return _emit(z, z, z)
        gchg = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.nonzero(gchg)[0]
        sizes = np.diff(np.r_[starts, n])
        nruns = len(starts)
        boundary = np.zeros(nruns, dtype=bool)
        boundary[[0, -1]] = True  # may continue in an adjacent block
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        bx: list[np.ndarray] = []
        by: list[np.ndarray] = []
        # internal size-2 fast path (the overwhelming majority of runs)
        s2 = starts[(~boundary) & (sizes == 2)]
        if len(s2):
            a2, b2 = ids[s2], ids[s2 + 1]
            keep = a2 != b2  # same (ck, id) twice — self pair, drop
            a_parts.append(a2[keep])
            b_parts.append(b2[keep])
        capped = 0
        for s0, sz in zip(
            starts[(~boundary) & (sizes > 2)], sizes[(~boundary) & (sizes > 2)]
        ):
            members = np.unique(ids[s0 : s0 + sz])
            if len(members) < 2:
                continue
            if len(members) <= max_bucket_pairs:
                iu, ju = np.triu_indices(len(members), k=1)
                a_parts.append(members[iu])
                b_parts.append(members[ju])
            elif overflow == "chain":  # giant collision bucket (documented cap)
                capped += 1
                a_parts.append(members[:-1])
                b_parts.append(members[1:])
            else:  # drop: over-frequent key emits nothing (df blocking)
                capped += 1
        for r in sorted({0, nruns - 1}):
            s0, sz = starts[r], sizes[r]
            members = np.unique(ids[s0 : s0 + sz])
            if len(members) <= max_bucket_pairs:
                bx.append(members)
                by.append(np.full(len(members), ck[s0], dtype=np.int64))
            elif overflow == "chain":
                capped += 1
                a_parts.append(members[:-1])
                b_parts.append(members[1:])
                bx.append(members[[0, -1]])  # chains bridge via edge members
                by.append(np.full(2, ck[s0], dtype=np.int64))
            else:  # drop: poison the bucket — the driver discards it whole
                capped += 1
                bx.append(np.full(1, -1, dtype=np.int64))
                by.append(np.full(1, ck[s0], dtype=np.int64))
        if capped:
            logging.getLogger(__name__).warning(
                "distributed lsh candidates: %d buckets over %d members %s",
                capped,
                max_bucket_pairs,
                "used chain pairs only (possible recall loss in those buckets)"
                if overflow == "chain"
                else "dropped (rare-key blocking)",
            )
        a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
        b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
        mx = np.concatenate(bx) if bx else np.empty(0, np.int64)
        my = np.concatenate(by) if by else np.empty(0, np.int64)
        return _emit(
            np.r_[np.zeros(len(a), np.int8), np.ones(len(mx), np.int8)],
            np.concatenate([a, mx]),
            np.concatenate([b, my]),
        )

    # materialized: consumed twice (pair split + boundary gather) and is
    # O(pairs) rows in the OBJECT STORE — that's the point of this variant
    emitted = s.map_batches(
        block_emit, batch_format="pyarrow", batch_size=None
    ).materialize()

    def keep_pairs(t: pa.Table) -> pa.Table:
        p = t.filter(pa.compute.equal(t.column("kind"), 0))
        return pa.table({"a": p.column("x"), "b": p.column("y")})

    pairs_ds = emitted.map_batches(keep_pairs, batch_format="pyarrow", batch_size=None)

    bdf = (
        emitted.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("kind"), 1)).select(["x", "y"]),
            batch_format="pyarrow",
            batch_size=None,
        ).to_pandas()  # ≤ 2 runs × max_bucket_pairs rows per block
    )
    if len(bdf):
        if overflow == "drop":
            x = bdf["x"].to_numpy().astype(np.int64)
            y = bdf["y"].to_numpy().astype(np.int64)
            o = np.lexsort((x, y))
            x, y = x[o], y[o]
            bstarts = np.nonzero(np.r_[True, y[1:] != y[:-1]])[0]
            bsizes = np.diff(np.r_[bstarts, len(y)])
            ap: list[np.ndarray] = []
            bp: list[np.ndarray] = []
            for s0, sz in zip(bstarts, bsizes):
                members = np.unique(x[s0 : s0 + sz])
                if members[0] == -1:  # poisoned: some portion exceeded the cap
                    continue
                if 2 <= len(members) <= max_bucket_pairs:
                    iu, ju = np.triu_indices(len(members), k=1)
                    ap.append(members[iu])
                    bp.append(members[ju])
            stitched = pd.DataFrame(
                {
                    "a": np.concatenate(ap) if ap else np.empty(0, np.int64),
                    "b": np.concatenate(bp) if bp else np.empty(0, np.int64),
                }
            )
        else:
            stitched = _chain_pairs(
                pd.DataFrame(
                    {
                        "band": 0,
                        "band_hash": bdf["y"].to_numpy(),
                        "id": bdf["x"].to_numpy(),
                    }
                ),
                "id",
                max_bucket_pairs=max_bucket_pairs,
            )
        if len(stitched):
            pairs_ds = pairs_ds.union(
                rd.from_arrow(
                    pa.table(
                        {
                            "a": pa.array(stitched["a"].to_numpy(), type=pa.int64()),
                            "b": pa.array(stitched["b"].to_numpy(), type=pa.int64()),
                        }
                    )
                )
            )
    return pairs_ds


def _unpack_fsb(col, width_items: int) -> np.ndarray:
    """fixed_size_binary column → (n, width_items) int64 view, zero-copy,
    slice-offset safe."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, width_items), np.int64)
    flat = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    lo = arr.offset * width_items
    return flat[lo : lo + len(arr) * width_items].reshape(len(arr), width_items)


def _attach_pair_payloads(
    pairs,
    payload_ds,
    id_col: str,
    payload_col: str,
    n_pairs: int,
    num_buckets: int = 64,
    seed: int = 0,
    bloom_fp_rate: float = 0.001,
):
    """(a, b) pairs + (id_col, payload_col) → Dataset with columns
    (a, b, <payload_col>_a, <payload_col>_b) — the distributed verify
    substrate shared by the no-driver-pairs dedup flavors.

    A distributed ``BloomAgg`` over the candidate ids prunes the payload
    shuffle to ~candidate rows (false positives only carry extra rows —
    never wrong results, since the subsequent joins are exact), then two
    ``equi_join_shuffle`` passes attach the a-side and b-side payloads.
    Driver holds ONE bloom bitmap sized for 2·n_pairs ids."""
    import ray

    from ddsketch_ray.agg import BloomAgg, hash_any_column, sketch_from_result
    from ddsketch_ray.functions.joins import equi_join_shuffle

    cid = pairs.map_batches(
        lambda t: pa.table(
            {
                "cid": pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                )
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    bloom = sketch_from_result(
        cid.aggregate(
            BloomAgg(
                on="cid",
                capacity=max(1024, 2 * n_pairs),
                fp_rate=bloom_fp_rate,
                seed=seed,
                alias_name="bf",
            )
        )["bf"]
    )
    bloom_ref = ray.put(bloom)

    def cand_filter(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)  # zero-copy bitmap per stateless task
        h = hash_any_column(t.column(id_col), is_arrow=True, seed=seed)
        return t.filter(pa.array(bf.contains_hashed(h)))

    cand = payload_ds.map_batches(
        cand_filter, batch_format="pyarrow", batch_size=None
    ).materialize()  # O(candidate ids) rows; scanned by both joins
    pa_col, pb_col = f"{payload_col}_a", f"{payload_col}_b"
    side_a = cand.map_batches(
        lambda t: t.rename_columns([id_col, pa_col]),
        batch_format="pyarrow",
        batch_size=None,
    )
    side_b = cand.map_batches(
        lambda t: t.rename_columns([id_col, pb_col]),
        batch_format="pyarrow",
        batch_size=None,
    )
    # coalesce_blocks: both inputs here are materialized and fragmented
    # (cand has ~input-block count, pairs come out of a sort) — the
    # block-count-superlinear groupby partition cost dominates otherwise.
    j1 = equi_join_shuffle(
        pairs, side_a, "a", id_col, ["b"], [pa_col],
        num_buckets=num_buckets, coalesce_blocks=True,
    )
    return equi_join_shuffle(
        j1, side_b, "b", id_col, ["a", pa_col], [pb_col],
        num_buckets=num_buckets, coalesce_blocks=True,
    )


def _emit_assignments_distributed(ids_ds, verified_pairs, id_col: str, num_buckets: int):
    """(id rows) + verified (a, b) edges → (id_col, rep, is_survivor)
    via connected_components + a shuffle left join — the distributed
    replacement for cluster_pairs + emit_cluster_assignments."""
    import pyarrow.compute as pc

    from ddsketch_ray.functions.graph import connected_components
    from ddsketch_ray.functions.joins import equi_join_shuffle

    comps = connected_components(verified_pairs, src="a", dst="b")
    lab = equi_join_shuffle(
        ids_ds,
        comps,
        id_col,
        "node",
        [],
        ["component"],
        num_buckets=num_buckets,
        how="left",
        coalesce_blocks=True,
    )

    def finish(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        rep = pc.coalesce(t.column("component"), ids)
        return pa.table(
            {id_col: ids, "rep": rep, "is_survivor": pc.equal(ids, rep)}
        )

    return lab.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _all_survivors_table(t: pa.Table, id_col: str) -> pa.Table:
    ids = t.column(id_col)
    return pa.table(
        {
            id_col: ids,
            "rep": ids,
            "is_survivor": pa.array(np.ones(t.num_rows, dtype=bool)),
        }
    )


def minhash_dedup_distributed(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    seed: int = 0,
    num_buckets: int = 64,
    max_bucket_pairs: int = 64,
    bloom_fp_rate: float = 0.001,
):
    """Fully distributed MinHash-LSH dedup: same contract and output as
    ``minhash_dedup`` (one (id_col, rep, is_survivor) row per doc, rep =
    min id of the near-dup cluster) but NOTHING O(pairs) ever sits on
    the driver — use it when the candidate-pair set itself may exceed
    driver memory (adversarial / boilerplate-heavy corpora).

    Differences from the driver-assisted path:

    - candidates: ``lsh_candidate_pairs_distributed`` (pairs stay a
      Dataset; driver sees O(blocks) boundary rows);
    - verify: signatures pack to fixed_size_binary(num_perm×8), a
      distributed ``BloomAgg`` of the candidate ids prunes the shuffle
      to candidate signatures (broadcast bitmap — false positives only
      carry extra rows, never wrong results), then two
      ``equi_join_shuffle`` passes attach sig_a/sig_b to each pair and
      the agreement compare runs vectorized per batch;
    - cluster: ``functions.graph.connected_components`` (alternating
      star contraction — same min-id labels as the union-find);
    - emit: shuffle left-join of all doc ids against component labels.

    Cost vs ``minhash_dedup``: ~2 extra shuffles of O(candidates)
    signature rows plus CC's per-round sorts — prefer the driver path
    until pairs approach driver memory (~10⁸). Thin wrapper over
    ``minhash_dedup(mode="distributed")`` — one substrate, two plans."""
    return minhash_dedup(
        ds,
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        num_perm=num_perm,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        seed=seed,
        mode="distributed",
        num_buckets=num_buckets,
        max_bucket_pairs=max_bucket_pairs,
        bloom_fp_rate=bloom_fp_rate,
    )


def simhash_dedup_distributed(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 0,
    num_buckets: int = 64,
    max_bucket_pairs: int = 64,
    bloom_fp_rate: float = 0.001,
):
    """Fully distributed SimHash dedup — same contract and output as
    ``simhash_dedup`` but with NOTHING O(pairs) on the driver: Dataset
    candidate pairs from the shared band machinery
    (``lsh_candidate_pairs_distributed`` over the 4×16-bit pigeonhole
    bands), bloom-pruned shuffle joins attaching the two int64
    fingerprints, vectorized Hamming verify, connected-components
    clustering, shuffle left-join emit. Cheaper than the minhash
    variant (8-byte payloads instead of num_perm×8). Thin wrapper over
    ``simhash_dedup(mode="distributed")`` — one substrate, two plans."""
    return simhash_dedup(
        ds,
        text_col=text_col,
        id_col=id_col,
        max_hamming=max_hamming,
        seed=seed,
        mode="distributed",
        num_buckets=num_buckets,
        max_bucket_pairs=max_bucket_pairs,
        bloom_fp_rate=bloom_fp_rate,
    )


# ------------------------------------------------------------------ SimHash


def simhash_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "simhash",
    seed: int = 0,
    token_hash: str = "xx",
) -> pa.Table:
    if token_hash == "poly":
        from ddsketch_ray.hashing import polyhash_strings as _tok_hash
    else:
        _tok_hash = hash_strings
    texts = pl.from_arrow(batch.column(text_col)).fill_null("")
    toks = texts.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    flat_tokens = toks.explode().drop_nulls()
    th = (
        _tok_hash(flat_tokens.to_arrow(), seed=seed)
        if flat_tokens.len()
        else np.empty(0, np.uint64)
    )
    fps = simhash64(th, offs)
    return batch.append_column(out_col, pa.array(fps.astype(np.int64), type=pa.int64()))


def _simhash_band_rows(batch: pa.Table, id_col: str) -> pa.Table:
    """Explode 64-bit fingerprints to 4×16-bit (band, band_hash, id)
    rows (pigeonhole: any pair with Hamming ≤ 3 over 64 bits agrees
    exactly on ≥ 1 band)."""
    fp = batch.column("simhash").to_numpy().view(np.uint64)
    ids = batch.column(id_col)
    n = len(fp)
    bands_out, vals_out = [], []
    for b in range(4):
        bits = (fp >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        bands_out.append(np.full(n, b, dtype=np.int64))
        vals_out.append(bits.astype(np.int64))
    return pa.table(
        {
            "band": pa.array(np.concatenate(bands_out)),
            "band_hash": pa.array(np.concatenate(vals_out)),
            id_col: pa.concat_arrays([ids.combine_chunks()] * 4),
        }
    )


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 0,
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    num_buckets: int = 64,
    max_bucket_pairs: int = 64,
    bloom_fp_rate: float = 0.001,
    token_hash: str = "xx",
):
    """SimHash near-dup → streaming Dataset (id_col, rep, is_survivor).

    Candidate generation: 4 bands of 16 bits each (pigeonhole: any pair
    with Hamming ≤ 3 over 64 bits agrees exactly on ≥1 band) → verify
    Hamming ≤ max_hamming → cluster. Physical plan is size-gated
    (``_banded_dedup_assignments``): small band sets verify/cluster on
    the driver, large ones stay fully distributed — identical output.
    """
    fps = ds.map_batches(
        lambda b: simhash_batch(
            b, text_col=text_col, seed=seed, token_hash=token_hash
        ).select([id_col, "simhash"]),
        batch_format="pyarrow", batch_size=None,
    ).materialize()  # 16 B per row; reused (banding + verify + emit)

    def verify_driver(pairs, cand):
        order = np.argsort(cand[id_col].to_numpy(), kind="stable")
        sorted_ids = cand[id_col].to_numpy()[order]
        fps_sorted = cand["simhash"].to_numpy()[order].astype(np.int64)
        av = fps_sorted[np.searchsorted(sorted_ids, pairs["a"].to_numpy())].view(np.uint64)
        bv = fps_sorted[np.searchsorted(sorted_ids, pairs["b"].to_numpy())].view(np.uint64)
        return pairs[hamming64(av, bv) <= max_hamming]

    def verify_dist(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        fa = t.column("fp_a").to_numpy(zero_copy_only=False).astype(np.int64)
        fb = t.column("fp_b").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (hamming64(fa.view(np.uint64), fb.view(np.uint64)) <= max_hamming) & (
            a != b
        )
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return _banded_dedup_assignments(
        fps,
        lambda b: _simhash_band_rows(b, id_col),
        id_col,
        verify_driver=verify_driver,
        pack_fn=lambda t: t,  # (id, simhash) is already the join payload
        payload_name="fp",
        verify_dist=verify_dist,
        mode=mode,
        driver_threshold=driver_threshold,
        max_bucket_pairs=max_bucket_pairs,
        num_buckets=num_buckets,
        bloom_fp_rate=bloom_fp_rate,
        seed=seed,
    )


def exact_dedup_emit(ds, key_col: str, id_col: str):
    """Exact dedup that EMITS the surviving row — for each ``key_col``
    group, the full row with the minimum ``id_col`` (deterministic:
    ties impossible for a unique id). Unlike ``sorted_group_rollup``
    (whose carries must be constant within a group), every output
    column belongs to the survivor row itself, so columns that vary
    within a duplicate group (e.g. a doc_id-keyed split assignment)
    are carried correctly.

    Plan: one distributed sort on (key, id) — group-first rows are then
    min-id rows — each block emits its group-first rows; only the
    block's FIRST and LAST groups can span an edge, so those candidates
    (≤ 2 rows per block) are re-minimized on the driver. The sort moves
    full rows: for very wide rows prefer ``exact_dedup`` (ids only) +
    an id join. Keys must be non-null."""
    import pandas as pd
    import ray.data as rd

    sch = getattr(ds.schema(), "base_schema", ds.schema())
    if sch is not None and "_edge" in getattr(sch, "names", []):
        raise ValueError("exact_dedup_emit reserves the column name '_edge'")
    s = ds.sort([key_col, id_col])

    def block_first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_edge", pa.array([], pa.bool_()))
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        out = t.take(pa.array(starts.astype(np.int64)))
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = edge[-1] = True
        return out.append_column("_edge", pa.array(edge))

    rep = s.map_batches(block_first, batch_format="pyarrow", batch_size=None).materialize()
    internal = rep.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("_edge"))).drop_columns(["_edge"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("_edge")).drop_columns(["_edge"]),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 candidate rows per block
    if not len(edge):
        return internal
    # min-id row per key among the candidates (the global min-id row of
    # any block-spanning group is a group-first row in SOME block).
    # drop_duplicates keeps WHOLE rows — groupby().first() would take
    # each column's first NON-NULL value, mixing rows when the survivor
    # holds nulls.
    win = edge.sort_values([key_col, id_col], kind="stable").drop_duplicates(
        subset=[key_col], keep="first"
    )
    rsch = getattr(rep.schema(), "base_schema", rep.schema())
    fix = pa.table(
        {
            f.name: pa.Array.from_pandas(win[f.name], type=f.type)  # NaN→null
            for f in rsch
            if f.name != "_edge"
        }
    )
    return internal.union(rd.from_arrow(fix))


def decontaminate(
    train_ds,
    eval_batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    tau_num: int = 1,
    tau_den: int = 2,
    max_eval_df: int = 8,
    min_rare_shared: int = 2,
    seed: int = 0,
    batch_size: int | None = 4096,
):
    """Test-set decontamination: flag train documents whose EXACT
    n-gram Jaccard against ANY eval document reaches
    ``tau_num/tau_den``. → Dataset (id_col, eval_id, inter, union) —
    one row per contaminated (train, eval) pair.

    The eval side is the small one (benchmarks/test sets), so this is a
    ZERO-shuffle broadcast plan, two-phase like the repo's n-gram dedup:

    - **Candidates** = pairs sharing ≥ ``min_rare_shared`` DISTINCTIVE
      grams (eval document frequency ≤ ``max_eval_df``), then pruned by
      the size-compatibility bound ``tau_den·min(|A|,|B|) ≥
      tau_num·max(|A|,|B|)`` (a necessary condition of the threshold —
      no recall loss). The df cap bounds the match expansion at
      ``max_eval_df`` per matched train gram; without it a hot
      boilerplate gram (eval df in the hundreds) that also appears in
      most train docs yields an O(|train| × df) blow-up — measured
      581M match rows for ONE 37.5k-doc block on a shared-template
      corpus, with every train×eval pair sharing ≥ 1 gram. The recall
      contract (same family as ``ngram_jaccard_dedup_distributed``'s
      rare-gram blocking): a pair sharing fewer than ``min_rare_shared``
      distinctive grams is missed — at sane thresholds (τ ≥ ~0.3) a
      true near-dup shares far more.
    - **Verification is exact**: each surviving candidate intersects
      the train doc's FULL sorted gram set against that eval doc's
      FULL set (one lexsort over concatenated pair payloads — no
      per-pair Python), processed in fixed-size element chunks so peak
      memory is bounded regardless of candidate count. Reported
      inter/union are true values; the threshold is the integer
      cross-multiplication.

    Docs with fewer than ``n`` tokens have empty sets and are never
    flagged (both sides). ``batch_size`` bounds per-task work (docs per
    kernel call); worker footprint = eval grams × 16 B + one verify
    chunk. For eval corpora beyond ~10⁷ grams, chunk the eval side
    (runs are independent unions).
    """
    import ray

    ev = shingle_doc_sets_batch(eval_batch, text_col=text_col, id_col=id_col, n=n, seed=seed)
    evals, ecounts = _unpack_large_binary_u64(ev.column("shset"))
    eids = ev.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    e_row = np.repeat(np.arange(len(eids), dtype=np.int64), ecounts)
    e_off = np.zeros(len(eids) + 1, dtype=np.int64)
    np.cumsum(ecounts, out=e_off[1:])
    order = np.argsort(evals, kind="stable")
    eg_s, erow_s = evals[order], e_row[order]
    starts = np.nonzero(np.r_[True, eg_s[1:] != eg_s[:-1]])[0]
    df = np.diff(np.r_[starts, len(eg_s)])
    rare = np.repeat(df <= max_eval_df, df)
    payload = ray.put(
        (eg_s[rare], erow_s[rare], evals, e_off, eids, ecounts.astype(np.int64))
    )
    VERIFY_CHUNK_ELEMS = 32_000_000  # ~0.5 GB peak in the verify lexsort

    def kernel(t: pa.Table) -> pa.Table:
        eg, erow, eflat, eoff, eids_, esz_ = ray.get(payload)  # plasma-local
        p = shingle_doc_sets_batch(t, text_col=text_col, id_col=id_col, n=n, seed=seed)
        vals, counts = _unpack_large_binary_u64(p.column("shset"))
        tids = p.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "eval_id": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "union": pa.array([], pa.int64()),
            }
        )
        if not len(vals) or not len(eg):
            return empty
        t_off = np.zeros(len(tids) + 1, dtype=np.int64)
        np.cumsum(counts, out=t_off[1:])
        t_row = np.repeat(np.arange(len(tids), dtype=np.int64), counts)
        # ---- phase 1: candidates via distinctive grams
        lo = np.searchsorted(eg, vals, side="left")
        hi = np.searchsorted(eg, vals, side="right")
        m = hi > lo
        if not m.any():
            return empty
        reps = (hi[m] - lo[m]).astype(np.int64)
        total = int(reps.sum())
        ar = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(reps) - reps, reps)
        pe = erow[np.repeat(lo[m], reps) + ar]
        pt = np.repeat(t_row[m], reps)
        key = pt * np.int64(len(eids_)) + pe
        uk, shared = np.unique(key, return_counts=True)
        sel = shared >= min_rare_shared
        cpt = (uk[sel] // len(eids_)).astype(np.int64)
        cpe = (uk[sel] % len(eids_)).astype(np.int64)
        # size-compatibility prune (necessary for J >= tau; no recall loss)
        la, lb = counts[cpt], esz_[cpe]
        ok = np.int64(tau_den) * np.minimum(la, lb) >= np.int64(tau_num) * np.maximum(la, lb)
        cpt, cpe, la, lb = cpt[ok], cpe[ok], la[ok], lb[ok]
        if not len(cpt):
            return empty
        # ---- phase 2: exact verify in bounded-memory chunks
        elems = la + lb
        cum = np.cumsum(elems)
        outs = []
        c0 = 0
        while c0 < len(cpt):
            base = cum[c0 - 1] if c0 else 0
            c1 = int(np.searchsorted(cum, base + VERIFY_CHUNK_ELEMS)) + 1
            c1 = max(c0 + 1, min(c1, len(cpt)))
            kpt, kpe = cpt[c0:c1], cpe[c0:c1]
            kla, klb = la[c0:c1], lb[c0:c1]
            npair = len(kpt)
            tota, totb = int(kla.sum()), int(klb.sum())
            ara = np.arange(tota, dtype=np.int64) - np.repeat(np.cumsum(kla) - kla, kla)
            a_grams = vals[np.repeat(t_off[kpt], kla) + ara]
            a_pair = np.repeat(np.arange(npair, dtype=np.int64), kla)
            arb = np.arange(totb, dtype=np.int64) - np.repeat(np.cumsum(klb) - klb, klb)
            b_grams = eflat[np.repeat(eoff[kpe], klb) + arb]
            b_pair = np.repeat(np.arange(npair, dtype=np.int64), klb)
            gall = np.concatenate([a_grams, b_grams])
            pall = np.concatenate([a_pair, b_pair])
            o = np.lexsort((gall, pall))
            gs, ps = gall[o], pall[o]
            dup = (ps[1:] == ps[:-1]) & (gs[1:] == gs[:-1])  # each side distinct
            inter = np.bincount(ps[1:][dup], minlength=npair).astype(np.int64)
            union = kla + klb - inter
            keep = np.int64(tau_den) * inter >= np.int64(tau_num) * union
            if keep.any():
                outs.append(
                    pa.table(
                        {
                            id_col: pa.array(tids[kpt[keep]]),
                            "eval_id": pa.array(eids_[kpe[keep]]),
                            "inter": pa.array(inter[keep]),
                            "union": pa.array(union[keep]),
                        }
                    )
                )
            c0 = c1
        return pa.concat_tables(outs) if outs else empty

    return train_ds.map_batches(
        kernel, batch_format="pyarrow", batch_size=batch_size
    )


# --------------------------------------------- representative selection


def select_representatives(
    assign_ds,
    scores_ds=None,
    id_col: str = "doc_id",
    score_col: str = "score",
    num_buckets: int = 64,
):
    """Re-pick each dedup cluster's representative as its highest-score
    member (ties → smallest id) — the "keep the best copy" policy a
    production corpus prep wants instead of the structural min-id rep
    that every dedup family here emits (no reference analogue —
    gmorleo/DDSketch has no dedup; this extends the §2.3 set-ops row).

    Inputs: ``assign_ds`` = ``(id_col, rep, ...)`` from any dedup
    family (exact / MinHash / SimHash / Jaccard / embedding / SemDeDup
    — they all share the contract); ``scores_ds`` = one non-null
    INTEGER score per id (fixed-point-quantize floats upstream, the
    repo's standard for order-independent SQL-replayable comparisons).
    Pass ``scores_ds=None`` when ``score_col`` is already a column of
    ``assign_ds`` — that skips the shuffle join (step 1) entirely, the
    common case when scores were computed on the same table.
    Output: ``(id_col, rep, is_survivor)`` with the same cluster
    partition, ``rep`` = the winning member's id.

    Plan (house sort-plan idiom, per_key_rank/cap_per_key family):

    1. ONE shuffle join attaches scores to the (id, rep) rows — the
       only all-to-all that moves data; payload is 3 int64 columns.
    2. ONE global sort by (rep, -score, id): each cluster's winner is
       the first row of its rep-run.
    3. Per block: winner = first id of each run (vectorized gather).
       A block's FIRST run may continue from the previous block, so
       each block emits ONE summary row and the driver resolves
       cross-block runs with an O(blocks) carry walk (ids unique ⇒
       block order reconstructible; in-block + boundary (rep, id)
       adjacency is validated and raises on duplicates — the pack.py
       silent-corruption rule, which also catches a fanned-out join
       from duplicate score rows).
    4. A streaming finish rewrites only first-run rows of overridden
       blocks. Driver footprint: one summary row per block + the
       override dict (≤ blocks entries).
    """
    import ray

    if scores_ds is None:
        j = assign_ds
    else:
        from ddsketch_ray.functions.joins import equi_join_shuffle

        j = equi_join_shuffle(
            assign_ds,
            scores_ds,
            id_col,
            id_col,
            ["rep"],
            [score_col],
            num_buckets=num_buckets,
            how="left",
            coalesce_blocks=True,
        )

    def project(t: pa.Table) -> pa.Table:
        s = t.column(score_col)
        if s.null_count:
            raise ValueError(
                "select_representatives: missing score for some ids — "
                "every cluster member needs exactly one score row"
            )
        s64 = s.cast(pa.int64()).to_numpy()
        if len(s64) and int(s64.min()) == np.iinfo(np.int64).min:
            raise ValueError("select_representatives: INT64_MIN score unsupported")
        return pa.table(
            {
                "r": t.column("rep").cast(pa.int64()),
                "n": pa.array(-s64),
                "i": t.column(id_col).cast(pa.int64()),
            }
        )

    s = j.map_batches(project, batch_format="pyarrow", batch_size=None).sort(
        ["r", "n", "i"]
    )

    def block_pass(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e64 = pa.array([], pa.int64())
            eb = pa.array([], pa.bool_())
            return pa.table(
                {
                    id_col: e64,
                    "rep": e64,
                    "_first_run": eb,
                    "_summary": eb,
                    "_fk": e64,
                    "_lk": e64,
                    "_fo": e64,
                    "_fi": e64,
                    "_li": e64,
                    "_wl": e64,
                }
            )
        r = t.column("r").to_numpy()
        o = t.column("n").to_numpy()
        i = t.column("i").to_numpy()
        n = len(r)
        if n > 1 and ((r[1:] == r[:-1]) & (i[1:] == i[:-1])).any():
            raise ValueError(
                "select_representatives: duplicate (rep, id) rows — "
                "more than one score row per id?"
            )
        kchg = np.r_[True, r[1:] != r[:-1]]
        gstart = np.maximum.accumulate(np.where(kchg, np.arange(n), 0))
        z = np.zeros(n - 1, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(i),
                "rep": pa.array(i[gstart]),
                "_first_run": pa.array(gstart == 0),
                "_summary": pa.array(np.r_[True, np.zeros(n - 1, dtype=bool)]),
                "_fk": pa.array(np.r_[r[0], z]),
                "_lk": pa.array(np.r_[r[-1], z]),
                "_fo": pa.array(np.r_[o[0], z]),
                "_fi": pa.array(np.r_[i[0], z]),
                "_li": pa.array(np.r_[i[-1], z]),
                "_wl": pa.array(np.r_[i[int(gstart[-1])], z]),
            }
        )

    rep_ds = s.map_batches(
        block_pass, batch_format="pyarrow", batch_size=None
    ).materialize()

    summ_refs = rep_ds.map_batches(
        lambda t: t.filter(t.column("_summary")).select(
            ["_fk", "_lk", "_fo", "_fi", "_li", "_wl"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).to_arrow_refs()
    # tiny inputs: all-to-all stages can emit schema-LESS empty blocks
    # (zero columns) that pass through map_batches untouched — drop them
    parts = [p for p in (ray.get(x) for x in summ_refs) if p.num_columns]
    if not parts:
        import ray.data as _rd

        e64 = pa.array([], pa.int64())
        return _rd.from_arrow(
            pa.table(
                {id_col: e64, "rep": e64, "is_survivor": pa.array([], pa.bool_())}
            )
        )
    summ = pa.concat_tables(parts)
    summ = summ.sort_by(
        [("_fk", "ascending"), ("_fo", "ascending"), ("_fi", "ascending")]
    )
    fk = summ.column("_fk").to_numpy()
    lk = summ.column("_lk").to_numpy()
    fi = summ.column("_fi").to_numpy()
    li = summ.column("_li").to_numpy()
    wl = summ.column("_wl").to_numpy()
    if len(np.unique(fi)) != len(fi):
        raise ValueError(
            "select_representatives: duplicate block-identity ids — id_col not unique"
        )
    override: dict[int, int] = {}
    carry_rep: int | None = None
    carry_last_id = 0
    carry_win = 0
    for b in range(len(fk)):
        if carry_rep is not None and int(fk[b]) == carry_rep:
            if int(fi[b]) == carry_last_id:
                raise ValueError(
                    "select_representatives: duplicate (rep, id) across block "
                    "boundary — more than one score row per id?"
                )
            override[int(fi[b])] = carry_win
            if int(fk[b]) != int(lk[b]):
                carry_win = int(wl[b])
        else:
            carry_win = int(wl[b])
        carry_rep = int(lk[b])
        carry_last_id = int(li[b])
    over_ref = ray.put(override)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            e64 = pa.array([], pa.int64())
            return pa.table(
                {id_col: e64, "rep": e64, "is_survivor": pa.array([], pa.bool_())}
            )
        ov = ray.get(over_ref)
        ids = t.column(id_col).to_numpy()
        w = t.column("rep").to_numpy().copy()
        if bool(t.column("_summary")[0].as_py()) and int(ids[0]) in ov:
            m = t.column("_first_run").to_numpy()
            w[m] = ov[int(ids[0])]
        return pa.table(
            {
                id_col: pa.array(ids),
                "rep": pa.array(w),
                "is_survivor": pa.array(ids == w),
            }
        )

    return rep_ds.map_batches(finish, batch_format="pyarrow", batch_size=None)
