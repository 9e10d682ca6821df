"""Incremental dedup against a PERSISTED MinHash-LSH index.

At 100 TB you do not re-dedup the whole corpus every time a new crawl
lands: you build the LSH index ONCE (``write_minhash_index`` — the
write_bucketed amortize-the-shuffle pattern applied to dedup), then
each ingest batch probes only the band buckets its own signatures hash
into (``dedup_against_index``). The corpus side stays on disk as two
hive layouts; per ingest batch only ~|batch × bands| band rows and the
candidates' signatures are touched.

Layouts under ``out_dir``:

- ``bands/bucket=i/`` — (band, band_hash, id) rows, hash-bucketed by
  band_hash: the probe side. A new doc's band hashes land in a small
  set of buckets; only those directories are read.
- ``sigs/bucket=i/``  — (id, minhash_sig) rows, hash-bucketed by id:
  the verify side, read only for candidate ids.
- ``_minhash_meta.json`` — the signature parameters; a lookup MUST use
  the same (k_shingle, num_perm, bands, seed) or candidates are
  garbage, so they are stored with the index, never passed twice.

Verify semantics match ``minhash_dedup`` exactly: estimated Jaccard =
signature-agreement fraction ≥ ``jaccard_threshold``; best match per
new doc = max agreement, ties to the smallest corpus id.

Driver bounds (documented, ingest-batch-scaled — NOT corpus-scaled):
the new batch's band rows (|batch| × bands fixed-width rows) and the
candidate pairs are held driver-side; the corpus band rows and corpus
signatures stream through stateless tasks. This is the same
"small side broadcasts, big side streams" contract as the broadcast
joins.

Reference scope note: gmorleo/DDSketch is a numeric sketch library
(`ddsketch.h:58-252`); this operator is part of the LLM-data-pipeline
surface this engine adds on top.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ddsketch_ray.functions.dedup import lsh_band_rows, minhash_signature_batch

_U64 = np.uint64
_KEYP = _U64(0x9E3779B97F4A7C15)


def _band_key(band_hash: np.ndarray, band: np.ndarray) -> np.ndarray:
    """Collision-safe (band, band_hash) match key in one uint64."""
    with np.errstate(over="ignore"):
        return band_hash.astype(np.int64).view(_U64) * _KEYP + band.astype(
            np.int64
        ).view(_U64)


def write_minhash_index(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 0,
    num_buckets: int = 64,
    token_hash: str = "xx",
) -> None:
    """Build the persisted LSH index: one signature pass over the
    corpus, then the two hive layouts. The signature pass is the
    dominant cost — paid once, amortized over every future ingest.
    ``token_hash`` ("xx" default, "poly" for the SQL-replayable family)
    is pinned in the index metadata — every future lookup must hash
    identically, so it travels with the index, never as a lookup
    argument."""
    from ddsketch_ray.sources.sinks import write_bucketed

    def sig_fn(t: pa.Table) -> pa.Table:
        return minhash_signature_batch(
            t, text_col=text_col, k_shingle=k_shingle, num_perm=num_perm, seed=seed,
            token_hash=token_hash,
        ).select([id_col, "minhash_sig"])

    sigs = ds.map_batches(sig_fn, batch_format="pyarrow", batch_size=None).materialize()
    band = sigs.map_batches(
        lambda t: lsh_band_rows(t, id_col=id_col, bands=bands),
        batch_format="pyarrow",
        batch_size=None,
    )
    write_bucketed(band, os.path.join(out_dir, "bands"), "band_hash", num_buckets, seed,
                   sort_by_bucket=True)

    def pack(t: pa.Table) -> pa.Table:
        # store signatures PACKED (fixed_size_binary(num_perm×8)): the
        # verify read decodes zero-copy instead of paying parquet
        # list<int64> reassembly over the whole corpus (the write_ivf
        # lesson — list decode dominated the lookup otherwise)
        m = np.asarray(
            t.column("minhash_sig").combine_chunks().flatten().to_numpy()
        ).reshape(t.num_rows, -1)
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m.shape[1] * 8),
            t.num_rows,
            [None, pa.py_buffer(np.ascontiguousarray(m).tobytes())],
        )
        return pa.table({id_col: t.column(id_col), "_psig": packed})

    write_bucketed(
        sigs.map_batches(pack, batch_format="pyarrow", batch_size=None),
        os.path.join(out_dir, "sigs"),
        id_col,
        num_buckets,
        seed,
        sort_by_bucket=True,  # index layouts are re-read every ingest
    )
    with open(os.path.join(out_dir, "_minhash_meta.json"), "w") as f:
        json.dump(
            {
                "id_col": id_col,
                "text_col": text_col,
                "k_shingle": k_shingle,
                "num_perm": num_perm,
                "bands": bands,
                "seed": seed,
                "num_buckets": num_buckets,
                "token_hash": token_hash,
            },
            f,
        )


def _bucket_of(values: np.ndarray, num_buckets: int, seed: int) -> np.ndarray:
    from ddsketch_ray.agg import hash_any_column

    return (
        hash_any_column(np.asarray(values, dtype=np.int64), is_arrow=False, seed=seed)
        % np.uint64(num_buckets)
    ).astype(np.int64)


def _read_buckets(root: str, buckets, columns):
    import glob as _glob

    import ray.data as rd

    files: list[str] = []
    for b in sorted(set(int(x) for x in buckets)):
        files.extend(sorted(_glob.glob(f"{root}/bucket={b}/*.parquet")))
    if not files:
        return None
    return rd.read_parquet(files, columns=columns)


def dedup_against_index(
    new_ds,
    index_dir: str,
    jaccard_threshold: float = 0.7,
):
    """Probe the persisted index with an ingest batch. Returns a
    Dataset (new_id:int64, match_id:int64 nullable, agreement:float64)
    — one row per new doc; match_id null when nothing in the corpus
    reaches the threshold."""
    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "_minhash_meta.json")) as f:
        meta = json.load(f)
    id_col, text_col = meta["id_col"], meta["text_col"]
    bands, num_perm = meta["bands"], meta["num_perm"]
    seed, num_buckets = meta["seed"], meta["num_buckets"]

    def sig_fn(t: pa.Table) -> pa.Table:
        return minhash_signature_batch(
            t,
            text_col=text_col,
            k_shingle=meta["k_shingle"],
            num_perm=num_perm,
            seed=seed,
            token_hash=meta.get("token_hash", "xx"),
        ).select([id_col, "minhash_sig"])

    nsigs = new_ds.map_batches(sig_fn, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(nsigs) == 0:  # empty ingest batch (to_pandas may drop schema)
        return rd.from_arrow(
            pa.table(
                {
                    "new_id": pa.array([], pa.int64()),
                    "match_id": pa.array([], pa.int64()),
                    "agreement": pa.array([], pa.float64()),
                }
            )
        )
    new_ids = nsigs[id_col].to_numpy(np.int64)
    nsig_mat = np.stack(
        [np.asarray(s, dtype=np.int64) for s in nsigs["minhash_sig"]]
    ) if len(nsigs) else np.empty((0, num_perm), np.int64)

    # new band rows — |batch| × bands fixed-width, the documented
    # ingest-batch driver bound
    nband = lsh_band_rows(
        pa.table(
            {
                id_col: pa.array(new_ids),
                "minhash_sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(nsig_mat.ravel(), type=pa.int64()), num_perm
                ),
            }
        ),
        id_col=id_col,
        bands=bands,
    )
    nb_key = _band_key(
        nband.column("band_hash").to_numpy(), nband.column("band").to_numpy()
    )
    nb_id = nband.column(id_col).to_numpy()
    order = np.argsort(nb_key, kind="stable")
    nb_key, nb_id = nb_key[order], nb_id[order]
    probe_ref = ray.put({"key": nb_key, "id": nb_id})

    empty = pa.table(
        {
            "new_id": pa.array(new_ids),
            "match_id": pa.nulls(len(new_ids), pa.int64()),
            "agreement": pa.array(np.zeros(len(new_ids))),
        }
    )
    if len(nb_key) == 0:
        return rd.from_arrow(empty)

    # probe ONLY the band buckets the new hashes land in
    buckets = np.unique(_bucket_of(nband.column("band_hash").to_numpy(), num_buckets, seed))
    iband = _read_buckets(
        os.path.join(index_dir, "bands"), buckets, ["band", "band_hash", id_col]
    )
    if iband is None:
        return rd.from_arrow(empty)

    def probe(t: pa.Table) -> pa.Table:
        p = ray.get(probe_ref)
        k = _band_key(t.column("band_hash").to_numpy(), t.column("band").to_numpy())
        lo = np.searchsorted(p["key"], k, side="left")
        hi = np.searchsorted(p["key"], k, side="right")
        m = hi > lo  # matched at least one new band row
        if not m.any():
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        cid = t.column(id_col).to_numpy()[m]
        lo, hi = lo[m], hi[m]
        counts = hi - lo
        # expand multi-matches (a new batch can contain near-dup docs
        # sharing a band hash)
        idx = np.repeat(lo, counts) + (
            np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        return pa.table(
            {
                "a": pa.array(p["id"][idx]),
                "b": pa.array(np.repeat(cid, counts)),
            }
        )

    from ddsketch_ray.functions.dedup import _distinct_sorted_pairs

    pairs = _distinct_sorted_pairs(
        iband.map_batches(probe, batch_format="pyarrow", batch_size=None)
    ).to_pandas()  # O(candidate pairs) — ingest-batch-scaled, documented
    pairs = pairs.drop_duplicates()  # block-edge stragglers from the sort dedup
    if not len(pairs):
        return rd.from_arrow(empty)

    # verify: stream ONLY the candidate corpus ids' signature buckets
    cand_ids = np.unique(pairs["b"].to_numpy(np.int64))
    new_pos = {int(i): p for p, i in enumerate(new_ids)}
    by_corpus: dict[int, np.ndarray] = {
        int(b): g["a"].to_numpy(np.int64) for b, g in pairs.groupby("b")
    }
    verify_ref = ray.put(
        {
            "by_corpus": by_corpus,
            "cand": cand_ids,
            "nsig": nsig_mat,
            "pos": new_pos,
        }
    )
    sbuckets = np.unique(_bucket_of(cand_ids, num_buckets, seed))
    isigs = _read_buckets(
        os.path.join(index_dir, "sigs"), sbuckets, [id_col, "_psig"]
    )

    def verify(t: pa.Table) -> pa.Table:
        v = ray.get(verify_ref)
        ids = t.column(id_col).to_numpy()
        keep = np.isin(ids.astype(np.int64), v["cand"])
        if not keep.any():
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "agree": pa.array([], pa.float64()),
                }
            )
        parr = t.column("_psig").combine_chunks()
        bw = parr.type.byte_width
        sig = np.frombuffer(
            parr.buffers()[1], dtype=np.int64, offset=parr.offset * bw,
            count=t.num_rows * (bw // 8),
        ).reshape(t.num_rows, -1)
        outs_a, outs_b, outs_g = [], [], []
        for i in np.nonzero(keep)[0]:
            cid = int(ids[i])
            news = v["by_corpus"][cid]
            rows = np.array([v["pos"][int(x)] for x in news], dtype=np.int64)
            agree = (v["nsig"][rows] == sig[i][None, :]).mean(axis=1)
            outs_a.append(news)
            outs_b.append(np.full(len(news), cid, dtype=np.int64))
            outs_g.append(agree)
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_a)),
                "b": pa.array(np.concatenate(outs_b)),
                "agree": pa.array(np.concatenate(outs_g)),
            }
        )

    ver = isigs.map_batches(verify, batch_format="pyarrow", batch_size=None).to_pandas()
    ver = ver[ver["agree"] >= jaccard_threshold]
    out_match = np.full(len(new_ids), -1, dtype=np.int64)
    out_agree = np.zeros(len(new_ids))
    if len(ver):
        # best match per new id: max agreement, ties to smallest corpus id
        ver = ver.sort_values(["a", "agree", "b"], ascending=[True, False, True])
        best = ver.groupby("a", as_index=False).first()
        for _, r in best.iterrows():
            p = new_pos[int(r["a"])]
            out_match[p] = int(r["b"])
            out_agree[p] = float(r["agree"])
    return rd.from_arrow(
        pa.table(
            {
                "new_id": pa.array(new_ids),
                "match_id": pa.array(out_match, type=pa.int64(), mask=out_match < 0),
                "agreement": pa.array(out_agree),
            }
        )
    )
