"""Misra-Gries frequent-items summary (sketches/mg.py — Misra & Gries
1982; mergeability per Agarwal et al., PODS 2012) and the two-pass exact
``frequent_items`` plan (functions/analytics.py): superset + undercount
guarantees under arbitrary splits/merge trees, weighted streams, and
exactness/layout-invariance of the distributed plan vs a Python oracle."""

from __future__ import annotations

import numpy as np
import pytest

from ddsketch_ray.sketches.mg import MisraGries


def _zipf_stream(n=60_000, vocab=5_000, seed=3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vals = np.minimum(rng.zipf(1.3, n), vocab)
    return np.array([f"tok{v}" for v in vals], dtype=object)


def _true_counts(stream) -> dict:
    vals, cnts = np.unique(stream, return_counts=True)
    return dict(zip(vals.tolist(), cnts.tolist()))


def _feed(sk: MisraGries, chunk: np.ndarray) -> None:
    vals, cnts = np.unique(chunk, return_counts=True)
    sk.add_counts(vals.astype(object), cnts)


def test_mg_guarantees_single_stream():
    stream = _zipf_stream()
    true = _true_counts(stream)
    k = 64
    sk = MisraGries(k)
    for chunk in np.array_split(stream, 17):
        _feed(sk, chunk)
    n = len(stream)
    assert sk.n == n
    assert sk.size <= k
    # realized offset within the published bound
    assert sk.offset <= n // (k + 1)
    cand = set(sk.candidates().tolist())
    for v, c in true.items():
        if c > n // (k + 1):
            assert v in cand, f"{v} (count {c}) missing from candidates"
        lo, hi = sk.estimate(v)
        assert lo <= c <= hi


def test_mg_merge_tree_guarantees():
    stream = _zipf_stream(seed=9)
    true = _true_counts(stream)
    n, k = len(stream), 48
    rng = np.random.default_rng(1)
    # random permutation, random 12-way split, pairwise merge tree
    perm = stream[rng.permutation(n)]
    parts = np.array_split(perm, 12)
    sks = []
    for p in parts:
        sk = MisraGries(k)
        _feed(sk, p)
        sks.append(sk)
    while len(sks) > 1:
        a, b = sks.pop(0), sks.pop(0)
        sks.append(a.merge(b))
    sk = sks[0]
    assert sk.n == n
    assert sk.offset <= n // (k + 1)
    cand = set(sk.candidates().tolist())
    for v, c in true.items():
        if c > n // (k + 1):
            assert v in cand
        lo, hi = sk.estimate(v)
        assert lo <= c <= hi


def test_mg_int_keys_and_exact_below_k():
    sk = MisraGries(16)
    vals = np.array([1, 2, 3, 2, 1, 1], dtype=np.int64)
    u, c = np.unique(vals, return_counts=True)
    sk.add_counts(u.astype(object), c)
    assert sk.offset == 0  # never pruned -> exact
    assert sk.estimate(1) == (3, 3)
    assert sk.estimate(2) == (2, 2)
    assert sk.estimate(99) == (0, 0)


def test_mg_validation():
    with pytest.raises(ValueError):
        MisraGries(0)
    sk = MisraGries(4)
    with pytest.raises(ValueError):
        sk.add_counts(np.array(["a"], dtype=object), np.array([-1]))
    other = MisraGries(5)
    with pytest.raises(ValueError):
        sk.merge(other)
    # zero-weight rows are dropped, not an error
    sk.add_counts(np.array(["a", "b"], dtype=object), np.array([0, 2]))
    assert sk.estimate("a") == (0, 0) and sk.estimate("b") == (2, 2)


# ------------------------------------------------- distributed two-pass plan


def _exact_frequent(stream, phi, weights=None):
    if weights is None:
        true = _true_counts(stream)
        n = len(stream)
    else:
        true = {}
        for v, w in zip(stream.tolist(), weights.tolist()):
            true[v] = true.get(v, 0) + int(w)
        n = int(np.sum(weights))
    import math

    thr = math.ceil(phi * n)
    rows = [(v, c) for v, c in true.items() if c >= thr]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows, n


@pytest.mark.parametrize("num_blocks", [3, 11])
def test_frequent_items_exact_and_layout_invariant(ray_session, num_blocks):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items

    stream = _zipf_stream(n=40_000, seed=5)
    ds = rd.from_arrow(pa.table({"tok": stream.astype(str)})).repartition(num_blocks)
    phi = 0.02
    out = frequent_items(ds, "tok", phi, k=128)
    got = list(zip(out.column("item").to_pylist(), out.column("cnt").to_pylist()))
    want, n = _exact_frequent(stream, phi)
    assert got == want
    assert set(out.column("n").to_pylist()) == {n}


def test_frequent_items_weighted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items

    rng = np.random.default_rng(7)
    stream = _zipf_stream(n=20_000, vocab=800, seed=8)
    weights = rng.integers(1, 5, len(stream)).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"tok": stream.astype(str), "w": weights})
    ).repartition(7)
    phi = 0.03
    out = frequent_items(ds, "tok", phi, weight_col="w")
    got = list(zip(out.column("item").to_pylist(), out.column("cnt").to_pylist()))
    want, _ = _exact_frequent(stream, phi, weights)
    assert got == want


def test_frequent_items_validation(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items

    ds = rd.from_arrow(pa.table({"tok": ["a", "b", "a"]}))
    with pytest.raises(ValueError):
        frequent_items(ds, "tok", 0.0)
    with pytest.raises(ValueError):
        frequent_items(ds, "tok", 0.01, k=10)  # k < ceil(1/phi)


def test_mg_groupby_per_group_summaries(ray_session):
    """MisraGriesAgg through ds.groupby().aggregate(): one summary per
    group, each honoring the superset + bound guarantees for its own
    substream (the per-language frequent-token profile shape)."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.agg import MisraGriesAgg, sketch_from_result

    rng = np.random.default_rng(2)
    langs = np.array(["en", "fr", "de"], dtype=object)[rng.integers(0, 3, 30_000)]
    toks = _zipf_stream(n=30_000, vocab=400, seed=4)
    ds = rd.from_arrow(
        pa.table({"lang": langs.astype(str), "tok": toks.astype(str)})
    ).repartition(9)
    k = 32
    rows = (
        ds.groupby("lang")
        .aggregate(MisraGriesAgg(on="tok", k=k, alias_name="mg"))
        .to_pandas()
    )
    assert sorted(rows["lang"]) == ["de", "en", "fr"]
    for _, row in rows.iterrows():
        sk = sketch_from_result(row["mg"])
        sub = toks[langs == row["lang"]]
        true = _true_counts(sub)
        n = len(sub)
        assert sk.n == n
        assert sk.offset <= n // (k + 1)
        cand = set(sk.candidates().tolist())
        for v, c in true.items():
            if c > n // (k + 1):
                assert v in cand
            lo, hi = sk.estimate(v)
            assert lo <= c <= hi


@pytest.mark.parametrize("num_blocks", [4, 13])
def test_frequent_items_by_group_exact(ray_session, num_blocks):
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items_by_group

    rng = np.random.default_rng(6)
    langs = np.array(["de", "en", "fr"], dtype=object)[rng.integers(0, 3, 35_000)]
    toks = _zipf_stream(n=35_000, vocab=600, seed=12)
    ds = rd.from_arrow(
        pa.table({"lang": langs.astype(str), "tok": toks.astype(str)})
    ).repartition(num_blocks)
    phi = 0.03
    out = frequent_items_by_group(ds, "lang", "tok", phi)
    got = list(
        zip(
            out.column("group").to_pylist(),
            out.column("item").to_pylist(),
            out.column("cnt").to_pylist(),
            out.column("n").to_pylist(),
        )
    )
    import math

    want = []
    for g in ["de", "en", "fr"]:
        sub = toks[langs == g]
        n = len(sub)
        thr = math.ceil(phi * n)
        rows = [(g, v, c, n) for v, c in _true_counts(sub).items() if c >= thr]
        rows.sort(key=lambda r: (r[0], -r[2], r[1]))
        want.extend(rows)
    assert got == want


def test_frequent_items_int_keys_and_empty_typed(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items

    rng = np.random.default_rng(3)
    vals = np.minimum(rng.zipf(1.5, 25_000), 1000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"uid": vals})).repartition(5)
    out = frequent_items(ds, "uid", phi=0.05)
    got = list(zip(out.column("item").to_pylist(), out.column("cnt").to_pylist()))
    u, c = np.unique(vals, return_counts=True)
    thr = math.ceil(0.05 * len(vals))
    want = sorted(
        [(int(v), int(n)) for v, n in zip(u, c) if n >= thr], key=lambda r: (-r[1], r[0])
    )
    assert got == want
    assert out.schema.field("item").type == pa.int64()
    # a phi no value reaches -> empty but TYPED output
    out2 = frequent_items(ds, "uid", phi=0.9)
    assert out2.num_rows == 0
    assert out2.schema.field("item").type == pa.int64()
    assert out2.schema.field("cnt").type == pa.int64()


# ----------------------------------------------------- resumable two-pass job


def test_frequent_items_job_cold_equals_resumed(ray_session, tmp_path):
    """jobs/frequent_items_job.py: exact answer, cold ≡ resumed
    bit-for-bit, resume recomputes 0 partitions, and a changed input
    set invalidates the affected partitions of BOTH passes."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.frequent_items_job import run_job

    rng = np.random.default_rng(10)
    files = []
    all_vals = []
    for f in range(4):
        vals = np.minimum(rng.zipf(1.4, 8000), 900)
        all_vals.append(vals)
        p = str(tmp_path / f"part-{f}.parquet")
        pq.write_table(
            pa.table({"host": pa.array([f"h{v}" for v in vals], pa.string())}), p
        )
        files.append(p)
    ckpt = str(tmp_path / "ckpt")
    phi = 0.02

    cold = run_job(files, "host", phi, ckpt, run_id="t1", concurrency=2)
    assert cold["recomputed_partitions_pass1"] == 4
    assert cold["recomputed_partitions_pass2"] == 4

    # exact oracle
    stream = np.concatenate(all_vals)
    u, c = np.unique(stream, return_counts=True)
    thr = math.ceil(phi * len(stream))
    want = sorted(
        [(f"h{v}", int(n)) for v, n in zip(u, c) if n >= thr],
        key=lambda r: (-r[1], r[0]),
    )
    assert [(d["item"], d["cnt"]) for d in cold["frequent"]] == want
    assert cold["n"] == len(stream)

    resumed = run_job(files, "host", phi, ckpt, run_id="t1", concurrency=2)
    assert resumed["recomputed_partitions_pass1"] == 0
    assert resumed["recomputed_partitions_pass2"] == 0
    assert resumed["frequent"] == cold["frequent"]
    assert (resumed["n"], resumed["threshold"], resumed["mg_offset"]) == (
        cold["n"], cold["threshold"], cold["mg_offset"]
    )

    # shrink the input file LIST -> partition lineage mismatches, pass 1
    # recomputes, the changed pass-1 outcome re-keys the pass-2 digest so
    # stale counts cannot be silently reused (same file-list lineage
    # contract as jobs/sketch_job.py; content changes under identical
    # paths are out of contract there too)
    sub = run_job(files[:3], "host", phi, ckpt, run_id="t1", concurrency=2)
    assert sub["recomputed_partitions_pass1"] == 0  # prefix partitions reused
    assert sub["recomputed_partitions_pass2"] == 3  # new digest -> fresh counts
    sub_stream = np.concatenate(all_vals[:3])
    assert sub["n"] == len(sub_stream)
    u3, c3 = np.unique(sub_stream, return_counts=True)
    thr3 = math.ceil(phi * len(sub_stream))
    want3 = sorted(
        [(f"h{v}", int(n)) for v, n in zip(u3, c3) if n >= thr3],
        key=lambda r: (-r[1], r[0]),
    )
    assert [(d["item"], d["cnt"]) for d in sub["frequent"]] == want3


def test_frequent_items_by_group_weighted(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ray.functions.analytics import frequent_items_by_group

    rng = np.random.default_rng(14)
    langs = np.array(["en", "fr"], dtype=object)[rng.integers(0, 2, 12_000)]
    toks = _zipf_stream(n=12_000, vocab=300, seed=15)
    w = rng.integers(0, 6, 12_000).astype(np.int64)  # zeros exercise the drop
    ds = rd.from_arrow(
        pa.table({"lang": langs.astype(str), "tok": toks.astype(str), "w": w})
    ).repartition(6)
    phi = 0.04
    out = frequent_items_by_group(ds, "lang", "tok", phi, weight_col="w")
    got = list(
        zip(
            out.column("group").to_pylist(),
            out.column("item").to_pylist(),
            out.column("cnt").to_pylist(),
            out.column("n").to_pylist(),
        )
    )
    want = []
    for g in ["en", "fr"]:
        m = langs == g
        true = {}
        for v, ww in zip(toks[m].tolist(), w[m].tolist()):
            true[v] = true.get(v, 0) + int(ww)
        n = int(w[m].sum())
        thr = math.ceil(phi * n)
        rows = [(g, v, c, n) for v, c in true.items() if c >= thr]
        rows.sort(key=lambda r: (r[0], -r[2], r[1]))
        want.extend(rows)
    assert got == want
