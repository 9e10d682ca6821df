import numpy as np
import pytest

from ddsketch_ray.agg import hash_any_column
from ddsketch_ray.sketches.kmv import KMV, kmv_set_ops


def _sk(values, k):
    sk = KMV(k=k)
    v = np.asarray(values)
    sk.add_hashed(hash_any_column(v, False, seed=0), v)
    return sk


def test_unsaturated_is_exact():
    # both sets smaller than k: the sketches ARE the sets, every number exact
    a = _sk(np.arange(0, 6), 64)
    b = _sk(np.arange(3, 10), 64)
    r = kmv_set_ops(a, b)
    assert r["k_used"] == 10
    assert r["est_union"] == 10.0
    assert r["est_intersection"] == 3.0
    assert r["est_diff_a"] == 3.0
    assert r["est_diff_b"] == 4.0
    assert r["jaccard"] == pytest.approx(0.3)


def test_disjoint_and_identical():
    a = _sk(np.arange(0, 50), 32)
    assert kmv_set_ops(a, _sk(np.arange(0, 50), 32))["jaccard"] == 1.0
    d = kmv_set_ops(a, _sk(np.arange(1000, 1050), 32))
    assert d["n_both"] == 0 and d["est_intersection"] == 0.0


def test_empty_sketches():
    r = kmv_set_ops(KMV(k=8), KMV(k=8))
    assert r["k_used"] == 0 and r["est_union"] == 0.0 and r["jaccard"] == 0.0


def test_k_mismatch_raises():
    with pytest.raises(ValueError):
        kmv_set_ops(KMV(k=8), KMV(k=16))


def test_saturated_accuracy_and_merge_order_independence():
    rng = np.random.default_rng(3)
    A = rng.choice(200_000, 30_000, replace=False)
    B = np.concatenate([A[:12_000], 200_000 + rng.choice(100_000, 18_000, replace=False)])
    k = 1024
    a, b = _sk(A, k), _sk(B, k)
    r = kmv_set_ops(a, b)
    true_union = len(np.union1d(A, B))
    true_inter = len(np.intersect1d(A, B))
    # KMV relative error ~ 1/sqrt(k-2) ≈ 3.1%; allow 4 sigma
    assert abs(r["est_union"] - true_union) / true_union < 0.13
    assert abs(r["est_intersection"] - true_inter) / true_inter < 0.2
    # distributed build (sharded partials merged in any order) is bit-identical
    parts = [_sk(A[i::7], k) for i in range(7)]
    m = parts[3]
    for p in (parts[6], parts[0], parts[5], parts[1], parts[4], parts[2]):
        m.merge(p)
    r2 = kmv_set_ops(m, b)
    assert r2 == r


def test_overlap_matrix_exact_below_saturation(ray_session):
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.analytics import kmv_overlap_matrix

    # three groups of integer ids with known overlaps, all below k
    rows = (
        [("a", i) for i in range(0, 30)]
        + [("b", i) for i in range(20, 50)]   # |a∩b| = 10
        + [("c", i) for i in range(100, 120)]  # disjoint from a and b
    )
    df = pd.DataFrame(rows, columns=["g", "v"])
    ds = rd.from_pandas(df).repartition(5)
    out = kmv_overlap_matrix(ds, "g", "v", k=64).to_pandas()
    out = out.set_index(["group_a", "group_b"])
    ab = out.loc[("a", "b")]
    assert ab["k_used"] == 50 and ab["n_both"] == 10
    assert ab["est_union"] == 50.0 and ab["est_intersection"] == 10.0
    assert ab["est_diff_a"] == 20.0 and ab["est_diff_b"] == 20.0
    ac = out.loc[("a", "c")]
    assert ac["n_both"] == 0 and ac["est_intersection"] == 0.0
    bc = out.loc[("b", "c")]
    assert bc["est_union"] == 50.0
    assert list(out.index) == [("a", "b"), ("a", "c"), ("b", "c")]


def test_overlap_matrix_partitioning_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from ddsketch_ray.functions.analytics import kmv_overlap_matrix

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 5000),
            "v": rng.integers(0, 800, 5000),
        }
    )
    a = kmv_overlap_matrix(rd.from_pandas(df).repartition(2), "g", "v", k=32).to_pandas()
    b = kmv_overlap_matrix(rd.from_pandas(df).repartition(13), "g", "v", k=32).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # saturated: k_used == k on every pair
    assert (a["k_used"] == 32).all()
