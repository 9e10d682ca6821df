import numpy as np
import pytest

from ddsketch_ray.sketches.ams import AMSSketch


def _sk(keys, rows=9, buckets=512):
    sk = AMSSketch(rows=rows, buckets=buckets)
    sk.add_hashed(np.asarray(keys, dtype=np.int64).view(np.uint64))
    return sk


def test_f2_accuracy_and_merge_bit_equality():
    rng = np.random.default_rng(3)
    # zipf-ish frequencies over 10k keys
    keys = rng.choice(10_000, 200_000, p=None)
    counts = np.bincount(keys)
    true_f2 = float((counts.astype(np.float64) ** 2).sum())
    sk = _sk(keys)
    assert abs(sk.f2() - true_f2) / true_f2 < 0.15
    # sharded build merged in arbitrary order is bit-identical
    parts = [_sk(keys[i::5]) for i in range(5)]
    m = parts[2]
    for p in (parts[4], parts[0], parts[3], parts[1]):
        m.merge(p)
    assert (m.counters == sk.counters).all()
    assert m.f2() == sk.f2()


def test_join_size_estimate():
    rng = np.random.default_rng(7)
    a = rng.choice(50_000, 300_000)           # fact side, multiplicity
    b = np.arange(50_000)                      # dim side, unique keys
    true_join = len(a)                         # every a-key matches once
    est = _sk(a).inner_product(_sk(b))
    assert abs(est - true_join) / true_join < 0.2


def test_param_validation_and_mismatch():
    with pytest.raises(ValueError):
        AMSSketch(rows=4)
    with pytest.raises(ValueError):
        _sk([1, 2]).inner_product(AMSSketch(rows=9, buckets=256))
