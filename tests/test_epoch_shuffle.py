"""epoch_shuffle_order: permutation, determinism, epoch decorrelation."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ddsketch_ray.functions.shuffle import epoch_shuffle_order


def _ids_ds(n, blocks):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(blocks)


def _order(ds, epoch):
    df = epoch_shuffle_order(ds, epoch=epoch).to_pandas()
    return df.sort_values("doc_id")["epoch_rank"].to_numpy()


def test_epoch_shuffle_is_permutation_and_layout_invariant(ray_session):
    n = 5000
    r_a = _order(_ids_ds(n, 7), epoch=3)
    r_b = _order(_ids_ds(n, 2), epoch=3)  # different layout, same order
    assert sorted(r_a) == list(range(1, n + 1))  # dense 1-based permutation
    assert (r_a == r_b).all()


def test_epoch_shuffle_epochs_decorrelated(ray_session):
    n = 5000
    ds = _ids_ds(n, 4)
    r0 = _order(ds, epoch=0)
    r1 = _order(ds, epoch=1)
    assert sorted(r1) == list(range(1, n + 1))
    # distinct permutations, and rank agreement is at chance level
    same = int((r0 == r1).sum())
    assert same < 20  # E[fixed points of a random pairing] ~ 1
    # no monotone relationship (independent hash families)
    corr = float(np.corrcoef(r0, r1)[0, 1])
    assert abs(corr) < 0.05
