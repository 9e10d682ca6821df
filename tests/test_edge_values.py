"""Edge-value conformance (FIXTURES.md §2 `values_edge`): zero bucket,
bucket boundaries, denormals, duplicates, singletons, wide binary rows."""

from __future__ import annotations

import math
import sys

import numpy as np
import pytest

from ddsketch_ray.sketches import DDSketch
from tests.oracle import exact_quantile, rel_error


def test_edge_table_quantiles():
    sk = DDSketch(alpha=0.008, bin_limit=100_000)
    g = sk.gamma
    vals = np.array(
        [0.0, 0.0, 0.0]  # zero bucket
        + [g**k for k in (1, 5, 50)]  # exact bucket boundaries
        + [-(g**k) for k in (1, 5, 50)]
        + [sys.float_info.min, -sys.float_info.min]  # smallest normals
        + [5e-324, -5e-324]  # denormals
        + [1.5] * 100  # duplicates
        + [sys.float_info.max / 2, -sys.float_info.max / 2],  # huge
        dtype=np.float64,
    )
    sk.add_array(vals)
    assert sk.n == len(vals)
    assert sk.sum_bins() == len(vals)
    assert sk.bins.get(0) == 3  # zeros land in key 0 (ddsketch.cc:97-98)
    # quantiles: nonzero exacts honor alpha; zero exacts estimate as 0
    for q in (0.1, 0.3, 0.5, 0.7, 0.9):
        exact = exact_quantile(vals, q)
        est = sk.quantile(q)
        if exact == 0.0:
            assert est == 0.0
        else:
            assert rel_error(est, exact) <= sk.alpha + 1e-9, (q, est, exact)


def test_singleton_sketch():
    sk = DDSketch()
    sk.add(42.0)
    for q in (0.0, 0.5, 1.0):
        assert rel_error(sk.quantile(q), 42.0) <= sk.alpha


def test_denormal_and_max_do_not_overflow_keys():
    sk = DDSketch()
    sk.add_array(np.array([5e-324, sys.float_info.max]))
    assert sk.n == 2
    keys = sorted(sk.bins)
    # both keys finite ints inside the positive zone
    assert all(0 < k < 2**31 for k in keys)


def test_negative_zero_is_zero():
    sk = DDSketch()
    sk.add_array(np.array([-0.0, 0.0]))
    assert sk.bins == {0: 2}


def test_wide_binary_rows_heavy_pages(ray_session):
    """FIXTURES full-scale ln_mu=9.5 (avg ~27KB, tail to MBs): wide
    binary rows flow through generation → extraction → sketch without
    pathology at small batch size."""
    from ddsketch_ray.pipelines import webpages_sketch_report
    from ddsketch_ray.synth import generate_webpages

    ds = generate_webpages(300, seed=5, ln_mu=9.5, ln_sigma=1.2, override_num_blocks=8)
    rep = webpages_sketch_report(ds)
    assert rep["rows"] == 300
    assert rep["extract_byte_identical"]
    assert rep["html_len_quantiles"][2] > 20_000  # heavy tail present
