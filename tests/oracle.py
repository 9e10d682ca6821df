"""Exact quantile oracle matching the reference harness.

``/root/reference/main.cpp:971-976``: for quantile q over n elements the
exact answer is the order statistic at 0-based index
``floor(1 + q*(n-1)) - 1`` of the sorted stream (computed there with
``std::nth_element``; here with ``np.partition``).
"""

from __future__ import annotations

import math

import numpy as np

REFERENCE_QS = (0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99)


def exact_quantile(values: np.ndarray, q: float) -> float:
    v = np.asarray(values, dtype=np.float64)
    idx = math.floor(1 + q * (v.size - 1)) - 1
    idx = min(max(idx, 0), v.size - 1)
    return float(np.partition(v, idx)[idx])


def rel_error(est: float, exact: float) -> float:
    if exact == 0:
        return abs(est - exact)
    return abs((est - exact) / exact)
