"""Deterministic, vectorized 64-bit hashing.

Every sketch in this library (HLL, count-min, Bloom, MinHash, SimHash) and
every dedup/partitioning operator consumes *uint64 hashes*, never raw Python
``hash()`` (which is salted per-process via PYTHONHASHSEED and would break
cross-process / cross-run determinism on a Ray cluster).

Primitives:

- ``splitmix64`` — the SplitMix64 finalizer (public domain, Steele et al.,
  "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014), vectorized
  over numpy uint64. Used to derive independent hash families from one base
  hash (double hashing / seeded re-mix).
- ``hash_strings`` — xxhash64 over a string column via polars (Rust,
  vectorized, stable for a pinned polars version), falling back to
  ``pandas.util.hash_array`` (SipHash-1-3, also deterministic) when polars is
  unavailable.
- ``hash_ints`` — splitmix64 over an int64/uint64 column.

All functions are pure: output depends only on (input bytes, seed).
"""

from __future__ import annotations

import numpy as np

try:  # polars is the fast path; the container has it, but gate the import.
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer, elementwise over a uint64 array (or scalar).
    uint64 wraparound is the algorithm (mod-2^64 arithmetic)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=_U64) + _U64(0x9E3779B97F4A7C15)) & _MASK64
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK64
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK64
        return z ^ (z >> _U64(31))


def mix_seed(h: np.ndarray, seed: int) -> np.ndarray:
    """Derive an independent hash family: remix ``h`` with a seed."""
    return splitmix64(np.asarray(h, dtype=_U64) ^ splitmix64(np.asarray(seed, dtype=_U64)))


def hash_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 hash of an integer array (values reinterpreted as uint64)."""
    v = np.asarray(values)
    if v.dtype.kind not in ("i", "u"):
        raise TypeError(f"hash_ints expects integers, got {v.dtype}")
    return mix_seed(v.astype(np.int64, copy=False).view(_U64), seed)


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """uint64 hash of a string sequence (pyarrow Array/ChunkedArray, numpy
    object array, pandas Series, or list of str). Nulls hash like empty
    strings remixed with the seed — callers that care filter nulls first."""
    if _HAVE_POLARS:
        s = pl.Series("h", values)
        if s.dtype != pl.Utf8:
            s = s.cast(pl.Utf8)
        out = s.fill_null("").hash(seed=seed % (1 << 64)).to_numpy().astype(_U64, copy=False)
        return splitmix64(out)  # extra finalize: decorrelate polars' seed handling
    import pandas as pd  # fallback path

    arr = np.asarray(values, dtype=object)
    arr = np.where(pd.isna(arr), "", arr)
    key = f"{seed % 10**16:016d}"
    return splitmix64(pd.util.hash_array(arr, hash_key=key, categorize=False).astype(_U64))


def hash_floats(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 hash of float64 values by bit pattern (NaNs canonicalized)."""
    v = np.asarray(values, dtype=np.float64)
    v = np.where(np.isnan(v), np.float64("nan"), v)  # canonical NaN bits
    v = np.where(v == 0.0, 0.0, v)  # -0.0 -> +0.0
    return mix_seed(v.view(_U64), seed)


def clz64(x: np.ndarray) -> np.ndarray:
    """Count of leading zeros of each uint64, exact (no float tricks), via a
    6-step branchless binary search. Returns int64 in [0, 64]."""
    x = np.asarray(x, dtype=_U64)
    n = np.zeros(x.shape, dtype=np.int64)
    shift = 32
    while shift >= 1:
        mask = x < (_U64(1) << _U64(64 - shift))
        n = np.where(mask, n + shift, n)
        x = np.where(mask, (x << _U64(shift)) & _MASK64, x)
        shift //= 2
    return np.where(x == 0, 64, n)
