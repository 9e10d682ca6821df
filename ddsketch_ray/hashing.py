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


_POLY64_PRIME = _U64(1099511628211)  # FNV-64 prime (odd, full period mod 2^64)


def polyhash_strings(values, seed: int = 0) -> np.ndarray:
    """SQL-recomputable uint64 string hash: byte polynomial mod 2^64
    (``Σ byte_i · P^{L-1-i}``, P = the FNV-64 prime — i.e. Horner over
    UTF-8 bytes) finalized with ``splitmix64(h ^ splitmix64(seed))``.

    Weaker bit-mixing than ``hash_strings`` (xxhash) but every step is
    plain mod-2^64 arithmetic an independent DuckDB oracle can replay
    (HUGEINT mulmod + hex(encode(tok)) byte extraction) — use it where
    a LOSSY bucket assignment must be recomputed exactly in SQL (hashed
    DSIR). Vectorized: zero-copy reads of the Arrow string buffers, one
    multiply-add pass over all bytes, segmented ``add.reduceat`` sums.
    Nulls hash like empty strings (h0 = 0) remixed with the seed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values), type=pa.large_string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if values.null_count:
        values = pc.fill_null(values, "")
    if pa.types.is_string(values.type):
        off_dtype = np.int32
    elif pa.types.is_large_string(values.type):
        off_dtype = np.int64
    else:
        values = values.cast(pa.large_string())
        off_dtype = np.int64
    n = len(values)
    if n == 0:
        return np.empty(0, _U64)
    off = np.frombuffer(
        values.buffers()[1], dtype=off_dtype, count=n + 1 + values.offset
    )[values.offset :].astype(np.int64)
    lo, hi = int(off[0]), int(off[-1])
    lens = off[1:] - off[:-1]
    h0 = np.zeros(n, _U64)
    total = hi - lo
    if total:
        data = np.frombuffer(values.buffers()[2], dtype=np.uint8, offset=lo, count=total)
        maxlen = int(lens.max())
        pows = np.empty(maxlen, dtype=_U64)  # P^j mod 2^64
        with np.errstate(over="ignore"):
            p = _U64(1)
            for j in range(maxlen):
                pows[j] = p
                p = p * _POLY64_PRIME
            starts = off[:-1] - lo
            ends = off[1:] - lo
            # position-from-end exponent per byte, all strings at once
            pfe = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
            contrib = data.astype(_U64) * pows[pfe]
            nz = lens > 0  # reduceat mis-handles empty segments
            if nz.any():
                h0[nz] = np.add.reduceat(contrib, starts[nz])
    return splitmix64(h0 ^ splitmix64(np.asarray(seed, dtype=_U64)))


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
