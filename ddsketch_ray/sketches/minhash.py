"""MinHash signature sketch (Broder 1997) + batched signature kernels.

``MinHashSketch`` is the mergeable form (signature of a *set*; merge =
elementwise min — used e.g. to estimate Jaccard similarity between two
corpora). ``minhash_signatures`` is the vectorized batch kernel producing
one signature per document from a flattened shingle-hash array — the hot
path for MinHash-LSH dedup (one ``np.minimum.reduceat`` per permutation,
no per-document Python).

Permutation family: ``h_i(x) = splitmix64(x XOR seed_i)`` — cheap,
deterministic, and empirically well-mixed (SplitMix64 is a bijection).
"""

from __future__ import annotations

import numpy as np

from ddsketch_ray.hashing import splitmix64

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def perm_seeds(num_perm: int, seed: int = 0) -> np.ndarray:
    return splitmix64(np.arange(num_perm, dtype=np.uint64) + np.uint64(seed * 0x9E3779B9 + 1))


def minhash_signatures(
    shingle_hashes: np.ndarray, doc_offsets: np.ndarray, num_perm: int = 128, seed: int = 0
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures.

    shingle_hashes: flattened uint64 hashes of all docs' shingles.
    doc_offsets: int64 array of start offsets per doc (len n_docs), i.e.
    doc d owns shingle_hashes[doc_offsets[d]:doc_offsets[d+1]]. Docs with
    zero shingles get all-max signatures.
    """
    h = np.asarray(shingle_hashes, dtype=np.uint64)
    offs = np.asarray(doc_offsets, dtype=np.int64)
    n_docs = offs.size
    seeds = perm_seeds(num_perm, seed)
    out = np.full((n_docs, num_perm), _U64MAX, dtype=np.uint64)
    if h.size == 0 or n_docs == 0:
        return out
    # reduceat only over NON-empty docs: their offsets are strictly
    # increasing and in-range, so segments are exact. (Clamping empty
    # docs' offsets instead would truncate the preceding doc's segment.)
    sizes = np.diff(np.append(offs, h.size))
    valid = sizes > 0
    if not valid.any():
        return out
    v_offs = offs[valid]
    for p in range(num_perm):
        mixed = splitmix64(h ^ seeds[p])
        out[valid, p] = np.minimum.reduceat(mixed, v_offs)
    return out


def minhash_signatures_oph(
    shingle_hashes: np.ndarray, doc_offsets: np.ndarray, num_perm: int = 128, seed: int = 0
) -> np.ndarray:
    """One-permutation hashing signatures (Li, Owen, Zhang 2012) with
    rotation densification (Shrivastava & Li 2014) — the at-scale
    alternative to ``minhash_signatures``.

    The classic kernel makes ``num_perm`` full passes (mix + reduceat)
    over the shingle array; OPH makes ONE: each shingle is routed to the
    bin given by its hash's top bits and each (doc, bin) keeps its
    minimum — one sort + one reduceat regardless of num_perm (the full
    signature stage measures 2× on the 600k-doc corpus — 34.1 s → 17.5 s
    — because tokenization+shingling dominate once the permutation loop
    is gone). Empty bins borrow the next non-empty
    bin's value cyclically, offset by the distance (the rotation
    densification that keeps collision probability ≈ Jaccard). Same
    signature CONTRACT (agreement fraction estimates Jaccard) but
    different values than the classic kernel — don't mix kernels within
    one index.

    num_perm must be a power of two (bins are the hash's top bits).

    SCOPE: use for Jaccard ESTIMATION (sig-agreement ≈ Jaccard; accuracy
    tests pass at ~4/√P). Do NOT feed OPH signatures into LSH banding
    over templated corpora: a shingle's bin is FIXED by its hash, so
    boilerplate shingles shared across documents win the same bins in
    every document — measured on the synthetic webpages corpus (4k
    docs), banded OPH signatures produce 890 hot LSH buckets where the
    classic kernel produces 1, exploding candidate volume. The classic
    per-permutation kernel stays the dedup default for exactly this
    reason.
    """
    P = int(num_perm)
    if P & (P - 1):
        raise ValueError("num_perm must be a power of two for OPH")
    nbits = P.bit_length() - 1
    h = np.asarray(shingle_hashes, dtype=np.uint64)
    offs = np.asarray(doc_offsets, dtype=np.int64)
    n_docs = offs.size
    out = np.full((n_docs, P), _U64MAX, dtype=np.uint64)
    if h.size == 0 or n_docs == 0:
        return out
    g = splitmix64(h ^ splitmix64(np.uint64(seed * 0x9E37 + 11)))
    bins = (g >> np.uint64(64 - nbits)).astype(np.int64)
    sizes = np.diff(np.append(offs, h.size))
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
    flat = doc_of * P + bins
    order = np.argsort(flat, kind="stable")
    fs, gs = flat[order], g[order]
    starts = np.nonzero(np.r_[True, fs[1:] != fs[:-1]])[0]
    out.ravel()[fs[starts]] = np.minimum.reduceat(gs, starts)
    # rotation densification: empty bin j takes bin (j+t) mod P's value
    # + t for the smallest t ≥ 1 with a non-empty bin; vectorized as P
    # cyclic forward passes over (n_docs,)-sized column views (cheap —
    # the heavy arrays above are shingle-sized, these are doc-sized)
    empty = out == _U64MAX
    if empty.any():
        doubled = np.concatenate([out, out], axis=1)
        filled = doubled.copy()
        dist = np.zeros_like(doubled, dtype=np.uint64)
        for j in range(2 * P - 2, -1, -1):
            src = filled[:, j + 1] if j + 1 < 2 * P else None
            m = doubled[:, j] == _U64MAX
            if src is not None and m.any():
                filled[m, j] = src[m]
                dist[m, j] = dist[m, j + 1] + np.uint64(1)
        dense = filled[:, :P] + dist[:, :P]
        still = filled[:, :P] == _U64MAX  # all-empty doc: leave as max
        out = np.where(empty & ~still, dense, out)
    return out


class MinHashSketch:
    __slots__ = ("num_perm", "seed", "sig")

    def __init__(self, num_perm: int = 128, seed: int = 0):
        self.num_perm = int(num_perm)
        self.seed = int(seed)
        self.sig = np.full(self.num_perm, _U64MAX, dtype=np.uint64)

    def add_hashed(self, element_hashes: np.ndarray) -> None:
        h = np.asarray(element_hashes, dtype=np.uint64)
        if h.size == 0:
            return
        seeds = perm_seeds(self.num_perm, self.seed)
        # chunk to bound the (num_perm × chunk) temporary
        for lo in range(0, h.size, 8192):
            chunk = h[lo : lo + 8192]
            mixed = splitmix64(chunk[None, :] ^ seeds[:, None])
            np.minimum(self.sig, mixed.min(axis=1), out=self.sig)

    def add_array(self, values) -> None:
        self.add_hashed(values)

    def merge(self, other: "MinHashSketch") -> "MinHashSketch":
        if (self.num_perm, self.seed) != (other.num_perm, other.seed):
            raise ValueError("minhash parameter mismatch")
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    def jaccard(self, other: "MinHashSketch") -> float:
        if (self.num_perm, self.seed) != (other.num_perm, other.seed):
            raise ValueError("minhash parameter mismatch")
        return float(np.mean(self.sig == other.sig))

    def to_row(self) -> dict:
        return {
            "kind": "minhash",
            "num_perm": self.num_perm,
            "seed": self.seed,
            "sig": self.sig.copy(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "MinHashSketch":
        sk = cls(num_perm=int(row["num_perm"]), seed=int(row["seed"]))
        sk.sig = np.asarray(row["sig"], dtype=np.uint64).copy()
        return sk


def simhash64(
    token_hashes: np.ndarray, doc_offsets: np.ndarray
) -> np.ndarray:
    """64-bit SimHash (Charikar 2002) per document, vectorized.

    token_hashes: flattened uint64 token hashes; doc_offsets: start offset
    per doc. Returns uint64 fingerprints (0 for empty docs).
    """
    h = np.asarray(token_hashes, dtype=np.uint64)
    offs = np.asarray(doc_offsets, dtype=np.int64)
    n_docs = offs.size
    out = np.zeros(n_docs, dtype=np.uint64)
    if h.size == 0 or n_docs == 0:
        return out
    sizes = np.diff(np.append(offs, h.size))
    valid = sizes > 0
    if not valid.any():
        return out
    v_offs = offs[valid]  # exact reduceat segments over non-empty docs
    v_sizes = sizes[valid]
    fp = np.zeros(v_offs.size, dtype=np.uint64)
    for bit in range(64):
        bits = ((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        pos = np.add.reduceat(bits, v_offs)  # count of 1s per doc
        ones = (2 * pos) >= v_sizes  # majority vote (ties -> 1, deterministic)
        fp |= (ones.astype(np.uint64)) << np.uint64(bit)
    out[valid] = fp
    return out


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    return popcount64(np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))


def popcount64(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        cnt += _POPCNT8[np.bitwise_and(x, np.uint64(0xFF)).astype(np.int64)]
        x = x >> np.uint64(8)
    return cnt
