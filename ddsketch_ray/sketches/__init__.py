"""Mergeable sketch cores (pure Python + numpy; no Ray imports).

All sketches follow the ``MergeableSketch`` protocol (base.py): vectorized
``add_array``, associative/commutative ``merge``, Arrow-friendly
``to_row``/``from_row``, and pickling for the aggregate shuffle path.
"""

from ddsketch_ray.sketches.base import MergeableSketch, from_bytes, to_bytes
from ddsketch_ray.sketches.bloom import BloomFilter, CountingBloomFilter
from ddsketch_ray.sketches.countmin import CountMin, HeavyHitters
from ddsketch_ray.sketches.ddsketch import (
    DDSketch,
    MODE_COLLAPSE,
    MODE_FIRST,
    MODE_LAST,
)
from ddsketch_ray.sketches.dyadic import DyadicCountMin, dyadic_decompose
from ddsketch_ray.sketches.hll import HyperLogLog
from ddsketch_ray.sketches.kll import KLL
from ddsketch_ray.sketches.kmv import KMV
from ddsketch_ray.sketches.mg import MisraGries
from ddsketch_ray.sketches.moments import MomentsSketch
from ddsketch_ray.sketches.minhash import (
    MinHashSketch,
    hamming64,
    minhash_signatures,
    popcount64,
    simhash64,
)
from ddsketch_ray.sketches.tdigest import TDigest
from ddsketch_ray.sketches.wrs import WeightedReservoir

__all__ = [
    "MergeableSketch",
    "WeightedReservoir",
    "to_bytes",
    "from_bytes",
    "DDSketch",
    "MODE_COLLAPSE",
    "MODE_LAST",
    "MODE_FIRST",
    "HyperLogLog",
    "CountMin",
    "DyadicCountMin",
    "dyadic_decompose",
    "HeavyHitters",
    "BloomFilter",
    "CountingBloomFilter",
    "TDigest",
    "KLL",
    "MisraGries",
    "MomentsSketch",
    "MinHashSketch",
    "minhash_signatures",
    "simhash64",
    "hamming64",
    "popcount64",
]
