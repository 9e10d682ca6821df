"""The ``MergeableSketch`` protocol — the library's plugin surface.

Every sketch (DDSketch, HLL, count-min, t-digest, KLL, Bloom, MinHash, …)
follows the contract the reference's DDSketch establishes
(``/root/reference/ddsketch.h:58-252``: init params → accumulate → merge →
query), re-expressed for batch/distributed execution:

- ``add_array(values)``   — vectorized accumulation of a numpy array
  (the Ray Data ``aggregate_block`` path; never per-row Python).
- ``merge(other)``        — in-place merge; MUST be associative and
  commutative up to the sketch's published error bound, because Ray Data's
  aggregate reduces partials in an arbitrary tree order.
- ``to_row()/from_row()`` — Arrow-friendly serialized form (plain dict of
  scalars + numpy arrays) used for Parquet checkpoints, so per-partition
  sketch state survives in files a resumed run can re-merge.
- pickling (``__reduce__``-free plain objects) — used on the shuffle path
  (accumulators travel as ``bytes``).

Any object implementing this protocol drops into ``ddsketch_ray.agg.SketchAgg``
and the checkpointed partition pipeline unchanged.
"""

from __future__ import annotations

import pickle
from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class MergeableSketch(Protocol):
    def add_array(self, values) -> None: ...

    def merge(self, other: "MergeableSketch") -> "MergeableSketch": ...

    def to_row(self) -> dict[str, Any]: ...


def to_bytes(sketch) -> bytes:
    """Serialized form used on the aggregate/shuffle path. Pickle keeps the
    blocks Arrow-native (a binary column) instead of object-dtype fallback."""
    return pickle.dumps(sketch, protocol=pickle.HIGHEST_PROTOCOL)


def from_bytes(data: bytes):
    return pickle.loads(data)
