"""Incremental streaming sketch service — the raw-actor escape hatch.

Everything else in this engine is a ``ray.data.Dataset`` pipeline; this
module is the documented exception (driver instructions: raw actors only
where the Dataset API genuinely can't express the semantics). The case:
a LIVE, incrementally-updated, queryable-between-batches sketch state —
e.g. "ingest the event stream as it lands and answer p99 per key at any
moment" — needs shared mutable state that outlives any one dataset
execution.

Design: ``num_shards`` actors, each owning ``{key: sketch}`` for the
keys that hash to its shard (consistent routing via the same splitmix64
family as everything else). Ingestion is batch-wise and vectorized
inside each actor; queries snapshot one key (one actor call) or merge a
key across shards (for re-sharded histories). Per-shard state is
KB-per-key (bounded by bin_limit), so memory is
``num_keys × sketch_size / num_shards`` per actor.

Partitioning assumption (documented per driver instructions): one key's
updates all route to one shard, so per-key order is the actor's arrival
order; cross-key ordering is not defined — acceptable because sketch
accumulation is order-insensitive (the reference's tested property).
"""

from __future__ import annotations

import numpy as np

import ray

from ddsketch_ray.hashing import hash_floats, hash_strings, splitmix64
from ddsketch_ray.sketches.ddsketch import DDSketch


def _route_shards(keys, num_shards: int) -> np.ndarray:
    """THE shard-routing function — single definition so ingest paths
    and query paths can never route the same key differently."""
    return (hash_strings([str(k) for k in keys], seed=11) % np.uint64(num_shards)).astype(
        np.int64
    )


def _batch_token(keys, values: np.ndarray) -> int:
    """Deterministic token of a routed sub-batch's (content, order) —
    a Ray task retry re-pushes the identical batch, which the shard
    then ignores (idempotent ingest). Two genuinely DISTINCT pushes
    with byte-identical content+order would also dedup; streams where
    that is expected should route through the driver path or add a
    distinguishing column."""
    kh = hash_strings([str(k) for k in keys], seed=13)
    vh = hash_floats(np.asarray(values, dtype=np.float64), seed=17)
    pos = np.arange(len(kh), dtype=np.uint64)
    mixed = splitmix64(kh ^ vh ^ splitmix64(pos))
    return int(np.bitwise_xor.reduce(mixed) ^ np.uint64(len(kh))) if len(kh) else 0


@ray.remote
class SketchShard:
    """One shard of the streaming state: {key: DDSketch}."""

    def __init__(self, alpha: float = 0.008, bin_limit: int = 2048):
        self.alpha = alpha
        self.bin_limit = bin_limit
        self.sketches: dict = {}
        self.batches_seen = 0
        self.seen_tokens: set[int] = set()

    def add(self, keys: list, values: np.ndarray, token: int | None = None) -> int:
        """Vectorized per-key accumulate of one routed batch. ``token``
        (content-derived) makes the push idempotent under task retries."""
        if token is not None:
            if token in self.seen_tokens:
                return len(self.sketches)
            self.seen_tokens.add(token)
        values = np.asarray(values, dtype=np.float64)
        # canonical (type, repr) sort key: mixed-type key batches (e.g.
        # int and str) must group deterministically, not raise TypeError
        canon = np.array([f"{type(k).__name__}\x00{k}" for k in keys], dtype=object)
        order = np.argsort(canon, kind="stable")
        keys_sorted = [keys[i] for i in order.tolist()]
        vals_sorted = values[order]
        start = 0
        for i in range(1, len(keys_sorted) + 1):
            if i == len(keys_sorted) or keys_sorted[i] != keys_sorted[start]:
                k = keys_sorted[start]
                sk = self.sketches.get(k)
                if sk is None:
                    sk = self.sketches[k] = DDSketch(
                        alpha=self.alpha, bin_limit=self.bin_limit
                    )
                sk.add_array(vals_sorted[start:i])
                start = i
        self.batches_seen += 1
        return len(self.sketches)

    def snapshot(self, key) -> dict | None:
        sk = self.sketches.get(key)
        return sk.to_row() if sk is not None else None

    def merged_snapshot(self) -> dict | None:
        """All of this shard's keys merged into one sketch (for global
        quantiles across the whole stream)."""
        merged = None
        for sk in self.sketches.values():
            merged = sk.copy() if merged is None else merged.merge(sk.copy())
        return merged.to_row() if merged is not None else None

    def keys(self) -> list:
        return list(self.sketches)


class StreamingSketchService:
    """Driver-side facade over the shard actors."""

    def __init__(self, num_shards: int = 4, alpha: float = 0.008, bin_limit: int = 2048):
        self.num_shards = num_shards
        self.shards = [
            SketchShard.remote(alpha=alpha, bin_limit=bin_limit) for _ in range(num_shards)
        ]

    def _route(self, keys) -> np.ndarray:
        return _route_shards(keys, self.num_shards)

    def ingest_batch(self, keys: list, values: np.ndarray) -> None:
        """Split one arriving batch by shard and push concurrently."""
        shard_of = self._route(keys)
        futures = []
        for s in range(self.num_shards):
            mask = shard_of == s
            if mask.any():
                idx = np.nonzero(mask)[0]
                futures.append(
                    self.shards[s].add.remote(
                        [keys[i] for i in idx.tolist()], np.asarray(values)[idx]
                    )
                )
        ray.get(futures)  # backpressure: at most one in-flight batch per caller

    def ingest_dataset(self, ds, key_col: str, value_col: str, batch_size: int = 65536) -> None:
        """Stream a Dataset in (driver-routed; for heavier streams, run
        several ingest clients over iter_batches shards)."""
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            self.ingest_batch(
                batch.column(key_col).to_pylist(),
                batch.column(value_col).to_numpy(zero_copy_only=False),
            )

    def ingest_dataset_distributed(
        self, ds, key_col: str, value_col: str, concurrency: int = 4
    ) -> int:
        """Multi-client ingest: the Dataset's map tasks push their
        batches straight to the shard actors — rows never pass through
        the driver (``ingest_dataset`` is the single-client driver-side
        variant). Each task ray.gets its own pushes, so backpressure is
        one in-flight batch per client; clients = map task slots.
        Pushes carry content-derived tokens, so a Ray task RETRY that
        re-pushes the same batch is ignored by the shards (idempotent —
        see _batch_token for the caveat). Returns the rows ingested."""
        import pyarrow as pa

        shards = self.shards
        num_shards = self.num_shards

        def push(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_pylist()
            values = batch.column(value_col).to_numpy(zero_copy_only=False)
            shard_of = _route_shards(keys, num_shards)
            futures = []
            for s in range(num_shards):
                idx = np.nonzero(shard_of == s)[0]
                if len(idx):
                    sub_keys = [keys[i] for i in idx.tolist()]
                    sub_vals = values[idx]
                    futures.append(
                        shards[s].add.remote(
                            sub_keys, sub_vals, token=_batch_token(sub_keys, sub_vals)
                        )
                    )
            ray.get(futures)
            return pa.table({"rows": pa.array([batch.num_rows], type=pa.int64())})

        acks = ds.map_batches(
            push, batch_format="pyarrow", batch_size=8192, concurrency=concurrency
        )
        return int(acks.sum("rows"))

    def global_quantile(self, q: float) -> float:
        """Quantile over ALL ingested values (shard-merged snapshot)."""
        rows = ray.get([s.merged_snapshot.remote() for s in self.shards])
        merged = None
        for row in rows:
            if row is None:
                continue
            sk = DDSketch.from_row(row)
            merged = sk if merged is None else merged.merge(sk)
        if merged is None:
            return float("nan")
        return merged.quantile(q)

    def quantile(self, key, q: float) -> float:
        shard = int(self._route([key])[0])
        row = ray.get(self.shards[shard].snapshot.remote(key))
        if row is None:
            return float("nan")
        return DDSketch.from_row(row).quantile(q)

    def keys(self) -> list:
        out: list = []
        for ks in ray.get([s.keys.remote() for s in self.shards]):
            out.extend(ks)
        # canonical ordering works for mixed-type key populations too
        return sorted(out, key=lambda k: (type(k).__name__, str(k)))
