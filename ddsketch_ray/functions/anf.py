"""Approximate neighborhood function (HyperANF) on Ray Data.

Per-node estimate of |{u : dist(v -> u) <= radius}| over a directed
edge list — Boldi, Rosa & Vigna, "HyperANF: Approximating the
Neighbourhood Function of Very Large Graphs on a Budget" (WWW 2011, a
public algorithm): every node carries a small HyperLogLog register
vector seeded with its own id; each round every node MAXes in the
registers of its out-neighbors, so after k rounds node v's sketch
holds exactly the HLL of its k-step reachable set. The per-node
estimates yield effective-diameter / centrality statistics that exact
BFS cannot produce at web scale.

Determinism contract (the pagerank/kmeans model, functions/graph.py):
registers are pure integer state (uint8 rho values, elementwise MAX is
order-independent), so the result is BIT-IDENTICAL across block
layouts, cluster sizes, and across the two plans — and replayable in
SQL (gate query ``anf_docs`` unrolls the rounds as sparse
(node, bucket, MAX(rho)) GROUP BYs in DuckDB). The estimator mirrors
``sketches/hll.py::estimate`` exactly: Σ 2^-reg accumulated as an
EXACT big integer of 2^-64 units (empty registers contribute 2^64),
ONE float conversion, α·m²/S, classic small-range correction.

Two plans, gated like ``pagerank``:

- **broadcast** (n <= limit): the register matrix (n × m uint8) lives
  on the driver and is ``ray.put`` once per round; the only shuffle
  per round is one ``sorted_max_rollup`` of the (src, m registers)
  rows emitted per edge.
- **shuffle** (beyond the limit, nothing O(n) on the driver): register
  rows ride a Dataset; per round one bucketed shuffle join delivers
  R_dst to each edge's src, a carry union keeps every node's own
  registers, and one ``sorted_max_rollup`` folds them.

Register width: m = 2^p registers per node (p in [4, 8] here — per
NODE, unlike the single p=14 corpus sketch), standard error
1.04/sqrt(m) (26% at the default p=4 — the published HyperANF
operating point; raise p when per-node memory n·2^p allows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ray.hashing import clz64, hash_ints
from ddsketch_ray.sketches.hll import _alpha_m

ANF_SEED = 4242
_U64MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _init_registers(node_arr: np.ndarray, p: int) -> np.ndarray:
    """(n, m) uint8 register matrix where row v is the HLL of {v}:
    h = hash_ints(v, ANF_SEED), bucket = h >> (64-p),
    rho = min(clz(h << p) + 1, 64 - p + 1) — the exact expressions the
    SQL oracle replays via _splitmix_sql and DuckDB bin()."""
    m = 1 << p
    h = hash_ints(node_arr, seed=ANF_SEED)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & _U64MASK
    rho = np.minimum(clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros((len(node_arr), m), dtype=np.uint8)
    regs[np.arange(len(node_arr)), idx] = rho
    return regs


def _estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Per-row HLL estimate, int64, mirroring sketches/hll.py::estimate
    bit-for-bit: S = Σ_j 2^(64 - r_j) EXACT (hi/lo int64 split — terms
    with r <= 32 land in hi units of 2^32, the rest in lo; both sums
    fit int64 for m <= 256 — recombined per row as a Python big int),
    one float conversion, raw = α·m²/S·2^64, small-range correction
    m·ln(m/zeros) when raw <= 2.5m and zeros > 0, then round."""
    n, m = regs.shape
    alpha = _alpha_m(m)
    r = regs.astype(np.int64)
    # select exponents BEFORE shifting (a shift by >= 63 is undefined)
    ehi = np.where(r <= 32, 32 - r, 0)
    elo = np.where(r > 32, 64 - r, 0)
    hi = np.where(r <= 32, np.int64(1) << ehi, 0).sum(axis=1)
    lo = np.where(r > 32, np.int64(1) << elo, 0).sum(axis=1)
    s_num = hi.astype(object) * (1 << 32) + lo.astype(object)
    s = np.asarray(s_num, dtype=np.float64) * 2.0**-64
    raw = alpha * m * m / s
    zeros = (regs == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (zeros > 0)
    est = raw.copy()
    if small.any():
        est[small] = m * np.log(m / zeros[small].astype(np.float64))
    return np.asarray([int(round(float(x))) for x in est], dtype=np.int64)


def _sorted_ufunc_rollup(ds, key_col: str, cols: list[str], ufunc, pd_agg: str):
    """Per-key integer reduction via the sort plan — the
    associative-ufunc generalization of ``analytics.sorted_sum_rollup``
    (same stitch: one distributed sort, ``ufunc.reduceat`` per adjacent
    key run, only each block's first/last key groups — ≤ 2 partial rows
    per block — re-reduced on the driver with the matching pandas
    aggregate). Returns a Dataset (key_col, *cols int64)."""
    import pyarrow.compute as pc
    import ray.data as rd

    cols = list(cols)
    s = ds.sort(key_col)

    def block_rollup(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=ktype),
                    **{c: pa.array([], type=pa.int64()) for c in cols},
                    "boundary": pa.array([], type=pa.bool_()),
                }
            )
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        boundary = np.zeros(len(starts), dtype=bool)
        boundary[0] = boundary[-1] = True
        out = {key_col: t.column(key_col).take(pa.array(starts))}
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            out[c] = pa.array(ufunc.reduceat(v, starts).astype(np.int64))
        out["boundary"] = pa.array(boundary)
        return pa.table(out)

    rep = s.map_batches(block_rollup, batch_format="pyarrow", batch_size=None).materialize()
    keep = [key_col] + cols
    internal = rep.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).select(keep),
        batch_format="pyarrow",
        batch_size=None,
    )
    edge = rep.map_batches(
        lambda t: t.filter(t.column("boundary")).select(keep),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()  # ≤ 2 partial rows per block
    if len(edge):
        edge = edge.groupby(key_col, as_index=False)[cols].agg(pd_agg)
        ktype = getattr(rep.schema(), "base_schema", rep.schema()).field(key_col).type
        fix = pa.table(
            {
                key_col: pa.array(edge[key_col].to_numpy(), type=ktype),
                **{
                    c: pa.array(edge[c].to_numpy().astype(np.int64), pa.int64())
                    for c in cols
                },
            }
        )
        return internal.union(rd.from_arrow(fix))
    return internal


def sorted_max_rollup(ds, key_col: str, max_cols: list[str]):
    """Per-key integer MAX via the sort plan (``_sorted_ufunc_rollup``
    with np.maximum — the elementwise-max sibling of
    ``analytics.sorted_sum_rollup``)."""
    return _sorted_ufunc_rollup(ds, key_col, max_cols, np.maximum, "max")


def sorted_min_rollup(ds, key_col: str, min_cols: list[str]):
    """Per-key integer MIN via the sort plan (``_sorted_ufunc_rollup``
    with np.minimum — used by ``graph.label_propagation``)."""
    return _sorted_ufunc_rollup(ds, key_col, min_cols, np.minimum, "min")


def _reg_cols(m: int) -> list[str]:
    return [f"rg{j}" for j in range(m)]


def _broadcast_round(edges_proj, node_arr, regs, node_col, src_col, dst_col, rcols):
    """One synchronous HyperANF round, broadcast plan: ship (node_arr,
    regs) to the object store, emit each edge's R_dst keyed by src,
    max-rollup, fold into the driver matrix. Returns the new matrix
    (the same object if the round was a fixed point)."""
    import ray

    from ddsketch_ray.functions.graph import _member_idx

    state = ray.put((node_arr, regs))

    def emit(t: pa.Table, _state=state) -> pa.Table:
        nodes_b, regs_b = ray.get(_state)  # zero-copy, node-local
        dst = t.column(dst_col).to_numpy(zero_copy_only=False)
        rr = regs_b[_member_idx(nodes_b, dst, "edge dst")]
        cols = {node_col: t.column(src_col)}
        for j, c in enumerate(rcols):
            cols[c] = pa.array(rr[:, j].astype(np.int64))
        return pa.table(cols)

    rolled = sorted_max_rollup(
        edges_proj.map_batches(emit, batch_format="pyarrow", batch_size=None),
        node_col,
        rcols,
    ).to_pandas()
    if len(rolled) == 0:
        return regs
    idx = _member_idx(
        node_arr, rolled[node_col].to_numpy().astype(np.int64), "edge src"
    )
    incoming = np.stack([rolled[c].to_numpy().astype(np.uint8) for c in rcols], axis=1)
    new = regs.copy()
    new[idx] = np.maximum(new[idx], incoming)
    return regs if np.array_equal(new, regs) else new


def _shuffle_round(state_ds, layout_dir, node_col, src_col, dst_col, rcols, num_buckets):
    """One synchronous HyperANF round, shuffle plan — r5: runs on the
    persisted edge layout (bucketed by dst, the join key that delivers
    R_dst to each edge's src; ``edgelayout.propagation_round``).  Phase
    A is a zero-shuffle map over the register state (per-bucket edge
    reads + searchsorted + per-src register MAX pre-reduction), phase B
    the round's single ``[bucket, node]`` sort.  Elementwise MAX is
    order-independent, so the state stays bit-identical to the r4
    join-plan and to the broadcast plan.  Returns the new materialized
    state Dataset (bucket, node, *rcols)."""
    from ddsketch_ray.functions.edgelayout import propagation_round

    def msg_fn(t: pa.Table) -> dict:
        return {
            c: t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in rcols
        }

    return propagation_round(
        state_ds,
        layout_dir=layout_dir,
        num_buckets=num_buckets,
        key_col=dst_col,
        payload_col=src_col,
        node_col=node_col,
        msg_cols=rcols,
        msg_fn=msg_fn,
        carry_fn=msg_fn,
        ufunc=np.maximum,
        pd_agg="max",
    ).materialize()


def neighborhood_function(
    edges_ds,
    nodes_ds,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    radius: int = 3,
    p: int = 4,
    mode: str = "auto",
    broadcast_node_limit: int = 16_000_000,
    num_buckets: int = 64,
):
    """HyperANF (module docstring): per-node approximate count of nodes
    reachable within ``radius`` directed hops (self included). Returns
    a Dataset (node int64, nhood_est int64), bit-identical across
    layouts and plans. ``nodes_ds`` must list every node exactly once;
    src/dst must be drawn from the node set."""
    import pyarrow.compute as pc
    import ray.data as rd

    if not (4 <= p <= 8):
        raise ValueError("p must be in [4, 8] (m = 2^p registers per node)")
    if radius < 0:
        raise ValueError("radius must be >= 0")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be 'auto', 'broadcast' or 'shuffle'")
    m = 1 << p
    rcols = _reg_cols(m)

    nodes_proj = nodes_ds.map_batches(
        lambda t: pa.table({node_col: pc.cast(t.column(node_col), pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    )
    edges_proj = edges_ds.map_batches(
        lambda t: pa.table(
            {
                src_col: pc.cast(t.column(src_col), pa.int64()),
                dst_col: pc.cast(t.column(dst_col), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )  # materialized only by the broadcast plan

    n = nodes_proj.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "nhood_est": pa.array([], type=pa.int64()),
                }
            )
        )
    if mode == "auto":
        mode = "broadcast" if n <= broadcast_node_limit else "shuffle"
    n_edges = edges_proj.count()

    if mode == "broadcast":
        edges_proj = edges_proj.materialize()  # reused every round
        node_arr = np.sort(nodes_proj.to_pandas()[node_col].to_numpy().astype(np.int64))
        if len(node_arr) > 1 and (node_arr[1:] == node_arr[:-1]).any():
            raise ValueError("nodes_ds must list every node id exactly once")
        regs = _init_registers(node_arr, p)
        for _ in range(radius if n_edges else 0):
            new = _broadcast_round(
                edges_proj, node_arr, regs, node_col, src_col, dst_col, rcols
            )
            if new is regs:
                break  # fixed point: further rounds are identity (max idempotent)
            regs = new
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr),
                    "nhood_est": pa.array(_estimate_rows(regs)),
                }
            )
        )

    # shuffle plan: register rows ride a Dataset; driver holds O(blocks);
    # static edges persisted once, bucketed by dst (edgelayout substrate)
    import shutil
    import tempfile

    from ddsketch_ray.functions.edgelayout import cluster_state, write_edge_layout

    def init_map(t: pa.Table) -> pa.Table:
        ids = t.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rr = _init_registers(ids, p)
        cols = {node_col: t.column(node_col)}
        for j, c in enumerate(rcols):
            cols[c] = pa.array(rr[:, j].astype(np.int64))
        return pa.table(cols)

    state_ds = cluster_state(
        nodes_proj.map_batches(init_map, batch_format="pyarrow", batch_size=None),
        node_col,
        num_buckets,
    )
    layout_dir = tempfile.mkdtemp(prefix="ddsr-anf-edges-")
    try:
        if n_edges:
            write_edge_layout(edges_proj, dst_col, src_col, layout_dir, num_buckets)
        for _ in range(radius if n_edges else 0):
            state_ds = _shuffle_round(
                state_ds, layout_dir, node_col, src_col, dst_col, rcols, num_buckets
            )
    finally:
        shutil.rmtree(layout_dir, ignore_errors=True)

    def est_map(t: pa.Table) -> pa.Table:
        rr = np.stack(
            [t.column(c).to_numpy(zero_copy_only=False).astype(np.uint8) for c in rcols],
            axis=1,
        )
        return pa.table(
            {
                "node": t.column(node_col),
                "nhood_est": pa.array(_estimate_rows(rr)),
            }
        )

    return state_ds.map_batches(est_map, batch_format="pyarrow", batch_size=None)


def distance_distribution(
    edges_ds,
    nodes_ds,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_radius: int = 8,
    p: int = 4,
    mode: str = "auto",
    broadcast_node_limit: int = 16_000_000,
    num_buckets: int = 64,
):
    """Graph distance distribution via HyperANF — the statistic the
    algorithm was published for (Boldi-Rosa-Vigna WWW'11 §1): the
    neighborhood function N(r) = Σ_v |ball_out(v, r)| estimated for
    every r in [0, max_radius]. The effective diameter is the smallest
    r with N(r) >= 0.9·N(max_radius); average distance and the full
    distance CDF are one subtraction away. Returns a pyarrow Table
    (radius int64, pairs_est int64) with exactly max_radius + 1 rows —
    after the register fixed point the totals repeat, matching the SQL
    oracle's unrolled rounds bit-for-bit (max is idempotent).

    Same two bit-identical plans as ``neighborhood_function``; per
    round the shuffle plan adds ONE O(blocks)-driver integer partial
    (the per-block sum of per-node estimates — each est <= n so the
    total fits int64 for n <= 3B)."""
    import pyarrow.compute as pc

    if not (4 <= p <= 8):
        raise ValueError("p must be in [4, 8] (m = 2^p registers per node)")
    if max_radius < 0:
        raise ValueError("max_radius must be >= 0")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be 'auto', 'broadcast' or 'shuffle'")
    m = 1 << p
    rcols = _reg_cols(m)

    nodes_proj = nodes_ds.map_batches(
        lambda t: pa.table({node_col: pc.cast(t.column(node_col), pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    )
    edges_proj = edges_ds.map_batches(
        lambda t: pa.table(
            {
                src_col: pc.cast(t.column(src_col), pa.int64()),
                dst_col: pc.cast(t.column(dst_col), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )  # materialized only by the broadcast plan

    n = nodes_proj.count()
    if n == 0:
        return pa.table(
            {
                "radius": pa.array(
                    np.arange(max_radius + 1, dtype=np.int64)
                ),
                "pairs_est": pa.array(
                    np.zeros(max_radius + 1, dtype=np.int64)
                ),
            }
        )
    if mode == "auto":
        mode = "broadcast" if n <= broadcast_node_limit else "shuffle"
    n_edges = edges_proj.count()
    totals: list[int] = []

    if mode == "broadcast":
        edges_proj = edges_proj.materialize()  # reused every round
        node_arr = np.sort(nodes_proj.to_pandas()[node_col].to_numpy().astype(np.int64))
        if len(node_arr) > 1 and (node_arr[1:] == node_arr[:-1]).any():
            raise ValueError("nodes_ds must list every node id exactly once")
        regs = _init_registers(node_arr, p)
        totals.append(int(_estimate_rows(regs).sum()))
        done = n_edges == 0
        for _ in range(max_radius):
            if not done:
                new = _broadcast_round(
                    edges_proj, node_arr, regs, node_col, src_col, dst_col, rcols
                )
                if new is not regs:
                    regs = new
                    totals.append(int(_estimate_rows(regs).sum()))
                    continue
                # register fixed point: every further round is a full
                # distributed emit+sort+rollup that provably returns the
                # same matrix (max is idempotent) — stop executing them
                done = True
            totals.append(totals[-1])  # fixed point: totals repeat
    else:
        import shutil
        import tempfile

        from ddsketch_ray.functions.edgelayout import cluster_state, write_edge_layout

        def init_map(t: pa.Table) -> pa.Table:
            ids = t.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
            rr = _init_registers(ids, p)
            cols = {node_col: t.column(node_col)}
            for j, c in enumerate(rcols):
                cols[c] = pa.array(rr[:, j].astype(np.int64))
            return pa.table(cols)

        state_ds = cluster_state(
            nodes_proj.map_batches(init_map, batch_format="pyarrow", batch_size=None),
            node_col,
            num_buckets,
        )

        def block_total(t: pa.Table) -> int:
            rr = np.stack(
                [
                    t.column(c).to_numpy(zero_copy_only=False).astype(np.uint8)
                    for c in rcols
                ],
                axis=1,
            )
            return int(_estimate_rows(rr).sum())

        totals.append(_int_partial_sum_anf(state_ds, block_total))
        layout_dir = tempfile.mkdtemp(prefix="ddsr-anf-edges-")
        try:
            if n_edges:
                write_edge_layout(
                    edges_proj, dst_col, src_col, layout_dir, num_buckets
                )
            for _ in range(max_radius):
                if n_edges:
                    state_ds = _shuffle_round(
                        state_ds, layout_dir, node_col, src_col, dst_col, rcols,
                        num_buckets,
                    )
                    totals.append(_int_partial_sum_anf(state_ds, block_total))
                else:
                    totals.append(totals[-1])
        finally:
            shutil.rmtree(layout_dir, ignore_errors=True)

    return pa.table(
        {
            "radius": pa.array(np.arange(max_radius + 1, dtype=np.int64)),
            "pairs_est": pa.array(np.asarray(totals, dtype=np.int64)),
        }
    )


def _int_partial_sum_anf(ds, expr_fn):
    """O(blocks)-driver exact integer sum (the graph.py pattern)."""
    part = ds.map_batches(
        lambda t: pa.table({"p": pa.array([expr_fn(t)], type=pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    return int(part["p"].sum()) if len(part) else 0
