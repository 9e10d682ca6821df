"""Distributed graph connectivity on Ray Data.

``connected_components`` implements alternating large-star / small-star
contraction — Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
"Connected Components in MapReduce and Beyond" (ACM SoCC 2014), a
public shuffle-round-efficient algorithm. It is the distributed
replacement for the driver-side union-find in
``functions/dedup.py:cluster_pairs`` (which that docstring promises for
adversarial corpora whose near-dup pair set does NOT fit one machine).

Ray-Data plan per round (no per-key ``map_groups`` anywhere — the
singleton-bucket trap documented in CLAUDE.md):

1. the canonical edge list is expanded to directed rows ``(v, w)`` (both
   directions) and SORTED by ``v`` — the round's only all-to-all
   exchange, carrying exactly two int64 columns;
2. a stats pass over the sorted blocks computes, per now-contiguous
   neighbor group, the local min / size / rows-at-min with
   ``np.minimum.reduceat`` — block-spanning groups (a star center's
   group can span MANY blocks) emit ≤ 2 tiny partial rows per block,
   which the driver stitches into global mins (driver payload
   O(blocks), never O(degree));
3. if the stats show the graph is already a star forest the loop stops —
   otherwise a rewrite pass (global boundary mins broadcast via
   ``ray.put``) emits the star-operation's rewired edges, vectorized,
   deduped per block.

Rounds are O(log² n) worst case (paper) and 2-5 in practice for
near-dup graphs. Every round materializes the 2|E|-row directed list;
the object store spills as needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EMPTY_EDGES = pa.table(
    {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
)


def _dedup_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Block-local exact dedup of (a, b) pairs (global dups may remain —
    they are harmless to every min-based step and removed at the end)."""
    if len(a) == 0:
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return a[keep], b[keep]


def _canonicalize_batch(t: pa.Table, src: str, dst: str) -> pa.Table:
    """(src, dst) rows -> canonical (a=min, b=max) int64 pairs, self
    loops and null endpoints dropped, block-deduped."""
    import pyarrow.compute as pc

    t = t.filter(pc.and_(pc.is_valid(t.column(src)), pc.is_valid(t.column(dst))))
    u = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    m = a != b
    a, b = _dedup_pairs(a[m], b[m])
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def _directed_batch(t: pa.Table) -> pa.Table:
    a = t.column("a").to_numpy()
    b = t.column("b").to_numpy()
    return pa.table(
        {"v": pa.array(np.concatenate([a, b])), "w": pa.array(np.concatenate([b, a]))}
    )


def _group_layout(v: np.ndarray):
    starts = np.nonzero(np.r_[True, v[1:] != v[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(v)])
    return starts, sizes


def _stats_pass(t: pa.Table) -> pa.Table:
    """Per sorted block: boundary-group partials (first/last group — the
    only ones that can span blocks) + this block's internal-group
    violation count. A group violates the star-forest condition when
    its min neighbor is below the node AND any neighbor differs from
    that min (i.e. the node still has mixed attachments)."""
    empty = pa.table(
        {
            "v": pa.array([], type=pa.int64()),
            "lmin": pa.array([], type=pa.int64()),
            "size": pa.array([], type=pa.int64()),
            "n_at_min": pa.array([], type=pa.int64()),
            "internal_viol": pa.array([], type=pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    v = t.column("v").to_numpy()
    w = t.column("w").to_numpy()
    starts, sizes = _group_layout(v)
    lmin = np.minimum.reduceat(w, starts)
    n_at_min = np.add.reduceat(
        (w == lmin[np.repeat(np.arange(len(starts)), sizes)]).astype(np.int64), starts
    )
    vg = v[starts]
    boundary = np.zeros(len(starts), dtype=bool)
    boundary[0] = boundary[-1] = True
    viol = (lmin < vg) & (sizes > n_at_min) & ~boundary
    bsel = np.nonzero(boundary)[0]
    return pa.table(
        {
            "v": pa.array(vg[bsel]),
            "lmin": pa.array(lmin[bsel]),
            "size": pa.array(sizes[bsel].astype(np.int64)),
            "n_at_min": pa.array(n_at_min[bsel]),
            "internal_viol": pa.array(
                np.full(len(bsel), 0, dtype=np.int64)
                if len(bsel) == 0
                else np.r_[int(viol.sum()), np.zeros(len(bsel) - 1, dtype=np.int64)]
            ),
        }
    )


def _resolve_boundaries(stats_df):
    """Driver-side stitch of the O(2-per-block) boundary partials →
    (total violations, {v: global min over Γ⁺(v)} for boundary nodes)."""
    if len(stats_df) == 0:  # empty graph: no columns survive to_pandas
        return 0, {}
    viol = int(stats_df["internal_viol"].sum())
    g = stats_df.groupby("v")
    gmin_w = g["lmin"].min()
    size = g["size"].sum()
    at_min = stats_df[
        stats_df["lmin"].to_numpy() == gmin_w.reindex(stats_df["v"]).to_numpy()
    ].groupby("v")["n_at_min"].sum().reindex(gmin_w.index, fill_value=0)
    nodes = gmin_w.index.to_numpy().astype(np.int64)
    viol += int(((gmin_w.to_numpy() < nodes) & (size.to_numpy() > at_min.to_numpy())).sum())
    gm = {int(n): int(min(mw, n)) for n, mw in zip(nodes, gmin_w.to_numpy())}
    return viol, gm


def _star_rewrite(large: bool, bkeys: np.ndarray, bvals: np.ndarray):
    """Vectorized large-star / small-star over one sorted block.
    ``bkeys/bvals``: sorted boundary-node → global-min map (broadcast);
    groups present in it use the global min, others their local min."""

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_EDGES
        v = t.column("v").to_numpy()
        w = t.column("w").to_numpy()
        starts, sizes = _group_layout(v)
        vg = v[starts]
        m_g = np.minimum(np.minimum.reduceat(w, starts), vg)
        if len(bkeys):
            idx = np.minimum(np.searchsorted(bkeys, vg), len(bkeys) - 1)
            hit = bkeys[idx] == vg
            m_g[hit] = np.minimum(m_g[hit], bvals[idx[hit]])
        m_row = m_g[np.repeat(np.arange(len(starts)), sizes)]
        if large:
            # connect every strictly-larger neighbor to min(Γ⁺(v))
            mask = w > v
            out_a, out_b = m_row[mask], w[mask]
        else:
            # connect the smaller neighbors and v itself to min(Γ⁺(v))
            mask = (w < v) & (w != m_row)
            out_a, out_b = m_row[mask], w[mask]
            has_neg = np.add.reduceat((w < v).astype(np.int64), starts) > 0
            out_a = np.concatenate([out_a, m_g[has_neg]])
            out_b = np.concatenate([out_b, vg[has_neg]])
        out_a, out_b = _dedup_pairs(out_a, out_b)
        return pa.table({"a": pa.array(out_a), "b": pa.array(out_b)})

    return rewrite


def connected_components(
    edges_ds,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 40,
):
    """Connected components of the undirected graph given as a Dataset
    of (src, dst) int64 edge rows. Returns a Dataset ``(node,
    component)`` with one row per node incident to ≥1 edge, where
    ``component`` is the component's minimum node id (isolated nodes
    never appear — union them in if needed). Hash non-integer node keys
    first (``agg.hash_any_column``).

    Duplicate edges and self loops are tolerated. Raises RuntimeError if
    ``max_iter`` alternating star rounds don't converge (the bound is
    O(log² n) — 40 rounds covers any real graph; hitting it means a bug,
    not a big input).

    Scale contract: per round one distributed sort of the 2|E|-row
    (int64, int64) directed list; driver sees O(blocks) boundary
    partials; output dedup reuses the sort-plan rollup. Nothing
    O(nodes) or O(edges) ever sits on the driver.
    """
    from ddsketch_ray.functions.dedup import sorted_group_rollup

    import ray

    edges = edges_ds.map_batches(
        lambda t: _canonicalize_batch(t, src, dst),
        batch_format="pyarrow",
        batch_size=None,
    )

    for it in range(max_iter):
        directed = edges.map_batches(
            _directed_batch, batch_format="pyarrow", batch_size=None
        )
        s = directed.sort("v").materialize()
        stats = s.map_batches(
            _stats_pass, batch_format="pyarrow", batch_size=None
        ).to_pandas()  # ≤ 2 boundary partials + 1 count per block
        viol, gm = _resolve_boundaries(stats)
        if viol == 0:
            if it == 0 and len(stats) == 0:
                import ray.data as rd

                return rd.from_arrow(
                    pa.table(
                        {
                            "node": pa.array([], type=pa.int64()),
                            "component": pa.array([], type=pa.int64()),
                        }
                    )
                )
            break
        bkeys = np.array(sorted(gm), dtype=np.int64)
        bvals = np.array([gm[int(k)] for k in bkeys], dtype=np.int64)
        ref = ray.put((bkeys, bvals))

        def rewrite_with_broadcast(t: pa.Table, _large=(it % 2 == 0), _ref=ref):
            k, vv = ray.get(_ref)  # zero-copy from plasma per task
            return _star_rewrite(_large, k, vv)(t)

        edges = s.map_batches(
            rewrite_with_broadcast, batch_format="pyarrow", batch_size=None
        )
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # terminal state: one star per component, centered at the component
    # min (contraction preserves connectivity; the center is below every
    # leaf, and the global min can't be a leaf). Label rows may repeat
    # across blocks -> exact dedup via the sort-plan rollup (min of
    # identical values).
    def label_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        node = np.concatenate([b, a])
        comp = np.concatenate([a, a])
        node, comp = _dedup_pairs(node, comp)
        return pa.table({"node": pa.array(node), "component": pa.array(comp)})

    labels = edges.map_batches(label_rows, batch_format="pyarrow", batch_size=None)
    rolled = sorted_group_rollup(labels, key_col="node", id_col="component")
    return rolled.map_batches(
        lambda t: t.select(["node", "component"]),
        batch_format="pyarrow",
        batch_size=None,
    )


# --------------------------------------------------------------- pagerank


def hash_link_edges(
    ids_ds,
    n_nodes: int,
    id_col: str = "doc_id",
    seed: int = 7777,
    max_deg: int = 3,
    dangling_mod: int = 7,
):
    """Deterministic synthetic link graph over integer node ids — the
    SQL-replayable web-link stand-in used by the ``pagerank_docs`` gate
    query, tests, and the stress harness (the test tables carry no link
    column). Node ``v`` is dangling (out-degree 0) when ``dangling_mod``
    divides it, else has out-degree ``1 + v % max_deg``; its j-th target
    (1-based) is ``hash_ints(v, seed + j) % n_nodes`` — the exact
    mod-2^64 splitmix64 expression the DuckDB oracle replays via
    ``_splitmix_sql``. Self-loops and parallel edges are kept: engine
    and oracle count them identically. Returns a Dataset (src, dst),
    both int64."""
    from ddsketch_ray.hashing import hash_ints

    def edges_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        deg = np.where(ids % dangling_mod == 0, 0, 1 + ids % max_deg)
        srcs, dsts = [], []
        for j in range(1, max_deg + 1):
            m = deg >= j
            if not m.any():
                continue
            s = ids[m]
            d = (hash_ints(s, seed=seed + j) % np.uint64(n_nodes)).astype(np.int64)
            srcs.append(s)
            dsts.append(d)
        if not srcs:
            return _EMPTY_EDGES.rename_columns(["src", "dst"])
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs)),
                "dst": pa.array(np.concatenate(dsts)),
            }
        )

    return ids_ds.map_batches(edges_batch, batch_format="pyarrow", batch_size=None)


def _int_partial_sum(ds, expr_fn):
    """Exact integer aggregate over a Dataset: per-block int64 partial
    rows (one per block, bounded by the caller's value-range contract)
    combined with Python-int driver addition — O(blocks) driver rows."""
    part = ds.map_batches(
        lambda t: pa.table({"p": pa.array([expr_fn(t)], type=pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    return int(part["p"].sum()) if len(part) else 0


def _member_idx(nodes_b: np.ndarray, ids: np.ndarray, what: str) -> np.ndarray:
    """``searchsorted`` with membership validation: every id must exist
    in the sorted node array (the edges-drawn-from-the-node-set
    contract, ``pagerank``/``label_propagation``/ANF docstrings).  An
    unvalidated searchsorted on a contract-violating input either
    raises IndexError (id beyond max) or SILENTLY credits mass/labels/
    registers to the wrong node — one vectorized check per batch makes
    the broadcast plans fail fast instead (r4 ADVICE)."""
    idx = np.searchsorted(nodes_b, ids)
    bad = idx >= len(nodes_b)
    if bad.any() or (nodes_b[np.minimum(idx, len(nodes_b) - 1)] != ids).any():
        raise ValueError(
            f"{what} references node ids not present in nodes_ds "
            "(every edge endpoint must be drawn from the node set)"
        )
    return idx


def _pagerank_broadcast(
    edges_ds, nodes_ds, node_col, src_col, dst_col,
    iters, dnum, dden, n, r0, base, seed_pred=None,
    start_r=None, start_iteration=0, on_iteration=None, start_nodes=None,
):
    """Broadcast-rank PageRank plan (see ``pagerank``): rank state is
    driver-held numpy (size-gated by the caller — the kmeans-centroid
    pattern at larger n), per-node contributions are ``ray.put`` once
    per iteration, and the only shuffle per iteration is one
    ``sorted_sum_rollup`` of (dst, contrib). Bit-identical to the
    shuffle plan: same integer recurrence, integer sums are
    order-independent."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from ddsketch_ray.functions.analytics import sorted_sum_rollup

    node_arr = np.sort(
        nodes_ds.map_batches(
            lambda t: pa.table({node_col: pc.cast(t.column(node_col), pa.int64())}),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()[node_col]
        .to_numpy()
        .astype(np.int64)
    )
    if len(node_arr) > 1 and (node_arr[1:] == node_arr[:-1]).any():
        raise ValueError("nodes_ds must list every node id exactly once")
    if start_nodes is not None and not np.array_equal(
        np.asarray(start_nodes, dtype=np.int64), node_arr
    ):
        # a node file changed in place (same glob, same count, different
        # ids) would otherwise resume with silently misassigned ranks —
        # the checkpointed r vector aligns with nodes purely by sort
        # order (r4 ADVICE)
        raise ValueError(
            "refusing to resume: checkpointed node ids do not match the "
            "current nodes_ds"
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
    ).materialize()  # reused every iteration

    # out-degrees: one rollup over the edges, stitched onto the driver's
    # node order (O(distinct src) <= n driver rows — the broadcast-mode
    # contract the caller gated on)
    outdeg = np.zeros(n, dtype=np.int64)
    n_edges = edges_proj.count()
    if n_edges:
        ones = edges_proj.map_batches(
            lambda t: pa.table(
                {
                    src_col: t.column(src_col),
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        od = sorted_sum_rollup(ones, src_col, ["one"]).to_pandas()
        idx = _member_idx(
            node_arr, od[src_col].to_numpy().astype(np.int64), "edge src"
        )
        outdeg[idx] = od["one"].to_numpy().astype(np.int64)

    dangling = outdeg == 0
    safe_deg = np.where(dangling, 1, outdeg)
    if start_r is not None:
        r = np.asarray(start_r, dtype=np.int64)
        if len(r) != n:
            raise ValueError(f"start_r has {len(r)} entries for n={n} nodes")
    else:
        r = np.full(n, r0, dtype=np.int64)

    if seed_pred is not None:
        seeds = np.asarray(seed_pred(node_arr), dtype=bool)
        ns = int(seeds.sum())
        if ns == 0:
            raise ValueError("seed_pred selects no nodes")
        tele = ((dden - dnum) * n * r0) // (dden * ns)

    if on_iteration is not None:
        # checkpoint hook: state as-of start_iteration (idempotent write)
        on_iteration(start_iteration, node_arr, r, outdeg)

    for _it in range(start_iteration, iters):
        dmass = int(r[dangling].sum())
        dshare = dmass // n
        s = np.zeros(n, dtype=np.int64)
        if n_edges:
            contrib_vals = np.where(dangling, 0, r // safe_deg)
            state = ray.put((node_arr, contrib_vals))

            def contrib_batch(t: pa.Table, _state=state) -> pa.Table:
                nodes_b, vals_b = ray.get(_state)  # zero-copy, node-local
                src = t.column(src_col).to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        dst_col: t.column(dst_col),
                        "contrib": pa.array(
                            vals_b[_member_idx(nodes_b, src, "edge src")]
                        ),
                    }
                )

            contribs = edges_proj.map_batches(
                contrib_batch, batch_format="pyarrow", batch_size=None
            )
            rolled = sorted_sum_rollup(contribs, dst_col, ["contrib"]).to_pandas()
            if len(rolled):
                idx = _member_idx(
                    node_arr, rolled[dst_col].to_numpy().astype(np.int64), "edge dst"
                )
                s[idx] = rolled["contrib"].to_numpy().astype(np.int64)
        if seed_pred is None:
            r = base + (dnum * (s + dshare)) // dden
        else:
            dboost = dmass // ns
            r = np.where(seeds, tele, 0) + (
                dnum * (s + np.where(seeds, dboost, 0))
            ) // dden
        if on_iteration is not None:
            on_iteration(_it + 1, node_arr, r, outdeg)

    denom = float(n) * float(r0)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(node_arr),
                "rank_fp": pa.array(r),
                "rank": pa.array(r / denom),
            }
        )
    )


def pagerank(
    edges_ds,
    nodes_ds,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: tuple = (85, 100),
    num_buckets: int = 64,
    mode: str = "auto",
    broadcast_node_limit: int = 16_000_000,
    seed_pred=None,
):
    """Distributed PageRank with dangling-mass redistribution, in exact
    fixed-point int64 arithmetic so the result is BIT-IDENTICAL across
    block layouts / cluster sizes (the kmeans/logreg determinism
    contract) and replayable in integer SQL (gate query
    ``pagerank_docs`` unrolls the iterations in DuckDB).

    Formulation (all integer, damping d = dnum/dden):

        r0        = min(2^26, 2^55 // n)      per-node initial mass
        base      = ((dden - dnum) * r0) // dden            (teleport)
        contrib_u = r_u // outdeg_u                  per out-edge of u
        dshare    = (sum of r over dangling nodes) // n
        r'_v      = base + (dnum * (sum contrib into v + dshare)) // dden

    Total mass is n*r0 <= 2^55, so every per-node contribution sum fits
    int64 and dnum * (sum + dshare) stays < 2^63 for dden <= 200 (the
    floor divisions leak a little mass per round — deterministic and
    mirrored exactly by the SQL oracle). Reported float ``rank`` is one
    conversion, r / (n * r0), ranks summing to ~1.

    Two bit-identical plans, gated like the dedup substrate's
    ``mode=auto``:

    **broadcast** (``n <= broadcast_node_limit``, default 16M ≈ 400 MB
    of rank state) — the kmeans pattern: the rank vector lives on the
    driver as numpy arrays, per-node contributions are broadcast via
    ``ray.put`` each iteration (one shared-memory copy per node, read
    zero-copy by every edge block), and the ONLY wide exchange per
    iteration is one ``sorted_sum_rollup`` of the (dst, contrib) rows.
    Measured 500k nodes / 860k edges / 5 iters: 77 s → ~5 s vs the
    shuffle plan (per-iteration fixed cost of 3 all-to-alls removed).

    **shuffle** (beyond the limit) — nothing O(n) on the driver: the
    static edge list is persisted ONCE as a hash-bucketed, key-sorted
    parquet layout (``edgelayout.write_edge_layout`` — the amortized
    shuffle); per iteration phase A joins each rank block against only
    its ``bucket=i/`` edge directories (zero shuffle, vectorized
    searchsorted, contributions pre-summed per dst) and phase B pays
    the round's SINGLE all-to-all, a ``[bucket, node]`` sort of ≲ 2n
    small integer rows.  Out-degrees ride the rank rows as a summed
    carry column so they never re-join.  Dangling mass is an O(blocks)
    integer partial, skipped when the init pass proves no dangling
    node exists; the driver never holds more than O(blocks) rows.

    **Personalized PageRank**: pass ``seed_pred``, a VECTORIZED pure
    predicate ``(node_ids int64 ndarray) -> bool ndarray`` naming the
    teleport set S. Teleport mass and dangling mass then go to S
    (uniformly) instead of all nodes:

        tele    = ((dden - dnum) * n * r0) // (dden * |S|)
        dboost  = (sum of r over dangling nodes) // |S|
        r'_v    = [v∈S]·tele + (dnum * (s_v + [v∈S]·dboost)) // dden

    A predicate (not a Dataset/array of seeds) keeps membership
    computable per batch with zero extra joins or broadcasts in BOTH
    plans, and SQL-replayable when the predicate is (e.g.
    ``node % 97 == 0``). ``seed_pred=None`` is standard PageRank —
    the two recurrences coincide exactly when S = all nodes (the
    integer floors agree: (a·n)//(b·n) == a//b).

    ``nodes_ds`` must list every node id exactly once (int64);
    ``edges_ds`` rows are (src, dst) with src/dst drawn from the node
    set. Parallel edges and self-loops are honored (each contributes).
    Returns a Dataset (node, rank_fp int64, rank float64).
    """
    import ray.data as rd

    dnum, dden = damping
    if not (0 < dnum < dden <= 200):
        raise ValueError("damping must satisfy 0 < dnum < dden <= 200")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be 'auto', 'broadcast' or 'shuffle'")
    n = nodes_ds.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "rank_fp": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.float64()),
                }
            )
        )
    r0 = min(1 << 26, (1 << 55) // n)
    if r0 < 1:
        raise ValueError(f"n={n} too large for the 2^55 fixed-point mass budget")
    base = ((dden - dnum) * r0) // dden

    if mode == "auto":
        mode = "broadcast" if n <= broadcast_node_limit else "shuffle"
    if mode == "broadcast":
        return _pagerank_broadcast(
            edges_ds, nodes_ds, node_col, src_col, dst_col,
            iters, dnum, dden, n, r0, base, seed_pred,
        )

    import shutil
    import tempfile

    from ddsketch_ray.functions.edgelayout import cluster_state, write_edge_layout

    nodes_proj = _pr_project_nodes(nodes_ds, node_col)
    edges_proj = _pr_project_edges(edges_ds, src_col, dst_col)
    n_edges = edges_proj.count()
    layout_dir = tempfile.mkdtemp(prefix="ddsr-pr-edges-")
    try:
        if n_edges:
            # the one-time edge shuffle the persisted layout amortizes
            write_edge_layout(edges_proj, src_col, dst_col, layout_dir, num_buckets)
        ranks = cluster_state(
            _pr_shuffle_init(
                nodes_proj, edges_proj, n_edges, node_col, src_col, dst_col,
                num_buckets, r0,
            ),
            node_col,
            num_buckets,
        )
        has_dangling = _pr_has_dangling(ranks)
        seed_ctx = _pr_seed_ctx(ranks, node_col, seed_pred, n, r0, dnum, dden)
        for _ in range(iters):
            ranks = _pr_shuffle_iteration(
                ranks, layout_dir if n_edges else None, node_col, src_col, dst_col,
                num_buckets, n, dnum, dden, base, has_dangling, seed_ctx,
            )
    finally:
        shutil.rmtree(layout_dir, ignore_errors=True)
    return _pr_finalize_shuffle(ranks, node_col, n, r0)


def _pr_project_nodes(nodes_ds, node_col):
    import pyarrow.compute as pc

    return nodes_ds.map_batches(
        lambda t: pa.table({node_col: pc.cast(t.column(node_col), pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    )


def _pr_project_edges(edges_ds, src_col, dst_col):
    """Lazy int64 edge projection — the shuffle plan streams it a fixed
    number of times at INIT only (count, layout write, out-degree
    rollup); iterations read the persisted edge layout instead, so the
    projection is never materialized in the object store."""
    import pyarrow.compute as pc

    return edges_ds.map_batches(
        lambda t: pa.table(
            {
                src_col: pc.cast(t.column(src_col), pa.int64()),
                dst_col: pc.cast(t.column(dst_col), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def _pr_shuffle_init(
    nodes_proj, edges_proj, n_edges, node_col, src_col, dst_col, num_buckets, r0
):
    """Initial (node, r=r0, outdeg) rank rows for the shuffle plan: one
    out-degree rollup left-joined onto the node set."""
    import pyarrow.compute as pc

    from ddsketch_ray.functions.analytics import sorted_sum_rollup
    from ddsketch_ray.functions.joins import equi_join_shuffle

    if n_edges:
        ones = edges_proj.map_batches(
            lambda t: pa.table(
                {
                    src_col: t.column(src_col),
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        outdeg = sorted_sum_rollup(ones, src_col, ["one"])
        joined0 = equi_join_shuffle(
            nodes_proj,
            outdeg,
            node_col,
            src_col,
            [],
            ["one"],
            num_buckets=num_buckets,
            how="left",
        )

        def init_map(t: pa.Table) -> pa.Table:
            od = pc.fill_null(t.column("one"), 0)
            return pa.table(
                {
                    node_col: t.column(node_col),
                    "r": pa.array(np.full(t.num_rows, r0, dtype=np.int64)),
                    "outdeg": pc.cast(od, pa.int64()),
                }
            )

        return joined0.map_batches(
            init_map, batch_format="pyarrow", batch_size=None
        ).materialize()
    # no edges: every node is dangling; skip the joins entirely
    return nodes_proj.map_batches(
        lambda t: pa.table(
            {
                node_col: t.column(node_col),
                "r": pa.array(np.full(t.num_rows, r0, dtype=np.int64)),
                "outdeg": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()


def _dang_mass(t: pa.Table) -> int:
    od = t.column("outdeg").to_numpy(zero_copy_only=False)
    r = t.column("r").to_numpy(zero_copy_only=False)
    return int(r[od == 0].sum())


def _pr_has_dangling(ranks) -> bool:
    return (
        _int_partial_sum(
            ranks,
            lambda t: int(
                (t.column("outdeg").to_numpy(zero_copy_only=False) == 0).sum()
            ),
        )
        > 0
    )


def _pr_seed_ctx(ranks, node_col, seed_pred, n, r0, dnum, dden):
    """None for standard PageRank, else (seed_pred, ns, tele) — |S|
    counted with one O(blocks) integer partial over the node rows."""
    if seed_pred is None:
        return None
    ns = _int_partial_sum(
        ranks,
        lambda t: int(
            np.asarray(
                seed_pred(t.column(node_col).to_numpy(zero_copy_only=False)),
                dtype=bool,
            ).sum()
        ),
    )
    if ns == 0:
        raise ValueError("seed_pred selects no nodes")
    tele = ((dden - dnum) * n * r0) // (dden * ns)
    return (seed_pred, ns, tele)


def _pr_shuffle_iteration(
    ranks, layout_dir, node_col, src_col, dst_col,
    num_buckets, n, dnum, dden, base, has_dangling, seed_ctx,
):
    """One PageRank round, shuffle plan — a pure function of the rank
    rows (the property the checkpointed job's bit-identical resume
    relies on).  r5: runs on the persisted edge layout
    (``edgelayout.propagation_round``) — phase A joins each rank block
    against only its ``bucket=i/`` edge directories (zero shuffle,
    contributions pre-summed per dst inside the block), phase B is the
    round's single all-to-all: one ``[bucket, node]`` sort of ≲ 2n
    small integer rows.  The r4 plan re-shuffled the static edge list
    through ``equi_join_shuffle`` every round (measured 59 s/iter at 5M
    nodes — BASELINE.md); integer sums are order-independent, so this
    plan is bit-identical to it and to the broadcast plan.  Returns the
    new materialized rank Dataset (bucket, node, r, outdeg)."""
    from ddsketch_ray.functions.edgelayout import propagation_round

    dmass = _int_partial_sum(ranks, _dang_mass) if has_dangling else 0
    dshare = dmass // n

    def msg_fn(t: pa.Table) -> dict:
        r = t.column("r").to_numpy(zero_copy_only=False)
        od = t.column("outdeg").to_numpy(zero_copy_only=False)
        # outdeg==0 rows never match an edge keyed by src (the layout
        # holds exactly the edges the degree counted) — the guard only
        # keeps the vectorized division defined
        return {
            "contrib": np.where(od > 0, r // np.maximum(od, 1), 0).astype(np.int64),
            "odeg": np.zeros(t.num_rows, dtype=np.int64),
        }

    def carry_fn(t: pa.Table) -> dict:
        return {
            "contrib": np.zeros(t.num_rows, dtype=np.int64),
            "odeg": t.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64),
        }

    rolled = propagation_round(
        ranks,
        layout_dir=layout_dir,
        num_buckets=num_buckets,
        key_col=src_col,
        payload_col=dst_col,
        node_col=node_col,
        msg_cols=["contrib", "odeg"],
        msg_fn=msg_fn,
        carry_fn=carry_fn,
        ufunc=np.add,
        pd_agg="sum",
    )

    if seed_ctx is None:

        def update(t: pa.Table, _dsh=dshare) -> pa.Table:
            s = t.column("contrib").to_numpy(zero_copy_only=False)
            newr = base + (dnum * (s + _dsh)) // dden
            return pa.table(
                {
                    "bucket": t.column("bucket"),
                    node_col: t.column(node_col),
                    "r": pa.array(newr.astype(np.int64)),
                    "outdeg": t.column("odeg"),
                }
            )

    else:
        seed_pred, ns, tele = seed_ctx
        dboost = dmass // ns

        def update(t: pa.Table, _db=dboost) -> pa.Table:
            s = t.column("contrib").to_numpy(zero_copy_only=False)
            mask = np.asarray(
                seed_pred(t.column(node_col).to_numpy(zero_copy_only=False)),
                dtype=bool,
            )
            newr = np.where(mask, tele, 0) + (
                dnum * (s + np.where(mask, _db, 0))
            ) // dden
            return pa.table(
                {
                    "bucket": t.column("bucket"),
                    node_col: t.column(node_col),
                    "r": pa.array(newr.astype(np.int64)),
                    "outdeg": t.column("odeg"),
                }
            )

    return rolled.map_batches(update, batch_format="pyarrow", batch_size=None).materialize()


def _pr_finalize_shuffle(ranks, node_col, n, r0):
    denom = float(n) * float(r0)
    return ranks.map_batches(
        lambda t: pa.table(
            {
                "node": t.column(node_col),
                "rank_fp": t.column("r"),
                "rank": pa.array(
                    t.column("r").to_numpy(zero_copy_only=False) / denom
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def pagerank_checkpointed(
    edges_ds,
    nodes_ds,
    ckpt_dir: str,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: tuple = (85, 100),
    num_buckets: int = 64,
    mode: str = "auto",
    broadcast_node_limit: int = 16_000_000,
    seed_mod: int | None = None,
    input_desc: str = "",
) -> dict:
    """``pagerank`` with per-ITERATION checkpoints — the resumable shape
    for iterative algorithms (the kmeans_fit_checkpointed / logreg
    contract, functions/cluster.py:234): after every round the full
    rank state lands in ``{ckpt_dir}/rank-{i:04d}/`` (i=0 is the
    deterministic init) as parquet plus a ``meta.json`` completion
    marker written LAST — a killed run leaves either a complete
    iteration or a marker-less partial that the restart wipes. A re-run
    with the same ckpt_dir resumes from the highest complete iteration
    ≤ ``iters`` and — because every round is a pure integer function of
    the rank rows (``_pr_shuffle_iteration`` / the broadcast loop) —
    produces the BIT-IDENTICAL result a cold run would. Parameter
    mismatches against the stored metadata raise instead of silently
    diverging.

    The checkpoint is O(n) rows: the broadcast plan writes it from the
    driver matrix (one file), the shuffle plan writes the rank Dataset
    distributed (``write_parquet`` — nothing O(n) crosses the driver).
    Personalization uses ``seed_mod`` (seeds = node % seed_mod == 0), an
    integer so the lineage metadata can pin it (a callable could not be
    fingerprinted).

    Returns {"result": Dataset(node, rank_fp, rank),
    "resumed_from_iteration": int, "iterations_run": int}.
    """
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil
    import time as _time

    import pyarrow.parquet as _pq
    import ray.data as rd

    dnum, dden = damping
    if not (0 < dnum < dden <= 200):
        raise ValueError("damping must satisfy 0 < dnum < dden <= 200")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be 'auto', 'broadcast' or 'shuffle'")
    if seed_mod is not None and seed_mod < 1:
        raise ValueError("seed_mod must be >= 1")
    n = nodes_ds.count()
    if n == 0:
        return {
            "result": rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "rank_fp": pa.array([], type=pa.int64()),
                        "rank": pa.array([], type=pa.float64()),
                    }
                )
            ),
            "resumed_from_iteration": 0,
            "iterations_run": 0,
        }
    r0 = min(1 << 26, (1 << 55) // n)
    base = ((dden - dnum) * r0) // dden
    params = {
        "dnum": int(dnum),
        "dden": int(dden),
        "n": int(n),
        "r0": int(r0),
        "seed_mod": int(seed_mod) if seed_mod is not None else 0,
        "input_desc": input_desc,
        "node_col": node_col,
    }
    _os.makedirs(ckpt_dir, exist_ok=True)

    def _dir(i: int) -> str:
        return _os.path.join(ckpt_dir, f"rank-{i:04d}")

    def _meta_path(i: int) -> str:
        return _os.path.join(_dir(i), "meta.json")

    def _complete(i: int) -> bool:
        return _os.path.exists(_meta_path(i))

    def _check_meta(i: int) -> None:
        with open(_meta_path(i)) as f:
            meta = _json.load(f)
        for k, v in params.items():
            if meta.get(k) != v:
                raise ValueError(
                    f"checkpoint {ckpt_dir} iteration {i} was written with "
                    f"{k}={meta.get(k)!r}, current run has {v!r} — refusing to resume"
                )

    def _write_meta(i: int, wall_s: float) -> None:
        meta = dict(params, iteration=i, wall_s=round(wall_s, 3))
        tmp = _meta_path(i) + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        _os.replace(tmp, _meta_path(i))  # marker lands atomically, LAST

    def _fresh_dir(i: int) -> str:
        d = _dir(i)
        if _os.path.exists(d):
            _shutil.rmtree(d)  # marker-less partial from a killed run
        return d

    start = -1
    for i in range(int(iters), -1, -1):
        if _complete(i):
            start = i
            break
    if start >= 0:
        _check_meta(start)

    seed_pred = None
    if seed_mod is not None:
        _sm = int(seed_mod)
        seed_pred = lambda ids, _m=_sm: ids % _m == 0  # noqa: E731

    if mode == "auto":
        mode = "broadcast" if n <= broadcast_node_limit else "shuffle"

    if mode == "broadcast":
        start_r, start_nodes, start_it = None, None, 0
        if start >= 0:
            files = sorted(_glob.glob(_os.path.join(_dir(start), "*.parquet")))
            t = _pq.read_table(files, columns=[node_col, "r"])
            ckpt_nodes = t.column(node_col).to_numpy(zero_copy_only=False)
            order = np.argsort(ckpt_nodes)
            start_r = t.column("r").to_numpy(zero_copy_only=False)[order]
            start_nodes = ckpt_nodes[order]  # validated vs nodes_ds inside
            start_it = start

        t_iter = _time.perf_counter()

        def on_iteration(i, node_arr, r, outdeg, _t=[t_iter]):
            if not _complete(i):
                d = _fresh_dir(i)
                _os.makedirs(d)
                tbl = pa.table(
                    {
                        node_col: pa.array(node_arr),
                        "r": pa.array(np.asarray(r, dtype=np.int64)),
                        "outdeg": pa.array(np.asarray(outdeg, dtype=np.int64)),
                    }
                )
                _pq.write_table(tbl, _os.path.join(d, "data.parquet"))
                _write_meta(i, _time.perf_counter() - _t[0])
            _t[0] = _time.perf_counter()

        result = _pagerank_broadcast(
            edges_ds, nodes_ds, node_col, src_col, dst_col,
            int(iters), dnum, dden, n, r0, base, seed_pred,
            start_r=start_r, start_iteration=start_it, on_iteration=on_iteration,
            start_nodes=start_nodes,
        )
        resumed = max(start, 0)
        return {
            "result": result,
            "resumed_from_iteration": resumed,
            "iterations_run": int(iters) - start_it,
        }

    # shuffle plan: the rank state never crosses the driver
    from ddsketch_ray.functions.edgelayout import cluster_state, write_edge_layout

    nodes_proj = _pr_project_nodes(nodes_ds, node_col)
    edges_proj = _pr_project_edges(edges_ds, src_col, dst_col)
    n_edges = edges_proj.count()
    # the persisted edge layout lives WITH the checkpoints so a resumed
    # run reuses it (write_edge_layout is marker-idempotent: a complete
    # layout is kept, a partial one from a killed run is rebuilt)
    layout_dir = _os.path.join(ckpt_dir, "edges-layout")
    if n_edges:
        write_edge_layout(edges_proj, src_col, dst_col, layout_dir, num_buckets)

    def _write_state_ds(i: int, ranks_ds, wall_s: float) -> None:
        if _complete(i):
            return
        d = _fresh_dir(i)
        ranks_ds.write_parquet(d)
        _write_meta(i, wall_s)

    if start >= 0:
        files = sorted(_glob.glob(_os.path.join(_dir(start), "*.parquet")))
        # cluster_state re-establishes the [bucket, node] invariant and
        # adds the bucket column when resuming a broadcast-written state
        ranks = cluster_state(rd.read_parquet(files), node_col, num_buckets)
        start_it = start
    else:
        t0 = _time.perf_counter()
        ranks = cluster_state(
            _pr_shuffle_init(
                nodes_proj, edges_proj, n_edges, node_col, src_col, dst_col,
                num_buckets, r0,
            ),
            node_col,
            num_buckets,
        )
        _write_state_ds(0, ranks, _time.perf_counter() - t0)
        start_it = 0

    has_dangling = _pr_has_dangling(ranks)
    seed_ctx = _pr_seed_ctx(ranks, node_col, seed_pred, n, r0, dnum, dden)
    for i in range(start_it + 1, int(iters) + 1):
        t0 = _time.perf_counter()
        ranks = _pr_shuffle_iteration(
            ranks, layout_dir if n_edges else None, node_col, src_col, dst_col,
            num_buckets, n, dnum, dden, base, has_dangling, seed_ctx,
        )
        _write_state_ds(i, ranks, _time.perf_counter() - t0)
    return {
        "result": _pr_finalize_shuffle(ranks, node_col, n, r0),
        "resumed_from_iteration": max(start, 0),
        "iterations_run": int(iters) - start_it,
    }


def label_propagation(
    edges_ds,
    nodes_ds,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 5,
    mode: str = "auto",
    broadcast_node_limit: int = 16_000_000,
    num_buckets: int = 64,
    directed: bool = False,
):
    """Bounded-round synchronous min-label propagation — community /
    local-cluster labels over the link graph (the spam-farm /
    mirror-site detector's workhorse). Every node starts with its own
    id as label; each round it takes the MIN of its own label and its
    neighbors' (both directions unless ``directed=True``, where labels
    flow src → dst only). After k rounds label_v = min node id within
    k propagation steps of v; run enough rounds and labels converge to
    connected components — ``connected_components`` (above) remains
    the full-convergence star-contraction path, while this variant has
    deterministic BOUNDED-ROUND state that an SQL oracle can unroll
    (gate query ``label_propagation_docs``) and per-round semantics
    (radius-k communities).

    Pure integer min state → bit-identical across layouts and the two
    plans (the pagerank/ANF gating):

    - **broadcast** (n <= limit): labels are a driver-held int64
      vector, ``ray.put`` once per round; ONE ``sorted_min_rollup``
      shuffle per round; early-exits on the fixed point (min is
      idempotent — identical output, fewer rounds).
    - **shuffle** (beyond the limit, nothing O(n) on the driver):
      label rows ride a Dataset; per round one bucketed join delivers
      neighbor labels + carry union + min-rollup.

    ``nodes_ds`` must list every node id exactly once (int64); src/dst
    drawn from the node set. Returns a Dataset (node, label), label =
    the minimum reachable node id within ``rounds`` steps.
    """
    import ray
    import ray.data as rd

    from ddsketch_ray.functions.anf import sorted_min_rollup

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be 'auto', 'broadcast' or 'shuffle'")

    nodes_proj = _pr_project_nodes(nodes_ds, node_col)

    def expand(t: pa.Table) -> pa.Table:
        a = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if directed:
            return pa.table({"a": pa.array(a), "b": pa.array(b)})
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, b])),
                "b": pa.array(np.concatenate([b, a])),
            }
        )

    ee = edges_ds.map_batches(
        expand, batch_format="pyarrow", batch_size=None
    )  # 2|E| rows undirected; materialized only by the broadcast plan
    n = nodes_proj.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.int64()),
                }
            )
        )
    if mode == "auto":
        mode = "broadcast" if n <= broadcast_node_limit else "shuffle"
    n_edges = ee.count()

    if mode == "broadcast":
        ee = ee.materialize()  # reused every round
        node_arr = np.sort(nodes_proj.to_pandas()[node_col].to_numpy().astype(np.int64))
        if len(node_arr) > 1 and (node_arr[1:] == node_arr[:-1]).any():
            raise ValueError("nodes_ds must list every node id exactly once")
        labels = node_arr.copy()
        for _ in range(rounds if n_edges else 0):
            state = ray.put((node_arr, labels))

            def emit(t: pa.Table, _state=state) -> pa.Table:
                nodes_b, labs_b = ray.get(_state)  # zero-copy, node-local
                a = t.column("a").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        node_col: t.column("b"),
                        "lab": pa.array(labs_b[_member_idx(nodes_b, a, "edge src")]),
                    }
                )

            rolled = sorted_min_rollup(
                ee.map_batches(emit, batch_format="pyarrow", batch_size=None),
                node_col,
                ["lab"],
            ).to_pandas()
            new = labels.copy()
            if len(rolled):
                idx = _member_idx(
                    node_arr, rolled[node_col].to_numpy().astype(np.int64), "edge dst"
                )
                new[idx] = np.minimum(new[idx], rolled["lab"].to_numpy().astype(np.int64))
            if np.array_equal(new, labels):
                break  # fixed point: min is idempotent
            labels = new
        return rd.from_arrow(
            pa.table({"node": pa.array(node_arr), "label": pa.array(labels)})
        )

    # shuffle plan: label rows never cross the driver; the static
    # expanded edge list is persisted ONCE (edgelayout substrate) and
    # each round pays a single [bucket, node] label-row sort instead of
    # re-shuffling 2|E| edges through equi_join_shuffle
    import shutil
    import tempfile

    from ddsketch_ray.functions.edgelayout import (
        cluster_state,
        propagation_round,
        write_edge_layout,
    )

    state_ds = cluster_state(
        nodes_proj.map_batches(
            lambda t: pa.table(
                {node_col: t.column(node_col), "lab": t.column(node_col)}
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        node_col,
        num_buckets,
    )

    def msg_fn(t: pa.Table) -> dict:
        return {"lab": t.column("lab").to_numpy(zero_copy_only=False).astype(np.int64)}

    layout_dir = tempfile.mkdtemp(prefix="ddsr-lp-edges-")
    try:
        if n_edges:
            write_edge_layout(ee, "a", "b", layout_dir, num_buckets)
        for _ in range(rounds if n_edges else 0):
            state_ds = propagation_round(
                state_ds,
                layout_dir=layout_dir,
                num_buckets=num_buckets,
                key_col="a",
                payload_col="b",
                node_col=node_col,
                msg_cols=["lab"],
                msg_fn=msg_fn,
                carry_fn=msg_fn,
                ufunc=np.minimum,
                pd_agg="min",
            ).materialize()
    finally:
        shutil.rmtree(layout_dir, ignore_errors=True)
    return state_ds.map_batches(
        lambda t: pa.table(
            {"node": t.column(node_col), "label": t.column("lab")}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
