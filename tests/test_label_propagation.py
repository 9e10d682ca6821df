"""Bounded-round min-label propagation (functions/graph.py::
label_propagation) vs an independent sequential reference: bit-equality
across plans/layouts, convergence to connected components, directed
flow."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ddsketch_ray.functions.graph import connected_components, label_propagation


def lp_reference(edges, n, rounds, directed=False):
    """Sequential synchronous min-label propagation, plain Python."""
    ee = list(edges)
    if not directed:
        ee = ee + [(b, a) for a, b in edges]
    lab = list(range(n))
    for _ in range(rounds):
        new = lab[:]
        for a, b in ee:
            if lab[a] < new[b]:
                new[b] = lab[a]
        lab = new
    return lab


def _run(edges, n, rounds=5, mode="auto", blocks=4, directed=False):
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(blocks)
    if edges:
        e = np.array(edges, dtype=np.int64)
        eds = rd.from_arrow(
            pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
        ).repartition(blocks)
    else:
        eds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
        )
    return (
        label_propagation(
            eds, nodes, rounds=rounds, mode=mode, num_buckets=8, directed=directed
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_random_graph_matches_reference_both_plans():
    rng = np.random.default_rng(61)
    n = 150
    edges = list(zip(rng.integers(0, n, 200).tolist(), rng.integers(0, n, 200).tolist()))
    ref = lp_reference(edges, n, rounds=3)
    for mode in ("broadcast", "shuffle"):
        out = _run(edges, n, rounds=3, mode=mode)
        assert out["label"].tolist() == ref, mode


def test_layout_bit_equality():
    rng = np.random.default_rng(67)
    n = 100
    edges = list(zip(rng.integers(0, n, 150).tolist(), rng.integers(0, n, 150).tolist()))
    ref = lp_reference(edges, n, rounds=2)
    for blocks in (1, 7):
        out = _run(edges, n, rounds=2, blocks=blocks)
        assert out["label"].tolist() == ref, blocks


def test_converges_to_components():
    # two clear components; enough rounds -> label = component min,
    # matching connected_components (which reports edge-incident nodes)
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)]
    n = 13
    out = _run(edges, n, rounds=12)
    labs = out["label"].tolist()
    assert labs[0:4] == [0, 0, 0, 0]
    assert labs[10:13] == [10, 10, 10]
    assert labs[4:10] == list(range(4, 10))  # isolated nodes keep their id
    cc = (
        connected_components(
            rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([e[0] for e in edges], type=pa.int64()),
                        "b": pa.array([e[1] for e in edges], type=pa.int64()),
                    }
                )
            ),
            src="a",
            dst="b",
        )
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"], out["label"]))
    for node, comp in zip(cc["node"], cc["component"]):
        assert got[int(node)] == int(comp)


def test_directed_flow_only_forward():
    # chain 0->1->2: directed labels flow forward only, so node 0
    # keeps 0, node 2 reaches 0 after 2 rounds; reversed never flows
    out = _run([(0, 1), (1, 2)], 3, rounds=2, directed=True)
    assert out["label"].tolist() == [0, 0, 0]
    out_back = _run([(2, 1), (1, 0)], 3, rounds=5, directed=True)
    # only smaller labels propagate; 2->1->0 delivers nothing smaller
    assert out_back["label"].tolist() == [0, 1, 2]


def test_zero_rounds_identity_and_empty():
    out = _run([(0, 1)], 2, rounds=0)
    assert out["label"].tolist() == [0, 1]
    out = _run([], 4, rounds=3)
    assert out["label"].tolist() == [0, 1, 2, 3]


def test_validation():
    nodes = rd.from_arrow(pa.table({"node": pa.array([0], type=pa.int64())}))
    eds = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
        )
    )
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(eds, nodes, rounds=-1)
    with pytest.raises(ValueError, match="mode"):
        label_propagation(eds, nodes, mode="bogus")
