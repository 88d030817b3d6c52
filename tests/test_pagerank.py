"""Quantized-PageRank invariants: exact agreement with a single-process
integer reference on hand graphs, mass conservation up to the bounded
floor residue, teleport floor for sink-only nodes, dangling-mass
evaporation semantics, and loud parameter validation."""

import pytest

from rust_triplets_spark.operators.pagerank import (
    PR_DAMP_NUM,
    PR_Q,
    pagerank_quantized,
)


def _ref(edges, rounds):
    """Single-process twin of the integer iteration."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    r = {v: PR_Q // n for v in nodes}
    base = (15 * PR_Q) // (100 * n)
    for _ in range(rounds):
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // out_w[s]
        r = {v: base + (PR_DAMP_NUM * inflow[v]) // 100 for v in nodes}
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string, w long")


EDGES = [
    ("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
    ("c", "a", 1), ("c", "b", 1), ("d", "a", 5),
]


def test_matches_reference(spark):
    got = {
        r["node"]: (r["rank_q"], r["in_weight"], r["out_weight"])
        for r in pagerank_quantized(_edges_df(spark, EDGES), rounds=4)
        .collect()
    }
    exp = _ref(EDGES, 4)
    for v, rq in exp.items():
        assert got[v][0] == rq, v
    # in/out weights audit
    assert got["a"][1] == 6 and got["a"][2] == 4
    assert got["d"][1] == 0 and got["d"][2] == 5


def test_mass_conserved_up_to_floor_residue(spark):
    """Σ rank stays within (rounds × (edges + nodes)) units of Q when no
    node dangles — the bounded-residue claim in the module doc."""
    closed = [("a", "b", 2), ("b", "c", 1), ("c", "a", 4), ("b", "a", 1)]
    rounds = 5
    rows = pagerank_quantized(_edges_df(spark, closed), rounds=rounds).collect()
    total = sum(r["rank_q"] for r in rows)
    assert total <= PR_Q
    assert PR_Q - total <= rounds * (len(closed) + 3)


def test_sink_keeps_teleport_floor(spark):
    """A node with no out-edges still receives inflow + teleport; a node
    with no in-edges bottoms out at the teleport base."""
    edges = [("a", "sink", 1), ("b", "sink", 1), ("b", "a", 1)]
    got = {r["node"]: r["rank_q"] for r in
           pagerank_quantized(_edges_df(spark, edges), rounds=3).collect()}
    base = (15 * PR_Q) // (100 * 3)  # 3 nodes: a, b, sink
    assert got["b"] == base  # no in-edges: teleport only
    assert got["sink"] > got["a"] > got["b"]


def test_ordering_is_total(spark):
    rows = pagerank_quantized(_edges_df(spark, EDGES), rounds=3).collect()
    keys = [(-r["rank_q"], r["node"]) for r in rows]
    assert keys == sorted(keys)


def test_bad_rounds_loud(spark):
    with pytest.raises(ValueError):
        pagerank_quantized(_edges_df(spark, EDGES), rounds=0)
