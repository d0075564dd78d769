"""Unit tests for operators/graph.py: PageRank and degree-ordered
triangle counting over candidate-pair edge lists (hand-checkable
graphs; the registered queries' oracle equivalence is covered by the
preflight/driver differential harness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.operators.graph import (
    pagerank,
    symmetrize,
    triangle_counts,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id1 long, id2 long")


def _reference_pagerank(edges, iters=5, damping=0.85):
    """Driver-side replication of the exact float recurrence (per-edge
    pr/outdeg, (1-d)/n base) for tiny graphs."""
    sym = set(edges) | {(b, a) for a, b in edges}
    nodes = sorted({a for a, _ in sym})
    n = len(nodes)
    outdeg = {u: sum(1 for a, _ in sym if a == u) for u in nodes}
    pr = {u: 1.0 / n for u in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        nxt = {}
        for v in nodes:
            s = sum(pr[u] / outdeg[u] for u, w in sorted(sym) if w == v)
            nxt[v] = base + damping * s
        pr = nxt
    return pr


def test_pagerank_path_graph(spark):
    ranks = {
        r["node"]: r["pr"]
        for r in pagerank(symmetrize(_pairs(spark, [(1, 2), (2, 3)]))).collect()
    }
    expect = _reference_pagerank([(1, 2), (2, 3)])
    assert set(ranks) == {1, 2, 3}
    for node, pr in expect.items():
        assert ranks[node] == pytest.approx(pr, abs=1e-12)
    # the middle node of a path is the hub
    assert ranks[2] > ranks[1] == pytest.approx(ranks[3], abs=1e-12)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(spark):
    out = pagerank(symmetrize(_pairs(spark, []).filter(F.lit(False))))
    assert out.columns == ["node", "pr"]
    assert out.count() == 0


def test_triangle_counts_k4(spark):
    # K4: every one of the 4 triangles hits 3 nodes -> each node in 3
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs(spark, k4)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_square_has_none(spark):
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert triangle_counts(_pairs(spark, square)).count() == 0


def test_triangle_counts_hub_graph_matches_bruteforce(spark):
    # Star hub 0 with spokes 1..10 plus chords (1,2) and (2,3): the
    # degree-ordered orientation must enumerate exactly the brute-force
    # triangle set even though node 0 is a skewed hub.
    edges = [(0, i) for i in range(1, 11)] + [(1, 2), (2, 3)]
    adj = set(edges) | {(b, a) for a, b in edges}
    nodes = sorted({a for a, _ in adj})
    brute = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            for c in nodes[nodes.index(b) + 1:]:
                if (a, b) in adj and (b, c) in adj and (a, c) in adj:
                    for v in (a, b, c):
                        brute[v] = brute.get(v, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs(spark, edges)).collect()
    }
    assert got == brute == {0: 2, 1: 1, 2: 2, 3: 1}
