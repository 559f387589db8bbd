"""operators/graph: connected components vs a union-find oracle —
chains (transitivity), cliques, self-loops, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.graph import connected_components


def _py_cc(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            find(a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id root per node (path-compress to true roots first)
    roots = {x: find(x) for x in parent}
    comp_min = {}
    for x, r in roots.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    return sorted((x, comp_min[roots[x]]) for x in parent if any(
        a != b for a, b in edges if x in (a, b)
    ))


def test_cc_matches_union_find_on_mixed_graph(spark):
    # a 7-node chain (diameter test), an 8-clique, pairs, and shared ids
    edges = (
        [(i, i + 1) for i in range(100, 107)]
        + [(200 + i, 200 + j) for i in range(8) for j in range(i + 1, 8)]
        + [(300, 301), (400, 401), (106, 300)]  # chain joins a pair
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted((r.id, r.root) for r in connected_components(df).collect())
    assert got == _py_cc(edges)
    # the chain+pair megacomponent all roots at 100
    roots = dict(got)
    for n in list(range(100, 108)) + [300, 301]:
        assert roots[n] == 100


def test_cc_ignores_self_loops_and_is_partition_invariant(spark):
    edges = [(1, 1), (2, 3), (3, 4), (9, 9)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted((r.id, r.root) for r in connected_components(df).collect())
    # self-loop-only nodes (1, 9) don't appear; 2-3-4 one cluster
    assert got == [(2, 2), (3, 2), (4, 2)]
    got2 = sorted(
        (r.id, r.root)
        for r in connected_components(df.repartition(5)).collect()
    )
    assert got == got2


def test_cc_raises_when_not_converged(spark):
    edges = [(i, i + 1) for i in range(20)]  # diameter 20 chain
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iters=3)
    # but converges with enough rounds
    out = connected_components(df, max_iters=30)
    assert out.filter(F.col("root") != 0).count() == 0
