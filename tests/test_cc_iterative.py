"""Iterative large-star/small-star CC vs a reference union-find on random
graphs (the scale-path equivalence proof), plus topology corner cases."""

import numpy as np
import pytest

from rlis2osm_spark.operators.cc_iterative import connected_components


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical min labels
    out = {}
    for n in nodes:
        r = find(n)
        out[n] = min(out.get(r, r), r)
    return {n: find(n) for n in nodes}


def _canon(labels: dict) -> dict:
    """map each node -> min node of its component"""
    groups = {}
    for n, c in labels.items():
        groups.setdefault(c, []).append(n)
    out = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 30, 20), (2, 60, 60), (3, 100, 40), (4, 50, 120),
])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.RandomState(seed)
    edges = [(int(a), int(b))
             for a, b in rng.randint(0, n_nodes, size=(n_edges, 2))]
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    expect = _canon(_uf_components(edges, nodes))
    assert _canon(got) == expect


def test_cc_long_chain_converges_fast(spark):
    """A 2000-node path — the diameter killer for naive label propagation —
    must converge within the O(log^2 n) iteration budget."""
    edges = [(i, i + 1) for i in range(2000)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = connected_components(df, max_iter=25).collect()
    assert {r.component for r in got} == {0}
    assert len(got) == 2001


def test_cc_self_loops_and_isolated(spark):
    df = spark.createDataFrame([(5, 5), (7, 8)], "u long, v long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {5: 5, 7: 7, 8: 7}
