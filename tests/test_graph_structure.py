"""Triangle counting (degree-oriented) and deterministic label
propagation: parity against independent pure-Python references on random
graphs, plus the partitioning-invariance property both operators'
exact-oracle grading relies on."""

from __future__ import annotations

import itertools
import random

import pytest

from obp_search_engine_spark.operators.graph import (
    label_propagation,
    triangle_counts,
)


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    t = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            t[a] += 1
            t[b] += 1
            t[c] += 1
    return t


def _py_labelprop(edges, seeds, iters):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    lab = {v: seeds.get(v) for v in nodes}
    for _ in range(iters):
        votes = {}
        for v in nodes:
            counts = {}
            for u in adj[v]:
                if lab[u] is not None:
                    counts[lab[u]] = counts.get(lab[u], 0) + 1
            if counts:
                # max votes, ties to smallest label
                votes[v] = min(
                    (l for l in counts),
                    key=lambda l: (-counts[l], l),
                )
        nxt = {}
        for v in nodes:
            if v in seeds:
                nxt[v] = seeds[v]
            elif v in votes:
                nxt[v] = votes[v]
            else:
                nxt[v] = lab[v]
        lab = nxt
    return {v: (-1 if lab[v] is None else lab[v]) for v in nodes}


def _rand_edges(rng, n_nodes=30, n_edges=90):
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_triangles_match_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == _py_triangles(edges)


def test_triangles_known_graph(spark):
    # K4 minus one edge: two triangles sharing edge (1,2)
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


def test_triangles_partitioning_invariant(spark):
    edges = _rand_edges(random.Random(7), n_nodes=60, n_edges=240)
    df1 = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    df17 = spark.createDataFrame(edges, "src long, dst long").repartition(17)
    a = sorted(map(tuple, triangle_counts(df1).collect()))
    b = sorted(map(tuple, triangle_counts(df17).collect()))
    assert a == b


@pytest.mark.parametrize("seed", [5, 23])
def test_labelprop_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    seeds = {0: 0, 1: 0, 2: 1}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.label
        for r in label_propagation(df, seeds=seeds, iters=4).collect()
    }
    assert got == _py_labelprop(edges, seeds, iters=4)


def test_labelprop_seeds_clamped_and_ties_to_smallest(spark):
    # path 0-2-1 with seeds 0->0, 1->1: node 2 sees one vote for each
    # label, tie breaks to the smaller label 0; seeds never flip
    edges = [(0, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.label
        for r in label_propagation(df, seeds={0: 0, 1: 1}, iters=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0}


def test_labelprop_isolated_component_stays_unlabeled(spark):
    edges = [(0, 1), (5, 6)]  # component {5,6} unreachable from seeds
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.label
        for r in label_propagation(df, seeds={0: 7}, iters=4).collect()
    }
    assert got == {0: 7, 1: 7, 5: -1, 6: -1}


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------


def _py_lcc(edges, scale=1_000_000):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = _py_triangles(edges)
    out = {}
    for v in nodes:
        d = len(adj[v])
        lcc = (2 * scale * tri[v]) // (d * (d - 1)) if d >= 2 else 0
        out[v] = (d, tri[v], lcc)
    return out


def test_lcc_known_graph(spark):
    # triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1.0; deg(3)=3 with
    # one triangle -> 2/(3*2) = 0.333333; deg(4)=1 -> 0
    from obp_search_engine_spark.operators.graph import clustering_coefficients

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    got = {r.node: (r.deg, r.triangles, r.lcc_micro)
           for r in clustering_coefficients(df).collect()}
    assert got == {
        1: (2, 1, 1_000_000),
        2: (2, 1, 1_000_000),
        3: (3, 1, 333_333),
        4: (1, 0, 0),
    }


@pytest.mark.parametrize("seed", [7, 19])
def test_lcc_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.graph import clustering_coefficients

    rng = random.Random(seed)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.deg, r.triangles, r.lcc_micro)
           for r in clustering_coefficients(df).collect()}
    assert got == _py_lcc(edges)


def test_lcc_triangle_counts_unchanged_by_refactor(spark):
    # the _deg_triangles refactor must leave triangle_counts' output
    # schema and values untouched
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)], "src long, dst long"
    )
    rows = triangle_counts(df).collect()
    assert rows[0].__fields__ == ["node", "triangles"]
    assert {r.node: r.triangles for r in rows} == _py_triangles(
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)]
    )
