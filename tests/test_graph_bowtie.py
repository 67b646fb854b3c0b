"""Bow-tie decomposition: all seven Broder classes on a hand graph, a
pure-Python reference on random graphs, partitioning invariance, and the
oracle cross-check."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.graph import (
    bowtie_components,
    bowtie_oracle_sql,
)
from tests.test_graph import _rand_edges

# one instance of every class (pivot 0):
HAND = [
    (0, 1), (1, 0),  # SCC {0,1}
    (2, 0),          # IN: 2
    (1, 3),          # OUT: 3
    (2, 4), (4, 3),  # TUBE: 4
    (2, 5),          # TENDRIL_IN: 5
    (6, 3),          # TENDRIL_OUT: 6
    (7, 8),          # DISCONNECTED: 7, 8
]
HAND_EXPECT = {
    0: "SCC", 1: "SCC", 2: "IN", 3: "OUT", 4: "TUBE",
    5: "TENDRIL_IN", 6: "TENDRIL_OUT", 7: "DISCONNECTED",
    8: "DISCONNECTED",
}


def _py_bowtie(edges, pivot, max_depth=12):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    fwd_adj, bwd_adj = {}, {}
    for a, b in e:
        fwd_adj.setdefault(a, []).append(b)
        bwd_adj.setdefault(b, []).append(a)

    def reach(adj, seeds):
        vis = set(seeds)
        frontier = set(seeds)
        for _ in range(max_depth):
            nxt = {
                y for x in frontier for y in adj.get(x, []) if y not in vis
            }
            if not nxt:
                break
            vis |= nxt
            frontier = nxt
        return vis

    fwd, bwd = reach(fwd_adj, [pivot]), reach(bwd_adj, [pivot])
    scc = fwd & bwd
    in_set, out_set = bwd - scc, fwd - scc
    core = scc | in_set | out_set
    tfi = reach(fwd_adj, in_set) - core
    tto = reach(bwd_adj, out_set) - core
    out = {}
    for v in nodes:
        if v in scc:
            out[v] = "SCC"
        elif v in in_set:
            out[v] = "IN"
        elif v in out_set:
            out[v] = "OUT"
        elif v in tfi and v in tto:
            out[v] = "TUBE"
        elif v in tfi:
            out[v] = "TENDRIL_IN"
        elif v in tto:
            out[v] = "TENDRIL_OUT"
        else:
            out[v] = "DISCONNECTED"
    return out


def _collect(df):
    return {r.node: r.component for r in df.collect()}


def test_all_seven_classes_on_hand_graph(spark):
    df = spark.createDataFrame(HAND, "src long, dst long")
    got = _collect(bowtie_components(df, pivot=0, max_depth=6))
    assert got == HAND_EXPECT
    assert got == _py_bowtie(HAND, 0, 6)


@pytest.mark.parametrize("seed", [19, 63])
def test_random_parity(spark, seed):
    edges = _rand_edges(random.Random(seed), n_nodes=40, n_edges=70)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _collect(bowtie_components(df, pivot=edges[0][0], max_depth=10))
    assert got == _py_bowtie(edges, edges[0][0], 10)


def test_partitioning_invariant(spark):
    edges = _rand_edges(random.Random(37), n_nodes=50, n_edges=90)
    df = spark.createDataFrame(edges, "src long, dst long")
    a = _collect(bowtie_components(df.repartition(1), pivot=0, max_depth=8))
    b = _collect(bowtie_components(df.repartition(11), pivot=0, max_depth=8))
    assert a == b


def test_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    for seed in (7, 71):
        edges = _rand_edges(random.Random(seed), n_nodes=35, n_edges=60)
        vals = ", ".join(f"({a}, {b})" for a, b in edges)
        sql = bowtie_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
            pivot=edges[0][0],
            max_depth=10,
        )
        got = dict(duckdb.sql(sql).fetchall())
        assert got == _py_bowtie(edges, edges[0][0], 10)


def test_oracle_hand_graph():
    duckdb = pytest.importorskip("duckdb")
    vals = ", ".join(f"({a}, {b})" for a, b in HAND)
    sql = bowtie_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", pivot=0, max_depth=6
    )
    assert dict(duckdb.sql(sql).fetchall()) == HAND_EXPECT
