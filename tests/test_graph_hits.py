"""Integer HITS + co-citation: parity against independent pure-Python
references, partitioning invariance (the property the integer design
buys), DuckDB oracle agreement, and the co-citation degree-cap guard."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.graph import (
    cocitation_oracle_sql,
    cocitation_topk,
    hits,
    hits_oracle_sql,
)


def _py_hits(edges, iters=5, scale=10**6):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    if not nodes:
        return {}
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}

    def norm(raw):
        tot = max(sum(raw.values()), 1)
        return {v: (raw.get(v, 0) * scale) // tot for v in nodes}

    for _ in range(iters):
        araw = {}
        for a, b in e:
            araw[b] = araw.get(b, 0) + hub[a]
        auth = norm(araw)
        hraw = {}
        for a, b in e:
            hraw[a] = hraw.get(a, 0) + auth[b]
        hub = norm(hraw)
    return {v: (hub[v], auth[v]) for v in nodes}


def _rand_edges(rng, n_nodes=40, n_edges=110):
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", [11, 42])
def test_hits_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=4).collect()}
    assert got == _py_hits(edges, iters=4)


def test_hits_partitioning_invariance(spark):
    edges = _rand_edges(random.Random(7), n_nodes=30, n_edges=90)
    df = spark.createDataFrame(edges, "src long, dst long")
    one = sorted(
        (r.node, r.hub, r.auth)
        for r in hits(df.repartition(1), iters=3).collect()
    )
    many = sorted(
        (r.node, r.hub, r.auth)
        for r in hits(df.repartition(17), iters=3).collect()
    )
    assert one == many  # bit-identical at any parallelism


def test_hits_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    edges = _rand_edges(random.Random(3))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r.node, r.hub, r.auth) for r in hits(df, iters=4).collect()
    )
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = hits_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", iters=4
    )
    assert got == sorted(map(tuple, duckdb.sql(sql).fetchall()))


def test_hits_authority_concentrates(spark):
    # star graph: many hubs all pointing at node 0 -> node 0 owns all
    # authority mass; the pointers own the hub mass.
    edges = [(i, 0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {x.node: (x.hub, x.auth) for x in hits(df, iters=3).collect()}
    assert r[0][1] == 10**6 and r[0][0] == 0
    for i in range(1, 6):
        assert r[i][1] == 0 and r[i][0] == 10**6 // 5


def _py_cocitation(edges, k=5, cap=64):
    e = sorted({(a, b) for a, b in edges if a != b})
    out_adj = {}
    for a, b in e:
        out_adj.setdefault(a, []).append(b)
    common = {}
    for a, dsts in out_adj.items():
        if len(dsts) > cap:
            continue
        for x in dsts:
            for y in dsts:
                if x != y:
                    common[(x, y)] = common.get((x, y), 0) + 1
    per_page = {}
    for (p, q), c in common.items():
        per_page.setdefault(p, []).append((q, c))
    res = []
    for p, cands in per_page.items():
        ranked = sorted(cands, key=lambda t: (-t[1], t[0]))[:k]
        res += [(p, q, c, i + 1) for i, (q, c) in enumerate(ranked)]
    return sorted(res)


@pytest.mark.parametrize("seed", [13, 77])
def test_cocitation_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed), n_nodes=25, n_edges=120)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r.page, r.related, r.common, r.rnk)
        for r in cocitation_topk(df, k=5, max_out_degree=64).collect()
    )
    assert got == _py_cocitation(edges, k=5, cap=64)


def test_cocitation_degree_cap_drops_mega_sources(spark):
    # src 100 links to 10 pages (over cap 4): contributes nothing;
    # src 1 links to 3 pages: they co-cite each other once.
    edges = [(100, i) for i in range(10)] + [(1, 20), (1, 21), (1, 22)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r.page, r.related, r.common)
        for r in cocitation_topk(df, k=5, max_out_degree=4).collect()
    )
    assert got == [t[:3] for t in _py_cocitation(edges, k=5, cap=4)] == [
        (20, 21, 1), (20, 22, 1),
        (21, 20, 1), (21, 22, 1),
        (22, 20, 1), (22, 21, 1),
    ]
    oracle_matches = _py_cocitation(edges, k=5, cap=4)
    duckdb = pytest.importorskip("duckdb")
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = cocitation_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", k=5, max_out_degree=4
    )
    assert (
        sorted((p, q, c) for p, q, c, _ in map(tuple, duckdb.sql(sql).fetchall()))
        == [t[:3] for t in oracle_matches]
    )
