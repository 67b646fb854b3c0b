"""SALSA and spam-mass: parity against independent pure-Python power
iterations mirroring the documented integer semantics, the partitioning
invariance the integer design buys, and oracle-vs-Python cross-checks so
an oracle bug can't hide behind a matching-but-both-wrong pair."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.graph import (
    SPAM_MASS_SCALE,
    salsa,
    salsa_oracle_sql,
    spam_mass,
    spam_mass_oracle_sql,
)
from tests.test_graph import _py_pagerank, _rand_edges


def _py_salsa(edges, iters=4, scale=10**12):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    if not nodes:
        return {}
    outdeg, indeg = {}, {}
    for a, b in e:
        outdeg[a] = outdeg.get(a, 0) + 1
        indeg[b] = indeg.get(b, 0) + 1
    init = scale // len(nodes)
    auth = {v: init for v in nodes}
    hub = {v: 0 for v in nodes}
    for _ in range(iters):
        hub = {v: 0 for v in nodes}
        for a, b in e:
            hub[a] += auth[b] // indeg[b]
        auth = {v: 0 for v in nodes}
        for a, b in e:
            auth[b] += hub[a] // outdeg[a]
    return {v: (auth[v], hub[v]) for v in nodes}


def _py_trustrank(edges, seeds, iters=5, num=85, den=100, scale=10**12):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    sset = sorted(set(seeds))
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    init = scale // len(sset)
    base = ((den - num) * init) // den
    r = {v: (init if v in sset else 0) for v in nodes}
    for _ in range(iters):
        nxt = {v: (base if v in sset else 0) for v in nodes}
        for a, b in e:
            nxt[b] += (num * r[a]) // (den * deg[a])
        r = nxt
    return r


def _py_spam_mass(edges, seeds, iters=5, scale=SPAM_MASS_SCALE):
    pr = _py_pagerank(edges, iters=iters, scale=scale)
    tr = _py_trustrank(edges, seeds, iters=iters, scale=scale)
    tpr, ttr = sum(pr.values()), max(sum(tr.values()), 1)
    out = {}
    for v, p in pr.items():
        ts = (tr[v] * tpr) // ttr
        out[v] = (p, ts, (max(p - ts, 0) * 1000000) // max(p, 1))
    return out


@pytest.mark.parametrize("seed", [3, 29, 77])
def test_salsa_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.auth, r.hub) for r in salsa(df, iters=4).collect()}
    assert got == _py_salsa(edges, iters=4)


def test_salsa_partitioning_invariant(spark):
    edges = _rand_edges(random.Random(11), n_nodes=80, n_edges=300)
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(
        (r.node, r.auth, r.hub)
        for r in salsa(df.repartition(1), iters=3).collect()
    )
    b = sorted(
        (r.node, r.auth, r.hub)
        for r in salsa(df.repartition(17), iters=3).collect()
    )
    assert a == b


def test_salsa_authority_tracks_indegree(spark):
    """Within one connected component, SALSA's stationary authority is
    proportional to indegree (Lempel & Moran Thm. 1) — the random-walk
    normalization that breaks HITS's clique mutual reinforcement. Node
    20 (indeg 4) must out-rank node 10 (indeg 2) in the same component."""
    edges = [(0, 10), (1, 10), (0, 20), (1, 20), (2, 20), (3, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.auth for r in salsa(df, iters=8).collect()}
    assert got[20] > got[10]


def test_salsa_self_loops_dups_and_empty(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 1), (1, 0)], "src long, dst long"
    )
    got = {r.node: (r.auth, r.hub) for r in salsa(df, iters=3).collect()}
    assert got == _py_salsa([(0, 1), (1, 0)], iters=3)
    empty = spark.createDataFrame([], "src long, dst long")
    assert salsa(empty, iters=2).count() == 0


def test_salsa_zero_iters_returns_init_state(spark):
    # iters=0 must return the init state (uniform auth, zero hub), not
    # crash on an uninitialized hub frame (ADVICE r04)
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r.node: (r.auth, r.hub) for r in salsa(df, iters=0).collect()}
    init = 10**12 // 3
    assert got == {0: (init, 0), 1: (init, 0), 2: (init, 0)}


def test_salsa_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    edges = _rand_edges(random.Random(59), n_nodes=30, n_edges=70)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = salsa_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=4
    )
    got = {n: (a, h) for n, a, h in duckdb.sql(sql).fetchall()}
    assert got == _py_salsa(edges, iters=4)


@pytest.mark.parametrize("seed", [7, 43])
def test_spam_mass_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    seeds = [0, 1]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.rank, r.trust_scaled, r.spam_mass_ppm)
        for r in spam_mass(df, seeds=seeds, iters=4).collect()
    }
    assert got == _py_spam_mass(edges, seeds, iters=4)


def test_spam_mass_flags_farm_not_core(spark):
    """Classic paper shape: a spam farm (nodes 100..104 all linking to
    the target 99) inflates the target's PageRank but none of its trust,
    while pages reachable from the seed keep low spam mass."""
    good = [(0, 1), (1, 2), (2, 0), (1, 3)]
    farm = [(100 + i, 99) for i in range(5)] + [(99, 100)]
    df = spark.createDataFrame(good + farm, "src long, dst long")
    got = {
        r.node: r.spam_mass_ppm
        for r in spam_mass(df, seeds=[0], iters=5).collect()
    }
    assert got[99] > 900000  # >90% of the farm target's rank is untrusted
    assert got[1] < got[99] and got[2] < got[99]


def test_spam_mass_partitioning_invariant(spark):
    edges = _rand_edges(random.Random(31), n_nodes=60, n_edges=200)
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = lambda d: sorted(  # noqa: E731
        (r.node, r.rank, r.trust_scaled, r.spam_mass_ppm)
        for r in spam_mass(d, seeds=[0, 1], iters=3).collect()
    )
    assert rows(df.repartition(1)) == rows(df.repartition(13))


def test_spam_mass_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    edges = _rand_edges(random.Random(83), n_nodes=30, n_edges=70)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = spam_mass_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", seeds=[0, 1], iters=4
    )
    got = {n: (p, ts, ppm) for n, p, ts, ppm in duckdb.sql(sql).fetchall()}
    assert got == _py_spam_mass(edges, [0, 1], iters=4)
