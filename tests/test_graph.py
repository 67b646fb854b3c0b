"""Fixed-point integer PageRank: parity against an independent pure-Python
power iteration mirroring the documented integer semantics, plus the
property that motivates the integer design — bit-identical results at any
partitioning."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.graph import (
    DEFAULT_SCALE,
    pagerank,
    pagerank_oracle_sql,
    trustrank,
    trustrank_oracle_sql,
)


def _py_pagerank(edges, iters=5, num=85, den=100, scale=DEFAULT_SCALE):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    if not nodes:
        return {}
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    n = len(nodes)
    init = scale // n
    base = ((den - num) * init) // den
    r = {v: init for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for a, b in e:
            nxt[b] += (num * r[a]) // (den * deg[a])
        r = nxt
    return r


def _rand_edges(rng, n_nodes=50, n_edges=120):
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", [5, 17, 91])
def test_pagerank_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    assert got == _py_pagerank(edges, iters=5)


def test_pagerank_partitioning_invariant(spark):
    """The reason ranks are integers: identical output for radically
    different physical layouts (1 partition vs 17), where float partial
    sums would differ in aggregation order."""
    edges = _rand_edges(random.Random(7), n_nodes=80, n_edges=300)
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(
        (r.node, r.rank) for r in pagerank(df.repartition(1), iters=4).collect()
    )
    b = sorted(
        (r.node, r.rank) for r in pagerank(df.repartition(17), iters=4).collect()
    )
    assert a == b


def test_pagerank_dangling_and_sink(spark):
    # 0 -> 1 -> 2, node 2 dangling: its mass leaks, node 0 gets base only
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    ref = _py_pagerank([(0, 1), (1, 2)], iters=3)
    assert got == ref
    assert got[0] < got[1] < got[2] or got[2] >= got[0]  # sink accumulates
    assert got[0] == ref[0]


def test_pagerank_self_loops_and_dups_removed(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 1), (1, 0)], "src long, dst long"
    )
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    assert got == _py_pagerank([(0, 1), (1, 0)], iters=3)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, iters=2).count() == 0


def test_oracle_sql_matches_python_reference():
    """The generated DuckDB CTE chain implements the same semantics as the
    operator — checked against the Python reference with no Spark at all,
    so oracle bugs can't hide behind matching-but-both-wrong pairs."""
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(23)
    edges = _rand_edges(rng, n_nodes=30, n_edges=70)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=4
    )
    got = dict(duckdb.sql(sql).fetchall())
    assert got == _py_pagerank(edges, iters=4)


@pytest.mark.parametrize("seed", [13, 41])
def test_degree_histogram_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.graph import degree_histogram

    edges = _rand_edges(random.Random(seed), n_nodes=40, n_edges=100)
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    outd = {v: 0 for v in nodes}
    ind = {v: 0 for v in nodes}
    for a, b in e:
        outd[a] += 1
        ind[b] += 1
    ref = set()
    for label, degs in (("out", outd), ("in", ind)):
        hist = {}
        for d in degs.values():
            hist[d] = hist.get(d, 0) + 1
        ref |= {(label, d, c) for d, c in hist.items()}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.direction, r.degree, r.n_nodes)
        for r in degree_histogram(df).collect()
    }
    assert got == ref


def test_trap_hosts_flags_duplicate_heavy_host(spark):
    from obp_search_engine_spark.operators.crawl import trap_hosts

    rows = (
        # trap.x: 6 pages, only 2 distinct bodies -> dup_ratio 0.666667
        [(f"u{i}", "trap.x", "same body " + str(i % 2)) for i in range(6)]
        # ok.x: 6 pages all distinct -> dup_ratio 0.0
        + [(f"v{i}", "ok.x", f"unique body {i}") for i in range(6)]
        # small.x: 2 pages duplicated but below min_pages -> not a trap
        + [(f"w{i}", "small.x", "tiny dup") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "url string, host string, text string")
    got = {r.host: r for r in trap_hosts(df, min_pages=5, dup_threshold=0.5).collect()}
    assert got["trap.x"].is_trap and got["trap.x"].n_distinct == 2
    assert got["trap.x"].dup_ratio == pytest.approx(0.666667)
    assert not got["ok.x"].is_trap and got["ok.x"].dup_ratio == 0.0
    assert not got["small.x"].is_trap  # dup-heavy but too few pages


def _py_bfs(edges, seeds, max_depth):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
    depth = {s: 0 for s in set(seeds)}
    frontier = set(depth)
    for d in range(1, max_depth + 1):
        nxt = set()
        for v in frontier:
            nxt |= adj.get(v, set())
        nxt -= depth.keys()
        if not nxt:
            break
        for v in nxt:
            depth[v] = d
        frontier = nxt
    return depth


@pytest.mark.parametrize("seed", [2, 13, 77])
def test_bfs_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.graph import bfs_depths

    edges = _rand_edges(random.Random(seed), n_nodes=40, n_edges=90)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.depth for r in bfs_depths(df, seeds=[0, 1], max_depth=4).collect()}
    assert got == _py_bfs(edges, [0, 1], 4)


def test_bfs_early_exit_and_chain_depths(spark):
    """A directed chain 0->1->2->3 plus an unreachable island: depths are
    the hop counts, the island never appears, and a max_depth far past the
    diameter returns the same result (the loop exits on the first empty
    frontier instead of running all levels)."""
    from obp_search_engine_spark.operators.graph import bfs_depths

    edges = [(0, 1), (1, 2), (2, 3), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.depth for r in bfs_depths(df, seeds=[0], max_depth=50).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_partitioning_invariant(spark):
    from obp_search_engine_spark.operators.graph import bfs_depths

    edges = _rand_edges(random.Random(31), n_nodes=60, n_edges=200)
    a = bfs_depths(
        spark.createDataFrame(edges, "src long, dst long").repartition(1),
        seeds=[3],
        max_depth=3,
    )
    b = bfs_depths(
        spark.createDataFrame(edges, "src long, dst long").repartition(17),
        seeds=[3],
        max_depth=3,
    )
    key = lambda r: (r.node, r.depth)  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


# ---------------------------------------------------------------------------
# resolve_redirects — pointer doubling
# ---------------------------------------------------------------------------
def _py_resolve(edges, doublings=4):
    """Independent reference: normalize to min-dst, compose the step
    function with itself `doublings` times, flag unresolved finals."""
    em = {}
    for a, b in edges:
        em[a] = min(b, em.get(a, b))
    nodes = sorted(set(em) | set(em.values()))
    r = {v: em.get(v, v) for v in nodes}
    for _ in range(doublings):
        r = {v: r[r[v]] for v in nodes}
    return {v: (r[v], r[v] not in em) for v in nodes}


def _chain(start, length):
    return [(start + i, start + i + 1) for i in range(length)]


def test_resolve_redirects_semantics(spark):
    from obp_search_engine_spark.operators.graph import resolve_redirects

    edges = (
        _chain(1, 3)            # 1->2->3->4 (terminal 4)
        + [(5, 6), (6, 5)]      # 2-cycle
        + [(7, 7)]              # self-redirect: 1-cycle
        + [(1, 9)]              # dup src: min(2, 9) = 2 wins
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.url: (r.final, r.resolved) for r in resolve_redirects(df).collect()}
    assert got == _py_resolve(edges)
    assert got[1] == (4, True) and got[4] == (4, True)
    assert got[5][1] is False and got[6][1] is False  # cycle unresolved
    assert got[7] == (7, False)  # self-redirect is a 1-cycle
    # 9 appears only in the LOSING duplicate edge: normalization (min dst
    # per src) drops it before node collection on both sides
    assert 9 not in got


def test_resolve_redirects_hop_budget(spark):
    """A 20-hop chain exceeds the 2**4=16-hop budget (head unresolved)
    but fits 2**5=32 (everything resolved)."""
    from obp_search_engine_spark.operators.graph import resolve_redirects

    edges = _chain(10, 20)  # 10 -> ... -> 30
    df = spark.createDataFrame(edges, "src long, dst long")
    g4 = {r.url: (r.final, r.resolved) for r in resolve_redirects(df, 4).collect()}
    assert g4 == _py_resolve(edges, 4)
    assert g4[10] == (26, False)  # 16 hops from 10, still mid-chain
    assert g4[14] == (30, True)
    g5 = {r.url: (r.final, r.resolved) for r in resolve_redirects(df, 5).collect()}
    assert all(res for _, res in g5.values())
    assert g5[10] == (30, True)


@pytest.mark.parametrize("seed", [3, 29])
def test_resolve_redirects_random_parity(spark, seed):
    from obp_search_engine_spark.operators.graph import resolve_redirects

    rng = random.Random(seed)
    edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(45)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.url: (r.final, r.resolved) for r in resolve_redirects(df).collect()}
    assert got == _py_resolve(edges)


def test_resolve_redirects_partitioning_invariant(spark):
    from obp_search_engine_spark.operators.graph import resolve_redirects

    edges = [(i, (i * 7 + 3) % 50) for i in range(0, 50, 2)]
    mk = lambda n: spark.createDataFrame(edges, "src long, dst long").repartition(n)  # noqa: E731
    key = lambda r: (r.url, r.final, r.resolved)  # noqa: E731
    assert sorted(map(key, resolve_redirects(mk(1)).collect())) == sorted(
        map(key, resolve_redirects(mk(17)).collect())
    )


def test_resolve_redirects_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    from obp_search_engine_spark.operators.graph import (
        resolve_redirects_oracle_sql,
    )

    rng = random.Random(11)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(35)]
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = resolve_redirects_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", doublings=4
    )
    got = {u: (f, res) for u, f, res in duckdb.sql(sql).fetchall()}
    assert got == _py_resolve(edges, 4)


# ---------------------------------------------------------------------------
# trustrank
# ---------------------------------------------------------------------------
def _py_trustrank(edges, seeds, iters=5, num=85, den=100, scale=DEFAULT_SCALE):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    sset = sorted(set(seeds))
    init = scale // len(sset)
    base = ((den - num) * init) // den
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    r = {v: (init if v in sset else 0) for v in nodes}
    for _ in range(iters):
        nxt = {v: (base if v in sset else 0) for v in nodes}
        for a, b in e:
            nxt[b] += (num * r[a]) // (den * deg[a])
        r = nxt
    return r


@pytest.mark.parametrize("seed", [6, 53])
def test_trustrank_matches_python_reference(spark, seed):
    edges = _rand_edges(random.Random(seed))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in trustrank(df, seeds=[0, 1, 2]).collect()}
    assert got == _py_trustrank(edges, [0, 1, 2], iters=5)


def test_trustrank_starves_unreachable_spam(spark):
    # 0 -> 1 -> 2 is the trusted neighborhood; 10 <-> 11 is a spam farm
    # with no path from any seed: its trust is exactly zero
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10), (10, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in trustrank(df, seeds=[0]).collect()}
    assert got == _py_trustrank(edges, [0], iters=5)
    assert got[10] == 0 and got[11] == 0
    assert got[1] > 0 and got[2] > 0


def test_trustrank_partitioning_invariant(spark):
    edges = _rand_edges(random.Random(14), n_nodes=30, n_edges=90)
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {tuple(r) for r in trustrank(df.repartition(1), seeds=[3, 4]).collect()}
    b = {tuple(r) for r in trustrank(df.repartition(17), seeds=[3, 4]).collect()}
    assert a == b


def test_trustrank_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    edges = _rand_edges(random.Random(33), n_nodes=25, n_edges=70)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = trustrank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", seeds=[0, 5], iters=4
    )
    got = dict(duckdb.sql(sql).fetchall())
    assert got == _py_trustrank(edges, [0, 5], iters=4)


def test_trustrank_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="seed"):
        trustrank(df, seeds=[])


# ---------------------------------------------------------------------------
# OPIC (Abiteboul, Preda & Cobéna 2003)
# ---------------------------------------------------------------------------
def _py_opic(edges, rounds=4, scale=DEFAULT_SCALE):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    if not nodes:
        return {}
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    n = len(nodes)
    cash = {v: scale // n for v in nodes}
    hist = {v: 0 for v in nodes}
    vcash = 0
    for _ in range(rounds):
        share = {v: cash[v] // (deg.get(v, 0) + 1) for v in nodes}
        nxt = {v: vcash // n for v in nodes}
        for a, b in e:
            nxt[b] += share[a]
        vcash = sum(share.values())
        for v in nodes:
            hist[v] += cash[v]
        cash = nxt
    return {v: (cash[v], hist[v]) for v in nodes}


@pytest.mark.parametrize("seed", [5, 17, 91])
def test_opic_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.graph import opic

    edges = _rand_edges(random.Random(seed))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.cash, r.history) for r in opic(df, rounds=4).collect()}
    assert got == _py_opic(edges, rounds=4)


def test_opic_partitioning_invariant_and_dangling(spark):
    from obp_search_engine_spark.operators.graph import opic

    # node 3 is dangling: all its cash flows to the virtual node and
    # comes back divided by N — never lost to a sink
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: (r.cash, r.history) for r in opic(df.repartition(1), rounds=5).collect()}
    b = {r.node: (r.cash, r.history) for r in opic(df.repartition(9), rounds=5).collect()}
    assert a == b == _py_opic(edges, rounds=5)
    # the dangling node keeps receiving cash (virtual redistribution)
    assert a[3][1] > 0 and a[3][0] > 0


def test_opic_mass_conservation_bound(spark):
    from obp_search_engine_spark.operators.graph import opic

    edges = _rand_edges(random.Random(3), n_nodes=30, n_edges=80)
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = opic(df, rounds=4).collect()
    total_cash = sum(r.cash for r in rows)
    # truncating div leaks at most (deg+1) units per node per round plus
    # the virtual remainder; total cash stays within scale and positive
    assert 0 < total_cash <= DEFAULT_SCALE


def test_webgraph_gap_encode_hand_computed(spark):
    from obp_search_engine_spark.operators.graph import webgraph_gap_encode

    # src 1: sorted dsts [5, 7, 130] -> gaps [5, 2, 123], all 1-byte
    # varints; duplicate edge (1, 7) must collapse first
    edges = spark.createDataFrame(
        [(1, 130), (1, 5), (1, 7), (1, 7), (2, 20000), (2, 3)],
        "src long, dst long",
    )
    rows = {r.src: r for r in webgraph_gap_encode(edges).collect()}
    r1 = rows[1]
    assert (r1.degree, r1.gaps, r1.raw_bytes, r1.varint_bytes, r1.ratio) == (
        3, "5,2,123", 24, 3, 0.125
    )
    # src 2: gaps [3, 19997]; 19997 needs a 2^14..2^21 (3-byte) varint
    r2 = rows[2]
    assert (r2.degree, r2.gaps, r2.varint_bytes, r2.ratio) == (
        2, "3,19997", 4, 0.25
    )
    # partitioning invariance: the per-src window makes layout irrelevant
    a = sorted(map(tuple, webgraph_gap_encode(edges.repartition(1)).collect()))
    b = sorted(map(tuple, webgraph_gap_encode(edges.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------- personalized pagerank


from obp_search_engine_spark.operators.graph import (  # noqa: E402
    personalized_pagerank,
    personalized_pagerank_oracle_sql,
)


def _py_ppr(edges, seeds, iters=5, num=85, den=100, scale=DEFAULT_SCALE):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    seeds = sorted(set(seeds))
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    init = scale // len(seeds)
    base = ((den - num) * init) // den
    r = {v: (init if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        nxt = {v: (base if v in seeds else 0) for v in nodes}
        for a, b in e:
            nxt[b] += (num * r[a]) // (den * deg[a])
        r = nxt
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


@pytest.mark.parametrize("seed", [3, 29])
def test_ppr_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    edges = _rand_edges(rng)
    seeds = [0, 1, 2]
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            _edges_df(spark, edges), seeds=seeds, iters=4
        ).collect()
    }
    assert got == _py_ppr(edges, seeds, iters=4)


def test_ppr_unreachable_is_zero(spark):
    # two components: seeds in {0->1->2}; {10->11} never reachable
    edges = [(0, 1), (1, 2), (10, 11)]
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            _edges_df(spark, edges), seeds=[0], iters=5
        ).collect()
    }
    assert got[10] == 0 and got[11] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


def test_ppr_seed_proximity_ordering(spark):
    # chain 0->1->2->3: rank must decay with distance from the seed
    edges = [(0, 1), (1, 2), (2, 3)]
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            _edges_df(spark, edges), seeds=[0], iters=6
        ).collect()
    }
    assert got[0] > got[1] > got[2] > got[3]


def test_ppr_partitioning_invariant(spark):
    rng = random.Random(7)
    edges = _rand_edges(rng)
    df = _edges_df(spark, edges)
    one = sorted(
        map(
            tuple,
            personalized_pagerank(
                df.coalesce(1), seeds=[1, 4], iters=3
            ).collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            personalized_pagerank(
                df.repartition(17), seeds=[1, 4], iters=3
            ).collect(),
        )
    )
    assert one == many


def test_ppr_validates_args(spark):
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        personalized_pagerank(df, seeds=[])
    with pytest.raises(ValueError):
        personalized_pagerank(df, seeds=[0], damping=(100, 100))


def test_ppr_oracle_matches_python_reference():
    import duckdb

    rng = random.Random(13)
    edges = _rand_edges(rng, n_nodes=30, n_edges=70)
    seeds = [2, 5]
    cte = "SELECT * FROM (VALUES {}) AS t(src, dst)".format(
        ", ".join(f"({a}, {b})" for a, b in edges)
    )
    sql = personalized_pagerank_oracle_sql(cte, seeds=seeds, iters=4)
    got = {int(n): int(r) for n, r in duckdb.sql(sql).fetchall()}
    assert got == _py_ppr(edges, seeds, iters=4)


# ---------------------------------------------------- assortativity


from obp_search_engine_spark.operators.graph import (  # noqa: E402
    degree_assortativity,
)


def _py_assort(edges):
    e = sorted({(a, b) for a, b in edges if a != b})
    outd, ind = {}, {}
    for a, b in e:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    xs = [(outd[a], ind[b]) for a, b in e]
    m = len(xs)
    sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs); syy = sum(y * y for _, y in xs)
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    if vx == 0 or vy == 0:
        return (m, 0.0)
    return (m, round((m * sxy - sx * sy) / (vx**0.5 * vy**0.5), 6))


@pytest.mark.parametrize("seed", [2, 44])
def test_assortativity_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    edges = _rand_edges(rng)
    r = degree_assortativity(_edges_df(spark, edges)).first()
    assert (r.m, r.r) == _py_assort(edges)


def test_assortativity_star_is_degenerate(spark):
    # star: every edge has the same (out, in) profile -> zero variance
    edges = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(_edges_df(spark, edges)).first()
    assert (r.m, r.r) == (5, 0.0)


def test_assortativity_partitioning_invariant(spark):
    rng = random.Random(10)
    edges = _rand_edges(rng)
    df = _edges_df(spark, edges)
    a = degree_assortativity(df.coalesce(1)).first()
    b = degree_assortativity(df.repartition(13)).first()
    assert (a.m, a.r) == (b.m, b.r)
