"""Batch-2 structural operators: k-core peeling, reciprocity, rendezvous
shard assignment, df-band index pruning, sitemap <loc> extraction."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.graph import kcore_nodes, reciprocity
from obp_search_engine_spark.operators.ranking import prune_index_by_df
from obp_search_engine_spark.operators.scheduling import rendezvous_assign
from obp_search_engine_spark.operators.urlmine import sitemap_loc_urls


def _py_kcore(edges, k, peels):
    g = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(peels):
        deg = {}
        for a, b in g:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        g = {(a, b) for a, b in g if a in keep and b in keep}
    deg = {}
    for a, b in g:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {v: d for v, d in deg.items() if d >= k}


@pytest.mark.parametrize("seed", [2, 19])
def test_kcore_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.degree for r in kcore_nodes(df, k=3, peels=4).collect()}
    assert got == _py_kcore(edges, k=3, peels=4)


def test_kcore_peels_pendant_chain(spark):
    # triangle {0,1,2} with a pendant chain 2-3-4: chain peels away at
    # k=2, the triangle survives with degree 2 each
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.degree for r in kcore_nodes(df, k=2, peels=3).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_reciprocity_counts_backlinks(spark):
    # 0->1 and 1->0 reciprocated; 0->2 one-way; 2->1 one-way
    edges = [(0, 1), (1, 0), (0, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.n_out, r.n_recip, r.recip_milli)
        for r in reciprocity(df).collect()
    }
    assert got == {0: (2, 1, 500), 1: (1, 1, 1000), 2: (1, 0, 0)}


def test_rendezvous_minimal_movement_on_reshard(spark):
    """The property rendezvous hashing exists for: growing 8 -> 9 shards
    must move keys ONLY to the new shard, never between old shards."""
    d = spark.range(500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.shard for r in rendezvous_assign(d, 8).collect()}
    b = {r.doc_id: r.shard for r in rendezvous_assign(d, 9).collect()}
    moved = {k for k in a if a[k] != b[k]}
    assert all(b[k] == 8 for k in moved)
    # ~1/9 of keys move; allow generous slack around 500/9 ~ 56
    assert 20 <= len(moved) <= 110
    # partitioning-invariant
    c = {
        r.doc_id: r.shard
        for r in rendezvous_assign(d.repartition(13), 8).collect()
    }
    assert c == a


def test_rendezvous_balances_roughly(spark):
    d = spark.range(1600).withColumnRenamed("id", "doc_id")
    counts = (
        rendezvous_assign(d, 16).groupBy("shard").count().collect()
    )
    assert len(counts) == 16
    per = [r["count"] for r in counts]
    assert min(per) > 50 and max(per) < 180  # 100 expected


def test_prune_index_df_band(spark):
    # 10 docs: 'common' in all 10 (df 100% > 20% cap, dropped),
    # 'hapax' once (df 1 < min_df 2, dropped), 'mid' in 2 docs (kept)
    texts = [
        "common mid alpha", "common mid beta",
        *[f"common w{i}" for i in range(8)],
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    kept = {
        r.term: (r.df_docs, r.postings)
        for r in prune_index_by_df(d, max_df_pct=20, min_df=2).collect()
    }
    assert kept == {"mid": (2, "0:1,1:1")}


def test_sitemap_extracts_locs_in_order(spark):
    sm = spark.createDataFrame(
        [
            (
                "h1",
                "<urlset><url><loc>https://h1/a</loc></url>"
                "<url><loc>https://h1/b</loc></url></urlset>",
            ),
            ("h2", "<urlset><url><priority>1</priority></url></urlset>"),
        ],
        "host string, xml string",
    )
    got = [
        (r.host, r.url, r.pos)
        for r in sitemap_loc_urls(sm).orderBy("host", "pos").collect()
    ]
    assert got == [("h1", "https://h1/a", 1), ("h1", "https://h1/b", 2)]


def test_normalize_text_rules(spark):
    from obp_search_engine_spark.functions.textstats import normalize_text_col

    d = spark.createDataFrame(
        [
            (0, "auto-\nmatic  dehyphen-\r\n  ation"),
            (1, "bell\x07and\x00nul"),
            (2, "  runs \t of\n\n whitespace  "),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.c
        for r in d.select(
            "doc_id", normalize_text_col(F.col("text")).alias("c")
        ).collect()
    }
    assert got == {
        0: "automatic dehyphenation",
        1: "bell and nul",
        2: "runs of whitespace",
    }


def test_registrable_domain_psl_lite(spark):
    from obp_search_engine_spark.operators.urlmine import registrable_domain_col

    d = spark.createDataFrame(
        [
            (0, "www.example.co.uk"),
            (1, "a.b.example.com"),
            (2, "example.com"),
            (3, "user.github.io"),
            (4, "localhost"),
            (5, "CDN.Example.COM.AU"),
        ],
        "i long, host string",
    )
    got = {
        r.i: r.d
        for r in d.select(
            "i", registrable_domain_col(F.col("host")).alias("d")
        ).collect()
    }
    assert got == {
        0: "example.co.uk",
        1: "example.com",
        2: "example.com",
        3: "user.github.io",
        4: "localhost",
        5: "example.com.au",
    }


def _py_ktruss(edges, k, peels):
    g = {tuple(sorted(e)) for e in edges if e[0] != e[1]}

    def support(g):
        adj = {}
        for a, b in g:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {
            (a, b): len(adj[a] & adj[b]) for a, b in g
        }

    for _ in range(peels):
        s = support(g)
        g = {e for e in g if s[e] >= k - 2}
    s = support(g)
    return {e: c for e, c in s.items() if c >= k - 2}


def test_ktruss_clique_triangle_pendant(spark):
    from obp_search_engine_spark.operators.graph import ktruss_edges

    # 4-clique {1..4} (every edge in 2 triangles), pendant triangle
    # {4,5,6} (support 1 each), dangling edge (6,7) (support 0)
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (4, 6), (5, 6), (6, 7),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    # k=3 (sup >= 1): dangling edge peels, clique + triangle survive
    got3 = {(r.a, r.b): r.sup for r in ktruss_edges(df, k=3, peels=2).collect()}
    assert got3 == {
        (1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2,
        (4, 5): 1, (4, 6): 1, (5, 6): 1,
    }
    # k=4 (sup >= 2): only the clique's edges survive
    got4 = {(r.a, r.b): r.sup for r in ktruss_edges(df, k=4, peels=2).collect()}
    assert got4 == {
        (1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2,
    }
    # k=5 (sup >= 3): nothing survives
    assert ktruss_edges(df, k=5, peels=2).count() == 0
    # k < 3 rejected
    with pytest.raises(ValueError):
        ktruss_edges(df, k=2)


@pytest.mark.parametrize("seed", [5, 23])
def test_ktruss_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.graph import ktruss_edges

    rng = random.Random(seed)
    edges = [(rng.randrange(24), rng.randrange(24)) for _ in range(140)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b): r.sup for r in ktruss_edges(df, k=4, peels=3).collect()}
    assert got == _py_ktruss(edges, k=4, peels=3)
