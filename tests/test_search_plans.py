"""Reference search-surface plans over engine-domain tables (SURVEY §3.2/3.3),
including the documented quirks in strict vs fixed fidelity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.plans.search import (
    ban_ratio_decision,
    search_listings,
    top_tags,
    user_agent_histogram,
)

NOW = "2026-06-01 12:00:00"


@pytest.fixture(scope="module")
def domain(spark):
    docs = spark.createDataFrame(
        [
            # url, peer_id, title, text, tags, nsfw, blocked, testnet, avg_rating, is_blocked
            ("http://a.x/1", "p1", "blue widget", "a fine blue widget", ["tools", "blue"], False, False, False, 4.8, None),
            ("http://a.x/2", "p1", "red hammer", "heavy red hammer", ["tools"], False, False, False, 3.5, True),
            ("http://b.x/1", "p2", "green gadget", "a green gadget", ["gadgets", "green"], False, False, False, 4.9, None),
            ("http://b.x/2", "p2", "nsfw thing", "very nsfw", ["adult"], True, False, False, 2.0, None),
            ("http://c.x/1", "p3", "blocked item", "should not appear", ["x"], False, True, False, 5.0, True),
            ("http://d.x/1", "p4", "stale node item", "from stale node", ["y"], False, False, False, 4.0, None),
        ],
        "url string, peer_id string, title string, text string, tags array<string>, "
        "nsfw boolean, blocked boolean, testnet boolean, avg_rating double, is_blocked boolean",
    )
    nodes = spark.createDataFrame(
        [
            ("p1", dt.datetime(2026, 6, 1, 11, 0), True, False, "agent/1.0"),
            ("p2", dt.datetime(2026, 6, 1, 10, 0), True, False, "agent/2.0"),
            ("p3", dt.datetime(2026, 6, 1, 11, 0), True, False, "agent/1.0"),
            ("p4", dt.datetime(2026, 5, 20, 0, 0), True, False, "agent/1.0"),  # stale
        ],
        "peer_id string, last_crawled timestamp, listed boolean, node_blocked boolean, user_agent string",
    )
    mods = spark.createDataFrame(
        [("p1", "m1"), ("p1", "m2"), ("p2", "m1")],
        "peer_id string, moderator_id string",
    )
    return docs, nodes, mods


def test_search_base_filters_and_freshness(domain):
    docs, nodes, mods = domain
    got = search_listings(docs, nodes, mods, now=NOW)
    urls = sorted(r.url for r in got.collect())
    # blocked item gone (F4), nsfw gone (F4), stale node p4 gone (F7)
    assert urls == ["http://a.x/1", "http://a.x/2", "http://b.x/1"]


def test_keyword_replaces_base_where_strict_quirk(domain):
    docs, nodes, mods = domain
    # strict: q present -> base where REPLACED, so the nsfw row matches 'nsfw'
    strict = search_listings(docs, nodes, q="nsfw", now=NOW, fidelity="strict")
    assert [r.url for r in strict.collect()] == ["http://b.x/2"]
    # fixed: base filters kept -> nsfw row excluded
    fixed = search_listings(docs, nodes, q="nsfw", now=NOW, fidelity="fixed")
    assert fixed.count() == 0


def test_rating_bucket_and_moderators(domain):
    docs, nodes, mods = domain
    got = search_listings(docs, nodes, mods, rating=5, now=NOW).collect()
    assert sorted(r.url for r in got) == ["http://a.x/1", "http://b.x/1"]
    by_url = {r.url: r.moderators for r in got}
    assert by_url["http://a.x/1"] == ["m1", "m2"]
    assert by_url["http://b.x/1"] == ["m1"]


def test_pagination_deterministic(domain):
    docs, nodes, mods = domain
    p0 = search_listings(docs, nodes, sort_by="avg_rating", ascending=False, page=0, page_size=2, now=NOW)
    p1 = search_listings(docs, nodes, sort_by="avg_rating", ascending=False, page=1, page_size=2, now=NOW)
    assert [r.url for r in p0.collect()] == ["http://b.x/1", "http://a.x/1"]
    assert [r.url for r in p1.collect()] == ["http://a.x/2"]


def test_top_tags_capitalization(domain):
    docs, nodes, _ = domain
    got = top_tags(docs, nodes, k=3, now=NOW).collect()
    # no nsfw/blocked filter in the reference's tag scan (tagsCache.js:59-70
    # joins items only to fresh nodes) -> 'Adult' counts; ties break by tag
    assert [(r.tag, r.cnt) for r in got] == [("Tools", 2), ("Adult", 1), ("Blue", 1)]


def test_top_tags_strict_overlap_quirk(spark):
    """strict fidelity == a literal simulation of the reference's paging
    loop (offset=batch*page, limit=batch*(page+1), tagsCache.js:78-79)."""
    import collections

    n, b = 23, 4
    rows = [(f"http://x/{i:03d}", [f"t{i % 5}"]) for i in range(n)]
    df = spark.createDataFrame(rows, "url string, tags array<string>")

    # literal reference loop
    want = collections.Counter()
    page = 0
    while page * b < n:
        for _, tags in rows[page * b : page * b + b * (page + 1)]:
            for t in tags:
                want[t.capitalize()] += 1
        page += 1

    got = {
        r.tag: r.cnt
        for r in top_tags(df, k=100, fidelity="strict", batch=b).collect()
    }
    assert got == dict(want)
    # and the overlap really double-counts (total > n)
    assert sum(got.values()) > n


def test_user_agent_histogram(domain):
    _, nodes, _ = domain
    got = user_agent_histogram(nodes).collect()
    assert [(r.user_agent, r.cnt) for r in got] == [("agent/2.0", 1), ("agent/1.0", 3)]


def test_ban_ratio_strict_vs_fixed(domain, spark):
    docs, _, _ = domain
    strict = {r.peer_id: r.decision for r in ban_ratio_decision(docs).collect()}
    # p1 has 1 flagged of 2 -> strict ratio = 2/1 = 2 > 0.5 -> ban
    assert strict["p1"] == "ban"
    # comparisons are STRICT (crawler.go:125-134 uses < and >), so the
    # boundary ratio banned/items = 1/2 = 0.5 in fixed mode is NOT a ban
    fixed = {r.peer_id: r.decision for r in ban_ratio_decision(docs, fidelity="fixed").collect()}
    assert fixed["p1"] == "review"


def test_keyword_whitespace_only_matches_all(domain):
    """q=' ' must not crash (reduce over zero words) and mirrors the
    reference's empty-word LIKE '%%' match-everything behavior."""
    from obp_search_engine_spark.plans.search import keyword_predicate

    docs, _nodes, _mods = domain
    assert docs.filter(keyword_predicate("  ")).count() == docs.count()


def test_ban_ratio_all_null_group_allows(spark):
    """A peer whose is_blocked values are all NULL (never classified) has
    bannedCnt 0 and must be listed -> 'allow' (crawler.go:125-134), not a
    NULL-poisoned 'review'."""
    from obp_search_engine_spark.plans.search import ban_ratio_decision

    d = spark.createDataFrame(
        [("p1", None), ("p1", None), ("p2", True), ("p2", False)],
        "peer_id string, is_blocked boolean",
    )
    got = {r.peer_id: r.decision for r in ban_ratio_decision(d).collect()}
    assert got["p1"] == "allow"
    assert got["p2"] == "ban"  # strict: items/banned = 2/1 = 2 > 0.5


def test_rollup_subtotals_consistent(spark):
    """ROLLUP invariants on a random frame: per-type subtotal equals the
    sum of its cells, the grand total equals the frame size, and the
    whole result matches an itertools-built Python reference."""
    import random

    rng = random.Random(6)
    rows = [
        (rng.choice("abc"), rng.randrange(3), round(rng.uniform(0, 9), 2))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_bucket int, value double")
    got = {
        (r.event_type, r.user_bucket): (r.n, r.sum_value)
        for r in (
            df.rollup("event_type", "user_bucket")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .select(
                F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
                F.coalesce("user_bucket", F.lit(-1)).alias("user_bucket"),
                "n",
                "sum_value",
            )
            .collect()
        )
    }
    from decimal import Decimal

    ref = {}
    for t, b, v in rows:
        for key in [(t, b), (t, -1), ("(all)", -1)]:
            n, s = ref.get(key, (0, Decimal(0)))
            ref[key] = (n + 1, s + Decimal(str(v)))
    assert got == {k: (n, float(s)) for k, (n, s) in ref.items()}


def test_pivot_rows_sum_to_group_counts(spark):
    import random

    rng = random.Random(8)
    types = ["click", "view", "error"]
    rows = [(rng.randrange(4), rng.choice(types[: rng.randrange(1, 4)])) for _ in range(150)]
    df = spark.createDataFrame(rows, "user_bucket int, event_type string")
    piv = (
        df.groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .collect()
    )
    totals = {r.user_bucket: r.n for r in df.groupBy("user_bucket").agg(F.count("*").alias("n")).collect()}
    for r in piv:
        assert r.click + r.view + r.error == totals[r.user_bucket]
    ref = {}
    for b, t in rows:
        ref[(b, t)] = ref.get((b, t), 0) + 1
    for r in piv:
        for t in types:
            assert getattr(r, t) == ref.get((r.user_bucket, t), 0)


def test_exact_percentile_matches_numpy(spark):
    """Spark percentile() == numpy's linear-interpolation quantile (the
    rank-p*(n-1) definition DuckDB quantile_cont also uses)."""
    import numpy as np
    import random

    rng = random.Random(11)
    rows = [(rng.choice("xy"), float(rng.randrange(1000))) for _ in range(333)]
    df = spark.createDataFrame(rows, "lang string, n double")
    got = {
        r.lang: (r.p50, r.p90)
        for r in df.groupBy("lang")
        .agg(
            F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("n", F.lit(0.9)), 6).alias("p90"),
        )
        .collect()
    }
    for lang in "xy":
        vals = np.array([n for l, n in rows if l == lang])
        assert got[lang] == (
            round(float(np.quantile(vals, 0.5)), 6),
            round(float(np.quantile(vals, 0.9)), 6),
        )
