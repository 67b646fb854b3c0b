"""Frontier dequeue: budgets, politeness, salting, priority order, resume."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from obp_search_engine_spark.operators.checkpoint import latest_round, run_crawl
from obp_search_engine_spark.operators.crawl import init_frontier
from obp_search_engine_spark.operators.frontier import dequeue_wave
from obp_search_engine_spark.schemas import FRONTIER_SCHEMA
from obp_search_engine_spark.sources.pages import synth_pages_df


def _frontier(spark, rows):
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _row(url, host, depth=0, disc="2026-01-01 00:00:00", state="due"):
    import datetime as dt

    return (
        url,
        hash(url),
        host,
        abs(hash(host)) % (2**31),
        depth,
        dt.datetime.fromisoformat(disc),
        None,
        state,
    )


def test_per_host_budget_and_priority(spark):
    rows = [
        _row("http://a.x/1", "a.x", depth=0),
        _row("http://a.x/2", "a.x", depth=1),
        _row("http://a.x/3", "a.x", depth=2),
        _row("http://b.x/1", "b.x", depth=5),
        _row("http://b.x/2", "b.x", depth=0, state="done"),
    ]
    f = _frontier(spark, rows)
    wave = dequeue_wave(f, per_host_budget=2)
    got = sorted(r.url for r in wave.collect())
    # a.x: lowest-depth 2 of 3; b.x: only the due row
    assert got == ["http://a.x/1", "http://a.x/2", "http://b.x/1"]


def test_salted_budget_bounds_hot_host(spark):
    rows = [_row(f"http://hot.x/{i:03d}", "hot.x", depth=i) for i in range(40)]
    f = _frontier(spark, rows)
    wave = dequeue_wave(f, per_host_budget=8, hot_host_salts=4)
    n = wave.count()
    # ceil(8/4)=2 per salt partition, 4 salts => at most 8 total
    assert 0 < n <= 8


def test_salted_budget_exact_when_not_divisible(spark):
    """budget % n_salts != 0: the per-host total must still be EXACTLY the
    budget (the ceil-div per-salt quota alone would admit up to
    n_salts*ceil(budget/n_salts) = 12)."""
    rows = [_row(f"http://hot.x/{i:03d}", "hot.x", depth=i) for i in range(40)]
    rows += [_row(f"http://cold.x/{i}", "cold.x", depth=i) for i in range(3)]
    f = _frontier(spark, rows)
    wave = dequeue_wave(f, per_host_budget=10, hot_host_salts=3)
    per_host = {
        r.host: r.n
        for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host["hot.x"] == 10
    assert per_host["cold.x"] == 3


def test_politeness_clock_excludes_hot_host(spark):
    import datetime as dt

    rows = [_row("http://a.x/1", "a.x"), _row("http://b.x/1", "b.x")]
    f = _frontier(spark, rows)
    hs = spark.createDataFrame(
        [
            ("a.x", 1, 30.0, dt.datetime(2026, 6, 1, 0, 0, 30), None),
            ("b.x", 2, 0.0, dt.datetime(2026, 5, 31), None),
        ],
        "host string, host_hash int, crawl_delay double, next_allowed_ts timestamp, robots_rules string",
    )
    wave = dequeue_wave(f, host_state=hs, now="2026-06-01 00:00:00")
    assert [r.url for r in wave.collect()] == ["http://b.x/1"]


def test_resume_equals_uninterrupted(spark):
    """North-rule resumability: kill after round k, resume, final frontier
    equals the uninterrupted run's."""
    pages = synth_pages_df(spark, n_pages=400, n_hosts=8, seed=11).cache()
    seed_url = pages.orderBy("url").first().url

    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        full = run_crawl(spark, pages, seeds=[seed_url], rounds=4, ckpt_dir=d1)
        part = run_crawl(spark, pages, seeds=[seed_url], rounds=2, ckpt_dir=d2)
        assert latest_round(d2) == 2
        resumed = run_crawl(spark, pages, rounds=2, ckpt_dir=d2, resume=True)
        assert latest_round(d2) == 4

        a = {
            (r.url, r.depth, r.state)
            for r in full["frontier"].select("url", "depth", "state").collect()
        }
        b = {
            (r.url, r.depth, r.state)
            for r in resumed["frontier"].select("url", "depth", "state").collect()
        }
        assert a == b


def test_snapshot_manifest_lineage(spark):
    """North-rule per-partition lineage: every snapshot write leaves an
    Iceberg-style _MANIFEST.json whose per-file/per-shard row counts (read
    from parquet footers, no scan) reconcile with the live frontier."""
    import os

    from obp_search_engine_spark.operators.checkpoint import latest_round, read_manifest

    pages = synth_pages_df(spark, n_pages=400, n_hosts=8, seed=11).cache()
    seed_url = pages.orderBy("url").first().url
    with tempfile.TemporaryDirectory() as d:
        res = run_crawl(spark, pages, seeds=[seed_url], rounds=3, ckpt_dir=d)
        k = latest_round(d)
        man = read_manifest(os.path.join(d, f"round={k}", "frontier"))
        assert man is not None
        assert man["n_rows"] == res["frontier_size"]
        assert man["n_rows"] == sum(e["rows"] for e in man["files"])
        assert man["per_shard"], "snapshot must be shard-partitioned"
        assert man["n_rows"] == sum(s["rows"] for s in man["per_shard"].values())
        # every round committed a manifest, not just the last
        for r in range(1, k + 1):
            assert read_manifest(os.path.join(d, f"round={r}", "frontier"))


def test_resume_ignores_uncommitted_round(spark):
    """Crash safety: a round dir written but never committed to LATEST
    (simulating a crash mid-snapshot) is invisible to resume — the run
    continues from the last COMMITTED round and overwrites the orphan."""
    import os
    import shutil

    from obp_search_engine_spark.operators.checkpoint import latest_round

    pages = synth_pages_df(spark, n_pages=400, n_hosts=8, seed=11).cache()
    seed_url = pages.orderBy("url").first().url
    with tempfile.TemporaryDirectory() as d:
        run_crawl(spark, pages, seeds=[seed_url], rounds=2, ckpt_dir=d)
        assert latest_round(d) == 2
        # fake a crashed round 3: partial frontier dir, LATEST not bumped
        shutil.copytree(os.path.join(d, "round=2"), os.path.join(d, "round=3"))
        os.remove(os.path.join(d, "round=3", "frontier", "_MANIFEST.json"))
        assert latest_round(d) == 2
        res = run_crawl(spark, pages, rounds=2, ckpt_dir=d, resume=True)
        assert latest_round(d) == 4
        # the orphan was overwritten by the real round 3 and re-manifested
        assert os.path.exists(
            os.path.join(d, "round=3", "frontier", "_MANIFEST.json")
        )
        assert res["per_round"][0]["round"] == 3


def test_scale_crawl_matches_reference_seen_set(spark):
    """Scale mode visits every due row per round (no budget) — its seen set
    after k rounds equals the reference oracle's after k rounds, because
    discovery is a pure function of the visited set."""
    from obp_search_engine_spark.functions.extract import extract_links
    from obp_search_engine_spark.functions.urls import canonicalize_url
    from obp_search_engine_spark.operators.reference_oracle import reference_crawl

    pages = synth_pages_df(spark, n_pages=300, n_hosts=5, seed=3).cache()
    recs = [r.asDict() for r in pages.collect()]
    by_url = {r["url"]: extract_links(r["html"]) for r in recs}
    seeds = [recs[0]["url"]]

    res = run_crawl(spark, pages, seeds=seeds, rounds=3)
    got = {r.url for r in res["frontier"].select("url").collect()}

    # oracle: scale mode crawls each url once (BFS waves); after 3 waves the
    # discovered set equals BFS reachability within depth 3
    want = set(seeds)
    frontier_wave = set(seeds)
    for _ in range(3):
        nxt = set()
        for u in frontier_wave:
            for link in by_url.get(u, []):
                c = canonicalize_url(link)
                if c and c != u and c not in want:
                    nxt.add(c)
        want |= nxt
        frontier_wave = nxt
    assert got == want


def test_bloom_seen_crawl_equals_exact(spark):
    """use_bloom_seen must be RESULT-identical to the exact anti-join (bloom
    false positives fall back to the exact check; false negatives are
    impossible), only cheaper at scale."""
    pages = synth_pages_df(spark, n_pages=500, n_hosts=10, seed=5).cache()
    seed_url = pages.orderBy("url").first().url
    exact = run_crawl(spark, pages, seeds=[seed_url], rounds=4)
    bloom = run_crawl(spark, pages, seeds=[seed_url], rounds=4, use_bloom_seen=True)
    a = {
        (r.url, r.depth, r.state)
        for r in exact["frontier"].select("url", "depth", "state").collect()
    }
    b = {
        (r.url, r.depth, r.state)
        for r in bloom["frontier"].select("url", "depth", "state").collect()
    }
    assert a == b


def test_auto_bloom_escalation_equals_exact(spark):
    """use_bloom_seen='auto' starts on the exact anti-join and escalates to
    the sharded bloom probe once the frontier crosses bloom_auto_threshold
    (here set tiny so the switch happens mid-run); the final frontier must
    be identical to the pure-exact run."""
    pages = synth_pages_df(spark, n_pages=500, n_hosts=10, seed=5).cache()
    seed_url = pages.orderBy("url").first().url
    exact = run_crawl(spark, pages, seeds=[seed_url], rounds=4)
    auto = run_crawl(
        spark, pages, seeds=[seed_url], rounds=4,
        use_bloom_seen="auto", bloom_auto_threshold=3,
    )
    a = {
        (r.url, r.depth, r.state)
        for r in exact["frontier"].select("url", "depth", "state").collect()
    }
    b = {
        (r.url, r.depth, r.state)
        for r in auto["frontier"].select("url", "depth", "state").collect()
    }
    assert a == b


def test_priority_override_pagerank_ordering(spark):
    """dequeue_wave(priority=...) replaces depth-then-discovery with a
    caller ordering — here PageRank-desc with the default tiebreakers, the
    operators.graph integration: the high-rank deep url beats the shallow
    one inside a host budget."""
    rows = [
        _row("http://a.x/deep", "a.x", depth=9),
        _row("http://a.x/shallow", "a.x", depth=0),
        _row("http://a.x/mid", "a.x", depth=5),
    ]
    ranks = {"http://a.x/deep": 900, "http://a.x/shallow": 10, "http://a.x/mid": 500}
    f = _frontier(spark, rows).withColumn(
        "pr",
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in ranks.items() for x in kv]
            ),
            F.col("url"),
        ),
    )
    from obp_search_engine_spark.operators.frontier import priority_order

    wave = dequeue_wave(
        f, per_host_budget=2, priority=[F.col("pr").desc(), *priority_order()]
    )
    got = sorted(r.url for r in wave.collect())
    assert got == ["http://a.x/deep", "http://a.x/mid"]


def test_per_host_alloc_dataframe_budget(spark):
    """allocate_budget output feeds dequeue_wave directly: each host is
    dequeued min(due, alloc) urls, hosts without an allocation row get 0."""
    from obp_search_engine_spark.operators.scheduling import allocate_budget

    rows = (
        [_row(f"http://a.x/{i}", "a.x", depth=i) for i in range(6)]
        + [_row(f"http://b.x/{i}", "b.x", depth=i) for i in range(3)]
        + [_row("http://c.x/0", "c.x")]
    )
    f = _frontier(spark, rows)
    demands = f.groupBy("host").agg(F.count("*").alias("demand"))
    alloc = allocate_budget(demands, budget=5)  # forces saturation
    wave = dequeue_wave(f, per_host_budget=alloc)
    per_host = {
        r.host: r.n
        for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    alloc_map = {r.host: r.alloc for r in alloc.collect()}
    assert sum(per_host.values()) == 5  # exact global budget
    assert per_host == {h: a for h, a in alloc_map.items() if a > 0}
    # unlisted host => zero dequeued
    wave2 = dequeue_wave(
        f, per_host_budget=alloc.filter(F.col("host") != "a.x")
    )
    assert wave2.filter(F.col("host") == "a.x").count() == 0


def test_per_host_alloc_dataframe_budget_salted(spark):
    """Variable per-host budgets under hot-host salting: never over the
    allocation anywhere; exact for the mega-host whose queue fills every
    salt bucket past its quota (the host salting exists for)."""
    from obp_search_engine_spark.operators.scheduling import allocate_budget

    rows = [
        _row(f"http://hot.x/{i:03d}", "hot.x", depth=i) for i in range(40)
    ] + [_row(f"http://cold.x/{i}", "cold.x", depth=i) for i in range(4)]
    f = _frontier(spark, rows)
    demands = f.groupBy("host").agg(F.count("*").alias("demand"))
    alloc = allocate_budget(demands, budget=11)
    alloc_map = {r.host: r.alloc for r in alloc.collect()}
    wave = dequeue_wave(f, per_host_budget=alloc, hot_host_salts=4)
    per_host = {
        r.host: r.n
        for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host["hot.x"] == alloc_map["hot.x"]  # 40 rows >> quota: exact
    assert all(per_host[h] <= alloc_map[h] for h in per_host)  # never over
    # small-queue host may under-fill (rows hash into few salt buckets);
    # without salting the same allocation is exact
    exact = dequeue_wave(f, per_host_budget=alloc)
    got = {
        r.host: r.n
        for r in exact.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert got == {h: a for h, a in alloc_map.items() if a > 0}
    assert sum(got.values()) == 11


# --------------------------------------------------- makespan plan


from obp_search_engine_spark.operators.scheduling import (  # noqa: E402
    crawl_makespan_plan,
)


def _hosts_df(spark, rows):
    return spark.createDataFrame(
        rows, "host string, n_urls long, delay_ms long"
    )


def test_makespan_critical_host(spark):
    # h1: 100 urls * 1000ms = 100000 serial floor; total work 103000;
    # with 64 fetchers ceil(total/64) = 1610 -> h1 binds
    rows = [("h1", 100, 1000), ("h2", 30, 100)]
    got = {
        r.host: (r.host_ms, r.work_share_ppm, bool(r.on_critical_path))
        for r in crawl_makespan_plan(
            _hosts_df(spark, rows), n_fetchers=64
        ).collect()
    }
    assert got["h1"] == (100000, 970873, True)
    assert got["h2"] == (3000, 29126, False)


def test_makespan_fleet_bound_no_critical_host(spark):
    # equal small hosts, tiny fleet: ceil(total/n) exceeds every host
    rows = [(f"h{i}", 10, 100) for i in range(8)]  # each 1000, total 8000
    got = crawl_makespan_plan(
        _hosts_df(spark, rows), n_fetchers=2
    ).collect()
    # makespan = max(1000, 4000) = 4000 -> nobody's serial floor equals it
    assert not any(r.on_critical_path for r in got)


def test_makespan_validates_fleet(spark):
    import pytest

    with pytest.raises(ValueError):
        crawl_makespan_plan(_hosts_df(spark, [("h", 1, 1)]), n_fetchers=0)
