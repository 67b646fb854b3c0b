"""Politeness end-to-end: crawl-delay clocks gate hosts across rounds;
robots disallow keeps urls out of the frontier. Logical time = 1 second per
round (round_ts = epoch + round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from obp_search_engine_spark.functions.robots import host_state_from_pages
from obp_search_engine_spark.operators.checkpoint import run_crawl
from obp_search_engine_spark.schemas import PAGES_SCHEMA


def _pages(spark):
    import datetime as dt

    rows = []

    def page(url, links, robots=None):
        if robots is not None:
            html, text = None, robots
        else:
            html = ("".join(f'<a href="{l}">x</a>' for l in links) + "<p>b</p>").encode()
            text = None
        rows.append((url, dt.datetime(2026, 1, 1), html, text, "en"))

    # slow.x has crawl-delay 3 (logical seconds = rounds); fast.x none.
    page("http://slow.x/robots.txt", [], robots="User-agent: *\nCrawl-delay: 3\nDisallow: /private")
    page("http://slow.x/a", ["http://slow.x/b", "http://slow.x/private/p", "http://fast.x/a"])
    page("http://slow.x/b", ["http://slow.x/c"])
    page("http://slow.x/c", [])
    page("http://slow.x/private/p", [])
    page("http://fast.x/a", ["http://fast.x/b"])
    page("http://fast.x/b", ["http://fast.x/c"])
    page("http://fast.x/c", [])
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_crawl_delay_gates_host_and_robots_excludes(spark):
    pages = _pages(spark).cache()
    hs = host_state_from_pages(spark, pages).cache()
    assert {r.host: r.crawl_delay for r in hs.collect()} == {"slow.x": 3.0}

    res = run_crawl(
        spark,
        pages,
        seeds=["http://slow.x/a", "http://fast.x/a"],
        rounds=6,
        host_state=hs,
        stop_when_exhausted=False,
    )
    f = res["frontier"]
    rows = {r.url: r for r in f.collect()}

    # robots: the disallowed url never entered the frontier
    assert "http://slow.x/private/p" not in rows
    # fast.x chain fully crawled
    for u in ("http://fast.x/a", "http://fast.x/b", "http://fast.x/c"):
        assert rows[u].state == "done", u
    # slow.x: crawl-delay 3 with 6 rounds allows at most 2 slow.x waves
    # (rounds 1 and >=4): a -> b discovered; b crawled on the second allowed
    # wave; c discovered but still due
    assert rows["http://slow.x/a"].state == "done"
    assert rows["http://slow.x/b"].state == "done"
    assert rows["http://slow.x/c"].state == "due"
    # visit timestamps respect the delay: b crawled >= 3 logical seconds
    # after a
    gap = (rows["http://slow.x/b"].last_crawled - rows["http://slow.x/a"].last_crawled).total_seconds()
    assert gap >= 3, gap
