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


def test_resume_restores_host_state(spark):
    """Killing after round 2 and resuming WITHOUT re-passing host_state must
    behave exactly like the uninterrupted run: the resume branch reloads the
    host_state snapshot (clocks + robots rules), so crawl-delay gating and
    robots filtering survive the restart."""
    import tempfile

    pages = _pages(spark).cache()
    hs = host_state_from_pages(spark, pages)
    seeds = ["http://slow.x/a", "http://fast.x/a"]

    full = run_crawl(
        spark, pages, seeds=seeds, rounds=6, host_state=hs,
        stop_when_exhausted=False,
    )
    want = {
        (r.url, r.state)
        for r in full["frontier"].select("url", "state").collect()
    }

    with tempfile.TemporaryDirectory() as d:
        run_crawl(
            spark, pages, seeds=seeds, rounds=2, host_state=hs,
            ckpt_dir=d, stop_when_exhausted=False,
        )
        resumed = run_crawl(
            spark, pages, rounds=4, ckpt_dir=d, resume=True,
            stop_when_exhausted=False,
        )
        got = {
            (r.url, r.state)
            for r in resumed["frontier"].select("url", "state").collect()
        }
    assert got == want
    # the robots-disallowed url must still be absent after the resume
    assert not any(u == "http://slow.x/private/p" for u, _ in got)


def test_null_html_page_marked_failed(spark):
    """A pages row with NULL html is an unreachable node (reference F2):
    it must come out of the round 'failed', not 'done', and contribute no
    links/documents."""
    import datetime as dt

    from obp_search_engine_spark.schemas import PAGES_SCHEMA

    rows = [
        ("http://h.x/a", dt.datetime(2026, 1, 1),
         b'<a href="http://h.x/dead">d</a><a href="http://h.x/b">b</a>', None, "en"),
        ("http://h.x/b", dt.datetime(2026, 1, 1), b"<p>ok</p>", None, "en"),
        ("http://h.x/dead", dt.datetime(2026, 1, 1), None, None, "en"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    res = run_crawl(spark, pages, seeds=["http://h.x/a"], rounds=3)
    states = {r.url: r.state for r in res["frontier"].collect()}
    assert states["http://h.x/a"] == "done"
    assert states["http://h.x/b"] == "done"
    assert states["http://h.x/dead"] == "failed"
