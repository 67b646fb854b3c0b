"""robots.txt parsing + allow/deny evaluation + host_state integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.functions.robots import (
    crawl_delay_col,
    disallowed,
    filter_robots_allowed,
    host_state_from_pages,
    parse_robots,
)
from obp_search_engine_spark.functions.urls import with_url_keys

ROBOTS = """
# comment
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""


def test_parse_robots():
    r = parse_robots(ROBOTS)
    assert "D:/private" in r and "A:/private/ok" in r and "CD:2.5" in r
    assert parse_robots(ROBOTS, user_agent="evilbot") == "D:/"
    assert parse_robots("") == ""
    assert parse_robots(None) == ""


def test_disallowed_oracle():
    r = parse_robots(ROBOTS)
    assert disallowed("/private/x", r) is True
    assert disallowed("/private/ok/x", r) is False  # longest prefix = allow
    assert disallowed("/public", r) is False
    assert disallowed("/", "D:/") is True
    assert disallowed("/anything", "") is False


def test_filter_robots_allowed_matches_oracle(spark):
    rules = parse_robots(ROBOTS)
    hs = spark.createDataFrame(
        [("a.x", 1, 2.5, None, rules), ("b.x", 2, 0.0, None, "")],
        "host string, host_hash int, crawl_delay double, next_allowed_ts timestamp, robots_rules string",
    )
    urls = [
        "http://a.x/private/x",
        "http://a.x/private/ok/y",
        "http://a.x/public",
        "http://a.x/",
        "http://b.x/private/x",  # no rules for b.x
        "http://c.x/anything",   # host not in host_state
    ]
    df = with_url_keys(spark.createDataFrame([(u,) for u in urls], "url string"))
    got = sorted(r.url for r in filter_robots_allowed(df, hs).collect())
    want = sorted(
        u
        for u in urls
        if not disallowed(
            "/" + u.split("/", 3)[3] if len(u.split("/", 3)) > 3 else "/",
            rules if "//a.x" in u else "",
        )
    )
    assert got == want
    assert "http://a.x/private/x" not in got
    assert "http://a.x/private/ok/y" in got


def test_host_state_from_pages(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.x/robots.txt", None, None, ROBOTS, "en"),
            ("http://a.x/page", None, None, "hello", "en"),
            ("http://b.x/robots.txt", None, None, "User-agent: *\nCrawl-delay: 7", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    hs = {r.host: (r.crawl_delay, r.robots_rules) for r in host_state_from_pages(spark, pages).collect()}
    assert hs["a.x"][0] == 2.5
    assert "D:/private" in hs["a.x"][1]
    assert hs["b.x"][0] == 7.0


def test_parse_robots_consecutive_ua_lines_form_one_group():
    """RFC 9309 §2.2.1: consecutive User-agent lines share the group's
    rules; a later User-agent line after rules starts a NEW group."""
    body = "User-agent: bot\nUser-agent: *\nDisallow: /p\n\nUser-agent: other\nDisallow: /q"
    assert parse_robots(body, user_agent="bot") == "D:/p"
    assert parse_robots(body, user_agent="*") == "D:/p"
    assert parse_robots(body, user_agent="other") == "D:/q"
    # a matching-but-ruleless group would NOT fall back to '*' (RFC),
    # but grouped agents share rules — 'bot' must see /p, not ''
    assert "D:/p" in parse_robots(body, user_agent="bot")


def test_host_state_one_row_per_host(spark):
    """Scheme twins / deeper /robots.txt paths must not fan out the robots
    join: exactly one host_state row per host (root robots only, lowest
    url wins deterministically)."""
    pages = spark.createDataFrame(
        [
            ("http://a.x/robots.txt", None, None, "User-agent: *\nDisallow: /p", "en"),
            ("https://a.x/robots.txt", None, None, "User-agent: *\nDisallow: /q", "en"),
            ("http://a.x/deep/robots.txt", None, None, "User-agent: *\nDisallow: /r", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = host_state_from_pages(spark, pages).collect()
    assert len(rows) == 1
    assert rows[0].host == "a.x"
    assert rows[0].robots_rules == "D:/p"  # http:// sorts before https://
