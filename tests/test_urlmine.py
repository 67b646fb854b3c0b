"""URL path-template mining: template extraction edges, pure-Python
parity on randomized URLs, the trap filter, and DuckDB oracle
agreement."""

from __future__ import annotations

import hashlib
import random
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.urlmine import (
    trap_templates,
    url_template_counts,
    url_template_oracle_sql,
)


def _py_template(url):
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)([/][^?#]*)?", url.lower())
    host = m.group(1) if m else ""
    path = m.group(2) or "" if m else ""
    t = re.sub(r"[0-9a-f]{8,}", "{h}", path)
    t = re.sub(r"[0-9]+", "{n}", t)
    return host, t if t else "/"


def _py_counts(urls):
    seen = defaultdict(set)
    for u in urls:
        seen[_py_template(u)].add(u)
    return {(h, t, len(s)) for (h, t), s in seen.items()}


def _rand_urls(rng, n=300):
    urls = []
    for _ in range(n):
        host = f"h{rng.randint(0, 4)}.example"
        kind = rng.randint(0, 4)
        if kind == 0:
            u = f"http://{host}/article/{rng.randint(1, 99999)}"
        elif kind == 1:
            u = f"http://{host}/item/{hashlib.md5(str(rng.random()).encode()).hexdigest()[:12]}"
        elif kind == 2:
            u = (f"http://{host}/cal/{rng.randint(1, 12)}/{rng.randint(1, 28)}"
                 f"?sess={hashlib.md5(str(rng.random()).encode()).hexdigest()}")
        elif kind == 3:
            u = f"HTTP://{host.upper()}/About"
        else:
            u = f"http://{host}"  # no path at all
        urls.append(u)
    return urls


@pytest.mark.parametrize("seed", [9, 61])
def test_template_counts_match_python_reference(spark, seed):
    urls = _rand_urls(random.Random(seed))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r.host, r.template, r.n_urls)
        for r in url_template_counts(df).collect()
    }
    assert got == _py_counts(urls)


def test_template_edges(spark):
    rows = [
        ("http://a.example/cal/2026/08?sess=deadbeefcafe1234",),
        ("http://a.example/item/0123456789ab",),   # hex wins over digits
        ("http://a.example/short/1a2b",),          # <8 hex chars: digits only
        ("https://B.EXAMPLE",),                    # no path -> '/'
        ("http://a.example/about#frag",),          # fragment stripped
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {(r.host, r.template) for r in url_template_counts(df).collect()}
    assert got == {
        ("a.example", "/cal/{n}/{n}"),
        ("a.example", "/item/{h}"),
        ("a.example", "/short/{n}a{n}b"),
        ("b.example", "/"),
        ("a.example", "/about"),
    }


def test_trap_templates_threshold(spark):
    urls = [f"http://t.example/cal/{i}/{j}" for i in range(12) for j in range(10)]
    urls += [f"http://t.example/p{k}" for k in range(3)]  # distinct templates
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    counts = url_template_counts(df)
    traps = trap_templates(counts, min_urls=100, min_share_pct=50)
    got = [(r.template, r.n_urls, r.host_urls) for r in traps.collect()]
    assert got == [("/cal/{n}/{n}", 120, 123)]
    # share gate: same template under 50% of a bigger frontier is kept out
    assert (
        trap_templates(counts, min_urls=100, min_share_pct=99).count() == 0
    )


def test_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    urls = _rand_urls(random.Random(17), n=250)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = sorted(
        (r.host, r.template, r.n_urls)
        for r in url_template_counts(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE urls(url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(u,) for u in urls])
    sql = url_template_oracle_sql("SELECT url FROM urls")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


# ---------------------------------------------------------------------------
# DUST (Bar-Yossef et al. 2006)
# ---------------------------------------------------------------------------
def test_dust_pair_rule_classification(spark):
    from obp_search_engine_spark.operators.urlmine import dust_url_pairs

    rows = [
        ("http://a.com/x", "f1"),
        ("http://a.com/x?sess=123", "f1"),  # strip_query vs canonical
        ("http://a.com/y", "f2"),
        ("http://a.com/y/", "f2"),  # trailing_slash
        ("http://a.com/z/", "f3"),
        ("http://a.com/z/index.html", "f3"),  # index_file
        ("http://a.com/p", "f4"),
        ("http://a.com/q", "f4"),  # unrelated paths -> other
        ("http://b.com/x", "f1"),  # same fp, DIFFERENT host: never pairs
        ("http://a.com/solo", "f9"),  # singleton group: no pair
    ]
    df = spark.createDataFrame(rows, "url string, fp string")
    got = {
        (r.url_a, r.url_b): r.rule for r in dust_url_pairs(df).collect()
    }
    assert got == {
        ("http://a.com/x", "http://a.com/x?sess=123"): "strip_query",
        ("http://a.com/y", "http://a.com/y/"): "trailing_slash",
        ("http://a.com/z/", "http://a.com/z/index.html"): "index_file",
        ("http://a.com/p", "http://a.com/q"): "other",
    }


def test_dust_rules_support_and_group_cap(spark):
    from obp_search_engine_spark.operators.urlmine import dust_rules

    rows = []
    # 3 strip_query alias pairs on host a (support 3)
    for i in range(3):
        rows += [
            (f"http://a.com/p{i}", f"g{i}"),
            (f"http://a.com/p{i}?s=1", f"g{i}"),
        ]
    # one trailing_slash pair (support 1 < min_support=2: filtered)
    rows += [("http://a.com/t", "h"), ("http://a.com/t/", "h")]
    # an oversized alias group (cap 4): amputated entirely
    rows += [(f"http://a.com/big{j}", "bigfp") for j in range(6)]
    df = spark.createDataFrame(rows, "url string, fp string")
    got = {
        (r.host, r.rule): r.n_pairs
        for r in dust_rules(df, max_group=4, min_support=2).collect()
    }
    assert got == {("a.com", "strip_query"): 3}




# ------------------------------------------- sitemap coverage audit


from obp_search_engine_spark.operators.urlmine import (  # noqa: E402
    sitemap_coverage_audit,
)


def _hu_df(spark, rows):
    return spark.createDataFrame(rows, "host string, url string")


def test_coverage_hand_case(spark):
    listed = _hu_df(
        spark, [("h1", "a"), ("h1", "b"), ("h1", "c"), ("h2", "x")]
    )
    crawled = _hu_df(
        spark, [("h1", "a"), ("h1", "b"), ("h1", "z"), ("h3", "q")]
    )
    got = {
        r.host: (r.n_listed, r.n_crawled_listed, r.n_orphans, r.coverage_pct)
        for r in sitemap_coverage_audit(listed, crawled).collect()
    }
    assert got == {
        "h1": (3, 2, 1, 66),
        "h2": (1, 0, 0, 0),
        "h3": (0, 0, 1, 0),
    }


def test_coverage_dedup_inputs(spark):
    listed = _hu_df(spark, [("h", "a"), ("h", "a")])
    crawled = _hu_df(spark, [("h", "a"), ("h", "a")])
    r = sitemap_coverage_audit(listed, crawled).first()
    assert (r.n_listed, r.n_crawled_listed, r.n_orphans, r.coverage_pct) == (
        1,
        1,
        0,
        100,
    )


def test_coverage_partitioning_invariant(spark):
    import random

    rng = random.Random(5)
    listed = _hu_df(
        spark,
        [(f"h{rng.randrange(4)}", f"u{rng.randrange(50)}") for _ in range(80)],
    )
    crawled = _hu_df(
        spark,
        [(f"h{rng.randrange(4)}", f"u{rng.randrange(60)}") for _ in range(80)],
    )
    a = sorted(
        map(
            tuple,
            sitemap_coverage_audit(
                listed.coalesce(1), crawled.coalesce(1)
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sitemap_coverage_audit(
                listed.repartition(7), crawled.repartition(9)
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------- front coding


from obp_search_engine_spark.operators.urlmine import url_front_coding  # noqa: E402


def _py_front_code(urls, block=8):
    us = sorted(set(urls))
    out = {}
    for i, u in enumerate(us):
        b, pos = divmod(i, block)
        raw = len(u)
        if pos == 0:
            cost = raw
        else:
            prev = us[i - 1]
            lcp = 0
            for a, c in zip(u, prev):
                if a != c:
                    break
                lcp += 1
            cost = 2 + raw - lcp
        nb, rb, cb = out.get(b, (0, 0, 0))
        out[b] = (nb + 1, rb + raw, cb + cost)
    return {
        b: (n, r, c, round(c / r, 6)) for b, (n, r, c) in out.items()
    }


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_front_coding_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    urls = [
        f"https://h{rng.randrange(3)}.example/p{rng.randrange(4)}/"
        f"s{rng.randrange(5)}/{rng.randrange(1000)}"
        for _ in range(100)
    ]
    got = {
        r.block_id: (r.n_urls, r.raw_bytes, r.coded_bytes, r.ratio)
        for r in url_front_coding(_urls_df(spark, urls)).collect()
    }
    assert got == _py_front_code(urls)


def test_front_coding_shared_prefixes_compress(spark):
    urls = [f"https://same.host/path/{i:04d}" for i in range(16)]
    rows = url_front_coding(_urls_df(spark, urls), block=8).collect()
    assert all(r.ratio < 0.5 for r in rows)


def test_front_coding_block_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        url_front_coding(_urls_df(spark, ["a"]), block=1)
