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
