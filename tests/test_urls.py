"""URL canonicalization + hashing (SURVEY.md §2.8 X12)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from obp_search_engine_spark.functions.urls import (
    canonicalize_udf,
    canonicalize_url,
    with_url_keys,
)

CASES = [
    ("http://Example.COM/a/b", "http://example.com/a/b"),
    ("HTTP://example.com", "http://example.com/"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com/a/../b", "http://example.com/b"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/b/..", "http://example.com/a/"),
    ("http://example.com/p#frag", "http://example.com/p"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?b=2&a=1"),  # query kept verbatim
    ("http://example.com/p?", "http://example.com/p"),
    ("  http://example.com/sp  ", "http://example.com/sp"),
    ("not a url", None),
    ("/relative/only", None),
    ("", None),
    (None, None),
    ("ftp://files.example.com/f", "ftp://files.example.com/f"),
]


def test_canonicalize_pure():
    for raw, want in CASES:
        assert canonicalize_url(raw) == want, raw


def test_canonicalize_idempotent():
    for raw, want in CASES:
        if want is not None:
            assert canonicalize_url(want) == want


def test_canonicalize_udf_matches_pure(spark):
    raws = [c[0] for c in CASES]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = df.select(canonicalize_udf("url").alias("c")).toPandas()["c"]
    want = pd.Series([c[1] for c in CASES], name="c")
    assert list(got.where(got.notna(), None)) == list(want.where(want.notna(), None))


def test_udf_fast_path_covers_canonical_urls(spark):
    # urls that are already canonical must come back unchanged
    urls = [f"http://host{i}.example/p/{i}" for i in range(50)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(canonicalize_udf("url").alias("c")).collect()]
    assert got == urls


def test_with_url_keys(spark):
    df = spark.createDataFrame([("http://example.com/a",)], "url string")
    row = with_url_keys(df).first()
    assert row.host == "example.com"
    assert isinstance(row.url_hash, int)
    assert 0 <= row.host_hash < 2**31
    # hash is the JVM xxhash64 of the url string — stable across runs
    again = with_url_keys(df).first()
    assert row.url_hash == again.url_hash


def test_url_keys_jvm_side(spark):
    # host/hash derivation must not appear as a Python UDF in the plan
    df = with_url_keys(spark.createDataFrame([("http://x.example/",)], "url string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
