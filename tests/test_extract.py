"""Link + text extraction UDFs; byte-identical invariant (FIXTURES.md §7.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from obp_search_engine_spark.functions.extract import (
    extract_links,
    extract_links_udf,
    extract_text,
    extract_text_udf,
)
from obp_search_engine_spark.sources.pages import (
    mock4_pages_df,
    synth_pages_df,
)


def test_extract_links_pure():
    html = b'<html><a href="http://a.example/">x</a><A HREF=\'http://b.example/p\'>y</A></html>'
    assert extract_links(html) == ["http://a.example/", "http://b.example/p"]
    assert extract_links(None) == []
    assert extract_links(b"<html>no links</html>") == []


def test_extract_text_pure():
    html = b"<html><head><script>var x=1;</script><style>.a{}</style></head><body>Hello  <b>world</b> &amp; more</body></html>"
    assert extract_text(html) == "Hello world & more"
    assert extract_text(None) is None


def test_text_udf_byte_identical_on_synth(spark):
    """The input_hint invariant: UDF(html) == golden text column, every url."""
    pages = synth_pages_df(spark, n_pages=300, n_hosts=10, seed=42)
    mism = (
        pages.withColumn("rx", extract_text_udf("html"))
        .filter(F.col("rx") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_text_udf_byte_identical_on_mock4(spark):
    pages = mock4_pages_df(spark)
    mism = (
        pages.withColumn("rx", extract_text_udf("html"))
        .filter(F.col("rx") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_links_udf_matches_pure(spark):
    pages = synth_pages_df(spark, n_pages=100, n_hosts=5, seed=7).collect()
    df = spark.createDataFrame([(r.url, r.html) for r in pages], "url string, html binary")
    got = {
        r.url: r.links
        for r in df.select("url", extract_links_udf("html").alias("links")).collect()
    }
    for r in pages:
        assert got[r.url] == extract_links(r.html), r.url


def test_combined_extractor_matches_singles(spark):
    """extract_links_and_text_udf == (extract_links_udf, extract_text_udf)."""
    from obp_search_engine_spark.functions.extract import extract_links_and_text_udf

    pages = synth_pages_df(spark, n_pages=150, n_hosts=6, seed=13)
    both = pages.select(
        "url", extract_links_and_text_udf("html").alias("h")
    ).select("url", "h.links", "h.text")
    got = {r.url: (r.links, r.text) for r in both.collect()}
    for r in pages.collect():
        assert got[r.url] == (extract_links(r.html), extract_text(r.html)), r.url


def test_synth_pages_deterministic(spark):
    a = synth_pages_df(spark, 50, 5, seed=42).orderBy("url").collect()
    b = synth_pages_df(spark, 50, 5, seed=42).orderBy("url").collect()
    assert a == b
    c = synth_pages_df(spark, 50, 5, seed=43).orderBy("url").collect()
    assert a != c
