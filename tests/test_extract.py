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


def test_canonical_links_udf_equals_two_stage(spark):
    """extract_canonical_links_udf == canonicalize_url mapped over
    extract_links_udf output (invalid dropped) — the spill-path fusion
    must be byte-identical to the two-stage path it replaced."""
    from obp_search_engine_spark.functions.extract import (
        extract_canonical_links_and_text_udf,
        extract_canonical_links_udf,
        extract_text_udf,
    )
    from obp_search_engine_spark.functions.urls import canonicalize_url

    df = synth_pages_df(spark, n_pages=200, n_hosts=8, seed=11)
    got = {
        r.url: r.links
        for r in df.select(
            "url", extract_canonical_links_udf("html").alias("links")
        ).collect()
    }
    raw = {
        r.url: r.links
        for r in df.select("url", extract_links_udf("html").alias("links")).collect()
    }
    want = {
        u: [c for l in ls if (c := canonicalize_url(l)) is not None]
        for u, ls in raw.items()
    }
    assert got == want

    both = {
        r.url: (r.h.links, r.h.text)
        for r in df.select(
            "url", extract_canonical_links_and_text_udf("html").alias("h")
        ).collect()
    }
    texts = {
        r.url: r.t for r in df.select("url", extract_text_udf("html").alias("t")).collect()
    }
    assert {u: v[0] for u, v in both.items()} == want
    assert {u: v[1] for u, v in both.items()} == texts


def test_spill_path_equals_memory_path(spark, tmp_path):
    """crawl_round's spill path (canonical-in-extract) must produce the
    same frontier as the in-memory path (canonicalize in the merge job)."""
    from obp_search_engine_spark.operators.checkpoint import run_crawl
    from obp_search_engine_spark.sources.pages import MOCK4_SEED_URL, mock4_pages_df

    mem = run_crawl(spark, mock4_pages_df(spark), seeds=[MOCK4_SEED_URL], rounds=4)
    spill = run_crawl(
        spark, mock4_pages_df(spark), seeds=[MOCK4_SEED_URL], rounds=4,
        spill_harvest=True, ckpt_dir=str(tmp_path / "ck"),
    )
    cols = ["url", "depth", "state"]
    a = sorted(tuple(r) for r in mem["frontier"].select(*cols).collect())
    b = sorted(tuple(r) for r in spill["frontier"].select(*cols).collect())
    assert a == b
