"""Multi-format pages ingestion (sources/ingest.py): json/csv wire round
trips byte-identically back to PAGES_SCHEMA, and the crawl runs unchanged
on an ingested corpus."""

from __future__ import annotations

import pytest

from obp_search_engine_spark.sources.ingest import export_pages, read_pages
from obp_search_engine_spark.sources.pages import (
    MOCK4_SEED_URL,
    mock4_pages_df,
    synth_pages_df,
)


def _rowset(df):
    return {
        (r.url, r.warc_ts, bytes(r.html), r.text, r.lang)
        for r in df.collect()
    }


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_wire_roundtrip(spark, tmp_path, fmt):
    pages = synth_pages_df(spark, n_pages=50, n_hosts=5, seed=3)
    path = str(tmp_path / f"pages_{fmt}")
    export_pages(pages, path, fmt=fmt)
    back = read_pages(spark, path, fmt=fmt)
    # names + types must match exactly (nullability flags may differ:
    # text formats can't declare non-null url)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in pages.schema.fields
    ]
    assert _rowset(back) == _rowset(pages)


def test_crawl_runs_on_ingested_corpus(spark, tmp_path):
    from obp_search_engine_spark.operators.checkpoint import run_crawl

    path = str(tmp_path / "mock4_json")
    export_pages(mock4_pages_df(spark), path, fmt="json")
    pages = read_pages(spark, path, fmt="json")
    res = run_crawl(spark, pages, seeds=[MOCK4_SEED_URL], rounds=3)
    assert res["visited"] == 4
    assert res["frontier_size"] == 4


def test_unknown_format_and_missing_columns(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown pages format"):
        read_pages(spark, "/nonexistent", fmt="xml")
    # parquet missing a required column fails loudly
    bad = str(tmp_path / "bad_parquet")
    mock4_pages_df(spark).drop("lang").write.parquet(bad)
    with pytest.raises(ValueError, match="missing columns.*lang"):
        read_pages(spark, bad, fmt="parquet")


def test_misnamed_wire_column_fails_loudly(spark, tmp_path):
    """An enforced-schema reader happily returns all-null columns for a
    misspelled field; read_pages must instead fail naming the missing wire
    column (the silent-null fetch-join poisoning the module guards against)."""
    import json as _json

    p = tmp_path / "bad_json"
    p.mkdir()
    rec = {"url": "http://x.example/", "warc_ts": "2026-01-01T00:00:00Z",
           "html": "PGh0bWw+", "text": "t", "lang": "en"}  # 'html' not 'html_b64'
    (p / "part-0.json").write_text(_json.dumps(rec) + "\n")
    with pytest.raises(ValueError, match="missing wire columns.*html_b64"):
        read_pages(spark, str(p), fmt="json")


def test_jsonl_roundtrip_with_null_html_first_row(spark, tmp_path):
    """The JSON writer must keep explicit nulls: a first row with null html
    (an unreachable page) would otherwise drop the html_b64 key and trip
    the wire-column validation on a valid export."""
    pages = spark.createDataFrame(
        [("http://dead.x/", None, None, None, "en"),
         ("http://ok.x/", None, bytearray(b"<html></html>"), "t", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).coalesce(1).sortWithinPartitions("url")  # null-html row first in file
    path = str(tmp_path / "null_first")
    export_pages(pages, path, fmt="json")
    back = read_pages(spark, path, fmt="json")
    rows = {r.url: r.html for r in back.collect()}
    assert rows["http://dead.x/"] is None
    assert bytes(rows["http://ok.x/"]) == b"<html></html>"
