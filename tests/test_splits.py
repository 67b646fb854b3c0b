"""Leakage-safe split assignment: duplicate cohesion (exact and
cluster-keyed), proportion sanity, determinism across partitionings,
validation errors, and DuckDB oracle agreement."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.curation import (
    assign_splits,
    split_oracle_case,
)


def _docs(rng, n=400, dup_rate=0.25):
    rows, texts = [], []
    for i in range(n):
        if texts and rng.random() < dup_rate:
            t = rng.choice(texts)  # exact duplicate of an earlier doc
        else:
            t = f"text {rng.random():.12f}"
            texts.append(t)
        rows.append((f"d{i:04d}", f"src{i % 7}", t))
    return rows


def test_duplicates_never_straddle_splits(spark):
    rows = _docs(random.Random(3))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = assign_splits(df, F.md5(F.col("text"))).collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r.text, set()).add(r.split)
    assert all(len(s) == 1 for s in by_text.values())
    # and with >1 member groups present, the property is non-vacuous
    assert any(
        len([r for r in out if r.text == t]) > 1 for t in by_text
    )


def test_proportions_and_names(spark):
    rows = [(f"d{i}", "s", f"unique {i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = dict(
        (r.split, r.n)
        for r in assign_splits(df, F.md5(F.col("text")))
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert set(got) == {"train", "val", "test"}
    assert got["train"] > 8 * (got["val"] + got["test"]) / 2  # ~90/5/5
    assert abs(got["train"] - 1800) < 120


def test_cluster_keyed_split_keeps_neardups_together(spark):
    # near-dup cluster labels (any grouping column) as the key: all
    # members inherit the label's split
    rows = [(f"d{i}", i % 37, f"t{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, cluster long, text string")
    out = assign_splits(df, F.col("cluster")).collect()
    per_cluster = {}
    for r in out:
        per_cluster.setdefault(r.cluster, set()).add(r.split)
    assert all(len(s) == 1 for s in per_cluster.values())


def test_determinism_across_partitionings(spark):
    rows = _docs(random.Random(9), n=200)
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    a = {(r.doc_id, r.split) for r in assign_splits(df.repartition(1), F.md5(F.col("text"))).collect()}
    b = {(r.doc_id, r.split) for r in assign_splits(df.repartition(13), F.md5(F.col("text"))).collect()}
    assert a == b


def test_validation():
    # validation fires before any DataFrame work
    with pytest.raises(ValueError, match="sum to 100"):
        assign_splits(None, F.lit("x"), pcts=[50, 40], names=["a", "b"])
    with pytest.raises(ValueError, match="align"):
        assign_splits(None, F.lit("x"), pcts=[100], names=["a", "b"])


def test_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = _docs(random.Random(21), n=300)
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = sorted(
        (r.doc_id, r.split)
        for r in assign_splits(df, F.md5(F.col("text"))).collect()
    )
    case = split_oracle_case("md5(text)", [90, 5, 5], ["train", "val", "test"])
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        f"SELECT doc_id, {case} AS split FROM docs").fetchall()))
    assert got == want
