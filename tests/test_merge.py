"""MERGE/upsert/partition-overwrite semantics (S10-S14, S17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from obp_search_engine_spark.operators.merge import (
    merge_upsert,
    partition_overwrite,
    point_update,
)


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "id string, v int, keep string"
    )
    updates = spark.createDataFrame([("b", 20), ("c", 30)], "id string, v int")
    got = {r.id: (r.v, r.keep) for r in merge_upsert(target, updates, "id").collect()}
    assert got == {"a": (1, "x"), "b": (20, "y"), "c": (30, None)}


def test_merge_upsert_subset_columns(spark):
    # S11 minimal upsert: only some columns updated, others preserved
    target = spark.createDataFrame(
        [("a", 1, "x")], "id string, v int, keep string"
    )
    updates = spark.createDataFrame([("a", 9, "z")], "id string, v int, keep string")
    got = merge_upsert(target, updates, "id", update_cols=["v"]).first()
    assert (got.v, got.keep) == (9, "x")


def test_point_update(spark):
    target = spark.createDataFrame([("a", False), ("b", False)], "id string, listed boolean")
    got = {r.id: r.listed for r in point_update(target, "id", "a", "listed", True).collect()}
    assert got == {"a": True, "b": False}


def test_partition_overwrite(spark):
    target = spark.createDataFrame(
        [("p1", 1), ("p1", 2), ("p2", 3)], "peer_id string, item int"
    )
    repl = spark.createDataFrame([("p1", 9)], "peer_id string, item int")
    got = sorted(
        (r.peer_id, r.item) for r in partition_overwrite(target, repl, "peer_id").collect()
    )
    assert got == [("p1", 9), ("p2", 3)]
