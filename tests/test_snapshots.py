"""Snapshot diff + change rates: semantics on a handcrafted case,
randomized parity with a pure-Python reference, and the graded-entry
synthesizer's invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.snapshots import (
    change_rate,
    snapshot_diff,
)


def _py_diff(old, new):
    out = {}
    for k in old.keys() | new.keys():
        if k not in old:
            out[k] = "new"
        elif k not in new:
            out[k] = "gone"
        elif old[k] == new[k] or (old[k] is None and new[k] is None):
            out[k] = "unchanged"
        else:
            out[k] = "changed"
    return out


def test_diff_semantics(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "url long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (5, "e"), (4, None)], "url long, text string"
    )
    got = {r.url: r.status for r in snapshot_diff(old, new, "url").collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "gone",
        5: "new",
        4: "unchanged",  # NULL content compares equal to NULL
    }


@pytest.mark.parametrize("seed", [9, 31])
def test_diff_random_parity(spark, seed):
    rng = random.Random(seed)
    old = {k: f"t{rng.randrange(5)}" for k in range(60) if rng.random() < 0.8}
    new = {k: f"t{rng.randrange(5)}" for k in range(70) if rng.random() < 0.8}
    o = spark.createDataFrame(list(old.items()), "url long, text string")
    n = spark.createDataFrame(list(new.items()), "url long, text string")
    got = {r.url: r.status for r in snapshot_diff(o, n, "url").collect()}
    assert got == _py_diff(old, new)


def test_change_rate_counts_and_ratio(spark):
    st = spark.createDataFrame(
        [
            ("h1", "unchanged"),
            ("h1", "changed"),
            ("h1", "changed"),
            ("h1", "new"),
            ("h2", "gone"),
            ("h2", "new"),
        ],
        "host string, status string",
    )
    got = {
        r.host: (r.n_unchanged, r.n_changed, r.n_gone, r.n_new, r.changed_ratio)
        for r in change_rate(st, "host").collect()
    }
    assert got["h1"] == (1, 2, 0, 1, 2 / 3)
    # no key survived both snapshots on h2 -> ratio is NULL, not 0/0
    assert got["h2"] == (0, 0, 1, 1, None)


def test_graded_snapshot_b_invariants(spark, sf_dir):
    """The deterministic next-snapshot synthesizer used by the graded
    entries: every status class is populated (the md5 cohort decorrelates
    from host assignment), and statuses partition the union of keys."""
    from obp_search_engine_spark.plans.pipeline_queries import (
        _snapshot_b,
        q_snapshot_change_detection,
    )

    d = snapshot_diff(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        ),
        _snapshot_b(spark, sf_dir).select("doc_id", "text"),
        key_col="doc_id",
    )
    counts = {r.status: r.n for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"unchanged", "changed", "gone", "new"}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(counts.values()) == n_docs + counts["new"]
    # md5 cohorts are ~10% each of the corpus
    n_old = n_docs
    for s in ("gone", "new"):
        assert 0.03 * n_old < counts[s] < 0.2 * n_old
    same = q_snapshot_change_detection(spark, sf_dir)
    assert same.count() == sum(counts.values())
