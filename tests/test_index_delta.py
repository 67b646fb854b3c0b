"""Incremental inverted-index merge: the merge==rebuild theorem on
randomized corpora (adds, deletes, both), verbatim pass-through of
untouched terms, and term disappearance when its last postings die."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.ranking import (
    inverted_index,
    merge_index_delta,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]


def _docs(rng, ids):
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 12))))
        for i in ids
    ]


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("seed", [4, 29])
def test_merge_equals_batch_rebuild(spark, seed):
    rng = random.Random(seed)
    base = _docs(rng, range(0, 60))
    delta = _docs(rng, range(100, 125))
    deleted = [base[i] for i in range(0, 60, 7)]
    sch = "doc_id long, text string"
    bdf = spark.createDataFrame(base, sch)
    ddf = spark.createDataFrame(delta, sch)
    xdf = spark.createDataFrame(deleted, sch)
    merged = merge_index_delta(inverted_index(bdf), ddf, deleted_docs=xdf)
    gone = {d for d, _ in deleted}
    new_corpus = spark.createDataFrame(
        [r for r in base if r[0] not in gone] + delta, sch
    )
    assert _rows(merged) == _rows(inverted_index(new_corpus))


def test_delta_only_and_delete_only(spark):
    rng = random.Random(11)
    base = _docs(rng, range(0, 40))
    sch = "doc_id long, text string"
    bdf = spark.createDataFrame(base, sch)
    idx = inverted_index(bdf)
    # delta only
    delta = _docs(rng, range(50, 70))
    ddf = spark.createDataFrame(delta, sch)
    merged = merge_index_delta(idx, ddf)
    assert _rows(merged) == _rows(
        inverted_index(spark.createDataFrame(base + delta, sch))
    )
    # delete only (empty delta)
    deleted = base[:10]
    empty = spark.createDataFrame([], sch)
    merged2 = merge_index_delta(idx, empty, deleted_docs=spark.createDataFrame(deleted, sch))
    assert _rows(merged2) == _rows(
        inverted_index(spark.createDataFrame(base[10:], sch))
    )


def test_untouched_terms_pass_through_verbatim(spark):
    sch = "doc_id long, text string"
    base = [(1, "alpha beta"), (2, "alpha gamma"), (3, "rare alpha")]
    delta = [(9, "beta beta")]
    bdf = spark.createDataFrame(base, sch)
    idx = inverted_index(bdf)
    merged = merge_index_delta(idx, spark.createDataFrame(delta, sch))
    before = {r.term: tuple(r) for r in idx.collect()}
    after = {r.term: tuple(r) for r in merged.collect()}
    # terms not in the delta keep byte-identical rows
    for t in ("alpha", "gamma", "rare"):
        assert after[t] == before[t]
    assert after["beta"] != before["beta"]


def test_term_vanishes_when_last_posting_deleted(spark):
    sch = "doc_id long, text string"
    base = [(1, "unique alpha"), (2, "alpha")]
    bdf = spark.createDataFrame(base, sch)
    merged = merge_index_delta(
        inverted_index(bdf),
        spark.createDataFrame([], sch),
        deleted_docs=spark.createDataFrame([base[0]], sch),
    )
    terms = {r.term for r in merged.collect()}
    assert terms == {"alpha"}
    row = merged.filter(F.col("term") == "alpha").first()
    assert (row.df_docs, row.total_tf, row.postings) == (1, 1, "2:1")
