"""Bigram-LM perplexity filter: pure-Python parity, held-out back-off,
DuckDB oracle agreement, empty-doc handling, fold-order determinism
across parallelism, and the head-quality filter wrapper."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.lm import (
    BOS,
    bigram_positions,
    filter_by_avg_loglik,
    lm_oracle_sql,
    score_perplexity,
)

WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far", "zap"]


def _rand_docs(rng, n=40, min_len=0, max_len=30):
    out = []
    for i in range(n):
        k = rng.randint(min_len, max_len)
        out.append((f"d{i:03d}", " ".join(rng.choice(WORDS) for _ in range(k))))
    return out


def _py_positions(docs):
    pos = []
    for d, text in docs:
        ts = [t for t in text.strip().lower().split() if t]
        for i, w in enumerate(ts):
            pos.append((d, i + 1, BOS if i == 0 else ts[i - 1], w))
    return pos


def _py_scores(score_docs, train_docs=None, alpha=0.5):
    tpos = _py_positions(train_docs if train_docs is not None else score_docs)
    cnts = Counter((c, w) for _, _, c, w in tpos)
    ctxs = Counter(c for _, _, c, _ in tpos)
    vocab = len({w for _, _, _, w in tpos})
    out = {}
    for d, text in score_docs:
        ts = [t for t in text.strip().lower().split() if t]
        if not ts:
            continue
        s = 0.0
        for i, w in enumerate(ts):
            c = BOS if i == 0 else ts[i - 1]
            s += math.log(
                (cnts.get((c, w), 0) + alpha) / (ctxs.get(c, 0) + alpha * vocab)
            )
        out[d] = (len(ts), round(s / len(ts), 6))
    return out


@pytest.mark.parametrize("seed", [3, 41])
def test_self_perplexity_matches_python_reference(spark, seed):
    docs = _rand_docs(random.Random(seed))
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_scored, r.avg_ll)
        for r in score_perplexity(df).collect()
    }
    assert got == _py_scores(docs)


def test_heldout_backoff_matches_python_reference(spark):
    rng = random.Random(7)
    train = _rand_docs(rng, n=30, min_len=1)
    # held-out docs include a token the model never saw -> coalesce-0 path
    held = _rand_docs(rng, n=10, min_len=1) + [("dx", "the qqq zap qqq")]
    tdf = spark.createDataFrame(train, "doc_id string, text string")
    hdf = spark.createDataFrame(held, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_scored, r.avg_ll)
        for r in score_perplexity(hdf, train_docs=tdf).collect()
    }
    assert got == _py_scores(held, train_docs=train)


def test_empty_and_blank_docs_produce_no_rows(spark):
    df = spark.createDataFrame(
        [("a", "the cat"), ("b", ""), ("c", "   \t\n "), ("d", "dog")],
        "doc_id string, text string",
    )
    got = {r.doc_id for r in score_perplexity(df).collect()}
    assert got == {"a", "d"}
    # and blank docs don't poison the vocab: positions see only real tokens
    pos = bigram_positions(df)
    assert {r.w for r in pos.collect()} == {"the", "cat", "dog"}


def test_empty_training_corpus_raises(spark):
    blank = spark.createDataFrame(
        [("a", ""), ("b", " \t ")], "doc_id string, text string"
    )
    docs = spark.createDataFrame([("c", "the cat")], "doc_id string, text string")
    with pytest.raises(ValueError, match="no tokens"):
        score_perplexity(docs, train_docs=blank)


def test_fold_is_parallelism_invariant(spark):
    docs = _rand_docs(random.Random(11), n=60)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    one = {
        (r.doc_id, r.n_scored, r.avg_ll)
        for r in score_perplexity(df.repartition(1)).collect()
    }
    many = {
        (r.doc_id, r.n_scored, r.avg_ll)
        for r in score_perplexity(df.repartition(17)).collect()
    }
    assert one == many


def test_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = _rand_docs(random.Random(23), n=50)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(
        (r.doc_id, r.n_scored, r.avg_ll)
        for r in score_perplexity(df).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = sorted(map(tuple, con.execute(lm_oracle_sql()).fetchall()))
    assert got == want


def test_filter_keeps_head_quality(spark):
    # a doc of one endlessly-repeated bigram is maximally probable;
    # a doc of rare one-off transitions is tail quality
    docs = [
        ("head", "the cat " * 30),
        ("head2", "the cat " * 30),
        ("tail", "zap far dog mat on a sat ran"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    scored = score_perplexity(df)
    vals = {r.doc_id: r.avg_ll for r in scored.collect()}
    assert vals["head"] > vals["tail"]
    cut = (vals["head"] + vals["tail"]) / 2
    kept = {r.doc_id for r in filter_by_avg_loglik(scored, cut).collect()}
    assert kept == {"head", "head2"}
