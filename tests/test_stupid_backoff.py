"""Stupid Backoff trigram LM (Brants et al., EMNLP 2007): pure-Python
parity, held-out backoff through all three levels, OOV floor behaviour,
DuckDB oracle agreement, empty-doc handling, fold-order determinism
across parallelism, and the empty-corpus guard."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from obp_search_engine_spark.operators.lm import (
    BOS,
    sb_positions,
    stupid_backoff_oracle_sql,
    stupid_backoff_scores,
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
            c2 = BOS if i <= 1 else ts[i - 2]
            c1 = BOS if i == 0 else ts[i - 1]
            pos.append((d, i + 1, c2, c1, w))
    return pos


def _py_scores(score_docs, train_docs=None, b=0.4):
    tpos = _py_positions(train_docs if train_docs is not None else score_docs)
    tri = Counter((c2, c1, w) for _, _, c2, c1, w in tpos)
    tt = Counter((c2, c1) for _, _, c2, c1, _ in tpos)
    bi = Counter((c1, w) for _, _, _, c1, w in tpos)
    bt = Counter(c1 for _, _, _, c1, _ in tpos)
    uni = Counter(w for _, _, _, _, w in tpos)
    n = float(len(tpos))
    out = {}
    for d, text in score_docs:
        ts = [t for t in text.strip().lower().split() if t]
        if not ts:
            continue
        s = 0.0
        for i, w in enumerate(ts):
            c2 = BOS if i <= 1 else ts[i - 2]
            c1 = BOS if i == 0 else ts[i - 1]
            if tri.get((c2, c1, w), 0) > 0:
                sc = tri[(c2, c1, w)] / float(tt[(c2, c1)])
            elif bi.get((c1, w), 0) > 0:
                sc = b * bi[(c1, w)] / float(bt[c1])
            else:
                sc = b * b * uni.get(w, 0) / n
            s += math.log(max(sc, 1e-300))
        out[d] = (len(ts), round(s / len(ts), 6))
    return out


@pytest.mark.parametrize("seed", [5, 47])
def test_self_score_matches_python_reference(spark, seed):
    docs = _rand_docs(random.Random(seed))
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_scored, r.avg_sb)
        for r in stupid_backoff_scores(df).collect()
    }
    assert got == _py_scores(docs)


def test_heldout_hits_all_three_backoff_levels(spark):
    # train corpus seen trigrams, held-out corpus constructed so scoring
    # exercises: seen trigram, trigram-miss/bigram-hit, bigram-miss/
    # unigram-hit, and full OOV (the 1e-300 floor)
    train = [
        ("t0", "the cat sat on the mat"),
        ("t1", "the dog ran far"),
        ("t2", "a cat ran"),
    ]
    held = [
        ("h0", "the cat sat"),        # seen trigram path
        ("h1", "dog ran on"),          # bigram/unigram mix
        ("h2", "mat the qqq"),         # qqq = OOV -> floor
    ]
    tdf = spark.createDataFrame(train, "doc_id string, text string")
    hdf = spark.createDataFrame(held, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_scored, r.avg_sb)
        for r in stupid_backoff_scores(hdf, train_docs=tdf).collect()
    }
    want = _py_scores(held, train_docs=train)
    assert got == want
    # the OOV doc's average is dominated by ln(1e-300) ~= -690.78
    assert got["h2"][1] < -200


def test_empty_and_blank_docs_produce_no_rows(spark):
    df = spark.createDataFrame(
        [("a", "the cat"), ("b", ""), ("c", "  \t\n "), ("d", "dog")],
        "doc_id string, text string",
    )
    got = {r.doc_id for r in stupid_backoff_scores(df).collect()}
    assert got == {"a", "d"}
    pos = sb_positions(df)
    assert {r.w for r in pos.collect()} == {"the", "cat", "dog"}
    # double-BOS padding: pos 1 has both contexts <s>, pos 2 only c2
    rows = {(r._doc, r.pos): (r.c2, r.c1) for r in pos.collect()}
    assert rows[("a", 1)] == (BOS, BOS)
    assert rows[("a", 2)] == (BOS, "the")


def test_empty_training_corpus_raises(spark):
    blank = spark.createDataFrame(
        [("a", ""), ("b", " \t ")], "doc_id string, text string"
    )
    docs = spark.createDataFrame([("c", "the cat")], "doc_id string, text string")
    with pytest.raises(ValueError, match="no tokens"):
        stupid_backoff_scores(docs, train_docs=blank)


def test_fold_is_parallelism_invariant(spark):
    docs = _rand_docs(random.Random(13), n=60)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    one = {
        (r.doc_id, r.n_scored, r.avg_sb)
        for r in stupid_backoff_scores(df.repartition(1)).collect()
    }
    many = {
        (r.doc_id, r.n_scored, r.avg_sb)
        for r in stupid_backoff_scores(df.repartition(17)).collect()
    }
    assert one == many


def test_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = _rand_docs(random.Random(29), n=50)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(
        (r.doc_id, r.n_scored, r.avg_sb)
        for r in stupid_backoff_scores(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = sorted(map(tuple, con.execute(stupid_backoff_oracle_sql()).fetchall()))
    assert got == want


def test_repetitive_doc_scores_higher_than_random(spark):
    # the quality-filter use: a doc of one endlessly repeated trigram is
    # maximally probable under the self-trained model; line noise is not
    docs = [("rep", "spam " * 60), ("mix", " ".join(WORDS))]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r.doc_id: r.avg_sb for r in stupid_backoff_scores(df).collect()}
    assert got["rep"] > got["mix"]
