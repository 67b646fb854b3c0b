"""NB classifier (U1/U2): tokenizer byte-identity, sklearn-equivalent math,
distributed train/predict."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.functions.tokenize import process_text, process_text_udf
from obp_search_engine_spark.operators.classifier import (
    classify_documents,
    nb_predict_udf,
    train_nb,
)

TRAIN = [
    (0, "buy cheap guns and ammo here free shipping", True),
    (1, "illegal weapons ammo explosive materials sale", True),
    (2, "guns knives weapons wholesale deal", True),
    (3, "handmade wooden chair with oak finish", False),
    (4, "organic honey from local bees jar", False),
    (5, "vintage wooden table oak furniture", False),
    (6, "knitted wool sweater winter collection", False),
]
TEST_ROWS = [
    (10, "cheap ammo and guns sale", None),
    (11, "oak wooden furniture handmade", None),
]


def test_process_text_matches_reference_semantics():
    # punctuation stripped, whitespace split, stopwords dropped (case kept)
    assert process_text("The Quick, brown fox!") == ["Quick", "brown", "fox"]
    assert process_text("it's AND a THE") == []  # "its" is a stopword too
    assert process_text(None) == []
    assert process_text("Don't stop-me now") == ["Dont", "stopme"]


def test_process_text_udf_byte_identical(spark):
    texts = [t for (_, t, _) in TRAIN] + ["", None, "A.B.C the; quick"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.toks for r in df.select(process_text_udf("text").alias("toks")).collect()]
    want = [process_text(t) for t in texts]
    assert got == want


def _pure_nb(train, alpha=0.3):
    """Reference math: multinomial NB with Lidstone smoothing (sklearn
    MultinomialNB semantics, learnNetwork.py:38-47)."""
    docs = [(process_text(t), y) for (_, t, y) in train]
    classes = sorted({y for _, y in docs})
    vocab = sorted({w for ws, _ in docs for w in ws})
    vix = {w: i for i, w in enumerate(vocab)}
    counts = {c: np.zeros(len(vocab)) for c in classes}
    prior = {c: 0 for c in classes}
    for ws, y in docs:
        prior[y] += 1
        for w in ws:
            counts[y][vix[w]] += 1
    n = len(docs)

    def predict(text):
        ws = process_text(text)
        best, best_s = None, -math.inf
        for c in classes:
            tot = counts[c].sum()
            s = math.log(prior[c] / n)
            for w in ws:
                if w in vix:
                    s += math.log((counts[c][vix[w]] + alpha) / (tot + alpha * len(vocab)))
            if s > best_s:
                best, best_s = c, s
        return best

    return predict


def test_train_nb_matches_pure_math(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string, is_blocked boolean")
    model = train_nb(df)
    pure = _pure_nb(TRAIN)
    for _, text, _ in TRAIN:
        assert model.predict_tokens(process_text(text)) == pure(text)
    for _, text, _ in TEST_ROWS:
        assert model.predict_tokens(process_text(text)) == pure(text)


def test_classify_documents_end_to_end(spark):
    df = spark.createDataFrame(
        TRAIN + TEST_ROWS, "doc_id long, text string, is_blocked boolean"
    )
    out = classify_documents(spark, df)
    got = {r.doc_id: r.predicted_blocked for r in out.collect()}
    # labeled rows keep their labels
    for i, _, y in TRAIN:
        assert got[i] == y
    # unlabeled rows get sensible predictions
    assert got[10] is True
    assert got[11] is False


def test_sklearn_parity_if_available(spark):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.feature_extraction.text import CountVectorizer
    from sklearn.naive_bayes import MultinomialNB

    df = spark.createDataFrame(TRAIN, "doc_id long, text string, is_blocked boolean")
    model = train_nb(df)

    vec = CountVectorizer(analyzer=process_text)
    X = vec.fit_transform([t for (_, t, _) in TRAIN])
    clf = MultinomialNB(alpha=0.3).fit(X, [y for (_, _, y) in TRAIN])
    Xt = vec.transform([t for (_, t, _) in TEST_ROWS])
    want = clf.predict(Xt)
    got = [model.predict_tokens(process_text(t)) for (_, t, _) in TEST_ROWS]
    assert list(want) == got


def test_vocab_cap_keeps_top_tokens(spark):
    """max_vocab caps the driver collect distributively: only the
    highest-total tokens survive, and prediction still works."""
    df = spark.createDataFrame(TRAIN, "doc_id long, text string, is_blocked boolean")
    full = train_nb(df)
    capped = train_nb(df, max_vocab=5)
    assert len(capped.vocab) == 5
    assert len(full.vocab) > 5
    # the kept 5 are the globally most frequent (ties by token asc)
    def total(model, tok):
        return model.log_prob[model.vocab[tok]]
    # every capped token exists in the full vocab
    assert set(capped.vocab) <= set(full.vocab)
    # min_df: tokens appearing once vanish with min_df=2
    md = train_nb(df, min_df=2)
    assert set(md.vocab) < set(full.vocab)
    for t in md.vocab:
        assert t in full.vocab
