"""BM25F: fielded scoring against a pure-Python reference, field-weight
semantics (anchor hit outranks body hit), and parallelism invariance."""

from __future__ import annotations

import math

from obp_search_engine_spark.operators.ranking import bm25f_topk

W = {"body": 1.0, "title": 3.0, "anchor": 4.0}
B = {"body": 0.75, "title": 0.5, "anchor": 0.4}


def _py_bm25f(rows, terms, w, fb, k1=1.2):
    # rows: (doc, field, text)
    toks = {(d, f): t.lower().split() for d, f, t in rows if t is not None}
    docs = sorted({d for d, f in toks})
    n = len(docs)
    fields = sorted(w)
    avgdl = {
        f: sum(len(toks.get((d, f), [])) for d in docs) / n for f in fields
    }
    scores = {}
    dfs = {
        t: sum(
            1
            for d in docs
            if any(t in toks.get((d, f), []) for f in fields)
        )
        for t in terms
    }
    for d in docs:
        s = 0.0
        for t in sorted(set(terms)):
            tfw = 0.0
            for f in fields:
                tf = toks.get((d, f), []).count(t)
                if tf == 0:
                    continue
                tfw += w[f] * tf / (1 - fb[f] + fb[f] * len(toks[(d, f)]) / avgdl[f])
            if tfw == 0.0:
                continue
            df = dfs[t]
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tfw / (k1 + tfw)
        if s:
            scores[d] = round(s, 6)
    return scores


ROWS = [
    (1, "body", "spark join hash join table scan"),
    (1, "title", "spark joins"),
    (2, "body", "the slow merge path"),
    (2, "anchor", "spark spark hash"),
    (3, "body", "spark hash join spark"),
    (3, "title", "unrelated words here"),
    (4, "body", "nothing relevant at all"),
]


def test_bm25f_matches_python_reference(spark):
    df = spark.createDataFrame(ROWS, "doc long, field string, text string")
    got = {
        r.doc: r.score
        for r in bm25f_topk(df, ["spark", "hash", "join"], W, B, k=10).collect()
    }
    want = _py_bm25f(ROWS, ["spark", "hash", "join"], W, B)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_bm25f_anchor_outweighs_body(spark):
    # same single term occurrence; the anchor field (w=4) must beat body
    rows = [
        (1, "body", "quux filler filler filler"),
        (2, "anchor", "quux filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc long, field string, text string")
    got = {r.doc: r.score for r in bm25f_topk(df, ["quux"], W, B).collect()}
    assert got[2] > got[1]


def test_bm25f_parallelism_invariant(spark):
    df = spark.createDataFrame(ROWS, "doc long, field string, text string")
    a = [
        tuple(r)
        for r in bm25f_topk(
            df.repartition(1), ["spark", "join"], W, B
        ).collect()
    ]
    b = [
        tuple(r)
        for r in bm25f_topk(
            df.repartition(7), ["spark", "join"], W, B
        ).collect()
    ]
    assert a == b
