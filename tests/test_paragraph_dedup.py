"""Corpus-wide paragraph dedup (CCNet): semantics against a pure-Python
reference, first-wins ordering, blank handling, partitioning invariance,
and oracle-vs-Python cross-check."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.dedup import (
    paragraph_dedup,
    paragraph_dedup_oracle_sql,
)


def _py_paragraph_dedup(docs):
    """docs: list[(doc_id, text)] -> {doc_id: (n_pars, n_kept, kept_text)}"""
    rows = []
    for did, text in docs:
        for pos, par in enumerate(text.split("\n"), start=1):
            p = par.strip()
            if p:
                rows.append((did, pos, p))
    seen = {}
    for did, pos, p in sorted(rows):
        seen.setdefault(p, (did, pos))
    out = {did: [0, 0, []] for did, _ in docs}
    for did, pos, p in sorted(rows):
        out[did][0] += 1
        if seen[p] == (did, pos):
            out[did][1] += 1
            out[did][2].append(p)
    return {
        did: (n, k, "\n".join(ps)) for did, (n, k, ps) in out.items()
    }


def _collect(df):
    return {
        r.doc_id: (r.n_pars, r.n_kept, r.kept_text) for r in df.collect()
    }


def test_first_wins_and_reassembly(spark):
    docs = [
        (1, "alpha\nbanner\nbeta"),
        (2, "banner\ngamma"),
        (3, "banner\nbanner\ndelta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(paragraph_dedup(df))
    assert got == _py_paragraph_dedup(docs)
    # doc 1 owns 'banner' (smallest doc_id); docs 2/3 lose every copy,
    # including the within-doc repeat in doc 3
    assert got[1] == (3, 3, "alpha\nbanner\nbeta")
    assert got[2] == (2, 1, "gamma")
    assert got[3] == (3, 1, "delta")


def test_blanks_removed_and_all_dropped_doc_survives(spark):
    docs = [(1, "x\n\n  \nx2"), (2, "x\nx2")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(paragraph_dedup(df))
    assert got[1] == (2, 2, "x\nx2")  # blanks not counted
    assert got[2] == (2, 0, "")  # fully-deduped doc still emitted


def test_within_doc_position_order_wins(spark):
    # same paragraph twice in one doc: position 1 wins, position 3 drops
    docs = [(5, "p\nq\np")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(paragraph_dedup(df))
    assert got[5] == (3, 2, "p\nq")


@pytest.mark.parametrize("seed", [9, 51])
def test_random_parity_and_partitioning(spark, seed):
    rng = random.Random(seed)
    pool = [f"par{i}" for i in range(12)]
    docs = [
        (d, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 8))))
        for d in range(30)
    ]
    ref = _py_paragraph_dedup(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert _collect(paragraph_dedup(df.repartition(1))) == ref
    assert _collect(paragraph_dedup(df.repartition(13))) == ref


def test_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(77)
    pool = [f"par{i}" for i in range(10)] + ["  ", ""]
    docs = [
        (d, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 6))))
        for d in range(25)
    ]
    vals = ", ".join(
        "({}, '{}')".format(d, t.replace("\n", "' || chr(10) || '"))
        for d, t in docs
    )
    sql = paragraph_dedup_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)"
    )
    got = {
        r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()
    }
    assert got == _py_paragraph_dedup(docs)
