"""Gopher quality rules and C4 line cleaning: rule-by-rule semantics on
crafted documents, Spark-vs-DuckDB oracle agreement on the same rows, and
the no-shuffle plan property the operators claim."""

from __future__ import annotations

import pytest

from obp_search_engine_spark.operators.quality import (
    c4_clean,
    c4_oracle_sql,
    gopher_flags,
    gopher_oracle_sql,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and that is fine "
    "to read of an evening. " * 5
)  # ~85 words, has stopwords, all-alpha, no symbols


def _gopher(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in gopher_flags(df).collect()}


def test_gopher_good_doc_passes(spark):
    got = _gopher(spark, [(1, GOOD)])[1]
    assert got["pass_gopher"] is True
    assert got["n_words"] >= 50 and got["n_stopwords"] >= 2


def test_gopher_each_rule_fails_independently(spark):
    docs = [
        (1, "too few words here."),  # rule 1: < 50 words
        (2, GOOD + " " + " ".join(["x"] * 60)),  # rule 2: mean len < 3
        (3, GOOD + " " + "# " * 12),  # rule 3: symbol ratio
        (4, GOOD + ("\n- b " * 200).replace(" \n", "\n")),  # rule 4 bullets
        (5, GOOD + "\nend...\nend2...\nend3..."),  # rule 5? 3/4 lines
        (6, GOOD + " " + " ".join(str(i) for i in range(40))),  # rule 6
        (7, "unique wording avoids probe terms " * 20),  # rule 7 stopwords
    ]
    got = _gopher(spark, docs)
    assert not got[1]["ok_word_count"]
    assert not got[2]["ok_mean_word_len"]
    assert not got[3]["ok_symbol_ratio"]
    assert not got[4]["ok_bullet_lines"]
    assert not got[5]["ok_ellipsis_lines"]
    assert not got[6]["ok_alpha_words"]
    assert not got[7]["ok_stopwords"]
    for d in (1, 2, 3, 4, 5, 6, 7):
        assert got[d]["pass_gopher"] is False


def test_gopher_empty_doc(spark):
    got = _gopher(spark, [(1, "")])[1]
    assert got["n_words"] == 0 and got["pass_gopher"] is False
    # ratio rules with 0 denominators hold vacuously (0 <= 0)
    assert got["ok_symbol_ratio"] and got["ok_bullet_lines"]
    assert not got["ok_mean_word_len"] and not got["ok_alpha_words"]


def test_gopher_oracle_agrees_with_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = [
        (1, GOOD),
        (2, "short one."),
        (3, GOOD + " # # # # # # # # # # # #"),
        (4, GOOD + "\n- one two\n- three four\nnot a bullet..."),
        (5, ""),
    ]
    spark_got = _gopher(spark, docs)
    vals = ", ".join(
        "({}, '{}')".format(d, t.replace("\n", "' || chr(10) || '"))
        for d, t in docs
    )
    sql = gopher_oracle_sql(f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)")
    cols = None
    for row in duckdb.sql(sql).fetchall():
        if cols is None:
            cols = [c[0] for c in duckdb.sql(sql).description]
        rec = dict(zip(cols, row))
        assert rec == spark_got[rec["doc_id"]], rec["doc_id"]


C4_DOC = (
    "Header line no punct\n"
    "This sentence is properly terminated.\n"
    "Another good sentence right here!\n"
    "Is this a question with enough words?\n"
    "Quoted sentences also count fine.\"\n"
    "A fifth good line completes the page.\n"
    "Too short.\n"
    "Enable javascript to continue reading please.\n"
)


def _c4(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in c4_clean(df).collect()}


def test_c4_keep_and_gate_semantics(spark):
    got = _c4(spark, [(1, C4_DOC)])[1]
    assert got["n_kept_lines"] == 5  # header, short, javascript dropped
    assert got["pass_c4"] is True
    assert "javascript" not in got["clean_text"].lower()
    assert "Header" not in got["clean_text"]
    assert got["clean_text"].count("\n") == 4


def test_c4_page_gates(spark):
    got = _c4(
        spark,
        [
            (1, C4_DOC + "var x = { a: 1 }\n"),
            (2, C4_DOC + "Lorem Ipsum dolor sit amet.\n"),
            (3, "Just one good sentence here today.\n"),
        ],
    )
    assert got[1]["has_brace"] and not got[1]["pass_c4"]
    assert got[2]["has_lorem"] and not got[2]["pass_c4"]
    assert got[3]["n_kept_lines"] == 1 and not got[3]["pass_c4"]


def test_c4_oracle_agrees_with_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = [
        (1, C4_DOC),
        (2, C4_DOC + "brace { line\n"),
        (3, "lorem ipsum only.\n"),
        (4, ""),
    ]
    spark_got = _c4(spark, docs)
    vals = ", ".join(
        "({}, '{}')".format(
            d, t.replace("'", "''").replace("\n", "' || chr(10) || '")
        )
        for d, t in docs
    )
    sql = c4_oracle_sql(f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)")
    cols = [c[0] for c in duckdb.sql(sql).description]
    for row in duckdb.sql(sql).fetchall():
        rec = dict(zip(cols, row))
        assert rec == spark_got[rec["doc_id"]], rec["doc_id"]


def test_quality_plans_have_no_shuffle(spark):
    """Both gates claim 'pure projection, no shuffle' — assert it."""
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    for op in (gopher_flags, c4_clean):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
