"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020 rank Common Crawl text by KenLM perplexity;
here the distributed analogue: an add-alpha-smoothed bigram LM trained
with two Catalyst aggregations, scored with one join).

The reference engine has no LM — this is a beyond-reference
LLM-data-pipeline operator (SURVEY.md §2.11): at 100 TB the standard
head/middle/tail split of a crawl corpus IS a perplexity threshold over
a model exactly like this one.

FP portability (the ranking.py recipe): per-doc log-prob terms are
folded in POSITION order — Catalyst ``F.aggregate(array_sort(
collect_list(struct(pos, t))), 0.0, +)`` equals DuckDB
``list_reduce(list(t ORDER BY pos), (a, b) -> a + b)`` because
``0.0 + x == x`` exactly — and the average is rounded to 6 decimals on
both sides, so a probabilistic-looking score grades against an EXACT
oracle.

100 TB shape: training is two map-side-combined groupBys onto
vocab-bounded tables (real corpora cap the vocab and route the tail to
an UNK bucket before this step, keeping counts broadcast-able);
scoring is a broadcast join per position plus one per-doc groupBy —
no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from ..functions import textstats as ts
from ..functions.folds import ordered_sums

BOS = "<s>"


def bigram_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenize and explode to scored positions: ``(_doc, pos, ctx, w)``
    with 1-based ``pos``, ``ctx`` = previous token (``<s>`` at pos 1).
    Docs with no tokens (empty/whitespace text) produce no rows."""
    t = docs.select(
        F.col(id_col).alias("_doc"),
        ts.nonempty_tokens_col(F.lower(F.col(text_col))).alias("_ts"),
    ).filter(F.size("_ts") > 0)
    p = t.select("_doc", "_ts", F.posexplode("_ts").alias("_p0", "w"))
    return p.select(
        "_doc",
        (F.col("_p0") + 1).cast("long").alias("pos"),
        F.when(F.col("_p0") == 0, F.lit(BOS))
        .otherwise(F.element_at("_ts", F.col("_p0")))
        .alias("ctx"),
        "w",
    )


def train_bigram_lm(
    positions: DataFrame, materialize: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count model from :func:`bigram_positions` rows: ``(cnts(ctx, w,
    c), ctxs(ctx, cc), vocab(v))``. ONE corpus-wide shuffle (the
    (ctx, w) groupBy, map-side combined onto a vocab^2-bounded table);
    ``ctxs`` and ``vocab`` are derived from ``cnts`` — ``cc`` is the
    sum of ``c`` over ``w`` and the vocab is the distinct ``w`` of
    ``cnts`` — so they re-aggregate the tiny counts table instead of
    re-exploding the corpus. ``materialize`` localCheckpoints ``cnts``
    (vocab^2-bounded — tiny at any corpus scale) so its three consumers
    (ctxs, vocab, the scoring join) share ONE corpus pass instead of
    re-running the explode+shuffle each."""
    cnts = positions.groupBy("ctx", "w").agg(F.count("*").alias("c"))
    if materialize:
        cnts = cnts.localCheckpoint(eager=False)
    ctxs = cnts.groupBy("ctx").agg(F.sum("c").alias("cc"))
    vocab = cnts.agg(F.countDistinct("w").alias("v"))
    return cnts, ctxs, vocab


def score_avg_loglik(
    positions: DataFrame,
    cnts: DataFrame,
    ctxs: DataFrame,
    vocab: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc average log-likelihood under the add-``alpha`` bigram
    model: ``(id_col, n_scored, avg_ll)`` with ``avg_ll = round(sum_pos
    ln((c + a) / (cc + a*V)) / n_scored, 6)``. Unseen (ctx, w) pairs —
    held-out scoring — coalesce to 0 counts, i.e. ``ln(a / (cc + a*V))``
    back-off. Higher (closer to 0) = more probable = head quality;
    perplexity is ``exp(-avg_ll)`` (:func:`perplexity_col`)."""
    j = (
        positions.join(F.broadcast(cnts), ["ctx", "w"], "left")
        .join(F.broadcast(ctxs), "ctx", "left")
        .crossJoin(F.broadcast(vocab))
    )
    term = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(float(alpha)) * F.col("v"))
    )
    # position-ordered strict fold via the running window
    # (functions/folds.py) — replaces collect_list/array_sort/lambda
    agg = ordered_sums(
        j.select("_doc", "pos", term.alias("t")),
        ["_doc"],
        "pos",
        {"_s": "t"},
        n_alias="n_scored",
    )
    return agg.select(
        F.col("_doc").alias(id_col),
        "n_scored",
        F.round(F.col("_s") / F.col("n_scored"), 6).alias("avg_ll"),
    )


def perplexity_col(avg_ll: Column) -> Column:
    """Perplexity from the (rounded) average log-likelihood."""
    return F.exp(-avg_ll)


def score_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end: train the bigram LM on ``train_docs`` (default: the
    scored corpus itself, the self-perplexity used for head/tail
    splits) and score every non-empty doc in ``docs``.

    Raises ``ValueError`` on an empty/all-blank training corpus
    (vocab 0): the smoothing denominator would be 0.0, and Spark's
    non-ANSI division would silently emit NULL scores for every doc
    (DuckDB's would emit inf — a parity break on top of a data bug).
    The check is one job over the already-materialized counts table."""
    pos = bigram_positions(docs, id_col=id_col, text_col=text_col)
    if train_docs is None:
        # self-scoring (the graded path): ONE tokenize+posexplode pass
        # shared by training and scoring — the vocab guard below already
        # materializes the training side, so without the pin the scoring
        # job re-ran the corpus explode a second time
        pos = pos.localCheckpoint(eager=False)
        tpos = pos
    else:
        tpos = bigram_positions(train_docs, id_col=id_col, text_col=text_col)
    cnts, ctxs, vocab = train_bigram_lm(tpos)
    if vocab.first()["v"] == 0:
        raise ValueError(
            "bigram LM training corpus has no tokens (empty or "
            "all-whitespace text) — refusing to score with a zero "
            "smoothing denominator"
        )
    return score_avg_loglik(
        pos, cnts, ctxs, vocab, alpha=alpha, id_col=id_col
    )


def filter_by_avg_loglik(scored: DataFrame, min_avg_ll: float) -> DataFrame:
    """Keep head-quality docs: ``avg_ll >= min_avg_ll`` (equivalently
    perplexity <= exp(-min_avg_ll))."""
    return scored.filter(F.col("avg_ll") >= F.lit(float(min_avg_ll)))


def sb_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenize and explode to trigram-scored positions: ``(_doc, pos,
    c2, c1, w)`` with 1-based ``pos``; ``c1`` = previous token, ``c2`` =
    token before that, both ``<s>``-padded at the document head. Docs
    with no tokens produce no rows (same contract as
    :func:`bigram_positions`)."""
    t = docs.select(
        F.col(id_col).alias("_doc"),
        ts.nonempty_tokens_col(F.lower(F.col(text_col))).alias("_ts"),
    ).filter(F.size("_ts") > 0)
    p = t.select("_doc", "_ts", F.posexplode("_ts").alias("_p0", "w"))
    return p.select(
        "_doc",
        (F.col("_p0") + 1).cast("long").alias("pos"),
        F.when(F.col("_p0") <= 1, F.lit(BOS))
        .otherwise(F.element_at("_ts", F.col("_p0") - 1))
        .alias("c2"),
        F.when(F.col("_p0") == 0, F.lit(BOS))
        .otherwise(F.element_at("_ts", F.col("_p0")))
        .alias("c1"),
        "w",
    )


def train_stupid_backoff(
    positions: DataFrame, materialize: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Count tables for Stupid Backoff (Brants, Popat, Xu, Och & Dean,
    "Large Language Models in Machine Translation", EMNLP 2007 — THE
    distributed MapReduce n-gram LM): ``(tri(c2, c1, w, ct), bi(c1, w,
    cb), uni(w, cu), tot(n))`` from :func:`sb_positions` rows.

    ONE corpus-wide shuffle (the trigram groupBy, map-side combined);
    ``bi``/``uni``/``tot`` re-aggregate the materialized trigram table —
    every position contributes exactly one trigram, so its bigram,
    unigram, and total counts are sums over ``tri`` — instead of
    re-running the corpus explode. Counts are DOUBLE so the score
    divisions below are pure IEEE double ops on both engines."""
    tri = positions.groupBy("c2", "c1", "w").agg(
        F.count("*").cast("double").alias("ct")
    )
    if materialize:
        tri = tri.localCheckpoint(eager=False)
    bi = tri.groupBy("c1", "w").agg(F.sum("ct").alias("cb"))
    uni = tri.groupBy("w").agg(F.sum("ct").alias("cu"))
    tot = tri.agg(F.sum("ct").alias("n"))
    return tri, bi, uni, tot


def score_stupid_backoff(
    positions: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    tot: DataFrame,
    backoff: float = 0.4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc average log Stupid Backoff score: ``(id_col, n_scored,
    avg_sb)`` with ``avg_sb = round(sum_pos ln(S(pos)) / n_scored, 6)``
    and the paper's three-level relative-frequency score

    ``S = ct/tt`` if the trigram was seen, else ``b * cb/bt`` if the
    bigram was, else ``b * b * cu/n`` — context denominators ``tt`` =
    sum of ``ct`` over the ``(c2, c1)`` context and ``bt`` = sum of
    ``cb`` over ``c1`` (position-context counts, the self-consistent
    MapReduce formulation), ``b`` the fixed 0.4 backoff multiplier; no
    normalization, no discounting — "scores", not probabilities, which
    is what makes the method embarrassingly distributable at web scale.

    ``S`` is floored at 1e-300 before the ``ln`` so a held-out OOV word
    (score 0) yields a finite identical term on both engines instead of
    Spark NULL vs DuckDB -inf; the floor never binds when scoring the
    training corpus itself (the graded path — every gram is then seen).
    The per-doc sum folds in POSITION order (the module's FP recipe),
    and ``avg_sb`` is rounded to 6 decimals on both sides."""
    b = float(backoff)
    tt = tri.groupBy("c2", "c1").agg(F.sum("ct").alias("tt"))
    bt = bi.groupBy("c1").agg(F.sum("cb").alias("bt"))
    j = (
        positions.join(F.broadcast(tri), ["c2", "c1", "w"], "left")
        .join(F.broadcast(tt), ["c2", "c1"], "left")
        .join(F.broadcast(bi), ["c1", "w"], "left")
        .join(F.broadcast(bt), ["c1"], "left")
        .join(F.broadcast(uni), ["w"], "left")
        .crossJoin(F.broadcast(tot))
    )
    s = (
        F.when(F.coalesce(F.col("ct"), F.lit(0.0)) > 0, F.col("ct") / F.col("tt"))
        .when(
            F.coalesce(F.col("cb"), F.lit(0.0)) > 0,
            F.lit(b) * F.col("cb") / F.col("bt"),
        )
        .otherwise(
            F.lit(b) * F.lit(b) * F.coalesce(F.col("cu"), F.lit(0.0)) / F.col("n")
        )
    )
    term = F.log(F.greatest(s, F.lit(1e-300)))
    # position-ordered strict fold via the running window
    # (functions/folds.py) — replaces collect_list/array_sort/lambda
    agg = ordered_sums(
        j.select("_doc", "pos", term.alias("t")),
        ["_doc"],
        "pos",
        {"_s": "t"},
        n_alias="n_scored",
    )
    return agg.select(
        F.col("_doc").alias(id_col),
        "n_scored",
        F.round(F.col("_s") / F.col("n_scored"), 6).alias("avg_sb"),
    )


def stupid_backoff_scores(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    backoff: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end Stupid Backoff: count grams on ``train_docs`` (default:
    the scored corpus itself — the self-score used, like
    :func:`score_perplexity`, for head/middle/tail corpus splits) and
    score every non-empty doc in ``docs``.

    Raises ``ValueError`` on an empty/all-blank training corpus — the
    unigram denominator would be 0.0 and Spark's non-ANSI division would
    silently NULL every score (DuckDB would emit inf/NaN: a parity break
    stacked on a data bug). Same guard discipline as
    :func:`score_perplexity`.

    100 TB shape (the Brants et al. deployment itself): gram counting is
    one map-side-combined groupBy per order onto vocab-bounded tables
    (real corpora route the long tail to an UNK bucket first, keeping
    the count tables broadcast-able); scoring is broadcast joins plus
    one per-doc groupBy — zero Python anywhere."""
    pos = sb_positions(docs, id_col=id_col, text_col=text_col)
    if train_docs is None:
        # self-scoring (the graded path): share ONE tokenize+posexplode
        # pass between the count tables and the scoring join (same pin
        # as score_perplexity — the tot guard materializes it)
        pos = pos.localCheckpoint(eager=False)
        tpos = pos
    else:
        tpos = sb_positions(train_docs, id_col=id_col, text_col=text_col)
    tri, bi, uni, tot = train_stupid_backoff(tpos)
    row = tot.first()
    if row["n"] is None or row["n"] == 0:
        raise ValueError(
            "stupid-backoff training corpus has no tokens (empty or "
            "all-whitespace text) — refusing to score with a zero "
            "unigram denominator"
        )
    return score_stupid_backoff(
        pos, tri, bi, uni, tot, backoff=backoff, id_col=id_col
    )


def stupid_backoff_oracle_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
) -> str:
    """DuckDB oracle for :func:`stupid_backoff_scores` (self-trained
    path). Mirrors tokenization, the double-``<s>`` trigram padding,
    the three-level CASE with left-to-right ``b * c / denom``
    evaluation, the 1e-300 floor, the position-ordered ``list_reduce``
    fold, and the 6-decimal round."""
    b = float(backoff)
    return rf"""
    WITH toks AS (
      SELECT {id_col} AS d,
             list_filter(string_split_regex(trim(lower({text_col})), '\s+'),
                         x -> x != '') AS ts
      FROM {docs_table}),
    ne AS (SELECT * FROM toks WHERE len(ts) > 0),
    pos AS (
      SELECT d, unnest(generate_series(1, len(ts))) AS pos, ts FROM ne),
    pw AS (
      SELECT d, pos,
             CASE WHEN pos <= 2 THEN '{BOS}' ELSE ts[pos - 2] END AS c2,
             CASE WHEN pos = 1 THEN '{BOS}' ELSE ts[pos - 1] END AS c1,
             ts[pos] AS w
      FROM pos),
    tri AS (SELECT c2, c1, w, count(*)::DOUBLE AS ct FROM pw GROUP BY c2, c1, w),
    tt AS (SELECT c2, c1, sum(ct) AS tt FROM tri GROUP BY c2, c1),
    bi AS (SELECT c1, w, sum(ct) AS cb FROM tri GROUP BY c1, w),
    bt AS (SELECT c1, sum(cb) AS bt FROM bi GROUP BY c1),
    uni AS (SELECT w, sum(ct) AS cu FROM tri GROUP BY w),
    tot AS (SELECT sum(ct) AS n FROM tri),
    terms AS (
      SELECT p.d, p.pos,
             ln(greatest(
               CASE WHEN COALESCE(tri.ct, 0) > 0 THEN tri.ct / tt.tt
                    WHEN COALESCE(bi.cb, 0) > 0 THEN {b} * bi.cb / bt.bt
                    ELSE {b} * {b} * COALESCE(uni.cu, 0) / tot.n
               END, 1e-300)) AS t
      FROM pw p
      LEFT JOIN tri ON tri.c2 = p.c2 AND tri.c1 = p.c1 AND tri.w = p.w
      LEFT JOIN tt ON tt.c2 = p.c2 AND tt.c1 = p.c1
      LEFT JOIN bi ON bi.c1 = p.c1 AND bi.w = p.w
      LEFT JOIN bt ON bt.c1 = p.c1
      LEFT JOIN uni ON uni.w = p.w, tot),
    agg AS (
      SELECT d, count(*)::BIGINT AS n_scored,
             list_reduce(list(t ORDER BY pos), (a, b) -> a + b) AS s
      FROM terms GROUP BY d)
    SELECT d AS {id_col}, n_scored, round(s / n_scored, 6) AS avg_sb
    FROM agg
    """


def lm_oracle_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> str:
    """DuckDB oracle for :func:`score_perplexity` (self-trained path).
    Mirrors tokenization (trimmed lower \\s+ split, '' filtered),
    1-based positions, BOS context, add-alpha arithmetic in DOUBLE, the
    position-ordered ``list_reduce`` fold, and the 6-decimal round."""
    a = float(alpha)
    return rf"""
    WITH toks AS (
      SELECT {id_col} AS d,
             list_filter(string_split_regex(trim(lower({text_col})), '\s+'),
                         x -> x != '') AS ts
      FROM {docs_table}),
    ne AS (SELECT * FROM toks WHERE len(ts) > 0),
    pos AS (
      SELECT d, unnest(generate_series(1, len(ts))) AS pos, ts FROM ne),
    pw AS (
      SELECT d, pos,
             CASE WHEN pos = 1 THEN '{BOS}' ELSE ts[pos - 1] END AS ctx,
             ts[pos] AS w
      FROM pos),
    cnts AS (SELECT ctx, w, count(*)::DOUBLE AS c FROM pw GROUP BY ctx, w),
    ctxs AS (SELECT ctx, count(*)::DOUBLE AS cc FROM pw GROUP BY ctx),
    v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM pw),
    terms AS (
      SELECT p.d, p.pos,
             ln((COALESCE(cnts.c, 0) + {a}) /
                (COALESCE(ctxs.cc, 0) + {a} * v.v)) AS t
      FROM pw p
      LEFT JOIN cnts ON cnts.ctx = p.ctx AND cnts.w = p.w
      LEFT JOIN ctxs ON ctxs.ctx = p.ctx, v),
    agg AS (
      SELECT d, count(*)::BIGINT AS n_scored,
             list_reduce(list(t ORDER BY pos), (a, b) -> a + b) AS s
      FROM terms GROUP BY d)
    SELECT d AS {id_col}, n_scored, round(s / n_scored, 6) AS avg_ll
    FROM agg
    """
