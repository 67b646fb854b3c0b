"""Search-side ranking (operators/ranking.py): BM25 and the inverted
index against independent pure-Python references on randomized corpora,
plus the FP-portability property the design hinges on (sorted-term fold)
and the web-scale sharding property (sharded postings concatenate back
to the unsharded index)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.ranking import (
    bm25_maxscore_topk,
    bm25_topk,
    inverted_index,
)

_WORDS = ["hash", "join", "spark", "scan", "sort", "merge", "page", "row"]


def _rand_docs(rng, n=40):
    rows = []
    for i in range(n):
        L = rng.randrange(0, 12)
        text = " ".join(rng.choice(_WORDS) for _ in range(L))
        # exercise the blank/whitespace-only quirk paths too
        if rng.random() < 0.1:
            text = "   "
        rows.append((i, text))
    rows.append((n, None))  # null text must be excluded everywhere
    return rows


def _tokens(text):
    return [t for t in text.lower().split() if t]


def _py_bm25(rows, terms, k=10, k1=1.2, b=0.75):
    corpus = [(i, _tokens(t)) for i, t in rows if t is not None]
    n = len(corpus)
    avgdl = sum(len(t) for _, t in corpus) / n
    terms = sorted(set(terms))
    df = {
        q: sum(1 for _, t in corpus if q in t) for q in terms
    }
    out = []
    for i, toks in corpus:
        comps = []
        for q in terms:  # sorted-term order == the engines' fold order
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            comps.append(idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl)))
        if comps:
            acc = 0.0
            for c in comps:
                acc += c
            out.append((i, round(acc, 6)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def _py_inverted(rows):
    post = {}
    for i, t in rows:
        if t is None:
            continue
        for tok in _tokens(t):
            post.setdefault(tok, {}).setdefault(i, 0)
            post[tok][i] += 1
    return {
        term: (
            len(d),
            sum(d.values()),
            ",".join(f"{doc}:{tf}" for doc, tf in sorted(d.items())),
        )
        for term, d in post.items()
    }


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_bm25_matches_python_reference(spark, seed):
    rows = _rand_docs(random.Random(seed))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.doc_id, r.score) for r in bm25_topk(docs, ["hash", "join", "spark"]).collect()]
    assert got == _py_bm25(rows, ["hash", "join", "spark"])


def test_bm25_fold_is_partitioning_invariant(spark):
    """The score sum folds in sorted-term order regardless of physical
    layout — the property that makes the DuckDB oracle exact."""
    rows = _rand_docs(random.Random(99), n=120)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = bm25_topk(docs.repartition(1), _WORDS, k=30).collect()
    b = bm25_topk(docs.repartition(17), _WORDS, k=30).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_bm25_maxscore_equals_exact(spark, seed):
    """Max-score pruning is result-identical to the exhaustive scorer on
    randomized corpora — the theorem the shared oracle grading rests on."""
    rows = _rand_docs(random.Random(seed), n=80)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for terms, k in [(["hash", "join", "spark"], 10), (_WORDS, 5), (["page"], 3)]:
        exact = [(r.doc_id, r.score) for r in bm25_topk(docs, terms, k=k).collect()]
        pruned = [
            (r.doc_id, r.score) for r in bm25_maxscore_topk(docs, terms, k=k).collect()
        ]
        assert pruned == exact == _py_bm25(rows, terms, k=k)


def test_bm25_maxscore_edge_cases(spark):
    """Phase 1 smaller than k (θ = −∞ → no pruning), query terms absent
    from the corpus (empty result), and k beyond the corpus size."""
    rows = [(0, "hash join"), (1, "join"), (2, "scan sort"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # only one doc contains 'hash' (the top-ub term), k=2 > phase-1 size
    exact = [(r.doc_id, r.score) for r in bm25_topk(docs, ["hash", "scan"], k=2).collect()]
    pruned = [
        (r.doc_id, r.score)
        for r in bm25_maxscore_topk(docs, ["hash", "scan"], k=2).collect()
    ]
    assert pruned == exact and len(pruned) == 2
    assert bm25_maxscore_topk(docs, ["zzz"], k=5).count() == 0
    assert (
        bm25_maxscore_topk(docs, ["join"], k=50).count()
        == bm25_topk(docs, ["join"], k=50).count()
    )


def test_bm25_maxscore_prunes_dominated_docs(spark):
    """A corpus built so phase 2 provably prunes: k docs rich in the
    top-ub term dominate a long tail that only contains a weak term whose
    upper bound cannot reach θ. The pruned run must still return exactly
    the exhaustive top-k (tie-break order included)."""
    rows = [(i, "hash hash hash join") for i in range(5)]
    rows += [(100 + i, "scan") for i in range(60)]  # weak-term-only tail
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = [(r.doc_id, r.score) for r in bm25_topk(docs, ["hash", "scan"], k=5).collect()]
    pruned = [
        (r.doc_id, r.score)
        for r in bm25_maxscore_topk(docs, ["hash", "scan"], k=5).collect()
    ]
    assert pruned == exact
    assert all(d < 100 for d, _ in pruned)  # the tail never places


@pytest.mark.parametrize("seed", [7, 23])
def test_inverted_index_matches_python_reference(spark, seed):
    rows = _rand_docs(random.Random(seed))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.term: (r.df_docs, r.total_tf, r.postings)
        for r in inverted_index(docs).collect()
    }
    assert got == _py_inverted(rows)


def test_inverted_index_min_df(spark):
    rows = [(0, "a b"), (1, "a"), (2, "a c c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term for r in inverted_index(docs, min_df=2).collect()}
    assert got == {"a"}  # 'a' is the only term appearing in >=2 docs


def test_sharded_index_concatenates_to_unsharded(spark):
    """shard_size bounds a hot term's postings row; concatenating a
    term's shards in shard order must reproduce the unsharded index
    exactly (df/tf sums and postings string)."""
    rows = _rand_docs(random.Random(5), n=60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    flat = {
        r.term: (r.df_docs, r.total_tf, r.postings)
        for r in inverted_index(docs).collect()
    }
    sharded = {}
    for r in sorted(
        inverted_index(docs, shard_size=8).collect(),
        key=lambda r: (r.term, r.shard),
    ):
        df0, tf0, p0 = sharded.get(r.term, (0, 0, ""))
        sharded[r.term] = (
            df0 + r.df_docs,
            tf0 + r.total_tf,
            p0 + ("," if p0 else "") + r.postings,
        )
    assert sharded == flat
    # every sharded row's postings stay within the shard's doc range
    for r in inverted_index(docs, shard_size=8).collect():
        for p in r.postings.split(","):
            assert int(p.split(":")[0]) // 8 == r.shard


def _py_mlt(rows, qid, k=10):
    corpus = {i: _tokens(t) for i, t in rows if t is not None}
    n = len(corpus)
    tf = {
        i: {w: toks.count(w) for w in set(toks)} for i, toks in corpus.items()
    }
    df = {}
    for d in tf.values():
        for w in d:
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log((n + 1.0) / (c + 1.0)) + 1.0 for w, c in df.items()}
    wts = {
        i: {w: c * idf[w] for w, c in d.items()} for i, d in tf.items()
    }

    def fold(items):  # sorted-term strict left fold
        acc = 0.0
        for _, v in sorted(items):
            acc = acc + v
        return acc

    norms = {i: math.sqrt(fold([(w, x * x) for w, x in d.items()])) for i, d in wts.items()}
    q = wts.get(qid, {})
    out = []
    for i, d in wts.items():
        if i == qid:
            continue
        shared = [(w, d[w] * q[w]) for w in d if w in q]
        if not shared:
            continue
        out.append((i, round(fold(shared) / (norms[i] * norms[qid]), 6)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


@pytest.mark.parametrize("seed", [9, 37])
def test_more_like_this_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.ranking import more_like_this

    rows = _rand_docs(random.Random(seed), n=50)
    # make sure doc 0 has text (the query side)
    rows[0] = (0, "hash join spark scan hash")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.doc_id, r.cos) for r in more_like_this(docs, 0, k=15).collect()]
    assert got == _py_mlt(rows, 0, k=15)
    assert len(got) > 0


def _py_snippets(rows, terms, w=5):
    out = {}
    for i, t in rows:
        if t is None:
            continue
        toks = _tokens(t)
        pos = [toks.index(q) + 1 for q in terms if q in toks]
        if not pos:
            continue
        p = min(pos)
        start = max(1, p - w)
        out[i] = (p, " ".join(toks[start - 1 : p + w]))
    return out


@pytest.mark.parametrize("seed", [4, 19])
def test_snippets_match_python_reference(spark, seed):
    from obp_search_engine_spark.operators.ranking import search_snippets

    rows = _rand_docs(random.Random(seed), n=50)
    # force edge cases: hit at position 1 and hit near the end
    rows[1] = (1, "hash a b c d e f g h i j k")
    rows[2] = (2, "a b join")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.pos, r.snippet)
        for r in search_snippets(docs, ["hash", "join", "spark"], window=5).collect()
    }
    assert got == _py_snippets(rows, ["hash", "join", "spark"], w=5)
    assert got[1][0] == 1 and got[1][1] == "hash a b c d e"  # left-clamped
    assert got[2] == (3, "a b join")  # right edge: no tokens past the end


# ---------------------------------------------------------------------------
# anchor_profiles — per-target anchor-term top-k
# ---------------------------------------------------------------------------
def _py_anchor(links, k=3):
    from collections import Counter

    cnt = {}
    for dst, anchor in links:
        for term in anchor.lower().split():
            cnt.setdefault(dst, Counter())[term] += 1
    out = {}
    for dst, c in cnt.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[dst] = [(t, n, i + 1) for i, (t, n) in enumerate(ranked)]
    return out


def test_anchor_profiles_semantics(spark):
    from obp_search_engine_spark.operators.ranking import anchor_profiles

    links = [
        (1, "Cheap  Widgets"),
        (1, "cheap widgets here"),
        (1, "best widgets"),
        (1, "widgets"),
        (2, "  "),  # whitespace-only anchor contributes nothing
        (3, "solo"),
    ]
    df = spark.createDataFrame(links, "dst long, anchor string")
    got = {}
    for r in anchor_profiles(df, k=2).collect():
        got.setdefault(r.dst, []).append((r.term, r.cnt, r.rnk))
    ref = {d: v[:2] for d, v in _py_anchor(links, 2).items()}
    for d in got:
        got[d].sort(key=lambda x: x[2])
    assert got == ref
    assert 2 not in got  # empty anchors leave no profile
    assert got[1][0] == ("widgets", 4, 1)  # case-folded count


def test_anchor_profiles_random_parity_and_oracle(spark):
    import random

    duckdb = pytest.importorskip("duckdb")
    from obp_search_engine_spark.operators.ranking import (
        anchor_profiles,
        anchor_profiles_oracle_sql,
    )

    rng = random.Random(61)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    links = [
        (
            rng.randrange(8),
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 4))),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(links, "dst long, anchor string")
    key = lambda r: (r[0], r[3], r[1])  # noqa: E731
    got = sorted(
        ((r.dst, r.term, r.cnt, r.rnk) for r in anchor_profiles(df, 3).collect()),
        key=key,
    )
    vals = ", ".join(f"({d}, '{a}')" for d, a in links)
    sql = anchor_profiles_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(dst, anchor)", k=3
    )
    oracle = sorted(map(tuple, duckdb.sql(sql).fetchall()), key=key)
    assert got == oracle
    ref = _py_anchor(links, 3)
    flat = sorted(
        ((d, t, n, r) for d, v in ref.items() for t, n, r in v), key=key
    )
    assert got == flat


def test_rrf_fuse_matches_python_reference(spark):
    from obp_search_engine_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 7.0), (3, 5.0)], "doc long, score double"
    )
    b = spark.createDataFrame(
        [(3, 100.0), (4, 90.0), (1, 80.0)], "doc long, score double"
    )
    got = {
        r.doc: r.rrf
        for r in rrf_fuse({"sysa": a, "sysb": b}, k0=60, k=10).collect()
    }
    # ranks: sysa 1->1, 2->2, 3->3; sysb 3->1, 4->2, 1->3
    want = {
        1: round(1 / 61 + 1 / 63, 6),
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        4: round(1 / 62, 6),
    }
    assert got == want


def test_rrf_ties_break_by_doc_id(spark):
    from obp_search_engine_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(5, 1.0), (2, 1.0)], "doc long, score double"
    )
    rows = rrf_fuse({"only": a}, k=2).collect()
    # equal scores -> rank by doc asc: doc 2 gets rank 1
    assert [r.doc for r in rows] == [2, 5]


# ---------------------------------------------------------------------------
# nDCG@k (round 5)
# ---------------------------------------------------------------------------
def test_ndcg_hand_computed(spark):
    import math

    from obp_search_engine_spark.operators.ranking import ndcg_at_k

    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 3), ("q", 3, 0), ("q", 4, 2)],
        "query string, doc_id long, rel int",
    )
    r = ndcg_at_k(run, qrels, k=3).collect()[0]
    dcg = 1 / math.log2(2) + 3 / math.log2(3) + 0 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert r.dcg == round(dcg, 6)
    assert r.idcg == round(idcg, 6)
    assert r.ndcg == round(dcg / idcg, 6)


def test_ndcg_perfect_and_degenerate(spark):
    from obp_search_engine_spark.operators.ranking import ndcg_at_k

    # perfect ranking (rel descending in rank order) => ndcg == 1
    run = spark.createDataFrame(
        [("q", i, i) for i in range(1, 6)], "query string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", i, 6 - i) for i in range(1, 6)], "query string, doc_id long, rel int"
    )
    assert ndcg_at_k(run, qrels, k=5).collect()[0].ndcg == 1.0
    # reversed ranking scores strictly less
    rev = spark.createDataFrame(
        [("q", i, 6 - i) for i in range(1, 6)], "query string, doc_id long, rank int"
    )
    assert ndcg_at_k(rev, qrels, k=5).collect()[0].ndcg < 1.0
    # no relevant docs => ndcg 0, not NaN/null
    none = spark.createDataFrame(
        [("q2", 9, 1)], "query string, doc_id long, rank int"
    )
    empty_qrels = spark.createDataFrame([], "query string, doc_id long, rel int")
    row = ndcg_at_k(none, empty_qrels, k=5).collect()[0]
    assert (row.dcg, row.idcg, row.ndcg) == (0.0, 0.0, 0.0)


def test_ndcg_unjudged_docs_score_zero(spark):
    from obp_search_engine_spark.operators.ranking import ndcg_at_k

    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 99, 2)], "query string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 2)], "query string, doc_id long, rel int"
    )
    r = ndcg_at_k(run, qrels, k=10).collect()[0]
    # doc 99 is unjudged -> rel 0; single judged doc at rank 1 => perfect
    assert r.ndcg == 1.0


def test_map_hand_computed_and_edges(spark):
    from obp_search_engine_spark.operators.ranking import map_at_k

    # run: relevant at ranks 1 and 3 (doc 1, doc 3); doc 2 irrelevant;
    # R = 3 relevant total but only 2 retrieved
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 2), ("q", 9, 1)],
        "query string, doc_id long, rel int",
    )
    r = map_at_k(run, qrels, k=10, rel_threshold=1).collect()[0]
    assert r.ap == round((1 / 1 + 2 / 3) / 3, 6)
    # rel_threshold binarization: only doc 3 (rel 2) counts
    r2 = map_at_k(run, qrels, k=10, rel_threshold=2).collect()[0]
    assert r2.ap == round((1 / 3) / 1, 6)
    # no relevant docs at all -> 0.0 (not null)
    none = spark.createDataFrame([("q2", 5, 1)], "query string, doc_id long, rank int")
    empty = spark.createDataFrame([], "query string, doc_id long, rel int")
    assert map_at_k(none, empty, k=10).collect()[0].ap == 0.0
    # perfect run: all k retrieved relevant, R <= k -> ap == 1
    prun = spark.createDataFrame(
        [("q3", i, i) for i in range(1, 4)], "query string, doc_id long, rank int"
    )
    pq = spark.createDataFrame(
        [("q3", i, 1) for i in range(1, 4)], "query string, doc_id long, rel int"
    )
    assert map_at_k(prun, pq, k=10).collect()[0].ap == 1.0


def test_mrr_hand_computed_and_edges(spark):
    from obp_search_engine_spark.operators.ranking import mrr_at_k

    # first relevant (rel >= 1) at rank 2 -> rr = 0.5
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 2, 1), ("q", 3, 2)], "query string, doc_id long, rel int"
    )
    assert mrr_at_k(run, qrels, k=10).collect()[0].rr == 0.5
    # threshold binarization: rel >= 2 keeps only doc 3 (rank 3)
    assert mrr_at_k(run, qrels, k=10, rel_threshold=2).collect()[0].rr == round(
        1 / 3, 6
    )
    # cutoff: the only relevant doc sits past k -> 0.0
    assert mrr_at_k(run, qrels, k=2, rel_threshold=2).collect()[0].rr == 0.0
    # no relevant docs at all -> 0.0 (not null)
    none = spark.createDataFrame([("q2", 5, 1)], "query string, doc_id long, rank int")
    empty = spark.createDataFrame([], "query string, doc_id long, rel int")
    assert mrr_at_k(none, empty, k=10).collect()[0].rr == 0.0


def test_precision_recall_hand_computed_and_edges(spark):
    from obp_search_engine_spark.operators.ranking import precision_recall_at_k

    # 2 of 3 retrieved are relevant; R = 3 total relevant
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 2), ("q", 9, 1)],
        "query string, doc_id long, rel int",
    )
    r = precision_recall_at_k(run, qrels, k=10).collect()[0]
    # trec_eval convention: precision divides by k even when < k retrieved
    assert (r.hits, r.precision, r.recall) == (2, 0.2, round(2 / 3, 6))
    # k=2 cutoff drops the rank-3 hit
    r2 = precision_recall_at_k(run, qrels, k=2).collect()[0]
    assert (r2.hits, r2.precision, r2.recall) == (1, 0.5, round(1 / 3, 6))
    # R = 0 -> recall 0.0 (not null/NaN), hits 0
    none = spark.createDataFrame([("q2", 5, 1)], "query string, doc_id long, rank int")
    empty = spark.createDataFrame([], "query string, doc_id long, rel int")
    r3 = precision_recall_at_k(none, empty, k=10).collect()[0]
    assert (r3.hits, r3.precision, r3.recall) == (0, 0.0, 0.0)


def test_err_hand_computed_and_edges(spark):
    from obp_search_engine_spark.operators.ranking import err_at_k

    # grades 0..3, max_grade=3: R = (2^g - 1)/8 in {0, 1/8, 3/8, 7/8}
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 1, 3), ("q", 3, 1)], "query string, doc_id long, rel int"
    )
    # rank 1: R=7/8 -> 7/8; rank 2 unjudged: R=0; rank 3: R=1/8,
    # p_before = 1/8 -> (1/8)*(1/8)/3
    expect = 7 / 8 + (1 / 8) * (1 / 8) / 3
    assert err_at_k(run, qrels, k=10).collect()[0].err == round(expect, 6)
    # cutoff drops the rank-3 term
    assert err_at_k(run, qrels, k=2).collect()[0].err == round(7 / 8, 6)
    # all-unjudged run -> ERR 0.0 (not null)
    none = spark.createDataFrame([("q2", 5, 1)], "query string, doc_id long, rank int")
    empty = spark.createDataFrame([], "query string, doc_id long, rel int")
    assert err_at_k(none, empty, k=10).collect()[0].err == 0.0
    # perfect ranking of a single max-grade doc -> 7/8
    prun = spark.createDataFrame(
        [("q3", 1, 1)], "query string, doc_id long, rank int"
    )
    pq = spark.createDataFrame(
        [("q3", 1, 3)], "query string, doc_id long, rel int"
    )
    assert err_at_k(prun, pq, k=10).collect()[0].err == 0.875


def test_rbp_hand_computed_and_residual(spark):
    from obp_search_engine_spark.operators.ranking import rbp_at_k

    # p = 1/2, graded gains rel/3: RBP = (1/2)·Σ (rel_i/3)·(1/2)^(i-1)
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 1, 3), ("q", 3, 1)], "query string, doc_id long, rel int"
    )
    row = rbp_at_k(run, qrels, k=10).collect()[0]
    # rank1 rel3: (1/2)(1)(1) ; rank2 unjudged 0 ; rank3 rel1: (1/2)(1/3)(1/4)
    assert row.rbp == round(0.5 * (1.0 + 0.0 + (1 / 3) * 0.25), 6)
    # residual: run is 3 deep -> tail mass Σ_{i>=4}(1/2)^i = (1/2)^3
    assert row.residual == round(0.125, 6)
    # cutoff at k=2 drops the rank-3 gain AND adds it to the residual
    row2 = rbp_at_k(run, qrels, k=2).collect()[0]
    assert row2.rbp == 0.5
    assert row2.residual == round(0.25, 6)
    # a rank gap (rank 2 missing from the run) goes into the residual
    gappy = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 3)], "query string, doc_id long, rank int"
    )
    rg = rbp_at_k(gappy, qrels, k=3).collect()[0]
    assert rg.residual == round(0.25 + 0.125, 6)
    # perfect run: every rank max-grade, full depth -> rbp + residual = 1
    perf = spark.createDataFrame(
        [("p", d, d) for d in range(1, 11)],
        "query string, doc_id long, rank int",
    )
    pq = spark.createDataFrame(
        [("p", d, 3) for d in range(1, 11)],
        "query string, doc_id long, rel int",
    )
    pr = rbp_at_k(perf, pq, k=10).collect()[0]
    assert round(pr.rbp + pr.residual, 6) == 1.0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_spell_suggest_semantics(spark):
    from obp_search_engine_spark.operators.ranking import spell_suggest_topk

    # vocab tfs: cat=3, car=2, cart=1, dog=1
    docs = _docs(spark, ["cat cat car", "cat car cart", "dog"])
    out = spell_suggest_topk(docs, ["cat", "cae", "cartt", "zzz"], k=3)
    rows = {(r.qterm, r.rank): (r.suggestion, r.dist, r.tf) for r in out.collect()}
    # exact term suggests itself first (dist 0), then dist-1 by tf desc
    assert rows[("cat", 1)] == ("cat", 0, 3)
    assert rows[("cat", 2)] == ("car", 1, 2)  # substitution
    assert rows[("cat", 3)] == ("cart", 1, 1)  # insertion
    assert ("cat", 4) not in rows  # dog is dist 3: excluded (and k=3)
    # unseen term with dist-1 neighbors: cae -> cat (sub), car (sub)
    assert rows[("cae", 1)] == ("cat", 1, 3)
    assert rows[("cae", 2)] == ("car", 1, 2)
    # insertion: cartt -> cart
    assert rows[("cartt", 1)] == ("cart", 1, 1)
    # no candidate within distance 1 -> no row at all
    assert not any(q == "zzz" for q, _ in rows)
    # one-char terms meet through the empty-string delete key
    one = _docs(spark, ["a a b"])
    r1 = {(r.qterm, r.rank): r.suggestion
          for r in spell_suggest_topk(one, ["b"], k=3).collect()}
    assert r1[("b", 1)] == "b" and r1[("b", 2)] == "a"


def test_autocomplete_semantics(spark):
    from obp_search_engine_spark.operators.ranking import autocomplete_topk

    # tfs: spark=3, spare=2, spam=2, ham=1 (pruned by min_tf=2)
    docs = _docs(spark, ["spark spark spare", "spark spare spam spam ham"])
    out = autocomplete_topk(docs, k=2, min_len=2, max_len=4, min_tf=2)
    rows = {(r.prefix, r.rank): (r.term, r.tf) for r in out.collect()}
    # shared prefix ranks by tf desc then term asc
    assert rows[("sp", 1)] == ("spark", 3)
    assert rows[("spa", 1)] == ("spark", 3)
    assert rows[("spa", 2)] == ("spam", 2)  # tf tie space: spam < spare
    # k=2 cuts spare at the 'spa' prefix
    assert ("spa", 3) not in rows
    # max_len=4 caps prefixes: full 5-char term never appears as prefix
    assert not any(len(p) > 4 or len(p) < 2 for p, _ in rows)
    # min_tf prunes hapax 'ham' entirely
    assert not any(t == "ham" for t, _ in rows.values())
    # distinct 4-prefixes split spark/spare vs spam
    assert rows[("spar", 1)] == ("spark", 3)
    assert rows[("spam", 1)] == ("spam", 2)


def test_related_terms_pmi_hand_computed(spark):
    import math
    from obp_search_engine_spark.operators.ranking import related_terms_pmi

    # N=4 docs; df: a=3, b=2, c=2; cooc(a,b)=2, cooc(a,c)=1
    docs = _docs(spark, ["a b", "a b", "a c", "c"])
    out = related_terms_pmi(docs, ["a"], k=10, min_cooc=1)
    rows = {(r.anchor, r.rank): (r.term, r.n_cooc, r.pmi) for r in out.collect()}
    assert rows[("a", 1)] == ("b", 2, round(math.log(2 * 4 / (3 * 2)), 6))
    assert rows[("a", 2)] == ("c", 1, round(math.log(1 * 4 / (3 * 2)), 6))
    # min_cooc floor prunes the single-doc pair
    pruned = related_terms_pmi(docs, ["a"], k=10, min_cooc=2).collect()
    assert [(r.term,) for r in pruned] == [("b",)]
    # anchor never suggests itself
    assert not any(t == "a" for t, _, _ in rows.values())
    # repeated term within one doc counts once (distinct postings)
    dup = _docs(spark, ["a b b b", "a"])
    r = related_terms_pmi(dup, ["a"], k=10, min_cooc=1).collect()[0]
    assert (r.term, r.n_cooc, r.pmi) == ("b", 1, round(math.log(1 * 2 / (2 * 1)), 6))


def test_serve_search_pipeline_composition(spark):
    from obp_search_engine_spark.operators.ranking import (
        bm25_topk,
        serve_search_pipeline,
    )

    docs = _docs(
        spark,
        ["hash join hash", "join scan", "sort merge sort merge", "scan scan"],
    )
    # 'hsh' -> hash, 'scann' -> scan; 'jion' is Levenshtein 2 from join
    # (transposition) so it drops out of the corrected query entirely
    out = serve_search_pipeline(
        docs, ["hsh", "scann", "jion"], k=10, window=1
    ).collect()
    got = {r.doc_id: (r.score, r.pos, r.snippet) for r in out}
    # scores must equal BM25 over the corrected literal terms
    expected = {
        r.doc_id: r.score for r in bm25_topk(docs, ["hash", "scan"], k=10).collect()
    }
    assert {d: s for d, (s, _, _) in got.items()} == expected
    # snippets: earliest corrected-term hit, +-1 token, clamped at edges
    assert got[0][1:] == (1, "hash join")       # pos 1 clamps left
    assert got[1][1:] == (2, "join scan")       # scan at pos 2, end clamp
    assert got[3][1:] == (1, "scan scan")
    assert 2 not in got                          # no corrected term
    # result-page order: score DESC, doc_id ASC
    assert [r.doc_id for r in out] == sorted(
        got, key=lambda d: (-got[d][0], d)
    )
    # all raw terms uncorrectable -> empty result page
    assert serve_search_pipeline(docs, ["zzzzzz"], k=10).count() == 0


def test_autocomplete_delta_merge_equals_rebuild(spark):
    import random
    from obp_search_engine_spark.operators.ranking import (
        autocomplete_topk,
        autocomplete_vocab,
        merge_autocomplete_delta,
        _autocomplete_from_vocab,
    )

    rng = random.Random(17)
    rows = _rand_docs(rng, n=60)
    base = spark.createDataFrame(rows, "doc_id long, text string")
    drows = _rand_docs(random.Random(91), n=20)
    delta = spark.createDataFrame(
        [(1000 + i, t) for i, t in drows], "doc_id long, text string"
    )
    kw = dict(k=3, min_len=2, max_len=4, min_tf=2)
    base_vocab = autocomplete_vocab(base)
    base_index = _autocomplete_from_vocab(base_vocab, **kw)
    merged = merge_autocomplete_delta(base_vocab, base_index, delta, **kw)
    rebuilt = autocomplete_topk(base.unionByName(delta), **kw)
    key = lambda r: (r.prefix, r.rank)
    assert sorted(map(tuple, merged.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, rebuilt.collect()), key=lambda t: t[:2]
    )
    # threshold crossing: a base hapax term crosses min_tf via the delta
    b2 = _docs(spark, ["zebra"])          # tf 1 -> pruned from base index
    d2 = _docs(spark, ["zebra zebra"])    # merged tf 3 -> must appear
    v2 = autocomplete_vocab(b2)
    i2 = _autocomplete_from_vocab(v2, **kw)
    assert i2.count() == 0
    m2 = merge_autocomplete_delta(v2, i2, d2, **kw)
    got = {(r.prefix, r.term, r.tf) for r in m2.collect()}
    assert got == {("ze", "zebra", 3), ("zeb", "zebra", 3), ("zebr", "zebra", 3)}
    # untouched prefixes pass through verbatim (no delta vocabulary at all)
    empty_delta = spark.createDataFrame([], "doc_id long, text string")
    passthru = merge_autocomplete_delta(base_vocab, base_index, empty_delta, **kw)
    assert sorted(map(tuple, passthru.collect())) == sorted(
        map(tuple, base_index.collect())
    )


def test_cori_shard_selection_hand_computed(spark):
    import math
    from obp_search_engine_spark.operators.ranking import shard_selection_cori

    # force both docs into known shards by picking n_shards=1 first:
    # a single shard must score the closed-form belief mean
    docs = _docs(spark, ["hash hash join", "scan sort"])
    r = shard_selection_cori(docs, ["hash", "scan"], n_shards=1).collect()
    assert len(r) == 1 and r[0].n_terms == 2
    # |S|=1: I = ln(1.5/1)/ln(2); cw=5, avg_cw=5 -> T = df/(df+200)
    i_term = math.log(1.5) / math.log(2.0)
    belief = lambda df: 0.4 + 0.6 * (df / (df + 200.0)) * i_term
    assert r[0].score == round((belief(1) + belief(1)) / 2, 6)
    # a term absent from every shard drops entirely (cf = 0)
    r2 = shard_selection_cori(docs, ["hash", "zzz"], n_shards=1).collect()
    assert r2[0].n_terms == 1 and r2[0].score == round(belief(1), 6)
    # multi-shard: scores order shards by query-term affinity — the
    # shard(s) holding 'hash' must outrank hash-free shards
    many = _docs(spark, ["hash join"] * 4 + ["scan sort"] * 4)
    rows = shard_selection_cori(many, ["hash"], n_shards=4).collect()
    assert len(rows) >= 2
    # every returned score is a valid CORI belief mean in (0.4-eps, 1)
    assert all(0.0 <= row.score <= 1.0 for row in rows)
    # ordering contract: score DESC then shard ASC
    assert [ (row.score, row.shard) for row in rows ] == sorted(
        [(row.score, row.shard) for row in rows], key=lambda t: (-t[0], t[1])
    )


def test_query_likelihood_hand_computed(spark):
    import math
    from obp_search_engine_spark.operators.ranking import query_likelihood_topk

    # corpus: d0 = "a a b", d1 = "b c"; |C| = 5, cf(a)=2, cf(b)=2, cf(c)=1
    docs = _docs(spark, ["a a b", "b c"])
    mu = 10.0
    r = {row.doc_id: row.score
         for row in query_likelihood_topk(docs, ["a", "b"], mu=mu).collect()}
    s = lambda tf, cf, dl: math.log((tf + mu * cf / 5.0) / (dl + mu))
    assert r[0] == round(s(2, 2.0, 3) + s(1, 2.0, 3), 6)
    assert r[1] == round(s(0, 2.0, 2) + s(1, 2.0, 2), 6)
    # d0 has both terms, so it must outrank d1
    assert r[0] > r[1]
    # a term absent from the collection drops (cf=0): score unchanged
    r2 = {row.doc_id: row.score
          for row in query_likelihood_topk(docs, ["a", "b", "zzz"], mu=mu).collect()}
    assert r2 == r
    # candidate rule: a doc with no query term never appears
    docs3 = _docs(spark, ["a a b", "b c", "zz zz"])
    r3 = query_likelihood_topk(docs3, ["a"], mu=mu).collect()
    assert {row.doc_id for row in r3} == {0}


def test_rm3_expansion_hand_computed(spark):
    from obp_search_engine_spark.operators.ranking import rm3_expansion_terms

    # fb_docs=1 makes the feedback set exactly the QL winner; the RM is
    # then just that doc's MLE term distribution
    docs = _docs(spark, ["a a b", "b c"])
    out = {row.term: row.weight
           for row in rm3_expansion_terms(
               docs, ["a"], fb_docs=1, fb_terms=10, alpha=0.5, mu=10.0
           ).collect()}
    # winner is d0 ("a a b"): P(a|R)=2/3, P(b|R)=1/3; P(a|q)=1
    assert out["a"] == round(0.5 * 1.0 + 0.5 * (2.0 / 3.0), 6)
    assert out["b"] == round(0.5 * 0.0 + 0.5 * (1.0 / 3.0), 6)
    assert "c" not in out
    # alpha=0 degenerates to the original query distribution
    out0 = {row.term: row.weight
            for row in rm3_expansion_terms(
                docs, ["a", "a", "b"], fb_docs=1, fb_terms=10, alpha=0.0,
                mu=10.0,
            ).collect()}
    assert out0["a"] == round(2.0 / 3.0, 6) and out0["b"] == round(1.0 / 3.0, 6)
    # expansion brings in feedback-doc terms absent from the query
    out1 = {row.term: row.weight
            for row in rm3_expansion_terms(
                docs, ["c"], fb_docs=1, fb_terms=10, alpha=0.5, mu=10.0
            ).collect()}
    assert "b" in out1  # d1 = "b c" is the only candidate; b expands in
    # no query term anywhere -> empty frame, not a crash
    assert rm3_expansion_terms(docs, ["zzz"], fb_docs=2).count() == 0


def test_sdm_hand_computed(spark):
    import math
    from obp_search_engine_spark.operators.ranking import sdm_topk

    # corpus: d0 = "a b a b", d1 = "b a"; |C|=6, bigram slots b_total=4
    # cf(a)=3, cf(b)=3, cf_o(a,b)=2, cf_u8(a,b)=4+1=5
    docs = _docs(spark, ["a b a b", "b a"])
    mu, lt, lo, lu = 10.0, 0.85, 0.1, 0.05
    r = {row.doc_id: row.score
         for row in sdm_topk(docs, ["a", "b"], mu=mu, lambda_t=lt,
                             lambda_o=lo, lambda_u=lu).collect()}
    c, b = 6.0, 4.0
    sm = lambda cf, den: mu * float(cf) / den
    d0 = (lt * math.log((2 + sm(3, c)) / (4 + mu))
          + lt * math.log((2 + sm(3, c)) / (4 + mu))
          + lo * math.log((2 + sm(2, b)) / (3 + mu))
          + lu * math.log((4 + sm(5, b)) / (3 + mu)))
    d1 = (lt * math.log((1 + sm(3, c)) / (2 + mu))
          + lt * math.log((1 + sm(3, c)) / (2 + mu))
          + lo * math.log((0 + sm(2, b)) / (1 + mu))
          + lu * math.log((1 + sm(5, b)) / (1 + mu)))
    assert r[0] == round(d0, 6) and r[1] == round(d1, 6)
    # proximity separates docs with identical unigram statistics: the
    # adjacent "a b" doc must outrank the distant one (ordered feature)
    docs2 = _docs(spark, ["a b c c", "a c c b"])
    rows = sdm_topk(docs2, ["a", "b"], mu=mu).collect()
    assert [row.doc_id for row in rows] == [0, 1]
    # a doc with no query term is never a candidate
    docs3 = _docs(spark, ["a b", "zz zz"])
    assert {row.doc_id for row in sdm_topk(docs3, ["a", "b"]).collect()} == {0}


def test_quantized_impacts_hand_computed(spark):
    from obp_search_engine_spark.operators.ranking import (
        quantized_impact_topk,
        quantized_impacts,
    )

    # corpus d0="x x y", d1="y z"; b_bits=2 -> impacts in [1,3]
    # term x: one posting -> degenerate range -> max impact 3
    # term y: c(y,d0) < c(y,d1) (longer doc) -> impacts 1 and 3
    docs = _docs(spark, ["x x y", "y z"])
    idx = {(r.term, r.doc_id): r.impact
           for r in quantized_impacts(docs, ["x", "y"], b_bits=2).collect()}
    assert idx == {("x", 0): 3, ("y", 0): 1, ("y", 1): 3}
    # integer query-time sum: d0 = 3+1 = 4, d1 = 3
    top = [(r.doc_id, r.impact_score)
           for r in quantized_impact_topk(docs, ["x", "y"], k=2, b_bits=2).collect()]
    assert top == [(0, 4), (1, 3)]
    # full-vocabulary build (query_terms=None) covers every term
    full = quantized_impacts(docs, None, b_bits=2).collect()
    assert {(r.term, r.doc_id) for r in full} == {
        ("x", 0), ("y", 0), ("y", 1), ("z", 1)
    }
    # quantization is monotone in c within a term: equal c -> equal
    # impact, and impacts stay within [1, 2^b - 1]
    assert all(1 <= r.impact <= 3 for r in full)


def test_ltr_linear_semantics(spark):
    """Hand-checkable LTR: with only the prior weight non-zero the
    ranking must follow PageRank mass; with only bm25 it must equal
    bm25_topk's order; features are the documented rounded values."""
    import math

    from obp_search_engine_spark.operators.ranking import (
        bm25_topk,
        ltr_linear_topk,
    )

    docs = _docs(spark, ["x x y", "y z w", "x z", "w w"])
    prior = spark.createDataFrame(
        [(0, 100), (1, 900), (2, 400), (3, 50)], "node long, rank long"
    )
    # prior-only: candidates are docs containing x or y (0, 1, 2);
    # order by mass 1 > 2 > 0
    by_prior = ltr_linear_topk(
        docs, prior, ["x", "y"], k=3,
        w_bm25=0.0, w_cov=0.0, w_len=0.0, w_prior=1.0,
    ).collect()
    assert [r.doc_id for r in by_prior] == [1, 2, 0]
    assert by_prior[0].ltr_score == round(round(math.log(901.0), 6), 6)
    # bm25-only: must reproduce bm25_topk exactly
    ltr = ltr_linear_topk(
        docs, prior, ["x", "y"], k=3,
        w_bm25=1.0, w_cov=0.0, w_len=0.0, w_prior=0.0,
    ).collect()
    ref = bm25_topk(docs, ["x", "y"], k=3).collect()
    assert [(r.doc_id, r.ltr_score) for r in ltr] == [
        (r.doc_id, r.score) for r in ref
    ]
    # coverage feature: doc 0 matches both terms, doc 2 matches one
    cov = {r.doc_id: r.matched for r in ltr}
    assert cov[0] == 2 and cov[2] == 1
    # missing prior row coalesces to mass 0 (feature ln(1)=0), not null
    sparse_prior = spark.createDataFrame([(1, 900)], "node long, rank long")
    got = ltr_linear_topk(
        docs, sparse_prior, ["x", "y"], k=3,
        w_bm25=0.0, w_cov=0.0, w_len=0.0, w_prior=1.0,
    ).collect()
    assert [r.doc_id for r in got][0] == 1
    assert all(r.ltr_score == 0.0 for r in got if r.doc_id != 1)


# ---------------------------------------------------------------------------
# block-max BM25 (Ding & Suel 2011)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_bm25_blockmax_equals_exact(spark, seed):
    """Block-max pruning is result-identical to the exhaustive scorer on
    randomized corpora across block sizes — including block=1 (one doc
    per block, the tightest bound) and a block larger than the docid
    space (degenerates to global max-score bounds)."""
    from obp_search_engine_spark.operators.ranking import bm25_blockmax_topk

    rows = _rand_docs(random.Random(seed), n=80)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for terms, k in [(["hash", "join", "spark"], 10), (_WORDS, 5), (["page"], 3)]:
        exact = [(r.doc_id, r.score) for r in bm25_topk(docs, terms, k=k).collect()]
        for block in (1, 16, 10_000):
            pruned = [
                (r.doc_id, r.score)
                for r in bm25_blockmax_topk(
                    docs, terms, k=k, block=block
                ).collect()
            ]
            assert pruned == exact, (terms, k, block)


def test_bm25_blockmax_prunes_more_than_maxscore(spark):
    """The block-level bound is tighter than the global per-term bound:
    a tail doc sharing a block with only weak postings prunes under
    block-max even when the term's GLOBAL max (driven by a hot block
    elsewhere) would survive max-score's bound. Verified structurally:
    per-block maxima differ across blocks, and the result still equals
    the exhaustive top-k."""
    from obp_search_engine_spark.operators.ranking import bm25_blockmax_topk

    # docids 0-4: rich in 'hash' (phase-1 block); 100-159: 'scan'-only
    # tail; 200: one doc making 'scan' globally strong in its own block,
    # so max-score's global ub(scan) stays high while the tail's
    # block-max(scan) is weak
    rows = [(i, "hash hash hash join") for i in range(5)]
    rows += [(100 + i, "scan") for i in range(60)]
    rows += [(200, "scan scan scan scan scan scan")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = [(r.doc_id, r.score) for r in bm25_topk(docs, ["hash", "scan"], k=5).collect()]
    pruned = [
        (r.doc_id, r.score)
        for r in bm25_blockmax_topk(docs, ["hash", "scan"], k=5, block=8).collect()
    ]
    assert pruned == exact


def test_bm25_blockmax_edge_cases(spark):
    from obp_search_engine_spark.operators.ranking import bm25_blockmax_topk

    rows = [(0, "hash join"), (1, "join"), (2, "scan sort"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = [(r.doc_id, r.score) for r in bm25_topk(docs, ["hash", "scan"], k=2).collect()]
    pruned = [
        (r.doc_id, r.score)
        for r in bm25_blockmax_topk(docs, ["hash", "scan"], k=2, block=2).collect()
    ]
    assert pruned == exact and len(pruned) == 2
    assert bm25_blockmax_topk(docs, ["zzz"], k=5).count() == 0


# ---------------------------------------------------------------------------
# ReDDE shard selection (Si & Callan 2003)
# ---------------------------------------------------------------------------


def _py_redde(rows, terms, n_shards, sample_mod, topn):
    """Pure-Python ReDDE reference: same md5 buckets, same BM25 chain
    over the sample, same scaled integer estimate."""
    import hashlib

    def md5_32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    base = [
        (i, t, md5_32(str(i)) % n_shards, md5_32(f"{i}#rs") % sample_mod == 0)
        for i, t in rows
        if t is not None
    ]
    sizes = {}
    for i, t, s, smp in base:
        nd, ns = sizes.get(s, (0, 0))
        sizes[s] = (nd + 1, ns + (1 if smp else 0))
    sample_rows = [(i, t) for i, t, s, smp in base if smp]
    top = {d for d, _ in _py_bm25(sample_rows, terms, k=topn)}
    hits = {}
    for i, t, s, smp in base:
        if i in top:
            hits[s] = hits.get(s, 0) + 1
    out = []
    for s, (nd, ns) in sizes.items():
        if ns == 0:
            continue
        h = hits.get(s, 0)
        out.append((s, nd, ns, h, round(h * nd / ns, 6)))
    out.sort(key=lambda r: (-r[4], r[0]))
    return out


@pytest.mark.parametrize("seed", [5, 17])
def test_redde_matches_python_reference(spark, seed):
    from obp_search_engine_spark.operators.ranking import shard_selection_redde

    rows = _rand_docs(random.Random(seed), n=150)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.shard, r.n_docs, r.n_sampled, r.in_topn, r.score)
        for r in shard_selection_redde(
            docs, ["hash", "join", "spark"], n_shards=4, sample_mod=3, topn=15
        ).collect()
    ]
    assert got == _py_redde(rows, ["hash", "join", "spark"], 4, 3, 15)


def test_redde_empty_sample_shard_dropped(spark):
    # sample_mod large enough that (with this tiny corpus) some shard
    # plausibly has no sampled doc; assert the invariant directly:
    # every output shard has n_sampled > 0 and scores scale hits
    from obp_search_engine_spark.operators.ranking import shard_selection_redde

    rows = [(i, "hash join" if i % 3 == 0 else "scan sort") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = shard_selection_redde(
        docs, ["hash"], n_shards=8, sample_mod=5, topn=10
    ).collect()
    assert all(r.n_sampled > 0 for r in out)
    for r in out:
        assert r.score == round(r.in_topn * r.n_docs / r.n_sampled, 6)


def test_redde_partitioning_invariant(spark):
    from obp_search_engine_spark.operators.ranking import shard_selection_redde

    rows = _rand_docs(random.Random(31), n=120)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = shard_selection_redde(docs, _WORDS[:3], n_shards=4).collect()
    b = shard_selection_redde(
        docs.repartition(13), _WORDS[:3], n_shards=4
    ).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))


# ---------------------------------------------------------------------------
# champion lists (tier-1 static pruning)
# ---------------------------------------------------------------------------


def test_champion_lists_structure(spark):
    from obp_search_engine_spark.operators.ranking import (
        champion_lists,
        quantized_impacts,
    )

    rows = _rand_docs(random.Random(13), n=60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = 3
    champs = champion_lists(docs, ["hash", "join"], m=m).collect()
    # per-term: <= m rows, ranks 1..len contiguous, impacts non-increasing
    by_term = {}
    for r in champs:
        by_term.setdefault(r.term, []).append(r)
    full = {
        (r.term, r.doc_id): r.impact
        for r in quantized_impacts(docs, ["hash", "join"]).collect()
    }
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= m
        imps = [r.impact for r in rs]
        assert imps == sorted(imps, reverse=True)
        # each champion's impact matches the full index
        for r in rs:
            assert full[(term, r.doc_id)] == r.impact
        # nothing outside the list beats the weakest champion under
        # (impact DESC, doc ASC)
        if len(rs) == m:
            cutoff = (-rs[-1].impact, rs[-1].doc_id)
            champ_docs = {r.doc_id for r in rs}
            for (t, d), imp in full.items():
                if t == term and d not in champ_docs:
                    assert (-imp, d) > cutoff


def test_champion_topk_scores_candidates_fully(spark):
    """Champion retrieval scores candidates with their FULL impact sum
    (both terms), even when a candidate entered via only one champion
    list — and docs outside every champion list never place."""
    from obp_search_engine_spark.operators.ranking import (
        champion_topk,
        quantized_impact_topk,
    )

    rows = _rand_docs(random.Random(29), n=80)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = champion_topk(docs, ["hash", "join", "spark"], k=5, m=4).collect()
    exhaustive = {
        r.doc_id: r.impact_score
        for r in quantized_impact_topk(
            docs, ["hash", "join", "spark"], k=200
        ).collect()
    }
    for r in got:
        assert exhaustive[r.doc_id] == r.impact_score  # full-info scores
    scores = [r.impact_score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_champion_topk_with_big_m_equals_exhaustive(spark):
    """m larger than any postings list disables tiering: the champion
    top-k must equal the exhaustive quantized top-k exactly."""
    from obp_search_engine_spark.operators.ranking import (
        champion_topk,
        quantized_impact_topk,
    )

    rows = _rand_docs(random.Random(37), n=70)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = [
        (r.doc_id, r.impact_score)
        for r in champion_topk(docs, ["hash", "join"], k=10, m=10_000).collect()
    ]
    b = [
        (r.doc_id, r.impact_score)
        for r in quantized_impact_topk(docs, ["hash", "join"], k=10).collect()
    ]
    assert a == b


# ---------------------------------------------------------------------------
# pre-retrieval QPP
# ---------------------------------------------------------------------------


def test_qpp_matches_python_reference(spark):
    from obp_search_engine_spark.operators.ranking import qpp_preretrieval

    rows = _rand_docs(random.Random(43), n=90)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [
        ("a", ["hash", "join"]),
        ("b", ["spark", "page", "row"]),
        ("c", ["nosuchtoken"]),
    ]

    import math

    corpus = [(i, _tokens(t)) for i, t in rows if t is not None]
    n = len(corpus)
    tot = sum(len(t) for _, t in corpus)
    want = {}
    for qid, terms in queries:
        terms = sorted(set(terms))
        idfs, ictfs, scqs = [], [], []
        for t in terms:  # sorted-term fold order
            df = sum(1 for _, ts in corpus if t in ts)
            cf = sum(ts.count(t) for _, ts in corpus)
            idf = math.log((n + 1) / (df + 1))
            idfs.append(idf)
            ictfs.append(math.log((tot + 1) / (cf + 1)))
            scqs.append((1 + math.log(cf)) * idf if cf > 0 else 0.0)
        nq = sum(1 for _, ts in corpus if any(t in ts for t in terms))
        want[qid] = (
            len(terms),
            round(sum_strict(idfs) / len(terms), 6),
            round(max(idfs), 6),
            round(sum_strict(ictfs) / len(terms), 6),
            round(sum_strict(scqs), 6),
            round(nq / n, 6),
        )
    got = {
        r.query_id: (
            r.n_terms, r.avg_idf, r.max_idf, r.avg_ictf, r.scq_sum, r.scope
        )
        for r in qpp_preretrieval(docs, queries).collect()
    }
    assert got == want


def sum_strict(xs):
    acc = 0.0
    for x in xs:
        acc += x
    return acc


def test_qpp_oov_query_scores_zero_scope(spark):
    from obp_search_engine_spark.operators.ranking import qpp_preretrieval

    docs = spark.createDataFrame(
        [(0, "hash join"), (1, "scan"), (2, None)], "doc_id long, text string"
    )
    got = {
        r.query_id: r
        for r in qpp_preretrieval(docs, [("q", ["zzz", "yyy"])]).collect()
    }
    r = got["q"]
    assert r.scope == 0.0 and r.scq_sum == 0.0 and r.n_terms == 2
    # df=0 -> idf = ln((N+1)/1) = ln(3), identical for both terms
    import math

    assert r.avg_idf == r.max_idf == round(math.log(3.0), 6)


def _py_textrank(texts, k=5, iters=4, num=85, den=100, scale=10**12):
    out = {}
    for doc, text in enumerate(texts):
        toks = [t for t in text.lower().split() if t]
        und = set()
        for x, y in zip(toks, toks[1:]):
            if x != y:
                und.add((min(x, y), max(x, y)))
        sym = [(u, v) for u, v in und] + [(v, u) for u, v in und]
        deg = {}
        for u, _ in sym:
            deg[u] = deg.get(u, 0) + 1
        nodes = sorted(deg)
        if not nodes:
            continue
        init = scale // len(nodes)
        base = ((den - num) * init) // den
        rank = {n: init for n in nodes}
        for _ in range(iters):
            contrib = {}
            for u, v in sym:
                contrib[v] = contrib.get(v, 0) + (num * rank[u]) // (den * deg[u])
            rank = {n: base + contrib.get(n, 0) for n in nodes}
        top = sorted(nodes, key=lambda n: (-rank[n], n))[:k]
        out[doc] = [(t, rank[t], i + 1) for i, t in enumerate(top)]
    return out


def test_textrank_matches_python_reference(spark):
    from obp_search_engine_spark.operators.ranking import textrank_keywords

    texts = [
        "the quick brown fox jumps over the lazy dog the quick fox",
        "spark shuffles data and spark joins data and data wins",
        "solo",          # single token: no edges, no vertices, no rows
        "loop loop loop",  # only self-adjacency: no vertices
        "a b a b a b c",
    ]
    docs = _docs(spark, texts)
    got = {}
    for r in textrank_keywords(docs, k=5, iters=4).collect():
        got.setdefault(r.doc_id, []).append((r.term, r.tr_rank, r.pos))
    for d in got:
        got[d].sort(key=lambda x: x[2])
    assert got == _py_textrank(texts, k=5, iters=4)
    # docs 2 and 3 produce no keyword rows at all
    assert 2 not in got and 3 not in got


def test_textrank_parallelism_invariant(spark):
    from obp_search_engine_spark.operators.ranking import textrank_keywords

    texts = ["w%d x%d y common z%d common w%d" % (i, i % 3, i % 5, (i * 7) % 11)
             for i in range(40)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, textrank_keywords(docs, k=3).collect()))
    b = sorted(map(tuple,
                   textrank_keywords(docs.repartition(17), k=3).collect()))
    assert a == b and len(a) > 0


# ------------------------------------------- team-draft interleaving


import hashlib

from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    team_draft_interleave,
)


def _h6(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def _py_tdi(q, a, b, steps=10):
    """Pure-python team-draft reference replaying the md5 coins/clicks."""
    picked, teams, na, nb = [], [], 0, 0
    for i in range(1, steps + 1):
        avail_a = [x for x in a if x not in picked]
        avail_b = [x for x in b if x not in picked]
        want_a = na < nb or (na == nb and _h6(f"{q}#f{i}") % 2 == 0)
        if want_a and avail_a:
            team = "A"
        elif not want_a and avail_b:
            team = "B"
        elif avail_b:
            team = "B"
        elif avail_a:
            team = "A"
        else:
            continue
        if team == "A":
            picked.append(avail_a[0]); teams.append(1); na += 1
        else:
            picked.append(avail_b[0]); teams.append(2); nb += 1
    ca = cb = 0
    for p, t in enumerate(teams, start=1):
        if _h6(f"{q}#c{p}") % (p + 2) == 0:
            if t == 1:
                ca += 1
            else:
                cb += 1
    winner = "A" if ca > cb else ("B" if cb > ca else "tie")
    return (len(picked), ca, cb, winner)


def _tdi_df(spark, rows):
    return spark.createDataFrame(
        rows, "q long, a array<bigint>, b array<bigint>"
    )


def test_tdi_matches_python_reference(spark):
    import random

    rng = random.Random(31)
    rows = []
    for q in range(12):
        docs = list(range(20))
        rng.shuffle(docs)
        a = docs[:5]
        rng.shuffle(docs)
        b = docs[:5]
        rows.append((q, a, b))
    got = {
        r.q: (r.n_interleaved, r.credit_a, r.credit_b, r.winner)
        for r in team_draft_interleave(_tdi_df(spark, rows)).collect()
    }
    assert got == {q: _py_tdi(q, a, b) for q, a, b in rows}


def test_tdi_disjoint_lists_balanced(spark):
    rows = [(3, [1, 2, 3, 4, 5], [11, 12, 13, 14, 15])]
    r = team_draft_interleave(_tdi_df(spark, rows)).first()
    assert r.n_interleaved == 10  # full union placed


def test_tdi_every_union_doc_placed_once(spark):
    # overlapping lists: interleaved length == |A ∪ B|
    rows = [(5, [1, 2, 3, 4, 5], [3, 4, 5, 6, 7])]
    r = team_draft_interleave(_tdi_df(spark, rows)).first()
    assert r.n_interleaved == 7


def test_tdi_empty_rankings_tie(spark):
    rows = [(9, [], [])]
    r = team_draft_interleave(_tdi_df(spark, rows)).first()
    assert (r.n_interleaved, r.credit_a, r.credit_b, r.winner) == (
        0,
        0,
        0,
        "tie",
    )


def test_tdi_partitioning_invariant(spark):
    rows = [
        (q, [q, q + 1, q + 2], [q + 2, q + 3, q + 4]) for q in range(10)
    ]
    df = _tdi_df(spark, rows)
    one = sorted(map(tuple, team_draft_interleave(df.coalesce(1)).collect()))
    many = sorted(
        map(tuple, team_draft_interleave(df.repartition(7)).collect())
    )
    assert one == many


# ---------------------------------------------------------- xQuAD


from obp_search_engine_spark.operators.ranking import xquad_rerank  # noqa: E402


def _py_xquad(cand, asp, docasp, k=5, lam=0.5):
    # cand: {(q,d): rel}; asp: {(q,a): paq}; docasp: {(d,a): pda}
    qs = sorted({q for q, _ in cand})
    out = []
    for q in qs:
        u = {a: 1.0 for (qq, a) in asp if qq == q}
        sel = set()
        for step in range(1, k + 1):
            best = None
            for (qq, d), rel in sorted(cand.items()):
                if qq != q or d in sel:
                    continue
                div = sum(
                    asp[(q, a)] * docasp.get((d, a), 0.0) * u[a]
                    for a in u
                )
                score = (1 - lam) * rel + lam * div
                if best is None or score > best[1] or (
                    score == best[1] and d < best[0]
                ):
                    best = (d, score)
            if best is None:
                break
            d, score = best
            sel.add(d)
            out.append((q, step, d, score))
            for a in u:
                u[a] *= 1.0 - docasp.get((d, a), 0.0)
    return out


def test_xquad_matches_python_reference(spark):
    import random

    rng = random.Random(19)
    cand, asp, docasp = {}, {}, {}
    for q in range(4):
        for d in rng.sample(range(30), 8):
            cand[(q, d)] = (1 + rng.randrange(15)) / 16.0
        for a in range(3):
            asp[(q, a)] = (1 + rng.randrange(4)) / 8.0
    for d in range(30):
        for a in range(3):
            docasp[(d, a)] = rng.randrange(8) / 16.0
    cdf = spark.createDataFrame(
        [(q, d, r) for (q, d), r in cand.items()], "q long, d long, rel double"
    )
    adf = spark.createDataFrame(
        [(q, a, p) for (q, a), p in asp.items()], "q long, a long, paq double"
    )
    ddf = spark.createDataFrame(
        [(d, a, p) for (d, a), p in docasp.items()],
        "d long, a long, pda double",
    )
    got = sorted(
        (r.q, r.step, r.d, r.score)
        for r in xquad_rerank(cdf, adf, ddf, k=5).collect()
    )
    assert got == sorted(_py_xquad(cand, asp, docasp, k=5))


def test_xquad_prefers_uncovered_aspect(spark):
    # d1 higher rel but same aspect as the first pick d0; d2 lower rel
    # but covers the untouched aspect -> step-2 must pick d2
    cdf = spark.createDataFrame(
        [(0, 0, 0.9375), (0, 1, 0.5625), (0, 2, 0.5)],
        "q long, d long, rel double",
    )
    adf = spark.createDataFrame(
        [(0, 0, 0.5), (0, 1, 0.5)], "q long, a long, paq double"
    )
    ddf = spark.createDataFrame(
        [(0, 0, 0.4375), (1, 0, 0.4375), (2, 1, 0.4375)],
        "d long, a long, pda double",
    )
    picks = {
        r.step: r.d for r in xquad_rerank(cdf, adf, ddf, k=3).collect()
    }
    assert picks[1] == 0 and picks[2] == 2


def test_xquad_no_aspects_degrades_to_rel_order(spark):
    cdf = spark.createDataFrame(
        [(0, d, (10 - d) / 16.0) for d in range(5)],
        "q long, d long, rel double",
    )
    adf = spark.createDataFrame([], "q long, a long, paq double")
    ddf = spark.createDataFrame([], "d long, a long, pda double")
    rows = sorted(
        (r.step, r.d) for r in xquad_rerank(cdf, adf, ddf, k=5).collect()
    )
    assert rows == [(1, 0), (2, 1), (3, 2), (4, 3), (5, 4)]


def test_xquad_partitioning_invariant(spark):
    import random

    rng = random.Random(4)
    rows = [
        (q, d, (1 + rng.randrange(15)) / 16.0)
        for q in range(4)
        for d in rng.sample(range(20), 6)
    ]
    cdf = spark.createDataFrame(rows, "q long, d long, rel double")
    adf = spark.createDataFrame(
        [(q, a, 0.25) for q in range(4) for a in range(2)],
        "q long, a long, paq double",
    )
    ddf = spark.createDataFrame(
        [(d, a, (d + a) % 8 / 16.0) for d in range(20) for a in range(2)],
        "d long, a long, pda double",
    )
    one = sorted(
        map(tuple, xquad_rerank(cdf.coalesce(1), adf, ddf, k=4).collect())
    )
    many = sorted(
        map(
            tuple,
            xquad_rerank(cdf.repartition(7), adf, ddf, k=4).collect(),
        )
    )
    assert one == many


# ------------------------------------------------------ alpha-nDCG


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    alpha_ndcg_at_k,
)
import math  # noqa: E402


def _py_alpha_ndcg(run, judg, k=5):
    # run: {(q,d): rank}; judg: set of (q,a,d)
    qs = sorted({q for q, _, _ in judg})
    out = {}
    for q in qs:
        aspects = sorted({a for qq, a, _ in judg if qq == q})
        cover = {
            d: {a for qq, a, dd in judg if qq == q and dd == d}
            for qq, d in run
            if qq == q
        }
        # realized
        seen = {a: 0 for a in aspects}
        dcg = 0.0
        ranked = sorted(
            ((r, d) for (qq, d), r in run.items() if qq == q and r <= k)
        )
        for r, d in ranked:
            g = sum(0.5 ** seen[a] for a in cover.get(d, ()))
            for a in cover.get(d, ()):
                seen[a] += 1
            dcg += g / math.log2(r + 1)
        # greedy ideal over judged pool
        pool = sorted({d for qq, a, d in judg if qq == q})
        u = {a: 1.0 for a in aspects}
        chosen = set()
        idcg = 0.0
        for step in range(1, k + 1):
            best = None
            for d in pool:
                if d in chosen:
                    continue
                g = sum(u[a] for a in cover.get(d, set()) | {
                    a for qq, a, dd in judg if qq == q and dd == d
                })
                if g <= 0:
                    continue
                if best is None or g > best[1]:
                    best = (d, g)
            if best is None:
                break
            d, g = best
            chosen.add(d)
            idcg += g / math.log2(step + 1)
            for qq, a, dd in judg:
                if qq == q and dd == d:
                    u[a] *= 0.5
        out[q] = (round(dcg, 6), round(idcg, 6), round(dcg / idcg, 6))
    return out


def test_alpha_ndcg_matches_python_reference(spark):
    import random

    rng = random.Random(8)
    run, judg = {}, set()
    for q in range(4):
        docs = rng.sample(range(25), 8)
        for r, d in enumerate(docs, start=1):
            run[(q, d)] = r
        for d in docs:
            for a in range(3):
                if rng.random() < 0.4:
                    judg.add((q, a, d))
    rdf = spark.createDataFrame(
        [(q, d, r) for (q, d), r in run.items()],
        "q long, d long, rank long",
    )
    jdf = spark.createDataFrame(
        sorted(judg), "q long, a long, d long"
    )
    got = {
        r.q: (r.dcg, r.idcg, r.alpha_ndcg)
        for r in alpha_ndcg_at_k(rdf, jdf, k=5).collect()
    }
    assert got == _py_alpha_ndcg(run, judg, k=5)


def test_alpha_ndcg_perfect_run_scores_one(spark):
    # run = the greedy ideal itself -> alpha_ndcg == 1
    run = [(0, 1, 1), (0, 2, 2)]
    judg = [(0, 0, 1), (0, 1, 2)]
    rdf = spark.createDataFrame(run, "q long, d long, rank long")
    jdf = spark.createDataFrame(judg, "q long, a long, d long")
    r = alpha_ndcg_at_k(rdf, jdf, k=5).first()
    assert r.alpha_ndcg == 1.0


def test_alpha_ndcg_redundancy_penalized(spark):
    # both runs rank 2 judged docs; run B's second doc repeats the
    # first's aspect -> lower alpha-ndcg than diverse run A
    judg = [(0, 0, 1), (0, 1, 2), (0, 0, 3)]
    jdf = spark.createDataFrame(judg, "q long, a long, d long")
    run_a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "q long, d long, rank long"
    )
    run_b = spark.createDataFrame(
        [(0, 1, 1), (0, 3, 2)], "q long, d long, rank long"
    )
    sa = alpha_ndcg_at_k(run_a, jdf, k=5).first().alpha_ndcg
    sb = alpha_ndcg_at_k(run_b, jdf, k=5).first().alpha_ndcg
    assert sa > sb


def test_alpha_ndcg_rejects_nondyadic_alpha(spark):
    rdf = spark.createDataFrame([(0, 1, 1)], "q long, d long, rank long")
    jdf = spark.createDataFrame([(0, 0, 1)], "q long, a long, d long")
    with pytest.raises(ValueError):
        alpha_ndcg_at_k(rdf, jdf, alpha=0.3)


# ------------------------------------------------------ Borda fusion


from obp_search_engine_spark.operators.ranking import borda_fuse  # noqa: E402


def test_borda_hand_case(spark):
    # sys1 ranks a>b>c (3/2/1 pts), sys2 ranks b>a (2/1 pts)
    # totals: a=3+1=4, b=2+2=4, c=1 -> tie broken id ASC
    s1 = spark.createDataFrame(
        [(0, 3.0), (1, 2.0), (2, 1.0)], "doc long, score double"
    )
    s2 = spark.createDataFrame([(1, 9.0), (0, 5.0)], "doc long, score double")
    rows = borda_fuse({"s1": s1, "s2": s2}, k=10).collect()
    assert [(r.doc, r.borda) for r in rows] == [(0, 4), (1, 4), (2, 1)]


def test_borda_absent_docs_score_zero_points(spark):
    s1 = spark.createDataFrame([(7, 1.0)], "doc long, score double")
    s2 = spark.createDataFrame(
        [(8, 2.0), (9, 1.0)], "doc long, score double"
    )
    rows = {r.doc: r.borda for r in borda_fuse({"a": s1, "b": s2}).collect()}
    assert rows == {7: 1, 8: 2, 9: 1}


def test_borda_partitioning_invariant(spark):
    import random

    rng = random.Random(6)
    s1 = spark.createDataFrame(
        [(d, float(rng.randrange(100))) for d in range(30)],
        "doc long, score double",
    )
    s2 = spark.createDataFrame(
        [(d, float(rng.randrange(100))) for d in range(10, 40)],
        "doc long, score double",
    )
    a = [
        (r.doc, r.borda)
        for r in borda_fuse(
            {"x": s1.coalesce(1), "y": s2.coalesce(1)}, k=15
        ).collect()
    ]
    b = [
        (r.doc, r.borda)
        for r in borda_fuse(
            {"x": s1.repartition(8), "y": s2.repartition(5)}, k=15
        ).collect()
    ]
    assert a == b


# ------------------------------------------------ paired bootstrap


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    paired_bootstrap_test,
)


def _py_bootstrap(pairs, n_boot=64, seed_tag="#bs"):
    ds = [a - b for _, a, b in sorted(pairs)]
    n = len(ds)
    mean_delta = round(sum(ds) / n, 6)
    wins = sum(1 for d in ds if d > 0)
    losses = sum(1 for d in ds if d < 0)
    ties = n - wins - losses
    le = 0
    for b in range(n_boot):
        acc = 0.0
        for j in range(n):
            acc += ds[_h6(f"{b}-{j}{seed_tag}") % n]
        if round(acc / n, 6) <= 0:
            le += 1
    return (n, n_boot, mean_delta, wins, losses, ties, round(le / n_boot, 6))


def test_bootstrap_matches_python_reference(spark):
    import random

    rng = random.Random(12)
    pairs = [
        (q, rng.randrange(17) / 16.0, rng.randrange(17) / 16.0)
        for q in range(25)
    ]
    df = spark.createDataFrame(pairs, "q long, m_a double, m_b double")
    r = paired_bootstrap_test(df, n_boot=64).first()
    assert (
        r.n_q, r.n_boot, r.mean_delta, r.wins, r.losses, r.ties, r.p_value
    ) == _py_bootstrap(pairs)


def test_bootstrap_dominant_system_significant(spark):
    # A beats B on every query by a wide margin -> p ~ 0
    pairs = [(q, 0.9375, 0.0625) for q in range(20)]
    df = spark.createDataFrame(pairs, "q long, m_a double, m_b double")
    r = paired_bootstrap_test(df, n_boot=64).first()
    assert r.p_value == 0.0 and r.wins == 20 and r.mean_delta == 0.875


def test_bootstrap_identical_systems_insignificant(spark):
    pairs = [(q, 0.5, 0.5) for q in range(20)]
    df = spark.createDataFrame(pairs, "q long, m_a double, m_b double")
    r = paired_bootstrap_test(df, n_boot=32).first()
    assert r.p_value == 1.0 and r.ties == 20


def test_bootstrap_partitioning_invariant(spark):
    import random

    rng = random.Random(14)
    pairs = [
        (q, rng.randrange(17) / 16.0, rng.randrange(17) / 16.0)
        for q in range(30)
    ]
    df = spark.createDataFrame(pairs, "q long, m_a double, m_b double")
    a = paired_bootstrap_test(df.coalesce(1)).first()
    b = paired_bootstrap_test(df.repartition(9)).first()
    assert tuple(a) == tuple(b)


# ---------------------------------------------- docid assignment


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    docid_assignment_benefit,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_docid_assignment_hand_case(spark):
    # 3 docs sharing one term; original ids 1000 apart (2-byte gaps),
    # clustered renumbering 1,2,3 (1-byte gaps)
    rows = [
        (1000, "x", "en", "a"),
        (2000, "x", "en", "a"),
        (3000, "x", "en", "a"),
    ]
    got = {
        r.assignment: (r.n_terms, r.n_postings, r.varint_bytes)
        for r in docid_assignment_benefit(_docs_df(spark, rows)).collect()
    }
    # original gaps: 1000,1000,1000 -> 2 bytes each = 6
    assert got["original"] == (1, 3, 6)
    assert got["clustered"] == (1, 3, 3)


def test_docid_assignment_clustered_never_worse(spark):
    import random

    rng = random.Random(21)
    vocab = ["alpha", "beta", "gamma", "delta"]
    rows = [
        (
            rng.randrange(1 << 30),
            " ".join(rng.choice(vocab) for _ in range(5)),
            rng.choice(["en", "de"]),
            rng.choice(["a", "b"]),
        )
        for _ in range(60)
    ]
    got = {
        r.assignment: r.varint_bytes
        for r in docid_assignment_benefit(_docs_df(spark, rows)).collect()
    }
    assert got["clustered"] <= got["original"]


def test_docid_assignment_partitioning_invariant(spark):
    rows = [
        (i * 977, f"t{i % 7} shared", "en", f"s{i % 3}") for i in range(40)
    ]
    df = _docs_df(spark, rows)
    a = sorted(
        map(tuple, docid_assignment_benefit(df.coalesce(1)).collect())
    )
    b = sorted(
        map(tuple, docid_assignment_benefit(df.repartition(9)).collect())
    )
    assert a == b


# ------------------------------------------------- host crowding


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    serp_host_crowding,
)


def _run_df(spark, rows):
    return spark.createDataFrame(
        rows, "q long, d long, host string, rank long"
    )


def test_crowding_hand_case(spark):
    rows = [
        (0, 1, "a", 1),
        (0, 2, "a", 2),
        (0, 3, "a", 3),  # third a -> crowded out
        (0, 4, "b", 4),
        (0, 5, "a", 5),  # fourth a -> crowded out
        (0, 6, "c", 6),
    ]
    got = [
        (r.d, r.new_rank)
        for r in serp_host_crowding(_run_df(spark, rows))
        .orderBy("new_rank")
        .collect()
    ]
    assert got == [(1, 1), (2, 2), (4, 3), (6, 4)]


def test_crowding_k_cut(spark):
    rows = [(0, d, f"h{d}", d) for d in range(1, 15)]  # all distinct hosts
    got = serp_host_crowding(_run_df(spark, rows), k=10).count()
    assert got == 10


def test_crowding_partitioning_invariant(spark):
    import random

    rng = random.Random(3)
    rows = []
    for q in range(5):
        for r, d in enumerate(rng.sample(range(100), 12), start=1):
            rows.append((q, d, f"h{d % 3}", r))
    df = _run_df(spark, rows)
    a = sorted(map(tuple, serp_host_crowding(df.coalesce(1)).collect()))
    b = sorted(map(tuple, serp_host_crowding(df.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------- elias-fano size


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    elias_fano_size,
    heaps_curve,
    kendall_tau_runs,
)


def test_elias_fano_hand_case(spark):
    # term "x" in docs {1,3,9}; doc 9 is max -> universe U = 10
    docs = spark.createDataFrame(
        [(1, "x"), (3, "x y"), (9, "x"), (0, "y")],
        "doc_id long, text string",
    )
    row = {r.term: r for r in elias_fano_size(docs).collect()}
    x = row["x"]
    # n=3, U div n = 3, l = floor(log2 3) = 1
    assert x.df_docs == 3 and x.ef_l == 1
    # ef = n*l + n + U div 2^l = 3 + 3 + 5 = 11 bits
    assert x.ef_bits == 11
    # gaps lag-0: 1,2,6 -> 3 varint bytes -> 24 bits
    assert x.varint_bits == 24
    assert abs(x.ef_over_varint - round(11 / 24, 6)) < 1e-12
    y = row["y"]
    # y in {0,3}: n=2, U div n = 5, l=2, ef = 4+2+ (10 div 4) = 8
    assert y.ef_l == 2 and y.ef_bits == 8


def test_elias_fano_partitioning_invariant(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(1, 9))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, elias_fano_size(df.coalesce(1)).collect()))
    b = sorted(map(tuple, elias_fano_size(df.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------- kendall tau


def _runs_df(spark, rows):
    return spark.createDataFrame(
        rows, "q long, d long, rank_a long, rank_b long"
    )


def test_kendall_tau_extremes(spark):
    rows = [(0, d, d + 1, 4 - d) for d in range(4)]  # reversed -> -1
    rows += [(1, d, d + 1, d + 1) for d in range(4)]  # identical -> +1
    got = {r.q: r for r in kendall_tau_runs(_runs_df(spark, rows)).collect()}
    assert got[0].tau == -1.0 and got[0].concordant == 0
    assert got[0].discordant == got[0].n_pairs == 6
    assert got[1].tau == 1.0 and got[1].discordant == 0
    assert got[0].n_docs == got[1].n_docs == 4


def test_kendall_tau_matches_pure_python(spark):
    import itertools
    import random

    rng = random.Random(5)
    n = 9
    pb = list(range(1, n + 1))
    rng.shuffle(pb)
    rows = [(7, d, d + 1, pb[d]) for d in range(n)]
    conc = disc = 0
    for i, j in itertools.combinations(range(n), 2):
        s = (i - j) * (pb[i] - pb[j])
        conc, disc = conc + (s > 0), disc + (s < 0)
    r = kendall_tau_runs(_runs_df(spark, rows)).collect()[0]
    assert (r.concordant, r.discordant) == (conc, disc)
    assert r.tau == round((conc - disc) / (n * (n - 1) / 2), 6)


# ------------------------------------------------- heaps curve


def test_heaps_curve_hand_case(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c b"), (2, "d"), (3, "a d e")],
        "doc_id long, text string",
    )
    got = {
        r.checkpoint: r for r in heaps_curve(docs, checkpoints=4).collect()
    }
    assert len(got) == 4
    # prefixes of 1..4 docs: tokens 2,5,6,9; vocab 2,3,4,5
    assert [got[i].docs_seen for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [got[i].tokens_seen for i in (1, 2, 3, 4)] == [2, 5, 6, 9]
    assert [got[i].vocab_size for i in (1, 2, 3, 4)] == [2, 3, 4, 5]


def test_heaps_curve_monotone_and_invariant(spark):
    import random

    rng = random.Random(23)
    rows = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(1, 7))))
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, heaps_curve(df.coalesce(1)).collect()))
    b = sorted(map(tuple, heaps_curve(df.repartition(5)).collect()))
    assert a == b
    vocab = [r[3] for r in a]
    toks = [r[2] for r in a]
    assert vocab == sorted(vocab) and toks == sorted(toks)
    assert a[-1][1] == 64  # last checkpoint covers the whole corpus


# ------------------------------------------------- qpp post-retrieval


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    qpp_postretrieval,
    zipf_octaves,
)


def test_qpp_postretrieval_hand_case(spark):
    # q0: scores 10,20,30,40 with k=2 -> topk {40,30}
    rows = [(0, d, s) for d, s in enumerate((10, 20, 30, 40))]
    df = spark.createDataFrame(rows, "q long, d long, score long")
    r = qpp_postretrieval(df, k=2).collect()[0]
    assert (r.k_eff, r.sum_topk, r.sumsq_topk) == (2, 70, 2500)
    assert (r.n_all, r.sum_all) == (4, 100)
    mu_all = 100 / 4
    assert r.wig == round((70 / 2 - mu_all) / mu_all, 6)
    import math

    assert r.nqc == round(math.sqrt(2 * 2500 - 70 * 70) / 2 / mu_all, 6)


def test_qpp_postretrieval_uniform_scores_zero_signal(spark):
    rows = [(1, d, 7) for d in range(12)]
    df = spark.createDataFrame(rows, "q long, d long, score long")
    r = qpp_postretrieval(df, k=5).collect()[0]
    assert r.wig == 0.0 and r.nqc == 0.0 and r.k_eff == 5


# ------------------------------------------------- zipf octaves


def test_zipf_octaves_hand_case(spark):
    # "a" x5 (octave 2), "b" x2 (octave 1), "c" x1 (octave 0)
    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a a b c")], "doc_id long, text string"
    )
    got = {r.octave: r for r in zipf_octaves(docs).collect()}
    assert got[2].n_terms == 1 and got[2].total_tf == 5
    assert got[1].n_terms == 1 and got[1].min_tf == got[1].max_tf == 2
    assert got[0].n_terms == 1 and got[0].total_tf == 1


def test_zipf_octaves_partitioning_invariant(spark):
    import random

    rng = random.Random(31)
    rows = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(1, 9))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, zipf_octaves(df.coalesce(1)).collect()))
    b = sorted(map(tuple, zipf_octaves(df.repartition(6)).collect()))
    assert a == b
    assert sum(r[1] for r in a) == len({w for _, t in rows for w in t.split()})


# ------------------------------------------------- codec decision


from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    codec_decision,
)


def test_codec_decision_hand_case(spark):
    # term "x" in docs {0, 1, 9}: gaps lag-0 = 0, 1, 8 -> g+1 = 1, 2, 9
    docs = spark.createDataFrame(
        [(0, "x"), (1, "x"), (9, "x y")], "doc_id long, text string"
    )
    row = {r.term: r for r in codec_decision(docs).collect()}
    x = row["x"]
    # gamma: (2*0+1) + (2*1+1) + (2*3+1) = 1 + 3 + 7 = 11
    assert x.gamma_bits == 11
    # delta: lg1 + 2*floor(log2(lg1+1)) + 1 per gap:
    #   g+1=1: 0+2*0+1=1; g+1=2: 1+2*1+1=4; g+1=9: 3+2*2+1=8 -> 13
    assert x.delta_bits == 13
    # varint: 3 gaps < 128 -> 24 bits
    assert x.varint_bits == 24
    # ef: n=3, U=10, l=floor(log2(3))=1 -> 3+3+5=11
    assert x.ef_bits == 11
    # tie 11 == 11 between gamma and ef -> gamma wins (decode order)
    assert x.best_codec == "gamma"
    y = row["y"]  # single posting at doc 9: gap 9, g+1=10
    assert y.gamma_bits == 2 * 3 + 1 and y.varint_bits == 8
    # ef: n=1, l=floor(log2(10))=3 -> 1*3 + 1 + 10 div 8 = 5, the min
    assert y.ef_bits == 5 and y.best_codec == "ef"


def test_codec_decision_partitioning_invariant(spark):
    import random

    rng = random.Random(41)
    rows = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(1, 8))))
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, codec_decision(df.coalesce(1)).collect()))
    b = sorted(map(tuple, codec_decision(df.repartition(9)).collect()))
    assert a == b
