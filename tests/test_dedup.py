"""Dedup suite: exact, n-gram Jaccard, MinHash-LSH recall, SimHash."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (3, "completely different text about spark engines"),
        (4, "completely different text about spark engines and more"),  # near 3
        (5, "unrelated words entirely here nothing shared at all"),
        (6, "The  Quick brown fox jumps over the lazy dog"),  # ws/case variant of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pure_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_exact_dedup(docs):
    groups = dedup.exact_dedup_groups(docs).collect()
    sizes = {g.keep_id: g.n_docs for g in groups}
    # 0, 2 and 6 (whitespace/case-normalized) collapse to keeper 0
    assert sizes[0] == 3
    deduped = dedup.exact_dedup(docs)
    assert sorted(r.doc_id for r in deduped.collect()) == [0, 1, 3, 4, 5]


def test_ngram_jaccard_matches_pure(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    rows = {r.doc_id: r.text for r in docs.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        j = _pure_jaccard(rows[a], rows[b])
        if j >= 0.3:
            want[(a, b)] = round(j, 6)
    assert got == want


def test_minhash_lsh_recall(spark):
    # 40 docs: 20 base texts + 20 near-copies (one word changed) => 20 true
    # near-dup pairs with high jaccard; LSH must find (almost) all of them
    base = [
        f"sentence number {i} about topic {i % 5} with shared words alpha beta gamma delta epsilon zeta"
        for i in range(20)
    ]
    rows = [(i, t) for i, t in enumerate(base)] + [
        (100 + i, t.replace("shared", "common")) for i, t in enumerate(base)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.5, k=32, bands=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    true_pairs = {(i, 100 + i) for i in range(20)}
    # every LSH pair must be a genuinely-similar pair (exact-verified)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert got <= exact
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"LSH recall {recall}"


def test_simhash_deterministic_and_neardup(spark):
    words = [f"tok{i}" for i in range(60)]
    base = " ".join(words)
    variant = " ".join(words[:-1] + ["changed"])  # 1 of 60 tokens differs
    rows = [
        (0, base),
        (1, variant),
        (2, "totally different content with other words in this doc entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    h1 = {r.doc_id: r.h for r in df.select("doc_id", dedup.simhash64_udf("text").alias("h")).collect()}
    h2 = {r.doc_id: r.h for r in df.select("doc_id", dedup.simhash64_udf("text").alias("h")).collect()}
    assert h1 == h2  # deterministic across runs
    ham01 = bin((h1[0] ^ h1[1]) & (2**64 - 1)).count("1")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_neardup_pairs(df, max_hamming=max(ham01, 1)).collect()
    }
    assert pairs.get((0, 1)) == ham01  # found, with the exact distance
    assert (0, 2) not in pairs or pairs[(0, 2)] > ham01


def test_shingles_jvm_only(spark, docs):
    # the minhash signature path must not contain a Python UDF eval node
    sig = dedup.with_minhash(dedup.with_shingles(docs), k=8)
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_duplicate_spans_golden(spark):
    # doc 0 and doc 1 share tokens w5..w16 (12 tokens => 5 consecutive
    # duplicated 8-gram positions in each doc, merged into ONE maximal
    # span); doc 2 shares nothing. Tokens are unique words elsewhere.
    shared = " ".join(f"w{i}" for i in range(5, 17))
    rows = [
        (0, " ".join(f"a{i}" for i in range(4)) + " " + shared + " a99"),
        (1, " ".join(f"b{i}" for i in range(4)) + " " + shared + " b99"),
        (2, " ".join(f"c{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_id): (r.span_start, r.span_end, r.n_tokens)
        for r in dedup.duplicate_spans(df, L=8).collect()
    }
    # both docs: shared block at token positions 5..16 (1-based), grams
    # 5..9 duplicated -> island 5..9 -> span 5..(9+7)=16, 12 tokens
    assert out == {0: (5, 16, 12), 1: (5, 16, 12)}


def test_duplicate_spans_within_doc_and_islands(spark):
    # one doc repeating an 8-token block twice => both occurrences marked
    # (within-doc repetition counts), yielding TWO islands
    block = " ".join(f"x{i}" for i in range(8))
    text = block + " gap1 gap2 gap3 " + block
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    spans = sorted(
        (r.span_start, r.span_end) for r in dedup.duplicate_spans(df, L=8).collect()
    )
    assert spans == [(1, 8), (12, 19)]


def test_duplicate_spans_jvm_only(spark):
    df = spark.createDataFrame([(0, "a b c d e f g h i")], "doc_id long, text string")
    plan = dedup.duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_duplicate_spans_overlapping_islands_merge(spark):
    # doc 10 = w1..w10; doc 11 duplicates its tokens 1-8, doc 12 its
    # tokens 3-10. Doc 10's dup gram positions are 1 and 3 (gap 2 <= L):
    # their token coverage [1,8] and [3,10] overlaps, so they must merge
    # into ONE maximal span [1,10] — not two overlapping spans that
    # double-count tokens 3..8 (the pre-round-4 behavior).
    w = [f"w{i}" for i in range(1, 11)]
    rows = [
        (10, " ".join(w)),
        (11, " ".join(w[0:8])),
        (12, " ".join(w[2:10])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in dedup.duplicate_spans(df, L=8).collect():
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_end, r.n_tokens))
    assert out[10] == [(1, 10, 10)]
    assert out[11] == [(1, 8, 8)] and out[12] == [(1, 8, 8)]


def test_duplicate_spans_touching_islands_merge(spark):
    # gap == L: dup grams at positions 1 and 9 cover tokens [1,8] and
    # [9,16] — contiguous coverage, one maximal span [1,16]
    blk_a = " ".join(f"p{i}" for i in range(8))
    blk_b = " ".join(f"q{i}" for i in range(8))
    rows = [
        (20, blk_a + " " + blk_b),
        (21, blk_a),
        (22, blk_b),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        (r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, L=8).collect()
        if r.doc_id == 20
    )
    assert spans == [(1, 16)]


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # pair {10, 11}, singleton 99 via nodes
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)], "n long")
    got = {
        r.node: r.cluster
        for r in dedup.connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_merging_clusters(spark):
    # two cliques joined by a bridge edge -> one component labeled by the
    # global min; long path 0-5-6-7-8-9 checks convergence over diameter 5
    edges = spark.createDataFrame(
        [(5, 0), (5, 6), (6, 7), (7, 8), (8, 9), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    got = {r.node: r.cluster for r in dedup.connected_components(edges).collect()}
    assert got == {0: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0, 20: 20, 21: 20, 22: 20}


def test_excise_spans_golden(spark):
    # doc 1: drop tokens 2-4 and 8-9; doc 2: no spans -> untouched
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y z")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 4), (1, 8, 9)], "doc_id long, span_start int, span_end int"
    )
    got = {r.doc_id: r for r in dedup.excise_spans(docs, spans).collect()}
    assert (got[1].n_kept, got[1].n_removed, got[1].text_deduped) == (
        5, 5, "a e f g j"
    )
    assert (got[2].n_kept, got[2].n_removed, got[2].text_deduped) == (3, 0, "x y z")


def test_excise_spans_full_coverage_and_jvm_only(spark):
    docs = spark.createDataFrame([(7, "p q r")], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(7, 1, 3)], "doc_id long, span_start int, span_end int"
    )
    out = dedup.excise_spans(docs, spans)
    r = out.collect()[0]
    assert (r.n_kept, r.n_removed, r.text_deduped) == (0, 3, "")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_keep_canonical_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 99)],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    labels = dedup.connected_components(edges, nodes=docs.select("doc_id"))
    kept = sorted(r.doc_id for r in dedup.keep_canonical(docs, labels).collect())
    assert kept == [1, 10, 99]


# ---------------------------------------------------------------------------
# winnowing (Schleimer, Wilkerson & Aiken 2003)
# ---------------------------------------------------------------------------
def _py_md5_32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_winnow(text: str, g: int = 4, w: int = 4):
    """Independent reference: leftmost-min winnowing via (h, pos) argmin."""
    toks = [t for t in text.lower().split() if t]
    grams = [
        (i + 1, _py_md5_32(" ".join(toks[i : i + g])))
        for i in range(len(toks) - g + 1)
    ]
    if not grams:
        return set()
    sel = set()
    last_valid = max(1, len(grams) - w + 1)
    for s in range(1, last_valid + 1):
        win = grams[s - 1 : s - 1 + w]
        pos, h = min(win, key=lambda ph: (ph[1], ph[0]))
        sel.add((pos, h))
    return sel


@pytest.mark.parametrize(
    "text",
    [
        "a b c d e f g h i j k l m",
        "x x x x x x x x",  # all-equal hashes: leftmost tie-break per window
        "one two three four",  # exactly g tokens: single global min
        "a b c d e",  # fewer grams than w
        "the quick brown fox jumps over the lazy dog the quick brown fox",
    ],
)
def test_winnow_matches_python_reference(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r.pos, r.fp) for r in dedup.winnow_fingerprints(df, g=4, w=4).collect()
    }
    assert got == _py_winnow(text, g=4, w=4)


def test_winnow_density_guarantee(spark):
    """Every window of w consecutive grams contains a selected position —
    the paper's coverage guarantee."""
    import random

    rng = random.Random(17)
    text = " ".join(rng.choice("aa bb cc dd ee ff gg".split()) for _ in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sel = sorted(r.pos for r in dedup.winnow_fingerprints(df, g=4, w=4).collect())
    n_grams = 200 - 3
    for s in range(1, n_grams - 3 + 1):
        assert any(s <= p <= s + 3 for p in sel), f"window at {s} uncovered"
    # density: |sel| is a small fraction of grams, never all of them
    assert len(sel) < n_grams


def test_winnow_dup_pairs_detects_shared_passage(spark):
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "intro words here " + passage),
        (2, passage + " closing remarks follow now"),
        (3, "completely different text with no overlap at all whatsoever"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.winnow_dup_pairs(df, g=4, w=4, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_winnow_stop_fingerprint_cap(spark):
    """A fingerprint shared by more docs than the cap is amputated before
    the pair explode."""
    boiler = "common boiler plate line repeated verbatim everywhere always"
    rows = [(i, boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        dedup.winnow_dup_pairs(df, g=4, w=4, min_shared=1, max_fp_docs=3).count()
        == 0
    )
    assert (
        dedup.winnow_dup_pairs(df, g=4, w=4, min_shared=1, max_fp_docs=10).count()
        == 15
    )


def test_twostar_matches_label_propagation_random(spark):
    # the two CC implementations must agree on arbitrary topology; seeds
    # chosen to mix cliques, chains, and singletons
    import random

    for seed in (7, 21):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(70)
        ]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        nodes = spark.createDataFrame([(i,) for i in range(n)], "n long")
        a = {
            r.node: r.cluster
            for r in dedup.connected_components(df, nodes=nodes).collect()
        }
        b = {
            r.node: r.cluster
            for r in dedup.connected_components_twostar(
                df, nodes=nodes
            ).collect()
        }
        assert a == b


def test_twostar_long_chain_converges_fast(spark):
    # a 40-node path is the adversarial case for label propagation
    # (O(diameter) rounds); two-star must solve it within its O(log^2 n)
    # bound — max_iter=12 would fail a diameter-bound algorithm
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_a long, id_b long"
    )
    got = {
        r.node: r.cluster
        for r in dedup.connected_components_twostar(
            edges, max_iter=12
        ).collect()
    }
    assert got == {i: 0 for i in range(40)}


def test_twostar_chain_pair_singleton(spark):
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 99)], "n long"
    )
    got = {
        r.node: r.cluster
        for r in dedup.connected_components_twostar(
            edges, nodes=nodes
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_minhash_incremental_equals_full_recompute(spark):
    # carry signatures for unchanged docs, recompute changed/new only —
    # the pair set must equal a full recompute over the new corpus
    a_rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "totally different text with other words"),
        (4, "this document will be deleted next snapshot"),
    ]
    b_rows = [
        (1, "alpha beta gamma delta epsilon zeta"),  # unchanged
        (2, "alpha beta gamma delta epsilon eta revised"),  # changed
        (3, "totally different text with other words"),  # unchanged
        (5, "alpha beta gamma delta epsilon zeta"),  # new near-dup of 1
    ]
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    sigs_a = dedup.with_minhash(dedup.with_shingles(a, "text", 3), 32, hash="md5")
    old = a.select("doc_id", F.col("text").alias("_old"))
    delta = (
        b.join(old, "doc_id", "left")
        .filter(F.col("_old").isNull() | (F.col("_old") != F.col("text")))
        .select("doc_id", "text")
    )
    carried = (
        b.join(old, "doc_id", "inner")
        .filter(F.col("_old") == F.col("text"))
        .select("doc_id")
    )
    sigs_b = sigs_a.join(carried, "doc_id", "left_semi").unionByName(
        dedup.with_minhash(dedup.with_shingles(delta, "text", 3), 32, hash="md5")
    )
    inc = sorted(
        map(tuple, dedup.minhash_lsh_pairs(b, threshold=0.3, hash="md5", sigs=sigs_b).collect())
    )
    full = sorted(
        map(tuple, dedup.minhash_lsh_pairs(b, threshold=0.3, hash="md5").collect())
    )
    assert inc == full and len(full) > 0
    # and the delta really was a strict subset of the corpus
    assert delta.count() == 2 and carried.count() == 2


def _py_allpairs_cosine(rows, threshold):
    import math

    toks = {d: t.lower().split() for d, t in rows if t is not None}
    n = len(toks)
    tf = {d: {} for d in toks}
    for d, ts_ in toks.items():
        for t in ts_:
            tf[d][t] = tf[d].get(t, 0) + 1
    dfreq = {}
    for d in tf:
        for t in tf[d]:
            dfreq[t] = dfreq.get(t, 0) + 1
    w = {
        d: {t: c * math.log((n + 1.0) / (dfreq[t] + 1.0)) for t, c in tf[d].items()}
        for d in tf
    }
    wn = {}
    for d, ws in w.items():
        nm = math.sqrt(sum(ws[t] * ws[t] for t in sorted(ws)))
        wn[d] = {t: v / nm for t, v in ws.items()} if nm else {}
    out = {}
    docs = sorted(wn)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            shared = sorted(set(wn[a]) & set(wn[b]))
            if not shared:
                continue
            c = round(sum(wn[a][t] * wn[b][t] for t in shared), 6)
            if c >= threshold:
                out[(a, b)] = c
    return out


def test_allpairs_cosine_equals_brute_force(spark):
    import random

    rng = random.Random(13)
    vocab = ["w%d" % i for i in range(12)]
    rows = [
        (d, " ".join(rng.choices(vocab, k=rng.randrange(4, 15))))
        for d in range(40)
    ]
    # a couple of exact/near twins so the high band is populated
    rows += [(100, rows[0][1]), (101, rows[1][1] + " extra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for th in (0.5, 0.9):
        got = {
            (r.id_a, r.id_b): r.cos
            for r in dedup.allpairs_cosine(df, threshold=th).collect()
        }
        assert got == _py_allpairs_cosine(rows, th), th


def test_allpairs_cosine_parallelism_invariant(spark):
    rows = [(d, "alpha beta gamma delta w%d" % (d % 5)) for d in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.allpairs_cosine(df.repartition(1), 0.6).collect()))
    b = sorted(map(tuple, dedup.allpairs_cosine(df.repartition(9), 0.6).collect()))
    assert a == b and len(a) > 0
