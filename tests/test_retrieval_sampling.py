"""Round-4 (cont. 8) retrieval/dedup/sampling operators: conjunctive
boolean search, exact phrase search, containment near-dup, and the
integer-exact weighted sample — semantics on crafted corpora (the DuckDB
oracle parity is covered by tools/check_oracle.py and the driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from obp_search_engine_spark.operators.curation import weighted_sample_k
from obp_search_engine_spark.operators.dedup import containment_pairs
from obp_search_engine_spark.operators.ranking import (
    boolean_and_topk,
    phrase_search,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_boolean_and_requires_every_term(spark):
    d = _docs(
        spark,
        [
            "spark join data join",  # all three -> total_tf 4... no 'data'x1
            "spark data",  # missing 'join'
            "join data spark spark",  # all three -> total_tf 4
            "unrelated words here",
        ],
    )
    got = [
        (r.doc_id, r.total_tf)
        for r in boolean_and_topk(d, ["data", "join", "spark"], k=10).collect()
    ]
    # doc 0: spark(1)+join(2)+data(1) = 4; doc 2: 1+1+2 = 4; tie -> id asc
    assert got == [(0, 4), (2, 4)]


def test_boolean_and_case_and_duplicate_terms(spark):
    d = _docs(spark, ["Alpha BETA alpha", "alpha only"])
    got = [
        (r.doc_id, r.total_tf)
        for r in boolean_and_topk(d, ["beta", "alpha", "alpha"], k=5).collect()
    ]
    assert got == [(0, 3)]


def test_phrase_search_counts_whole_token_runs(spark):
    d = _docs(
        spark,
        [
            "hash join hash join fast",  # 2 occurrences
            "hash mergejoin hash",  # substring 'join' inside a token: no
            "the hash join",  # 1
            "join hash",  # wrong order
            "hash",  # shorter than the phrase
        ],
    )
    got = [
        (r.doc_id, r.n_occurrences)
        for r in phrase_search(d, "hash join", k=10).collect()
    ]
    assert got == [(0, 2), (2, 1)]


def test_phrase_search_overlapping_occurrences(spark):
    d = _docs(spark, ["a a a a"])
    got = phrase_search(d, "a a", k=5).collect()
    assert [(r.doc_id, r.n_occurrences) for r in got] == [(0, 3)]


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    small = "one two three four five six"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    d = _docs(spark, [small, big, "totally different text body here now"])
    rows = containment_pairs(d, threshold_milli=900, n=3).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(0, 1)]
    r = rows[0]
    # every 3-gram of the small doc appears in the big one
    assert r.containment_milli == 1000 and r.n_common == r.size_a
    # while Jaccard for the same pair is far below 0.9
    assert r.n_common / (r.size_a + r.size_b - r.n_common) < 0.2


def test_weighted_sample_is_deterministic_and_monotone(spark):
    d = spark.createDataFrame(
        [(i, "x" * ((i % 10) + 1)) for i in range(400)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    a = [r.doc_id for r in weighted_sample_k(d, "1 + n_chars", k=60).collect()]
    b = [
        r.doc_id
        for r in weighted_sample_k(d.repartition(13), "1 + n_chars", k=60).collect()
    ]
    assert a == b  # partitioning-invariant
    # monotone weight tilt: heavy docs (weight 7..11) overrepresented vs
    # their 50% population share
    heavy = sum(1 for i in a if (i % 10) + 2 >= 7)
    assert heavy > 36  # > 60% of the sample


def test_weighted_sample_respects_scaled_weights(spark):
    # one doc with overwhelming weight is (near-)always picked
    d = spark.createDataFrame(
        [(i, 1 if i else 10**9) for i in range(500)],
        "doc_id long, w long",
    )
    got = [r.doc_id for r in weighted_sample_k(d, "w", k=5, salt="s2").collect()]
    assert 0 in got


# ---------------------------------------------------------------------------
# positional-index phrase + proximity (round 5)
# ---------------------------------------------------------------------------
from obp_search_engine_spark.operators.ranking import (  # noqa: E402
    phrase_search_indexed,
    proximity_pairs_topk,
)


def test_phrase_indexed_equals_scan_side(spark):
    import random

    rng = random.Random(17)
    vocab = ["hash", "join", "scan", "agg", "slow"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(60)
    ]
    d = _docs(spark, texts)
    for phrase in ["hash join", "slow hash join", "agg", "a b a"]:
        scan = [(r.doc_id, r.n_occurrences) for r in
                __import__("obp_search_engine_spark.operators.ranking",
                           fromlist=["phrase_search"]).phrase_search(d, phrase, k=100).collect()]
        idx = [(r.doc_id, r.n_occurrences) for r in
               phrase_search_indexed(d, phrase, k=100).collect()]
        assert idx == scan, phrase


def test_phrase_indexed_duplicate_term_phrase(spark):
    # 'a b a': offsets {0, 2} share the term 'a' — the distinct-offset
    # count must require BOTH positions, not term multiplicity
    d = _docs(spark, ["a b a b a", "a b b a", "b a b"])
    got = [(r.doc_id, r.n_occurrences)
           for r in phrase_search_indexed(d, "a b a", k=10).collect()]
    assert got == [(0, 2)]


def test_phrase_indexed_overlapping_occurrences(spark):
    d = _docs(spark, ["a a a a"])
    got = phrase_search_indexed(d, "a a", k=5).collect()
    assert [(r.doc_id, r.n_occurrences) for r in got] == [(0, 3)]


def test_proximity_pairs_band_and_ordering(spark):
    d = _docs(
        spark,
        [
            "hash join",                   # |0-1|=1 -> 1 pair
            "hash x x x x x join",         # distance 6 > 5 -> 0
            "hash x join hash join",       # pairs: (0,2),(0,4),(3,2),(3,4) all <=5
            "join x x hash",               # distance 3 -> 1 (order-free)
            "nothing here",
        ],
    )
    got = [(r.doc_id, r.n_pairs)
           for r in proximity_pairs_topk(d, "hash", "join", window=5, k=10).collect()]
    assert got == [(2, 4), (0, 1), (3, 1)]


def test_proximity_same_term_excludes_self_pairs(spark):
    d = _docs(spark, ["a x a"])
    got = [(r.doc_id, r.n_pairs)
           for r in proximity_pairs_topk(d, "a", "a", window=5, k=10).collect()]
    # positions 0 and 2: ordered pairs (0,2) and (2,0), self-pairs excluded
    assert got == [(0, 2)]
