"""BPE-merge training: parity against an independent pure-Python trainer
(Sennrich et al. 2016 reference algorithm with the same lexicographic
tie-break), partitioning invariance, oracle cross-check, and the
monotone-token-shortening property of the learned vocabulary."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.bpe import (
    bpe_oracle_sql,
    bpe_segment_word,
    bpe_train_merges,
)


def _py_bpe(word_freqs: dict[str, int], rounds: int) -> list[tuple[str, str, int]]:
    """Independent reference: dict-based pair counting + greedy
    left-to-right re-segmentation, no string-replace trick anywhere."""
    words = [(list(w), f) for w, f in sorted(word_freqs.items())]
    merges: list[tuple[str, str, int]] = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        nxt = []
        for syms, f in words:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, f))
        words = nxt
    return merges


def _word_freqs(seed: int, n_words: int = 120) -> dict[str, int]:
    rng = random.Random(seed)
    alphabet = "abcdef"
    out: dict[str, int] = {}
    for _ in range(n_words):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        out[w] = out.get(w, 0) + rng.randint(1, 9)
    return out


def _docs_from_freqs(spark, freqs: dict[str, int]):
    text = " ".join(w for word, f in sorted(freqs.items()) for w in [word] * f)
    # split the corpus across several docs/partitions so pair counting
    # actually distributes
    words = text.split()
    chunks = [" ".join(words[i::7]) for i in range(7)]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "doc_id long, text string"
    ).repartition(4)


@pytest.mark.parametrize("seed", [3, 11])
def test_bpe_matches_python_reference(spark, seed):
    freqs = _word_freqs(seed)
    got = [
        (r.lhs, r.rhs, r.pair_count)
        for r in bpe_train_merges(_docs_from_freqs(spark, freqs), rounds=6).collect()
    ]
    assert got == _py_bpe(freqs, rounds=6)


def test_bpe_partitioning_invariant(spark):
    freqs = _word_freqs(5)
    docs = _docs_from_freqs(spark, freqs)
    a = bpe_train_merges(docs.repartition(1), rounds=4).collect()
    b = bpe_train_merges(docs.repartition(16), rounds=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    freqs = _word_freqs(9)
    text = " ".join(w for word, f in sorted(freqs.items()) for w in [word] * f)
    sql = bpe_oracle_sql(
        f"SELECT 0 AS doc_id, '{text}' AS text", rounds=5
    )
    got = [(l, r, c) for _, l, r, c in duckdb.sql(sql).fetchall()]
    assert got == _py_bpe(freqs, rounds=5)


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaa' holds two overlapping (a,a) pairs but greedy merge produces
    # [aa, a] — pair_count counts overlaps (3 per 'aaaa'), the merge
    # must not
    docs = spark.createDataFrame([(0, "aaa aaa aaaa")], "doc_id long, text string")
    rows = bpe_train_merges(docs, rounds=2).collect()
    assert (rows[0].lhs, rows[0].rhs, rows[0].pair_count) == ("a", "a", 2 * 2 + 3)
    # after merging: aaa->[aa,a] x2, aaaa->[aa,aa]; best next pair is (aa,a)
    # at freq 2 vs (aa,aa) at 1
    assert (rows[1].lhs, rows[1].rhs, rows[1].pair_count) == ("aa", "a", 2)
    assert bpe_segment_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert bpe_segment_word("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_learned_merges_shorten_tokens_monotonically(spark):
    freqs = _word_freqs(21, n_words=200)
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train_merges(_docs_from_freqs(spark, freqs), rounds=8).collect()
    ]
    assert len(merges) == 8
    prev = None
    for k in range(len(merges) + 1):
        total = sum(
            len(bpe_segment_word(w, merges[:k])) * f for w, f in freqs.items()
        )
        if prev is not None:
            assert total < prev, f"round {k} did not shorten token count"
        prev = total


def test_bpe_apply_matches_pure_python_segmenter(spark):
    from obp_search_engine_spark.operators.bpe import bpe_apply_merges

    freqs = _word_freqs(33, n_words=80)
    docs = _docs_from_freqs(spark, freqs)
    merges = [
        (r.lhs, r.rhs) for r in bpe_train_merges(docs, rounds=5).collect()
    ]
    got = {r.doc_id: r.n_tokens_bpe for r in bpe_apply_merges(docs, merges).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    want = {
        d: sum(len(bpe_segment_word(w, merges)) for w in t.lower().split())
        for d, t in texts.items()
    }
    assert got == want


def test_bpe_apply_empty_and_null_docs(spark):
    from obp_search_engine_spark.operators.bpe import bpe_apply_merges

    docs = spark.createDataFrame(
        [(0, "aa ab"), (1, ""), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens_bpe
           for r in bpe_apply_merges(docs, [("a", "a")]).collect()}
    # null text drops; empty/whitespace docs count 0 tokens
    assert got == {0: 1 + 2, 1: 0, 3: 0}
