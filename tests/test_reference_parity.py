"""Randomized reference parity for the round-4 operators: one Spark job
per operator over MANY seeded-random cases, each checked against an
independent pure-Python reference implementation (union-find for CC,
direct token surgery for spans/excision). Randomness is seeded — failures
reproduce exactly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators import dedup


def _py_duplicate_spans(texts: dict[int, str], L: int = 8):
    """Independent reference: global gram counts -> duplicated positions ->
    merge islands with gap <= L -> (doc, start, end) spans."""
    grams: dict[tuple, int] = {}
    per_doc: dict[int, list[tuple[int, tuple]]] = {}
    for d, t in texts.items():
        toks = t.lower().split()
        if len(toks) < L:
            per_doc[d] = []
            continue
        lst = []
        for i in range(len(toks) - L + 1):
            g = tuple(toks[i : i + L])
            grams[g] = grams.get(g, 0) + 1
            lst.append((i + 1, g))
        per_doc[d] = lst
    spans = set()
    for d, lst in per_doc.items():
        dup = [p for p, g in lst if grams[g] >= 2]
        if not dup:
            continue
        start = prev = dup[0]
        for p in dup[1:]:
            if p - prev > L:
                spans.add((d, start, prev + L - 1))
                start = p
            prev = p
        spans.add((d, start, prev + L - 1))
    return spans


def _rand_corpus(rng: random.Random, n_docs: int = 40):
    """Small vocab + copied blocks so cross-doc and within-doc duplicate
    grams actually occur."""
    vocab = [f"w{i}" for i in range(30)]
    blocks = [
        " ".join(rng.choices(vocab, k=rng.randint(8, 14))) for _ in range(6)
    ]
    texts = {}
    for d in range(n_docs):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                parts.append(rng.choice(blocks))
            else:
                parts.append(" ".join(rng.choices(vocab, k=rng.randint(3, 12))))
        texts[d] = " ".join(parts)
    return texts


@pytest.mark.parametrize("seed", [7, 19, 101])
def test_duplicate_spans_matches_python_reference(spark, seed):
    texts = _rand_corpus(random.Random(seed))
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, L=8).collect()
    }
    assert got == _py_duplicate_spans(texts, L=8)


@pytest.mark.parametrize("seed", [3, 23])
def test_excise_spans_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    texts = {d: " ".join(f"t{rng.randint(0, 50)}" for _ in range(rng.randint(0, 30)))
             for d in range(30)}
    # random (possibly overlapping) spans over a random subset of docs
    span_rows = []
    for d, t in texts.items():
        n = len(t.split())
        for _ in range(rng.randint(0, 3)):
            if n == 0:
                continue
            s = rng.randint(1, n)
            span_rows.append((d, s, min(n, s + rng.randint(0, 6))))
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    spans = spark.createDataFrame(
        span_rows or [(999, 1, 1)], "doc_id long, span_start int, span_end int"
    )
    got = {r.doc_id: r for r in dedup.excise_spans(df, spans).collect()}
    for d, t in texts.items():
        toks = t.lower().split()
        covered = {
            i
            for (sd, s, e) in span_rows
            if sd == d
            for i in range(s, e + 1)
        }
        kept = [tok for i, tok in enumerate(toks, start=1) if i not in covered]
        r = got[d]
        assert r.n_kept == len(kept), d
        assert r.n_removed == len(toks) - len(kept), d
        assert r.text_deduped == " ".join(kept), d


def _py_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node in component
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.mark.parametrize("seed", [11, 29, 57])
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [
        (rng.randint(0, 59), rng.randint(0, 59)) for _ in range(rng.randint(10, 50))
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges or [(0, 1)], "id_a long, id_b long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "n long")
    got = {
        r.node: r.cluster
        for r in dedup.connected_components(edf, nodes=ndf).collect()
    }
    assert got == _py_components(edges or [(0, 1)], nodes)
