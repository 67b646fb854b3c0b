"""Query-log mining (operators/querylog.py): query-flow reformulations
and co-click related queries against pure-Python references, the degree
cap, and partitioning invariance."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.querylog import (
    query_reformulations,
    related_queries_coclick,
)


def _log_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, q long"
    )


def test_reformulations_hand_case(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 0: a -> b -> b -> a  => edges a->b, b->a (self-loop b->b dropped)
        (0, t(1), 1, 10),
        (0, t(2), 2, 11),
        (0, t(3), 3, 11),
        (0, t(4), 4, 10),
        # user 1: a -> b  (reinforces a->b)
        (1, t(1), 5, 10),
        (1, t(2), 6, 11),
        # tie on ts: event_id breaks it => c -> a
        (2, t(1), 8, 10),
        (2, t(1), 7, 12),
    ]
    got = [
        (r.q, r.rank, r.q2, r.n)
        for r in query_reformulations(_log_df(spark, rows), k=5).collect()
    ]
    assert got == [
        (10, 1, 11, 2),
        (11, 1, 10, 1),
        (12, 1, 10, 1),
    ]


def test_reformulations_topk_and_invariance(spark):
    import datetime as dt

    rng = random.Random(5)
    rows = []
    eid = 0
    for u in range(20):
        for i in range(rng.randrange(2, 15)):
            eid += 1
            rows.append(
                (u, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i), eid,
                 rng.randrange(6))
            )
    df = _log_df(spark, rows)
    a = [tuple(r) for r in query_reformulations(df, k=2).collect()]
    b = [tuple(r) for r in query_reformulations(df.repartition(9), k=2).collect()]
    assert a == b
    # per-source: ranks contiguous from 1, counts non-increasing
    per = {}
    for q, rank, q2, n in a:
        per.setdefault(q, []).append((rank, n))
    for q, rs in per.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        ns = [n for _, n in rs]
        assert ns == sorted(ns, reverse=True)
        assert len(rs) <= 2


def _clicks_df(spark, rows):
    return spark.createDataFrame(rows, "q long, d long")


def test_coclick_hand_case(spark):
    rows = [
        (1, 100), (2, 100),          # q1,q2 share d=100
        (1, 101), (2, 101),          # and d=101
        (2, 102), (3, 102),          # q2,q3 share d=102
        (1, 100),                    # duplicate click collapses
    ]
    got = {
        (r.q1, r.q2): (r.co_docs, r.jaccard_milli)
        for r in related_queries_coclick(_clicks_df(spark, rows)).collect()
    }
    # D(1)={100,101} D(2)={100,101,102} D(3)={102}
    assert got == {
        (1, 2): (2, 666),   # 2/3
        (2, 3): (1, 333),   # 1/3
    }


def test_coclick_degree_cap_drops_hot_doc(spark):
    # doc 999 clicked by 5 queries; cap=4 drops it entirely
    rows = [(q, 999) for q in range(5)] + [(0, 1), (1, 1)]
    got = {
        (r.q1, r.q2)
        for r in related_queries_coclick(_clicks_df(spark, rows), cap=4).collect()
    }
    assert got == {(0, 1)}
    # without the cap the hot doc contributes all 10 pairs
    got_nocap = related_queries_coclick(_clicks_df(spark, rows), cap=64).count()
    assert got_nocap == 10


def test_coclick_matches_python_reference(spark):
    rng = random.Random(17)
    rows = [(rng.randrange(10), rng.randrange(30)) for _ in range(400)]
    cap = 5
    edges = set(rows)
    deg = {}
    for q, d in edges:
        deg[d] = deg.get(d, 0) + 1
    # all statistics read the CAPPED click graph (operator contract)
    D = {}
    for q, d in edges:
        if deg[d] <= cap:
            D.setdefault(q, set()).add(d)
    want = {}
    for q1 in D:
        for q2 in D:
            if q1 < q2:
                co = D[q1] & D[q2]
                if co:
                    u = len(D[q1] | D[q2])
                    want[(q1, q2)] = (len(co), 1000 * len(co) // u)
    got = {
        (r.q1, r.q2): (r.co_docs, r.jaccard_milli)
        for r in related_queries_coclick(
            _clicks_df(spark, rows), cap=cap
        ).collect()
    }
    assert got == want
