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


# ------------------------------------------------- click-graph walk


from obp_search_engine_spark.operators.querylog import (  # noqa: E402
    click_graph_walk,
    click_graph_walk_oracle_sql,
    lru_hit_curve,
    lru_stack_distances,
)


def _py_walk(clicks, steps=3, scale=10**12, floor=0):
    e = sorted(set(clicks))
    qdeg, ddeg = {}, {}
    for q, d in e:
        qdeg[q] = qdeg.get(q, 0) + 1
        ddeg[d] = ddeg.get(d, 0) + 1
    m = {}
    for q, d in e:
        v = scale // qdeg[q]
        if v > floor:
            m[(q, d)] = m.get((q, d), 0) + v
    for i in range(2, steps + 1):
        nxt = {}
        for (q0, node), mass in m.items():
            for q, d in e:
                if i % 2 == 0 and d == node:
                    nxt[(q0, q)] = nxt.get((q0, q), 0) + mass // ddeg[d]
                elif i % 2 == 1 and q == node:
                    nxt[(q0, d)] = nxt.get((q0, d), 0) + mass // qdeg[q]
        m = {k: v for k, v in nxt.items() if v > floor}
    return m


def _walk_clicks_df(spark, rows):
    return spark.createDataFrame(rows, "q long, d long")


def test_walk_matches_python_reference(spark):
    import random

    rng = random.Random(17)
    clicks = [(rng.randrange(6), rng.randrange(15)) for _ in range(60)]
    got = {
        (r.q, r.d): r.mass
        for r in click_graph_walk(_walk_clicks_df(spark, clicks)).collect()
    }
    assert got == _py_walk(clicks)


def test_walk_smooths_to_unclicked_docs(spark):
    # q0 clicked d1 only; q1 clicked d1 and d2 -> after 3 half-steps q0
    # holds mass on d2 it never clicked (the Craswell-Szummer point)
    clicks = [(0, 1), (1, 1), (1, 2)]
    got = {
        (r.q, r.d): r.mass
        for r in click_graph_walk(_walk_clicks_df(spark, clicks)).collect()
    }
    assert got[(0, 2)] > 0
    assert got[(0, 1)] > got[(0, 2)]  # direct click still dominates


def test_walk_floor_prunes(spark):
    clicks = [(0, 1), (1, 1), (1, 2)]
    full = click_graph_walk(_walk_clicks_df(spark, clicks), floor=0).count()
    pruned = click_graph_walk(
        _walk_clicks_df(spark, clicks), floor=10**12 // 3
    ).count()
    assert pruned < full


def test_walk_even_steps_rejected(spark):
    with pytest.raises(ValueError):
        click_graph_walk(_walk_clicks_df(spark, [(0, 1)]), steps=2)
    with pytest.raises(ValueError):
        click_graph_walk_oracle_sql("SELECT 0 AS q, 1 AS d", steps=4)


def test_walk_partitioning_invariant(spark):
    import random

    rng = random.Random(3)
    clicks = [(rng.randrange(5), rng.randrange(10)) for _ in range(40)]
    df = _walk_clicks_df(spark, clicks)
    a = sorted(map(tuple, click_graph_walk(df.coalesce(1)).collect()))
    b = sorted(map(tuple, click_graph_walk(df.repartition(11)).collect()))
    assert a == b


# ------------------------------------------------- LRU hit curve


def _py_lru_curve(log, capacities):
    # log: [(t, q)] — exact LRU simulation (the ground truth the
    # stack-distance formulation must reproduce)
    from collections import OrderedDict

    hits = {k: 0 for k in capacities}
    caches = {k: OrderedDict() for k in capacities}
    for t, q in sorted(log):
        for k in capacities:
            c = caches[k]
            if q in c:
                hits[k] += 1
                c.move_to_end(q)
            else:
                c[q] = True
                if len(c) > k:
                    c.popitem(last=False)
    total = len(log)
    return {
        k: (hits[k], total, round(hits[k] / total, 6)) for k in capacities
    }


def _lru_log_df(spark, log):
    return spark.createDataFrame(log, "t long, q long")


def test_lru_curve_matches_true_lru_simulation(spark):
    import random

    rng = random.Random(9)
    log = [(t, rng.randrange(12)) for t in range(300)]
    caps = (1, 4, 16, 64)
    got = {
        r.capacity: (r.hits, r.total, r.hit_rate)
        for r in lru_hit_curve(_lru_log_df(spark, log), caps, t_col="t").collect()
    }
    assert got == _py_lru_curve(log, caps)


def test_lru_stack_distance_hand_case(spark):
    # log: a b c a b b -> a@t4 reuse {b,c}=2; b@t5 reuse {c,a}=2; b@t6 0
    log = [(1, 0), (2, 1), (3, 2), (4, 0), (5, 1), (6, 1)]
    got = {
        (r.t, r.q): r.reuse
        for r in lru_stack_distances(_lru_log_df(spark, log), t_col="t").collect()
    }
    assert got == {(4, 0): 2, (5, 1): 2, (6, 1): 0}


def test_lru_curve_monotone_in_capacity(spark):
    import random

    rng = random.Random(2)
    log = [(t, rng.randrange(30)) for t in range(400)]
    rows = lru_hit_curve(
        _lru_log_df(spark, log), (1, 2, 8, 32, 128), t_col="t"
    ).collect()
    by_cap = sorted((r.capacity, r.hits) for r in rows)
    hits = [h for _, h in by_cap]
    assert hits == sorted(hits)
    assert by_cap[-1][1] == 400 - 30  # full-capacity: only compulsory miss


# ------------------------------------------------- query intent


from obp_search_engine_spark.operators.querylog import query_intent  # noqa: E402


def test_intent_hand_case(spark):
    # q0: 10 clicks all on d5 -> navigational (share 1.0, 1 doc)
    # q1: clicks on 4 docs evenly -> informational, entropy = 2.0 exactly
    rows = [(0, 5)] * 10 + [(1, d) for d in (1, 2, 3, 4)] * 3
    got = {
        r.q: (r.n_clicks, r.n_docs, r.entropy, r.top_share, r.intent)
        for r in query_intent(
            spark.createDataFrame(rows, "q long, d long")
        ).collect()
    }
    assert got[0] == (10, 1, -0.0, 1.0, "navigational")
    assert got[1] == (12, 4, 2.0, 0.25, "informational")


def test_intent_threshold_edges(spark):
    # share 0.8 with 2 docs -> navigational (>= threshold, <= docs)
    rows = [(0, 1)] * 8 + [(0, 2)] * 2
    r = query_intent(
        spark.createDataFrame(rows, "q long, d long")
    ).first()
    assert (r.top_share, r.n_docs, r.intent) == (0.8, 2, "navigational")
    # share 0.8 but 3 distinct docs -> informational
    rows = [(0, 1)] * 8 + [(0, 2), (0, 3)]
    r = query_intent(
        spark.createDataFrame(rows, "q long, d long")
    ).first()
    assert r.intent == "informational"


def test_intent_partitioning_invariant(spark):
    import random

    rng = random.Random(77)
    rows = [
        (rng.randrange(6), rng.randrange(10)) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "q long, d long")
    a = sorted(map(tuple, query_intent(df.coalesce(1)).collect()))
    b = sorted(map(tuple, query_intent(df.repartition(9)).collect()))
    assert a == b
