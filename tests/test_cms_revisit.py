"""Count-Min sketch + revisit priority: pure-Python parity, the
overcount-only guarantee, merge-equals-sketch-of-concat, DuckDB oracle
agreement, and the diff → priority → dequeue_wave wiring."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.scheduling import revisit_priority
from obp_search_engine_spark.operators.sketches import (
    cms_estimate,
    cms_merge,
    cms_oracle_sql,
    cms_registers,
)


def _h(row, v, width=64):
    return int(hashlib.md5(f"{row}:{v}".encode()).hexdigest()[:8], 16) % width


def _py_cms(values, depth=4, width=64):
    cells = {}
    for v in values:
        for r in range(depth):
            key = (r, _h(r, v, width))
            cells[key] = cells.get(key, 0) + 1
    return cells


def _py_estimate(cells, v, depth=4, width=64):
    return min(cells.get((r, _h(r, v, width)), 0) for r in range(depth))


def _rand_values(rng, n=600, vocab=40):
    return [f"w{int(rng.paretovariate(1.2)) % vocab}" for _ in range(n)]


@pytest.mark.parametrize("seed", [19, 57])
def test_cms_registers_match_python_reference(spark, seed):
    vals = _rand_values(random.Random(seed))
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    got = {
        (r.row, r.col): r.cnt
        for r in cms_registers(df, "term").collect()
    }
    assert got == _py_cms(vals)


def test_cms_estimates_overcount_only_and_match_reference(spark):
    vals = _rand_values(random.Random(5))
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    regs = cms_registers(df, "term")
    cands = spark.createDataFrame([(v,) for v in truth], "term string")
    got = {r.term: r.est_cnt for r in cms_estimate(regs, cands, "term").collect()}
    cells = _py_cms(vals)
    for v, true_cnt in truth.items():
        assert got[v] == _py_estimate(cells, v)
        assert got[v] >= true_cnt  # CMS never underestimates
    # total over-estimate bounded in aggregate (loose sanity bound)
    assert sum(got.values()) <= 4 * len(vals)


def test_cms_merge_equals_sketch_of_concat(spark):
    rng = random.Random(8)
    a, b = _rand_values(rng, n=300), _rand_values(rng, n=300)
    da = spark.createDataFrame([(v,) for v in a], "term string")
    db = spark.createDataFrame([(v,) for v in b], "term string")
    merged = {
        (r.row, r.col): r.cnt
        for r in cms_merge(
            cms_registers(da, "term"), cms_registers(db, "term")
        ).collect()
    }
    concat = {
        (r.row, r.col): r.cnt
        for r in cms_registers(da.unionByName(db), "term").collect()
    }
    assert merged == concat


def test_cms_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    vals = _rand_values(random.Random(2), n=400)
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    regs = cms_registers(df, "term")
    cands = df.distinct()
    got = sorted(
        (r.term, r.est_cnt)
        for r in cms_estimate(regs, cands, "term").collect()
    )
    vsql = ", ".join(f"('{v}')" for v in vals)
    sql = cms_oracle_sql(
        source_sql=f"SELECT * FROM (VALUES {vsql}) t(term)",
        value_expr="term",
        candidates_sql=f"SELECT DISTINCT term FROM (VALUES {vsql}) t(term)",
        cand_expr="term",
    )
    assert got == sorted(map(tuple, duckdb.sql(sql).fetchall()))


def test_revisit_priority_semantics(spark):
    rates = spark.createDataFrame(
        [
            ("h_hot", 10, 30),   # 75% changed
            ("h_cold", 40, 0),   # never changes
            ("h_empty", 0, 0),   # no doc survived both snapshots
        ],
        "host string, n_unchanged long, n_changed long",
    )
    ages = spark.createDataFrame(
        [("h_hot", 2), ("h_cold", 9), ("h_empty", 3), ("h_new", 4)],
        "host string, age_rounds long",
    )
    got = {
        r.host: (r.age_rounds, r.change_pct, r.priority)
        for r in revisit_priority(rates, ages).collect()
    }
    assert got["h_hot"] == (2, 75, 2 * 76)
    # stale-but-static host: age only enters via the +1 tiebreak term
    assert got["h_cold"] == (9, 0, 9)
    assert got["h_empty"] == (3, 0, 3)
    # never-diffed host: crawl-it-to-learn default of 100%
    assert got["h_new"] == (4, 100, 4 * 101)
    # a hot host outranks a much staler static one
    assert got["h_hot"][2] > got["h_cold"][2]


def test_priority_feeds_dequeue_wave(spark):
    """End-to-end wiring: the change-aware revisit priorities set
    per-host dequeue budgets (the host-level lever — within-host order
    stays the deterministic depth-then-discovery tiebreak), so a
    hot-changing host gets a bigger slice of the wave than an equally
    stale static one."""
    import datetime as dt

    from obp_search_engine_spark.operators.frontier import dequeue_wave
    from obp_search_engine_spark.schemas import FRONTIER_SCHEMA

    rates = spark.createDataFrame(
        [("a.example", 0, 10), ("b.example", 10, 0)],
        "host string, n_unchanged long, n_changed long",
    )
    ages = spark.createDataFrame(
        [("a.example", 1), ("b.example", 1)], "host string, age_rounds long"
    )
    # hot host: pct 100 -> priority 101 -> budget 3; static: 1 -> 1
    budgets = revisit_priority(rates, ages).select(
        "host", F.expr("1 + priority div 50").cast("int").alias("alloc")
    )
    rows = [
        (
            f"http://{h}/p{i}",
            hash(f"http://{h}/p{i}"),
            h,
            abs(hash(h)) % (2**31),
            i,
            dt.datetime(2026, 1, 1),
            None,
            "due",
        )
        for h in ("a.example", "b.example")
        for i in range(6)
    ]
    frontier = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    wave = dequeue_wave(frontier, per_host_budget=budgets)
    per_host = Counter(r.host for r in wave.collect())
    assert per_host == {"a.example": 3, "b.example": 1}
