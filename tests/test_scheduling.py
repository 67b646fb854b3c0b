"""Max-min fair crawl-budget allocation: parity against an independent
pure-Python water-filling reference, the two invariants the semantics
promise (exact budget exhaustion, never over demand), partitioning
invariance, and the oracle-vs-reference check with no Spark involved."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.scheduling import (
    allocate_budget,
    allocate_budget_oracle_sql,
)


def _py_alloc(demands: dict, budget: int):
    """Naive single-sorted-scan reference mirroring the documented
    semantics (a different algorithm than the operator's two-level
    decomposition)."""
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    w = 0
    k = 0
    w_k = 0
    for i, (_, d) in enumerate(items, 1):
        w += d
        if w + (n - i) * d <= budget:
            k = i
            w_k = w
    m = n - k
    out = {}
    if m == 0:
        return {h: (d, d, False) for h, d in items}
    left = budget - w_k
    t0, r = left // m, left % m
    for i, (h, d) in enumerate(items, 1):
        if i <= k:
            out[h] = (d, d, False)
        elif i <= k + r:
            out[h] = (d, t0 + 1, True)
        else:
            out[h] = (d, t0, True)
    return out


def _collect(df):
    return {r.host: (r.demand, r.alloc, r.saturated) for r in df.collect()}


def _demands_df(spark, demands: dict):
    return spark.createDataFrame(
        list(demands.items()), "host string, demand long"
    )


@pytest.mark.parametrize("seed", [2, 19, 83])
def test_allocation_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    demands = {f"h{i:03d}": rng.randrange(0, 200) for i in range(60)}
    budget = sum(demands.values()) // 3
    got = _collect(allocate_budget(_demands_df(spark, demands), budget))
    assert got == _py_alloc(demands, budget)


@pytest.mark.parametrize("seed", [7, 31])
def test_allocation_invariants(spark, seed):
    rng = random.Random(seed)
    demands = {f"h{i:02d}": rng.randrange(0, 50) for i in range(40)}
    total = sum(demands.values())
    for budget in (0, 1, total // 4, total - 1, total, total + 100):
        got = _collect(allocate_budget(_demands_df(spark, demands), budget))
        assert sum(a for _, a, _ in got.values()) == min(budget, total)
        assert all(0 <= a <= d for d, a, _ in got.values())
        # unsaturated == fully granted
        assert all(a == d for d, a, s in got.values() if not s)


def test_allocation_heavy_tie_level(spark):
    """Many hosts sharing one demand level straddling the cut: the
    remainder rule must pick the lexicographically-first saturated hosts."""
    demands = {f"h{i:02d}": 10 for i in range(10)}
    demands["big"] = 1000
    got = _collect(allocate_budget(_demands_df(spark, demands), 57))
    assert got == _py_alloc(demands, 57)


def test_allocation_all_granted_and_empty_leftover(spark):
    demands = {"a": 5, "b": 7, "c": 0}
    got = _collect(allocate_budget(_demands_df(spark, demands), 12))
    assert got == {"a": (5, 5, False), "b": (7, 7, False), "c": (0, 0, False)}


def test_allocation_rejects_negative_budget(spark):
    with pytest.raises(ValueError):
        allocate_budget(_demands_df(spark, {"a": 1}), -1)


def test_allocation_partitioning_invariant(spark):
    demands = {f"h{i:03d}": (i * 13) % 37 for i in range(120)}
    budget = sum(demands.values()) // 2
    a = _collect(
        allocate_budget(_demands_df(spark, demands).repartition(1), budget)
    )
    b = _collect(
        allocate_budget(_demands_df(spark, demands).repartition(17), budget)
    )
    assert a == b == _py_alloc(demands, budget)


def test_oracle_matches_python_reference():
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(47)
    demands = {f"h{i:02d}": rng.randrange(0, 100) for i in range(35)}
    budget = sum(demands.values()) // 3
    vals = ", ".join(f"('{h}', {d})" for h, d in demands.items())
    sql = allocate_budget_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(host, demand)", budget
    )
    got = {h: (d, a, s) for h, d, a, s in duckdb.sql(sql).fetchall()}
    assert got == _py_alloc(demands, budget)
