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


# ---------------------------------------------------------------------------
# UCB1 crawl-host bandit
# ---------------------------------------------------------------------------


def _py_ucb1(rewards: dict, hosts, rounds: int, batch: int):
    """Reference bandit: rewards = {(host, pull): reward}. Mirrors the
    documented policy — unplayed-first/host-asc init, rounded ucb
    DESC / host ASC, integer state."""
    import math

    n = {h: 0 for h in hosts}
    s = {h: 0 for h in hosts}
    out = []
    for t in range(1, rounds + 1):
        T = sum(n.values())
        scored = []
        for h in hosts:
            if n[h] == 0:
                key = (0, 0.0, h)  # unplayed bucket, ordered by host
            else:
                ucb = round(s[h] / n[h] + math.sqrt(2 * math.log(T) / n[h]), 6)
                key = (1, -ucb, h)
            scored.append((key, h))
        scored.sort()
        for _, h in scored[:batch]:
            pull = n[h] + 1
            r = rewards.get((h, pull), 0)
            ucb = (
                None
                if n[h] == 0
                else round(s[h] / n[h] + math.sqrt(2 * math.log(T) / n[h]), 6)
            )
            out.append((t, h, pull, r, ucb))
            n[h] += 1
            s[h] += r
    out.sort(key=lambda r: (r[0], r[1]))
    return out


def _rewards_df(spark, rewards):
    return spark.createDataFrame(
        [(h, p, r) for (h, p), r in sorted(rewards.items())],
        "host string, pull long, reward long",
    )


def test_ucb1_matches_python_reference(spark):
    from obp_search_engine_spark.operators.scheduling import (
        ucb1_crawl_schedule,
    )

    rng = random.Random(7)
    hosts = [f"h{i:02d}" for i in range(9)]
    rounds, batch = 7, 3
    rewards = {
        (h, p): rng.randrange(100)
        for h in hosts
        for p in range(1, rounds + 1)
    }
    got = [
        (r.t, r.host, r.pull, r.reward, r.ucb)
        for r in ucb1_crawl_schedule(
            _rewards_df(spark, rewards), rounds=rounds, batch=batch
        ).collect()
    ]
    assert got == _py_ucb1(rewards, hosts, rounds, batch)


def test_ucb1_plays_every_arm_before_repeating(spark):
    """With H hosts and batch B, the first ceil(H/B) rounds sweep every
    arm exactly once (pull == 1) before any second pull happens."""
    from obp_search_engine_spark.operators.scheduling import (
        ucb1_crawl_schedule,
    )

    hosts = [f"h{i}" for i in range(10)]
    rewards = {(h, p): 1 for h in hosts for p in range(1, 7)}
    sched = ucb1_crawl_schedule(
        _rewards_df(spark, rewards), rounds=6, batch=4
    ).collect()
    first_seen = {}
    for r in sched:
        first_seen.setdefault(r.host, (r.t, r.pull))
    assert set(first_seen) == set(hosts)
    sweep_rounds = {t for t, _ in first_seen.values()}
    assert sweep_rounds <= {1, 2, 3}  # ceil(10/4) = 3
    assert all(
        r.pull == 1 for r in sched if r.t <= 2
    )  # rounds 1-2 are pure first pulls


def test_ucb1_exploits_the_better_arm(spark):
    """Two arms, one always 90 one always 10: after the init sweep the
    rich arm must take strictly more pulls."""
    from obp_search_engine_spark.operators.scheduling import (
        ucb1_crawl_schedule,
    )

    rounds = 10
    rewards = {("rich", p): 90 for p in range(1, rounds + 1)}
    rewards.update({("poor", p): 10 for p in range(1, rounds + 1)})
    sched = ucb1_crawl_schedule(
        _rewards_df(spark, rewards), rounds=rounds, batch=1
    ).collect()
    pulls = {"rich": 0, "poor": 0}
    for r in sched:
        pulls[r.host] += 1
    assert pulls["rich"] > pulls["poor"]
    assert pulls["rich"] + pulls["poor"] == rounds


def test_ucb1_partitioning_invariant(spark):
    from obp_search_engine_spark.operators.scheduling import (
        ucb1_crawl_schedule,
    )

    rng = random.Random(19)
    rewards = {
        (f"h{i}", p): rng.randrange(50)
        for i in range(8)
        for p in range(1, 6)
    }
    a = ucb1_crawl_schedule(_rewards_df(spark, rewards), 5, 3).collect()
    b = ucb1_crawl_schedule(
        _rewards_df(spark, rewards).repartition(11), 5, 3
    ).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))


def test_ucb1_rejects_bad_params(spark):
    from obp_search_engine_spark.operators.scheduling import (
        ucb1_crawl_schedule,
    )

    df = _rewards_df(spark, {("h", 1): 1})
    with pytest.raises(ValueError):
        ucb1_crawl_schedule(df, rounds=0, batch=1)
    with pytest.raises(ValueError):
        ucb1_crawl_schedule(df, rounds=1, batch=0)
