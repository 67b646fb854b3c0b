"""HyperBall: per-node HLL counters absorbed along out-edges equal the
HLL of the EXACT reachability ball at every radius — registers are
deterministic (md5-portable), so equality is exact, not approximate."""

from __future__ import annotations

import hashlib
import random

from obp_search_engine_spark.operators.graph import hyperball


def _h32(x: int) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)


def _regs_of(ball: set[int], b: int) -> dict[int, int]:
    p = 32 - b
    pmax = p + 1
    regs: dict[int, int] = {}
    for node in ball:
        h = _h32(node)
        bucket = h >> p
        w = h % (1 << p)
        rank = pmax if w == 0 else pmax - (w.bit_length())
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def _z_scaled(regs: dict[int, int], b: int) -> int:
    m = 1 << b
    pmax = 32 - b + 1
    z = 0
    for bucket in range(m):
        z += 1 << (pmax - regs.get(bucket, 0))
    return z


def _balls(edges: list[tuple[int, int]], iters: int) -> dict[tuple[int, int], set[int]]:
    adj: dict[int, set[int]] = {}
    nodes = set()
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    balls = {(v, 0): {v} for v in nodes}
    for t in range(1, iters + 1):
        for v in nodes:
            ball = set(balls[(v, t - 1)])
            for w in adj.get(v, ()):  # ball(v,t) = {v} U balls of successors
                ball |= balls[(w, t - 1)]
            balls[(v, t)] = ball
    return balls


def test_hyperball_registers_equal_exact_ball_hll(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.node, r.t): (r.buckets_hit, r.z_scaled)
        for r in hyperball(df, iters=3, b=4).collect()
    }
    balls = _balls(edges, 3)
    for (v, t), ball in balls.items():
        regs = _regs_of(ball, 4)
        assert got[(v, t)] == (len(regs), _z_scaled(regs, 4)), (v, t)


def test_hyperball_parallelism_invariant(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(
        map(tuple, hyperball(df.repartition(1), iters=2, b=4).collect())
    )
    b = sorted(
        map(tuple, hyperball(df.repartition(7), iters=2, b=4).collect())
    )
    assert a == b


def test_hyperball_ball_growth_monotone(spark):
    # z_scaled only decreases (registers only grow) as the radius grows
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hyperball(df, iters=4, b=4).collect()
    by_node: dict[int, list] = {}
    for r in rows:
        by_node.setdefault(r.node, []).append((r.t, r.z_scaled))
    for node, seq in by_node.items():
        seq.sort()
        zs = [z for _, z in seq]
        assert zs == sorted(zs, reverse=True), node


def test_harmonic_centrality_matches_python_reference(spark):
    from obp_search_engine_spark.operators.graph import harmonic_centrality
    from obp_search_engine_spark.operators.sketches import _alpha

    rng = random.Random(3)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.centrality
        for r in harmonic_centrality(df, iters=3, b=4).collect()
    }
    m, pmax = 16, 29
    alpha = _alpha(m)
    balls = _balls(edges, 3)
    nodes = {v for v, _ in balls}
    for v in nodes:
        acc, prev = 0.0, 0.0
        for t in range(0, 4):
            z = _z_scaled(_regs_of(balls[(v, t)], 4), 4)
            est = alpha * m * m * float(1 << pmax) / float(z)
            if t > 0:
                acc += (est - prev) / float(t)
            prev = est
        assert abs(got[v] - round(acc, 6)) < 1e-9, v


def test_distance_distribution_monotone_and_p90(spark):
    from obp_search_engine_spark.operators.graph import distance_distribution

    edges = [(i, i + 1) for i in range(12)] + [(12, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = sorted(
        distance_distribution(df, iters=4, b=4).collect(),
        key=lambda r: r.t,
    )
    reach = [r.reach_scaled for r in rows]
    assert reach == sorted(reach)  # N(t) monotone
    assert rows[-1].cum_ppm == 1000000 and rows[-1].at_or_past_p90
    # p90 flags are monotone: once true, stays true
    flags = [r.at_or_past_p90 for r in rows]
    assert flags == sorted(flags)


def test_distance_distribution_parallelism_invariant(spark):
    from obp_search_engine_spark.operators.graph import distance_distribution

    rng = random.Random(9)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = [tuple(r) for r in distance_distribution(df.repartition(1), iters=3).collect()]
    b = [tuple(r) for r in distance_distribution(df.repartition(9), iters=3).collect()]
    assert a == b
