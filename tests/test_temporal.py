"""Temporal joins (operators/temporal.py) against brute-force Python
references on randomized event streams, plus the distributed-correctness
property (identical output at any partitioning) and the edge semantics
the DuckDB oracles pin: <= tie inclusion, NULL/zero behavior for
match-less rows, and half-open range windows."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.temporal import asof_join, range_count_join

_T0 = dt.datetime(2024, 1, 1)


def _rand_stream(rng, n, n_keys=5, max_step=900):
    rows, t = [], 0
    for i in range(n):
        t += rng.randrange(1, max_step)
        rows.append((i, rng.randrange(n_keys), _T0 + dt.timedelta(seconds=t)))
    return rows


def _py_asof(left, right):
    """left/right: (id, key, ts). Returns {left_id: (right_id, right_ts)}"""
    out = {}
    for lid, lk, lts in left:
        best = None
        for rid, rk, rts in right:
            if rk == lk and rts <= lts and (best is None or rts > best[1]):
                best = (rid, rts)
        out[lid] = best
    return out


@pytest.mark.parametrize("seed", [1, 14, 52])
def test_asof_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    left = _rand_stream(rng, 80)
    right = _rand_stream(rng, 30)
    # unique (key, ts) on the right by construction (strictly increasing t)
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [(rid, k, ts, float(rid) * 1.5) for rid, k, ts in right],
        "rid long, user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof_join(ldf, rdf, key="user_id", value_cols=["value"]).collect()
    }
    ref = _py_asof(left, right)
    assert set(got) == set(r[0] for r in left)
    for lid, best in ref.items():
        if best is None:
            assert got[lid] == (None, None)
        else:
            assert got[lid] == (best[0] * 1.5, best[1])


def test_asof_tie_at_equal_timestamp_matches(spark):
    """A right row AT the left timestamp is a match (<= semantics)."""
    ts = _T0
    ldf = spark.createDataFrame([(1, 7, ts)], "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [(9, 7, ts, 42.0)], "rid long, user_id long, ts timestamp, value double"
    )
    row = asof_join(ldf, rdf, key="user_id", value_cols=["value"]).first()
    assert row.asof_value == 42.0 and row.asof_ts == ts


def test_asof_partitioning_invariant(spark):
    rng = random.Random(33)
    left = _rand_stream(rng, 120)
    right = _rand_stream(rng, 50)
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [(rid, k, ts, float(rid)) for rid, k, ts in right],
        "rid long, user_id long, ts timestamp, value double",
    )
    key = lambda r: (r.event_id, r.asof_value, r.asof_ts)  # noqa: E731
    a = sorted(map(key, asof_join(ldf.repartition(1), rdf.repartition(1), "user_id", value_cols=["value"]).collect()))
    b = sorted(map(key, asof_join(ldf.repartition(13), rdf.repartition(7), "user_id", value_cols=["value"]).collect()))
    assert a == b


def _py_range_count(left, right, width_sec):
    out = {}
    for rid, _, rts in right:
        out[rid] = sum(
            1
            for _, _, lts in left
            if rts <= lts < rts + dt.timedelta(seconds=width_sec)
        )
    return out


@pytest.mark.parametrize("seed", [6, 21])
def test_range_count_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    left = _rand_stream(rng, 100, max_step=400)
    right = _rand_stream(rng, 40, max_step=1100)
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "event_id long, k long, ts timestamp")
    got = {
        r.event_id: r.n_in_window
        for r in range_count_join(ldf, rdf, width_minutes=30).collect()
    }
    assert got == _py_range_count(left, right, 30 * 60)
    assert 0 in got.values() or min(got.values()) >= 0  # zero-count rows kept


def test_range_half_open_boundaries(spark):
    """ts == right.ts is IN the window; ts == right.ts + width is OUT."""
    rts = _T0
    ldf = spark.createDataFrame(
        [
            (1, rts),  # exactly at start: in
            (2, rts + dt.timedelta(minutes=30)),  # exactly at end: out
            (3, rts + dt.timedelta(minutes=29, seconds=59)),  # in
        ],
        "lid long, ts timestamp",
    )
    rdf = spark.createDataFrame([(5, rts)], "event_id long, ts timestamp")
    row = range_count_join(ldf, rdf, width_minutes=30).first()
    assert row.n_in_window == 2
