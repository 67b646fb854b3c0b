"""Structured-Streaming operators (streaming/events.py): the stream path
must produce exactly the batch plan's rows (same logical aggregation), the
session/tumbling state machinery must close windows via the watermark, and
the applyInPandasWithState politeness gate must match the pure-Python
clock oracle including across micro-batch boundaries.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pandas as pd
import pytest

from obp_search_engine_spark.streaming.events import (
    politeness_gate_oracle,
    politeness_gate_stream,
    session_windows,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _copy_events(spark, tmp_path):
    src = f"{SF}/events.parquet"
    dst = tmp_path / "stream_in"
    dst.mkdir()
    batch = spark.read.parquet(src)
    batch.write.mode("overwrite").parquet(str(dst / "real"))
    return str(dst / "real"), batch


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    path, batch = _copy_events(spark, tmp_path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.table("win_counts").collect()}
    want = {tuple(r) for r in windowed_event_counts(batch).collect()}
    assert got == want


def test_session_windows_stream_equals_batch(spark, tmp_path):
    """Append-mode sessions only emit once the watermark passes their end;
    two far-future sentinel batches push the watermark over every real
    session (watermark used in batch N is computed at the end of N-1)."""
    path, batch = _copy_events(spark, tmp_path)
    max_ts = batch.agg({"ts": "max"}).first()[0]
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        session_windows(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for i, days in enumerate((10, 20)):
            pd.DataFrame(
                {
                    "event_id": [-1 - i],
                    "ts": [max_ts + dt.timedelta(days=days)],
                    "user_id": [-1 - i],
                    "event_type": ["sentinel"],
                    "value": [0.0],
                    "props": ["{}"],
                }
            ).pipe(spark.createDataFrame, schema=batch.schema).write.mode(
                "append"
            ).parquet(path)
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r) for r in spark.table("sessions").filter("user_id >= 0").collect()
    }
    want = {tuple(r) for r in session_windows(batch).collect()}
    assert got == want


def test_politeness_gate_stream_matches_oracle(spark, tmp_path):
    """Custom stateful op: per-host crawl-delay clock. Fed in two
    micro-batches (per-host event-time order preserved across them) the
    decisions must equal the single-pass python oracle — state carries the
    clock across batches."""
    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = [
        ("a.example", base + dt.timedelta(seconds=s))
        for s in (0, 30, 61, 90, 200)
    ] + [
        ("b.example", base + dt.timedelta(seconds=s))
        for s in (5, 64, 65, 131)
    ]
    early = [r for r in rows if r[1] < base + dt.timedelta(seconds=80)]
    late = [r for r in rows if r[1] >= base + dt.timedelta(seconds=80)]

    path = tmp_path / "fetches"
    path.mkdir()
    schema = "host string, ts timestamp"
    spark.createDataFrame(early, schema).write.mode("append").parquet(str(path))
    stream = spark.readStream.schema("host string, ts timestamp").parquet(str(path))
    q = (
        politeness_gate_stream(stream, crawl_delay_sec=60.0)
        .writeStream.format("memory")
        .queryName("gate")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(late, schema).write.mode("append").parquet(str(path))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.host, r.ts, r.allowed) for r in spark.table("gate").collect()}
    want = politeness_gate_oracle(rows, crawl_delay_sec=60.0)
    assert got == want


def test_politeness_gate_multi_chunk_group(spark, tmp_path):
    """A host whose micro-batch exceeds one Arrow batch arrives as several
    unordered chunks; the gate must sort the whole group once (per-chunk
    sorting would tie decisions to chunk boundaries). 5000 events at the
    session's 2048-row Arrow batches span 3 chunks."""
    import random

    base = dt.datetime(2026, 3, 1)
    rows = [("big.example", base + dt.timedelta(seconds=7 * i)) for i in range(5000)]
    rng = random.Random(7)
    rng.shuffle(rows)  # unordered within the batch
    path = tmp_path / "fetches_big"
    path.mkdir()
    spark.createDataFrame(rows, "host string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(str(path))
    stream = spark.readStream.schema("host string, ts timestamp").parquet(str(path))
    q = (
        politeness_gate_stream(stream, crawl_delay_sec=60.0)
        .writeStream.format("memory")
        .queryName("gate_big")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.host, r.ts, r.allowed) for r in spark.table("gate_big").collect()}
    want = politeness_gate_oracle(rows, crawl_delay_sec=60.0)
    assert got == want
    # exactly every 60s/7s≈9th event admitted
    assert sum(1 for (_h, _t, ok) in got if ok) == len({i for i in range(5000) if (7 * i) % 63 == 0})


def test_politeness_gate_scale_10k_hosts_state_and_batch_parity(spark, tmp_path):
    """VERDICT r04 item 9 — the last untested scale claim in the streaming
    layer: drive 10k hosts through the stateful gate in two micro-batches
    and assert (a) the state store holds EXACTLY one row per host (O(1)
    state per host, never O(events)), and (b) the stream's decisions agree
    exactly with the batch politeness filter (politeness_gate_batch) over
    the same events."""
    from obp_search_engine_spark.streaming.events import politeness_gate_batch

    n_hosts = 10_000
    base = dt.datetime(2026, 3, 1)
    # 3 events per host with per-host phase: admit/deny mix varies by host
    rows = [
        (f"h{h}.example", base + dt.timedelta(seconds=(h % 50) + 40 * i))
        for h in range(n_hosts)
        for i in range(3)
    ]
    early = [r for r in rows if r[1] < base + dt.timedelta(seconds=60)]
    late = [r for r in rows if r[1] >= base + dt.timedelta(seconds=60)]
    path = tmp_path / "fetches_10k"
    path.mkdir()
    schema = "host string, ts timestamp"
    spark.createDataFrame(early, schema).write.mode("append").parquet(str(path))
    stream = spark.readStream.schema(schema).parquet(str(path))
    q = (
        politeness_gate_stream(stream, crawl_delay_sec=60.0)
        .writeStream.format("memory")
        .queryName("gate_10k")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(late, schema).write.mode("append").parquet(str(path))
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    got = {(r.host, r.ts, r.allowed) for r in spark.table("gate_10k").collect()}
    assert len(got) == 3 * n_hosts
    # (a) O(1) state per host: one state row per host, no growth with events
    state = progress["stateOperators"][0]
    assert state["numRowsTotal"] == n_hosts, state
    # (b) exact agreement with the batch politeness filter
    batch = {
        (r.host, r.ts, r.allowed)
        for r in politeness_gate_batch(
            spark.createDataFrame(rows, schema), crawl_delay_sec=60.0
        ).collect()
    }
    assert got == batch
