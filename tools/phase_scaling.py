"""Per-phase N-vs-4N scaling probe (BENCH/BASELINE.md evidence).

Reconstructs a steady-state crawl round (the round-3 state of the 1M-page
scaling bench) and times each phase separately at the given core count, so
the efficiency writeup can attribute the non-scaling residual to a named
phase instead of a guess:

  A dequeue   window-rank wave selection over the frontier
  B fetch+extract   co-located SHJ fetch join + single-Arrow-pass link/text
                    extraction + stats + spill write (the documents store)
  C dedup     candidate aggregation + exact anti-join (and bloom probe)
  D merge     frontier merge + shard-partitioned snapshot write

Run alternating core counts, never concurrently with anything else:

  python tools/phase_scaling.py --cpus 8
  python tools/phase_scaling.py --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--hosts", type=int, default=1024)
    ap.add_argument("--body-repeat", type=int, default=150)
    ap.add_argument("--outdeg-max", type=int, default=25)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--codec", default=None,
                    help="parquet write codec override (e.g. zstd): trades "
                         "CPU (scales with cores) for write bytes (the "
                         "non-scaling bus) on spill/snapshot writes")
    ap.add_argument("--zstd-level", type=int, default=None,
                    help="zstd encode level for parquet writes (parquet-mr "
                         "default 3; 1 = faster encode, slightly larger)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from obp_search_engine_spark.functions import textstats as ts
    from obp_search_engine_spark.functions.extract import extract_links_and_text_udf
    from obp_search_engine_spark.operators.checkpoint import run_crawl, write_snapshot
    from obp_search_engine_spark.operators.crawl import candidates_from_harvest
    from obp_search_engine_spark.operators.frontier import dequeue_wave
    from obp_search_engine_spark.operators.seen_set import (
        build_seen_set,
        seen_probe_factory,
    )
    from obp_search_engine_spark.session import get_spark
    from obp_search_engine_spark.sources.pages import bucketed_pages_table, url_of

    spark = get_spark(
        f"phase-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(8, args.cpus),
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/derby",
            **({"spark.sql.parquet.compression.codec": args.codec} if args.codec else {}),
            **(
                {"spark.hadoop.parquet.compression.codec.zstd.level": str(args.zstd_level)}
                if args.zstd_level is not None
                else {}
            ),
        },
    )
    pages_path = (
        f"/tmp/bench_pages_{args.pages}_{args.hosts}_{args.body_repeat}_{args.outdeg_max}"
    )
    raw = spark.read.parquet(pages_path)
    tbl = f"pages_b{args.buckets}_{args.pages}_{args.hosts}_{args.body_repeat}_{args.outdeg_max}"
    pages = bucketed_pages_table(spark, raw, tbl, n_buckets=args.buckets)
    pages.select(F.sum(F.length("html"))).collect()  # prewarm real bytes

    # ---- set up the round-3 state: 2 rounds from 8192 seeds -------------
    seeds = [url_of(i, 42, args.hosts) for i in range(8192)]
    setup = run_crawl(
        spark, pages, seeds=seeds, rounds=2, per_host_budget=100_000,
        hot_host_salts=8, broadcast_batch=False, extract_documents=True,
        discard_harvest=True,
    )
    frontier = setup["frontier"].localCheckpoint(eager=True)
    round_ts = "2026-06-01 00:00:03"
    timings: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 2)
        return out

    # A: dequeue
    wave = dequeue_wave(frontier, per_host_budget=100_000, now=round_ts,
                        hot_host_salts=8)
    clock("A_dequeue", wave.count)
    wave = wave.localCheckpoint(eager=True)

    # B: fetch join + single-pass extraction + stats + spill (the round's
    # dominant phase; mirrors crawl_round's harvest_dir path exactly)
    from obp_search_engine_spark.operators.crawl import fetch_join

    spill = tempfile.mkdtemp(prefix="phase_spill_")
    fetched = fetch_join(wave, pages, broadcast_batch=False)
    harvested = fetched.select(
        "url",
        F.col("depth").alias("src_depth"),
        extract_links_and_text_udf(F.col("html")).alias("_h"),
    ).select(
        "url", "src_depth",
        F.col("_h.links").alias("_links"),
        F.col("_h.text").alias("text"),
        F.lit(round_ts).cast("timestamp").alias("fetch_ts"),
        ts.lang_id_col(F.col("_h.text")).alias("lang"),
        ts.token_count_col(F.col("_h.text")).alias("n_tokens"),
        ts.fingerprint_col(F.col("_h.text")).alias("fp"),
        ts.quality_score_col(F.col("_h.text")).alias("quality"),
    )
    clock("B_fetch_extract_spill",
          lambda: harvested.write.mode("overwrite").parquet(os.path.join(spill, "h")))
    harvest = spark.read.parquet(os.path.join(spill, "h"))

    # B sub-decomposition (each repeats the prior stages — subtract to
    # attribute). Every action aggregates the HEAVY column: a bare count()
    # lets Catalyst prune html and skip the UDF entirely (measured: 2.5 s
    # "join+extract" vs 45 s real — the optimizer deleted the work).
    clock("B0_scan_bytes",
          lambda: pages.select(F.sum(F.length("html"))).collect())
    clock("B1_scan_join_bytes",
          lambda: fetched.select(F.sum(F.length("html"))).collect())
    clock("B2_extract_bytes",
          lambda: harvested.select(F.sum(F.length("text"))).collect())

    # C: candidates + dedup (exact anti-join, then the bloom probe)
    candidates = candidates_from_harvest(harvest)
    fresh_exact = candidates.join(
        frontier.select(F.col("url_hash").alias("_seen_hash")).hint("shuffle_hash"),
        F.xxhash64(F.col("url")) == F.col("_seen_hash"),
        "left_anti",
    )
    clock("C_dedup_exact", fresh_exact.count)
    seen = None

    def _build():
        nonlocal seen
        seen = build_seen_set(
            spark, frontier.select("url_hash", "host_hash")
        ).localCheckpoint(eager=True)

    clock("C_bloom_build", _build)
    probe = seen_probe_factory(lambda: seen)
    clock("C_dedup_bloom", lambda: probe(candidates, frontier).count())

    # D: frontier merge + shard-partitioned snapshot
    from obp_search_engine_spark.operators.crawl import new_frontier_rows

    reached = harvest.select("url", F.lit(True).alias("_r"))
    mark = (
        wave.select("url")
        .join(reached, "url", "left")
        .select("url", F.coalesce(F.col("_r"), F.lit(False)).alias("_reachable"))
        .hint("shuffle_hash")
    )
    merged = (
        frontier.join(mark, "url", "left")
        .withColumn(
            "state",
            F.when(F.col("_reachable").isNull(), F.col("state"))
            .when(F.col("_reachable"), F.lit("done"))
            .otherwise(F.lit("failed")),
        )
        .drop("_reachable")
        .unionByName(new_frontier_rows(fresh_exact, round_ts))
    )
    snap = tempfile.mkdtemp(prefix="phase_snap_")
    clock("D_merge_snapshot",
          lambda: write_snapshot(merged, os.path.join(snap, "frontier")))

    shutil.rmtree(spill, ignore_errors=True)
    shutil.rmtree(snap, ignore_errors=True)
    print(json.dumps({
        "cpus": args.cpus,
        "wave": wave.count(),
        "frontier": frontier.count(),
        "setup_rounds_sec": round(setup["wall_sec"], 1),
        "phases_sec": timings,
    }))


if __name__ == "__main__":
    main()
