"""foreachBatch crawl driver: a rate-source tick stream triggers crawl
rounds, mirroring the reference's forever-loop + 5-min cache refresh timers
(crawler/crawling/crawler.go:181, apiserver/tagsCache.js:47-48) with
Spark-native checkpointed triggers.

The round itself stays the SAME batch function (operators/crawl.crawl_round)
— streaming here is just the scheduler. This is deliberately thin: crawl
state lives in our snapshot checkpoints, not in streaming state stores, so
a streaming-driven run and a loop-driven run are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_crawl_rounds(
    spark: SparkSession,
    pages: DataFrame,
    ckpt_dir: str,
    seeds: list[str] | None = None,
    rounds_per_trigger: int = 1,
    tick_seconds: int = 5,
    max_rounds: int | None = None,
    **crawl_kwargs,
):
    """Start a streaming query whose every micro-batch runs crawl rounds.

    Returns the StreamingQuery; caller awaits/stops it. State persists in
    ckpt_dir exactly as in batch mode, so stopping the stream and resuming
    later (or in batch mode) is seamless.
    """
    from ..operators.checkpoint import latest_round, run_crawl

    # host_state is checkpointed per round: hand it to the SEED round only
    # (which snapshots it) and let every resume trigger reload the snapshot —
    # re-passing the original frame would reset crawl-delay clocks each
    # micro-batch.
    seed_host_state = crawl_kwargs.pop("host_state", None)
    if seeds is not None and latest_round(ckpt_dir) is None:
        # seed round 0 synchronously so every trigger is a pure resume
        run_crawl(
            spark, pages, seeds=seeds, rounds=0, ckpt_dir=ckpt_dir,
            host_state=seed_host_state,
        )

    state = {"rounds_done": 0}

    def one_batch(_batch_df: DataFrame, _batch_id: int) -> None:
        if max_rounds is not None and state["rounds_done"] >= max_rounds:
            return
        run_crawl(
            spark,
            pages,
            rounds=rounds_per_trigger,
            ckpt_dir=ckpt_dir,
            resume=True,
            **crawl_kwargs,
        )
        state["rounds_done"] += rounds_per_trigger

    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
    )
    return (
        ticks.writeStream.trigger(processingTime=f"{tick_seconds} seconds")
        .foreachBatch(one_batch)
        .option("checkpointLocation", f"{ckpt_dir}/_stream_meta")
        .start()
    )
