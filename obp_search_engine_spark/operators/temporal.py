"""Temporal joins: as-of join and range (interval-containment) join.

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do) and executes
non-equi range predicates as BroadcastNestedLoopJoin — both are
re-expressed here as compositions of shuffle-friendly primitives, the
pattern this engine uses everywhere: turn the non-equi condition into an
equi key, let Catalyst do the rest.

* :func:`asof_join` — for each left row, the single right row with the
  greatest right timestamp <= the left timestamp, per key. Implemented
  WITHOUT a join at all: tag-union both sides, one window over
  (key, ts) carrying the last right value forward. ONE shuffle on the
  key, no nested loop, no per-key skew beyond the window sort —
  at 100 TB this is the same cost as a groupBy over the union.
  (A sort-merge join can't express "latest prior"; the union+window is
  the canonical distributed as-of.)

* :func:`range_count_join` — count left rows whose timestamp falls in
  [right.ts, right.ts + width) per right row. Implemented by bucketing
  both sides to fixed ``width``-sized bins: each window covers at most
  two bins (width == bin size), so the right side explodes to <= 2
  (bin, row) pairs, the join becomes an EQUI join on bin, and the exact
  containment check runs as a cheap post-filter. Shuffle is on the bin
  key — bounded fan-out, no nested loop, skew limited to hot time bins.

Both have exact DuckDB oracles (native ASOF JOIN / theta join) — the
Spark plans must reproduce the declarative semantics bit-for-bit, which
pins tie-breaking (<= includes the equal timestamp) and empty-window
behavior (left rows with no prior match survive with NULLs / zero
counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row picks up the ``right``
    row with the greatest ``right_ts`` <= its ``left_ts`` for the same
    ``key`` (NULLs when no prior right row exists).

    Returns all ``left`` columns plus, for each requested right value
    column ``c``, ``asof_<c>``, and ``asof_ts`` (the matched right
    timestamp). Ties: a right row AT the left timestamp matches (<=),
    and among equal right timestamps the implementation keeps the one
    ordered last by the window sort, matching DuckDB's ASOF choice of
    the single greatest-ts row; duplicate (key, ts) rows on the right
    make "the" match ill-defined in both engines, so callers should
    de-dup the right side for exactness.
    """
    value_cols = list(value_cols or [])
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r = right.select(
        F.col(key),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"),
    ).select(*l.columns)  # align column order for the union
    u = l.unionByName(r)
    # right rows sort BEFORE left rows at the same timestamp so a match
    # at exactly left_ts is visible to the left row (the <= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    width_minutes: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str = "event_id",
) -> DataFrame:
    """For each ``right`` row, count ``left`` rows with
    ``right.ts <= left.ts < right.ts + width_minutes`` — interval
    containment as a bucketed EQUI join.

    Bin size == window width, so every window spans at most two bins;
    the right side explodes to those bins, joins the binned left side
    on the bin key, and the exact half-open containment filters after
    the join. Right rows with no contained left rows are kept with
    ``n_in_window = 0`` (left-outer semantics, like the SQL theta
    LEFT JOIN it replaces).
    """
    width_us = int(width_minutes) * 60_000_000
    # events parquet carries TIMESTAMP_NTZ; the session runs UTC, so the
    # cast to TIMESTAMP is epoch-identical (and cancels anyway: both
    # sides of every comparison here go through the same conversion)
    lb = left.select(
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("_lus")
    ).withColumn("_bin", F.expr(f"_lus div {width_us}"))
    rb = right.select(
        F.col(right_id).alias("_rid"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_rus"),
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"_rus div {width_us}"),
                F.expr(f"(_rus + {width_us - 1}) div {width_us}"),
            )
        ),
    )
    hits = (
        rb.join(lb, "_bin")
        .filter(
            (F.col("_lus") >= F.col("_rus"))
            & (F.col("_lus") < F.col("_rus") + F.lit(width_us))
        )
        .groupBy("_rid")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        right.select(F.col(right_id).alias("_rid"))
        .join(hits, "_rid", "left")
        .select(
            F.col("_rid").alias(right_id),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_in_window"),
        )
    )
