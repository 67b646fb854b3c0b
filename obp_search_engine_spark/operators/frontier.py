"""Frontier scheduling: window-rank dequeue, politeness clock, hot-host
salting.

Reference analogues:
  * dequeue  <- keyset frontier scan ``WHERE id > ? ORDER BY id LIMIT ?``
    (crawler/db/mysql.go:101-129) + staleness top-1 (mysql.go:90-98). The
    scale design replaces the cursor with a window rank per host partition
    ordered by the depth-then-discovery-time priority the sentinel
    timestamps encode (crawler/db/mysql.go:293).
  * politeness <- the reference's only throttle is a global 10-goroutine cap
    (crawler/main.go:36); ours is a per-host budget + a ``host_state``
    crawl-delay clock (north_rule: robots crawl-delay budgets).
  * salting <- no reference analogue; required at 10^10 URLs because one
    mega-host would put its whole queue in one window partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import FRONTIER_STATE_DUE

#: deterministic crawl priority — never-crawled first by discovery wave,
#: then oldest-crawled, then url as the total-order tiebreaker. This is the
#: reference's "sentinel-timestamp staleness" ordering made explicit
#: (SURVEY.md §1.1 item 4).
PRIORITY_COLS = ("depth", "discovered_ts", "url")


def priority_order() -> list[Column]:
    return [F.col(c).asc() for c in PRIORITY_COLS]


def salted_host_key(host_hash: Column, url: Column, n_salts: int) -> Column:
    """Split one hot host's queue across ``n_salts`` window partitions.

    The salt is a pure function of the url so ranking stays deterministic;
    per-salt budget = ceil(budget / n_salts) keeps the host total bounded.
    """
    return F.concat_ws(
        "#", host_hash.cast("string"), F.pmod(F.xxhash64(url), F.lit(n_salts)).cast("string")
    )


def dequeue_wave(
    frontier: DataFrame,
    per_host_budget: int | DataFrame | None = None,
    host_state: DataFrame | None = None,
    now=None,
    hot_host_salts: int = 1,
    priority: list[Column] | None = None,
) -> DataFrame:
    """Select this round's crawl wave from the frontier.

    - filter to ``state = 'due'``;
    - politeness: drop hosts whose ``next_allowed_ts`` is in the future
      (host_state is small — one row per host — so Catalyst broadcasts it);
    - per-host budget: ``row_number`` over host partitions ordered by the
      deterministic priority, keep rank <= budget. With ``hot_host_salts >
      1`` the window partitions on a salted key so a mega-host's queue
      spreads over several partitions (skew defusal) while the per-host
      total stays <= budget;
    - a DataFrame ``per_host_budget`` gives each host its OWN budget:
      (host, alloc) rows, e.g. the output of
      :func:`operators.scheduling.allocate_budget` — the global-fetch-
      budget water-filling allocator feeding the dequeue directly. Hosts
      with no allocation row are dequeued 0 urls (the allocator saw no
      demand for them, so admitting any would break its budget
      invariant). One row per host, so Catalyst broadcasts the join.
      Under salting the per-host total is exact for hosts whose queue
      fills every salt bucket past its quota (the mega-hosts salting
      exists for) and may under-fill for small-queue hosts whose rows
      hash into few buckets — same one-sided (never-over) guarantee as
      the uniform-budget salted path;
    - ``priority`` overrides the default depth-then-discovery ordering —
      e.g. ``[F.col("rank").desc(), *priority_order()]`` after joining
      :func:`operators.graph.pagerank` scores onto the frontier crawls
      high-PageRank urls first. Callers must keep the ordering total
      (append ``url`` or the defaults as tiebreakers) or the dequeue
      stops being deterministic.
    """
    order = list(priority) if priority is not None else priority_order()
    wave = frontier.filter(F.col("state") == FRONTIER_STATE_DUE)
    if host_state is not None and now is not None:
        # anti-join against CLOSED hosts: a host with no host_state row has
        # no constraints and must pass
        closed = host_state.filter(
            F.col("next_allowed_ts").isNotNull()
            & (F.col("next_allowed_ts") > F.lit(now).cast("timestamp"))
        ).select("host")
        wave = wave.join(F.broadcast(closed), "host", "left_anti")
    if isinstance(per_host_budget, DataFrame):
        alloc = per_host_budget.select(
            "host", F.col("alloc").cast("long").alias("_alloc")
        )
        wave = wave.join(F.broadcast(alloc), "host", "inner")
        if hot_host_salts > 1:
            # same two-pass shape as the uniform-budget path, with the
            # per-salt quota derived per row; the quota ceil over-admits,
            # so the exact per-host re-rank always runs
            key = salted_host_key(
                F.col("host_hash"), F.col("url"), hot_host_salts
            )
            w1 = Window.partitionBy(key).orderBy(*order)
            wave = (
                wave.withColumn("_rank", F.row_number().over(w1))
                .filter(
                    # ceil(_alloc / n_salts); the add-then-div form because
                    # Spark's `div` truncates toward zero, so the negate
                    # trick is wrong for the negative intermediate
                    F.col("_rank")
                    <= F.expr(
                        f"(_alloc + {hot_host_salts - 1}) div {hot_host_salts}"
                    )
                )
                .drop("_rank")
            )
        w2 = Window.partitionBy(F.col("host_hash")).orderBy(*order)
        return (
            wave.withColumn("_rank", F.row_number().over(w2))
            .filter(F.col("_rank") <= F.col("_alloc"))
            .drop("_rank", "_alloc")
        )
    if per_host_budget is not None:
        if hot_host_salts > 1:
            # pass 1: rank inside salted partitions — the skew-defusing
            # heavy lift (a mega-host's queue spreads over n_salts windows).
            # ceil-div per-salt quota over-admits up to n_salts-1 rows when
            # budget % n_salts != 0, so a second per-HOST re-rank over the
            # (<= budget + n_salts - 1 per host) survivors enforces the
            # exact budget. Pass 2's partitions are budget-bounded, so it
            # cannot reintroduce the skew pass 1 defused.
            key = salted_host_key(F.col("host_hash"), F.col("url"), hot_host_salts)
            per_part = -(-per_host_budget // hot_host_salts)  # ceil div
            w1 = Window.partitionBy(key).orderBy(*order)
            wave = (
                wave.withColumn("_rank", F.row_number().over(w1))
                .filter(F.col("_rank") <= per_part)
                .drop("_rank")
            )
            if per_host_budget % hot_host_salts != 0:
                w2 = Window.partitionBy(F.col("host_hash")).orderBy(*order)
                wave = (
                    wave.withColumn("_rank", F.row_number().over(w2))
                    .filter(F.col("_rank") <= per_host_budget)
                    .drop("_rank")
                )
        else:
            w = Window.partitionBy(F.col("host_hash")).orderBy(*order)
            wave = (
                wave.withColumn("_rank", F.row_number().over(w))
                .filter(F.col("_rank") <= per_host_budget)
                .drop("_rank")
            )
    return wave


def update_host_clock(
    host_state: DataFrame, visited_hosts: DataFrame, now, default_delay: float = 0.0
) -> DataFrame:
    """Advance next_allowed_ts for hosts visited this wave (MERGE semantics:
    matched hosts update their clock, new hosts insert with defaults)."""
    bumped = visited_hosts.select("host").distinct()
    merged = (
        host_state.join(bumped.withColumn("_hit", F.lit(True)), "host", "full_outer")
        .withColumn("crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(default_delay)))
        .withColumn(
            "next_allowed_ts",
            F.when(
                F.col("_hit"),
                F.lit(now).cast("timestamp")
                + F.expr("make_dt_interval(0, 0, 0, crawl_delay)"),
            ).otherwise(F.col("next_allowed_ts")),
        )
        .drop("_hit")
    )
    return merged
