"""Crawl-budget scheduling: max-min fair (water-filling) allocation of a
global fetch budget across hosts.

The reference crawler fetches every discovered node each round
(crawler/crawler.go:116 walks the whole frontier); a web-scale deployment
of the same loop has a bounded per-round fetch budget and must split it
across hosts so no single mega-host starves the tail — the classic
max-min fairness problem. This operator computes the exact integer
water-filling allocation:

* every host with demand ``d_h <= t`` (the water level) is fully granted;
* saturated hosts (``d_h > t``) all receive the level ``t0 = L div m``
  (L = leftover budget, m = saturated count), and the remainder
  ``r = L mod m`` is granted one extra unit each to the first ``r``
  saturated hosts in (demand asc, host asc) order;
* if total demand fits the budget, everyone is fully granted.

All arithmetic is integer, the tie order is total, so the result is
bit-identical at any parallelism and exactly mirrored by a single
global-window SQL oracle (:func:`allocate_budget_oracle_sql`). The
allocation satisfies ``sum(alloc) == min(budget, total_demand)`` and
``alloc <= demand`` everywhere (pytest asserts both).

100 TB shape: the naive formulation needs one global ROW_NUMBER over all
hosts — a single-partition sort of 10^8 rows. :func:`allocate_budget`
avoids it with the same two-level decomposition as
``curation.pack_by_token_budget_distributed``:

  1. aggregate per DISTINCT DEMAND LEVEL (count + sum per level — one
     map-side-combined shuffle, output is O(distinct demands), far
     smaller than hosts);
  2. the cut (water level), leftover, and per-level saturated-rank
     offsets come from windows over that bounded levels frame;
  3. per-host ranks for the remainder are windows PARTITIONED BY demand
     level (ordered by host within the level) plus the broadcast level
     offset — no global host-order window anywhere.

Skew note: a level shared by very many hosts makes its partition-local
window wide; that is the documented trade (the remainder rule needs a
total order within the level). Demands are counts, so heavy levels are
the small ones (d=1,2,...) whose windows are cheap per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def allocate_budget(
    demands: DataFrame,
    budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """Max-min fair integer allocation of ``budget`` across hosts.

    ``demands`` must have one row per host: (host, demand BIGINT >= 0).
    Returns (host, demand, alloc BIGINT, saturated BOOLEAN) for every
    input row. See module docstring for semantics and the scale shape.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    d = demands.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    )

    # level 1: one row per distinct demand value
    levels = d.groupBy("demand").agg(
        F.count("*").alias("lvl_n"), F.sum("demand").alias("lvl_sum")
    )
    w_lvl = Window.orderBy("demand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # materialize the bounded levels frame ONCE: tot/feas/cut/sat_levels
    # below all derive from it, and without truncation each would re-run
    # the full per-host aggregation scan
    levels = levels.select(
        "demand",
        "lvl_n",
        F.sum("lvl_n").over(w_lvl).alias("cnt_le"),
        F.sum("lvl_sum").over(w_lvl).alias("sum_le"),
    ).localCheckpoint(eager=True)

    # totals + the cut: the highest demand level v* whose "grant everyone
    # min(d, v*)" cost still fits the budget. Everything below is a
    # window/agg over the bounded levels frame.
    tot = levels.agg(
        F.max("cnt_le").alias("n"), F.max("sum_le").alias("tot")
    )
    feas = levels.crossJoin(F.broadcast(tot)).filter(
        F.col("sum_le") + (F.col("n") - F.col("cnt_le")) * F.col("demand")
        <= F.lit(budget)
    )
    cut = feas.agg(
        F.coalesce(F.max("cnt_le"), F.lit(0)).cast("long").alias("k"),
        F.coalesce(
            F.max(F.struct("demand", "sum_le")).getField("sum_le"), F.lit(0)
        )
        .cast("long")
        .alias("w_k"),
        F.coalesce(F.max("demand"), F.lit(-1)).cast("long").alias("v_star"),
    )
    params = (
        cut.crossJoin(tot)
        .select(
            "k",
            "w_k",
            "v_star",
            "n",
            (F.col("n") - F.col("k")).alias("m"),
            (F.lit(budget) - F.col("w_k")).alias("leftover"),
        )
        .select(
            "k",
            "v_star",
            "m",
            F.expr("leftover div nullif(m, 0)").alias("t0"),
            F.expr("leftover % nullif(m, 0)").alias("r"),
        )
    )

    # saturated-rank offsets per saturated level: how many saturated
    # hosts live in strictly lower levels (exclusive prefix over levels)
    w_sat = Window.orderBy("demand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sat_levels = (
        levels.crossJoin(F.broadcast(params.select("v_star")))
        .filter(F.col("demand") > F.col("v_star"))
        .select(
            "demand",
            (F.sum("lvl_n").over(w_sat) - F.col("lvl_n")).alias("sat_before"),
        )
    )

    # level 2: per-host, windows partitioned by the demand level only
    w_host = Window.partitionBy("demand").orderBy("host")
    ranked = (
        d.join(F.broadcast(sat_levels), "demand", "left")
        .crossJoin(F.broadcast(params.select("v_star", "m", "t0", "r")))
        .withColumn(
            "sat_rank",
            F.when(
                F.col("demand") > F.col("v_star"),
                F.col("sat_before") + F.row_number().over(w_host),
            ),
        )
    )
    return ranked.select(
        "host",
        "demand",
        F.when(F.col("m") == 0, F.col("demand"))
        .when(F.col("demand") <= F.col("v_star"), F.col("demand"))
        .otherwise(
            F.col("t0") + F.when(F.col("sat_rank") <= F.col("r"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        (
            (F.col("m") > 0) & (F.col("demand") > F.col("v_star"))
        ).alias("saturated"),
    )


def allocate_budget_oracle_sql(
    demands_cte: str, budget: int | str
) -> str:
    """DuckDB oracle for :func:`allocate_budget` as the NAIVE
    single-global-window formulation (row_number + running sum over all
    hosts) — deliberately a different algorithm than the operator's
    two-level decomposition, so an exact match proves the decomposition.
    ``demands_cte`` must yield (host, demand BIGINT); ``budget`` may be
    an int literal or a SQL scalar-subquery string."""
    return f"""
    WITH dem AS ({demands_cte}),
    s AS (
      SELECT host, demand,
             ROW_NUMBER() OVER (ORDER BY demand, host) AS i,
             SUM(demand) OVER (ORDER BY demand, host
                               ROWS UNBOUNDED PRECEDING) AS w
      FROM dem),
    tot AS (SELECT COUNT(*) AS n, COALESCE(SUM(demand), 0) AS t FROM dem),
    cut AS (
      SELECT COALESCE(MAX(i), 0) AS k, COALESCE(MAX(w), 0) AS w_k
      FROM (SELECT s.i, s.w FROM s, tot
            WHERE s.w + (tot.n - s.i) * s.demand <= {budget}
            ORDER BY s.i DESC LIMIT 1) last),
    p AS (
      SELECT cut.k, tot.n - cut.k AS m,
             ({budget} - cut.w_k) // NULLIF(tot.n - cut.k, 0) AS t0,
             ({budget} - cut.w_k) % NULLIF(tot.n - cut.k, 0) AS r
      FROM cut, tot)
    SELECT s.host, s.demand,
           (CASE WHEN p.m = 0 THEN s.demand
                 WHEN s.i <= p.k THEN s.demand
                 WHEN s.i <= p.k + p.r THEN p.t0 + 1
                 ELSE p.t0 END)::BIGINT AS alloc,
           (p.m > 0 AND s.i > p.k) AS saturated
    FROM s, p
    """


def revisit_priority(
    rates: DataFrame,
    ages: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Change-aware revisit priority per host: the Cho-Garcia-Molina
    upgrade of the reference's staleness-only recrawl clock
    (crawler/db/mysql.go:238 orders by ``lastUpdated`` alone).

    Inputs: ``rates`` — (host, n_unchanged, n_changed[, n_gone,
    n_new], ...) from :func:`operators.snapshots.change_rate`;
    ``ages`` — (host, age_rounds) since last visit. Hosts missing from
    ``rates`` (never diffed — e.g. first sighting) take change_pct
    100, the crawl-it-to-learn default.

    Output: (host, age_rounds, change_pct, priority) with
    ``change_pct = (100 * n_changed) div (n_unchanged + n_changed)``.
    When NO doc survived both snapshots, surviving-doc change is
    undefined — if the rates frame carries churn columns (n_gone,
    n_new) and the host had churn, it is FULL-turnover volatile and
    reads 100 (a rotating-URL archive must not rank below a static
    host); with no churn information (or a genuinely empty diff) it
    reads 0. Then
    ``priority = age_rounds * (1 + change_pct)`` — all INTEGER
    arithmetic, so the ranking is bit-stable at any parallelism and
    exactly SQL-expressible; the +1 keeps staleness a tiebreaker for
    never-changing hosts. Feed the result to
    ``frontier.dequeue_wave(priority=...)`` (tests wire them together).

    100 TB shape: one broadcast-or-shuffled join of two host-sized
    (already aggregated) tables and a projection — no per-URL work.
    """
    both = F.col("n_unchanged") + F.col("n_changed")
    has_churn_cols = {"n_gone", "n_new"}.issubset(set(rates.columns))
    turnover = (
        (F.col("n_gone") + F.col("n_new") > 0) if has_churn_cols else F.lit(False)
    )
    pct = (
        F.when(
            both > 0,
            F.expr("(100 * n_changed) div (n_unchanged + n_changed)"),
        )
        .when(turnover, F.lit(100))
        .otherwise(F.lit(0))
    )
    r = rates.select(
        F.col(host_col).alias("host"), pct.cast("long").alias("change_pct")
    )
    a = ages.select(
        F.col(host_col).alias("host"),
        F.col("age_rounds").cast("long").alias("age_rounds"),
    )
    j = a.join(r, "host", "left")
    cp = F.coalesce(F.col("change_pct"), F.lit(100))
    return j.select(
        F.col("host").alias(host_col),
        "age_rounds",
        cp.alias("change_pct"),
        (F.col("age_rounds") * (F.lit(1) + cp)).cast("long").alias("priority"),
    )


def rendezvous_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "rdv",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1998): each key goes to the shard with the highest
    md5-derived score — the assignment scheme whose defining property is
    MINIMAL MOVEMENT under resharding (adding shard S+1 relocates only
    the keys whose new score wins, ~1/(S+1) of them; modulo hashing
    relocates nearly everything). This is how the sharded artifacts this
    engine builds — seen-set partitions, inverted-index shards, ANN
    buckets — get pinned to executors/servers without a coordination
    service.

    Output: (key, shard INT) — deterministic, engine-portable (scores
    are the md5_32 pattern), and a pure per-row Catalyst expression:
    the argmax over ``n_shards`` scores unrolls into a ``greatest``
    comparison chain inside whole-stage codegen — no explode, no
    shuffle, no per-row Python.

    ``n_shards`` is bounded (an expression per shard): fine for the
    tens-to-hundreds of physical shards rendezvous is used for; use
    bucketed partitioning for data-partition counts beyond that.
    """
    if not (1 <= n_shards <= 512):
        raise ValueError("n_shards must be in [1, 512]")
    key = F.col(key_col).cast("string")

    def score(s: int):
        return F.conv(
            F.substring(
                F.md5(F.concat(key, F.lit(f":{salt}:{s}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")

    # linear-size argmax: array_max over (score, -shard) structs compares
    # lexicographically, so the winner is the highest score with ties to
    # the LOWEST shard id. (A chained when(score > best) fold would
    # reference the previous best twice per level — an exponentially
    # growing expression tree that stalls Catalyst analysis beyond ~12
    # shards.)
    winner = F.array_max(
        F.array(
            *[
                F.struct(
                    score(s).alias("score"),
                    F.lit(-s).cast("int").alias("neg_shard"),
                )
                for s in range(n_shards)
            ]
        )
    )
    return df.select(
        F.col(key_col), (-winner.getField("neg_shard")).cast("int").alias("shard")
    )


def rendezvous_oracle_sql(
    n_shards: int,
    table: str = "documents",
    key_col: str = "doc_id",
    salt: str = "rdv",
) -> str:
    """DuckDB oracle for :func:`rendezvous_assign` — the same md5 scores,
    argmax expressed as a window rank over the unnested shard list (ties
    to the LOWER shard id, mirroring the operator's strict > update)."""
    return f"""
    WITH scored AS (
      SELECT {key_col}, s,
             ('0x' || substr(md5(CAST({key_col} AS VARCHAR)
                             || ':{salt}:' || s), 1, 8))::BIGINT AS score
      FROM {table}, unnest(generate_series(0, {int(n_shards) - 1})) AS t(s)
    ),
    ranked AS (
      SELECT {key_col}, s,
             ROW_NUMBER() OVER (PARTITION BY {key_col}
                                ORDER BY score DESC, s ASC) AS rn
      FROM scored
    )
    SELECT {key_col}, s::INT AS shard FROM ranked WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# UCB1 crawl-host bandit (Auer, Cesa-Bianchi & Fischer 2002)
# ---------------------------------------------------------------------------


def ucb1_crawl_schedule(
    rewards: DataFrame,
    rounds: int,
    batch: int,
    host_col: str = "host",
) -> DataFrame:
    """Batched UCB1 bandit scheduling of crawl-host pulls (Auer,
    Cesa-Bianchi & Fischer, Machine Learning 2002, the UCB1 policy) —
    the explore/exploit layer a revisit scheduler needs when per-host
    yield (new URLs per fetch) is UNKNOWN and must be learned online,
    complementing :func:`allocate_budget` (known demands) and
    :func:`revisit_priority` (known change rates).

    ``rewards`` holds the environment: (host, pull BIGINT >= 1,
    reward BIGINT >= 0) — the deterministic reward a host yields on its
    j-th pull (missing (host, pull) rows read as reward 0). Arms are
    the distinct hosts. Each round t = 1..rounds pulls a BATCH of
    ``batch`` hosts at once (one fetch slot each — the per-round
    parallel crawl fleet):

    * never-pulled hosts come first (UCB1's play-each-arm-once init),
      ordered host ASC;
    * played hosts rank by ucb = round(s/n + sqrt(2·ln(T)/n), 6) DESC,
      host ASC — T = total pulls at round start, (n, s) the host's
      pull count and reward sum;
    * chosen hosts observe reward(host, n+1) and update (n, s).

    The schedule is fully deterministic: all state is integer, the only
    FP values are the rounded ucb scores whose ties break on host, so
    the R-round recursion unrolls into an exact DuckDB oracle
    (:func:`ucb1_oracle_sql`).

    100 TB shape: bandit state is ONE ROW PER HOST (two integers) —
    the per-round cost is a top-``batch`` TakeOrdered over that
    host-stats frame plus one co-partitioned join against the reward
    log, both map-side combinable; nothing is per-URL. ``rounds`` is
    the driver-side loop (a crawl scheduler's natural cadence), each
    iteration localCheckpointed like the PageRank family.

    Output: one row per executed pull — (t, host, pull, reward, ucb
    DOUBLE nullable; NULL on a host's first pull) ordered t ASC,
    host ASC.
    """
    if rounds < 1 or batch < 1:
        raise ValueError("ucb1_crawl_schedule requires rounds, batch >= 1")
    rew = rewards.select(
        F.col(host_col).alias("host"),
        F.col("pull").cast("long").alias("pull"),
        F.col("reward").cast("long").alias("reward"),
    )
    state = (
        rew.select("host")
        .distinct()
        .withColumn("n", F.lit(0).cast("long"))
        .withColumn("s", F.lit(0).cast("long"))
    )
    chosen_rounds = []
    for t in range(1, rounds + 1):
        tot = state.agg(F.sum("n").cast("double").alias("_T"))
        scored = state.crossJoin(F.broadcast(tot)).select(
            "host",
            "n",
            "s",
            F.when(
                F.col("n") > 0,
                F.round(
                    F.col("s").cast("double") / F.col("n")
                    + F.sqrt(F.lit(2.0) * F.log("_T") / F.col("n")),
                    6,
                ),
            ).alias("ucb"),
        )
        pick = scored.orderBy(
            (F.col("n") == 0).desc(),
            F.col("ucb").desc_nulls_last(),
            F.col("host").asc(),
        ).limit(batch)
        obs = (
            pick.withColumn("pull", F.col("n") + 1)
            .join(rew, ["host", "pull"], "left")
            .select(
                F.lit(t).cast("long").alias("t"),
                "host",
                "pull",
                F.coalesce("reward", F.lit(0)).cast("long").alias("reward"),
                "ucb",
            )
            # consumed by the schedule output AND next round's state;
            # O(batch) rows — pin it so the loop doesn't re-derive the
            # whole prefix each round
            .localCheckpoint(eager=False)
        )
        chosen_rounds.append(obs)
        state = (
            state.join(
                obs.select("host", "reward"), "host", "left"
            )
            .select(
                "host",
                (
                    F.col("n")
                    + F.when(F.col("reward").isNotNull(), 1).otherwise(0)
                ).cast("long").alias("n"),
                (F.col("s") + F.coalesce("reward", F.lit(0)))
                .cast("long")
                .alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    out = chosen_rounds[0]
    for df in chosen_rounds[1:]:
        out = out.unionByName(df)
    return out.orderBy("t", "host")


def ucb1_oracle_sql(rewards_cte: str, rounds: int, batch: int) -> str:
    """DuckDB oracle for :func:`ucb1_crawl_schedule` — the bandit
    recursion unrolled into one (score, pick, observe, state) CTE block
    per round; same rounded ucb, same unplayed-first/host tie order,
    same integer state. ``rewards_cte`` must produce
    (host, pull, reward)."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and each round references the previous state three
    # times, so un-materialized unrolling is exponential (3^rounds)
    parts = [
        f"WITH rew AS MATERIALIZED ({rewards_cte}),",
        "s0 AS MATERIALIZED (SELECT host, 0::BIGINT AS n, 0::BIGINT AS s"
        " FROM (SELECT DISTINCT host FROM rew)),",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f"sc{t} AS MATERIALIZED (SELECT host, n, s,\n"
            "  CASE WHEN n > 0 THEN round(s::DOUBLE / n\n"
            f"    + sqrt(2.0 * ln((SELECT SUM(n)::DOUBLE FROM s{p})) / n), 6)\n"
            f"  END AS ucb FROM s{p}),"
        )
        parts.append(
            f"pk{t} AS MATERIALIZED (SELECT host, n, ucb FROM sc{t}\n"
            "  ORDER BY (n = 0) DESC, ucb DESC NULLS LAST, host ASC\n"
            f"  LIMIT {int(batch)}),"
        )
        parts.append(
            f"ob{t} AS MATERIALIZED (SELECT {t}::BIGINT AS t, p.host,"
            " (p.n + 1)::BIGINT AS pull,"
            " COALESCE(r.reward, 0)::BIGINT AS reward, p.ucb\n"
            f"  FROM pk{t} p LEFT JOIN rew r"
            " ON r.host = p.host AND r.pull = p.n + 1),"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.host,\n"
            "  (s.n + CASE WHEN o.host IS NULL THEN 0 ELSE 1 END)::BIGINT"
            " AS n,\n"
            "  (s.s + COALESCE(o.reward, 0))::BIGINT AS s\n"
            f"  FROM s{p} s LEFT JOIN ob{t} o ON o.host = s.host),"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM ob{t}" for t in range(1, rounds + 1)
    )
    parts.append(f"sched AS ({union})")
    parts.append(
        "SELECT t, host, pull, reward, ucb FROM sched ORDER BY t, host"
    )
    return "\n".join(parts)


def crawl_makespan_plan(
    hosts: DataFrame,
    n_fetchers: int = 64,
    host_col: str = "host",
    n_col: str = "n_urls",
    delay_ms_col: str = "delay_ms",
) -> DataFrame:
    """Politeness-bound crawl makespan planning (Cho & Garcia-Molina,
    WWW 2000 parallel-crawler analysis; Lee et al. IRLbot, WWW 2008
    §politeness): with one connection per host and a per-host
    crawl-delay, a host's drain time is ``n_urls * delay_ms`` no matter
    how many fetchers exist — the politeness serial floor. The fleet
    finishes in

        makespan_ms = max(critical-path host, ceil(total work / N))

    i.e. whichever binds: the slowest single host (adding fetchers
    can't help it) or the aggregate work spread over ``n_fetchers``.
    This is the planning query a crawl scheduler runs before a round to
    size its fleet and to flag hosts that need splitting (separate
    mirrors, sharded hostnames) because they sit on the critical path.

    Output: one row per host — (host, n_urls, delay_ms, host_ms,
    work_share_ppm, on_critical_path) — where host_ms = n*delay,
    work_share_ppm = the host's parts-per-million of total work
    (integer), and on_critical_path marks hosts whose serial floor
    EQUALS the fleet makespan (the ones a planner must split to go
    faster). All integers; exact-oracle graded.

    100 TB shape: one map-side-combined aggregate for the totals (2
    scalars broadcast back via a lazy cross join, never driver state),
    one projection per host. The per-host numbers ride whatever
    partitioning host_state already has.
    """
    if n_fetchers < 1:
        raise ValueError("crawl_makespan_plan requires n_fetchers >= 1")
    h = hosts.select(
        F.col(host_col).alias("host"),
        F.col(n_col).cast("long").alias("n_urls"),
        F.col(delay_ms_col).cast("long").alias("delay_ms"),
    ).withColumn("host_ms", (F.col("n_urls") * F.col("delay_ms")).cast("long"))
    tot = h.groupBy().agg(
        F.sum("host_ms").cast("long").alias("_total"),
        F.max("host_ms").cast("long").alias("_crit"),
    )
    joined = h.crossJoin(F.broadcast(tot))
    makespan = F.greatest(
        F.col("_crit"),
        F.expr(f"(_total + {int(n_fetchers)} - 1) div {int(n_fetchers)}"),
    )
    return joined.select(
        "host",
        "n_urls",
        "delay_ms",
        "host_ms",
        F.expr("(1000000 * host_ms) div _total").cast("long").alias(
            "work_share_ppm"
        ),
        (F.col("host_ms") == makespan).alias("on_critical_path"),
    )


def crawl_makespan_oracle_sql(hosts_cte: str, n_fetchers: int = 64) -> str:
    """DuckDB oracle for :func:`crawl_makespan_plan`; ``hosts_cte``
    must yield (host, n_urls, delay_ms)."""
    return f"""
    WITH h AS (
      SELECT host, n_urls::BIGINT AS n_urls, delay_ms::BIGINT AS delay_ms,
             (n_urls * delay_ms)::BIGINT AS host_ms
      FROM ({hosts_cte})
    ),
    tot AS (
      SELECT SUM(host_ms)::BIGINT AS total, MAX(host_ms)::BIGINT AS crit
      FROM h
    )
    SELECT h.host, h.n_urls, h.delay_ms, h.host_ms,
           ((1000000 * h.host_ms) // t.total)::BIGINT AS work_share_ppm,
           h.host_ms = greatest(t.crit,
             (t.total + {int(n_fetchers)} - 1) // {int(n_fetchers)})
             AS on_critical_path
    FROM h CROSS JOIN tot t
    """
