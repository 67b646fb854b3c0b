"""Query-log mining: the query-flow graph and the click bipartite graph.

A production search engine mines its own logs for two structures the
reference (which serves queries but never logs them —
apiserver/index.js:85-125) lacks:

* the QUERY-FLOW GRAPH (Boldi, Bonchi, Castillo, Donato, Gionis &
  Vigna, CIKM 2008 "The query-flow graph: model and applications"):
  consecutive query pairs inside a user session, weighted by frequency
  — the substrate for "people also searched for" and session-aware
  suggestion;
* RELATED QUERIES VIA CO-CLICKS (Beeferman & Berger, KDD 2000 query
  clustering on the click graph; Craswell & Szummer, SIGIR 2007
  random walks on the click graph): query pairs sharing clicked
  documents, weighted by co-click count and integer milli-Jaccard over
  their clicked-doc sets.

Both are pure integer counting over the log (the module's exact-oracle
discipline needs no FP recipe at all).

100 TB shape: reformulations are one window per user partition (the
log's natural bucketing) + one map-side-combined groupBy(pair);
co-clicks invert the bounded per-doc clicked-query set (the same
degree-capped pair-explosion discipline as
:func:`..operators.graph.related_pages_cocitation` — per-doc distinct
clicked queries is bounded by panel diversity, and a ``cap`` guards the
hot-doc tail) and never compare all query pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "query_reformulations",
    "reformulations_oracle_sql",
    "related_queries_coclick",
    "coclick_oracle_sql",
    "click_graph_walk",
    "click_graph_walk_oracle_sql",
    "lru_stack_distances",
    "lru_hit_curve",
    "lru_hit_curve_oracle_sql",
    "query_intent",
    "query_intent_oracle_sql",
]


def query_reformulations(
    events: DataFrame,
    k: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    query_col: str = "q",
) -> DataFrame:
    """Top-``k`` query reformulations per source query from a
    per-user temporal query log (Boldi et al. CIKM 2008's query-flow
    edges, frequency-weighted).

    ``events`` must carry (user, ts, event_id unique, q): each row is
    one issued query. Within each user's timeline (ordered ts ASC,
    event_id ASC — the unique id makes the order total and therefore
    the result deterministic), every consecutive pair (q → q') with
    q != q' is one reformulation edge; edges aggregate by count and
    each source keeps its top-k targets (n DESC, q' ASC).

    Output: (q, rank, q2, n) with rank <= k, ordered q ASC, rank ASC.

    100 TB shape: ONE window partitioned by user (the log's bucketing
    key — millions of small partitions, no skew), one
    map-side-combined groupBy(q, q2), one window over the bounded
    per-source edge lists for the top-k.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(
            F.col(query_col).alias("q"),
            F.lead(query_col).over(w).alias("q2"),
        )
        .filter(F.col("q2").isNotNull() & (F.col("q") != F.col("q2")))
        .groupBy("q", "q2")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wr = Window.partitionBy("q").orderBy(F.col("n").desc(), F.col("q2").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q", "rank", "q2", "n")
        .orderBy("q", "rank")
    )


def reformulations_oracle_sql(log_cte: str, k: int = 5) -> str:
    """DuckDB oracle for :func:`query_reformulations` — same total
    order, same adjacency rule, same top-k window. ``log_cte`` must
    produce (user_id, ts, event_id, q)."""
    return f"""
    WITH log AS ({log_cte}),
    seq AS (
      SELECT q,
             lead(q) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS q2
      FROM log
    ),
    pairs AS (
      SELECT q, q2, COUNT(*)::BIGINT AS n FROM seq
      WHERE q2 IS NOT NULL AND q != q2
      GROUP BY q, q2
    ),
    ranked AS (
      SELECT q, q2, n,
             row_number() OVER (PARTITION BY q
               ORDER BY n DESC, q2 ASC)::INT AS rank
      FROM pairs
    )
    SELECT q, rank, q2, n FROM ranked WHERE rank <= {int(k)}
    ORDER BY q, rank
    """


def related_queries_coclick(
    clicks: DataFrame,
    cap: int = 64,
    query_col: str = "q",
    doc_col: str = "d",
) -> DataFrame:
    """Related-query pairs via shared clicked documents (Beeferman &
    Berger KDD 2000; Craswell & Szummer SIGIR 2007's click-graph
    neighborhoods).

    ``clicks`` carries one row per click event with (q, d) (extra
    columns ignored; duplicates collapse — the unit of evidence is the
    DISTINCT (q, d) clicked edge). For every unordered query pair
    (q1 < q2) sharing at least one clicked doc:

        co_docs       = |D(q1) ∩ D(q2)|           (distinct shared docs)
        jaccard_milli = floor(1000 · co_docs / |D(q1) ∪ D(q2)|)

    all integers — exact on any engine. Docs whose distinct clicked-
    query set exceeds ``cap`` are dropped BEFORE pair explosion (the
    degree cap that bounds the quadratic hot-doc tail; same discipline
    as ``related_pages_cocitation``, and identically applied in the
    oracle so grading is exact). ALL statistics -- per-query degrees,
    intersections, unions -- read the capped click graph, so
    jaccard_milli is a true Jaccard over it.

    Output: (q1, q2, co_docs, jaccard_milli) ordered q1, q2.

    100 TB shape: the pair explosion is per-DOC over the capped
    clicked-query set (Σ deg² bounded by cap·Σ deg), one
    map-side-combined groupBy(q1, q2), plus one broadcast of the tiny
    per-query click-degree table for the union sizes.
    """
    edges = clicks.select(
        F.col(query_col).alias("q"), F.col(doc_col).alias("d")
    ).distinct()
    deg = edges.groupBy("d").agg(F.count("*").cast("long").alias("_deg"))
    capped = edges.join(
        deg.filter(F.col("_deg") <= cap).select("d"), "d", "left_semi"
    ).localCheckpoint(eager=False)  # consumed by nq AND both pair sides
    # every statistic (degrees, intersections, unions) reads the SAME
    # capped click graph, so jaccard_milli is a true Jaccard over it
    nq = capped.groupBy("q").agg(F.count("*").cast("long").alias("nd"))
    a = capped.select("d", F.col("q").alias("q1"))
    b = capped.select("d", F.col("q").alias("q2"))
    pairs = (
        a.join(b, "d")
        .filter(F.col("q1") < F.col("q2"))
        .groupBy("q1", "q2")
        .agg(F.count("*").cast("long").alias("co_docs"))
    )
    n1 = nq.select(F.col("q").alias("q1"), F.col("nd").alias("_n1"))
    n2 = nq.select(F.col("q").alias("q2"), F.col("nd").alias("_n2"))
    return (
        pairs.join(F.broadcast(n1), "q1")
        .join(F.broadcast(n2), "q2")
        .select(
            "q1",
            "q2",
            "co_docs",
            F.floor(
                F.lit(1000)
                * F.col("co_docs")
                / (F.col("_n1") + F.col("_n2") - F.col("co_docs"))
            )
            .cast("long")
            .alias("jaccard_milli"),
        )
        .orderBy("q1", "q2")
    )


def coclick_oracle_sql(clicks_cte: str, cap: int = 64) -> str:
    """DuckDB oracle for :func:`related_queries_coclick` — same
    distinct-edge collapse, same degree cap, same integer Jaccard.
    ``clicks_cte`` must produce rows with (q, d)."""
    return f"""
    WITH raw AS ({clicks_cte}),
    edges AS (SELECT DISTINCT q, d FROM raw),
    keep AS (
      SELECT d FROM edges GROUP BY d HAVING COUNT(*) <= {int(cap)}
    ),
    capped AS MATERIALIZED (SELECT e.q, e.d FROM edges e JOIN keep USING (d)),
    nq AS (SELECT q, COUNT(*)::BIGINT AS nd FROM capped GROUP BY q),
    pairs AS (
      SELECT a.q AS q1, b.q AS q2, COUNT(*)::BIGINT AS co_docs
      FROM capped a JOIN capped b ON a.d = b.d AND a.q < b.q
      GROUP BY a.q, b.q
    )
    SELECT p.q1, p.q2, p.co_docs,
           CAST(floor(1000 * p.co_docs
                      / (n1.nd + n2.nd - p.co_docs)) AS BIGINT)
             AS jaccard_milli
    FROM pairs p
    JOIN nq n1 ON n1.q = p.q1
    JOIN nq n2 ON n2.q = p.q2
    ORDER BY p.q1, p.q2
    """


def click_graph_walk(
    clicks: DataFrame,
    steps: int = 3,
    scale: int = 10**12,
    floor: int = 0,
    q_col: str = "q",
    d_col: str = "d",
) -> DataFrame:
    """Markov random walk on the bipartite query-click graph (Craswell
    & Szummer, SIGIR 2007 "Random walks on the click graph"): start
    ``scale`` integer mass units on every query node, split mass evenly
    over a node's click edges each half-step (query→doc, doc→query,
    …), and read the doc-side mass after an odd number of half-steps as
    the walk-smoothed relevance of d to q — docs never clicked FOR q
    but co-clicked with q's neighbors earn mass, the sparsity fix
    coclick Jaccard (:func:`related_queries_coclick`) can't provide at
    the (q, d) grain.

    Integer fixed-point discipline (same as ``graph.pagerank``):
    per half-step each node forwards ``mass div degree`` along every
    edge — truncation leaks bounded mass, sums are associative, so the
    result is bit-identical at any shuffle parallelism and exactly
    oracle-checkable (:func:`click_graph_walk_oracle_sql`). ``steps``
    must be odd so the walk ends on the doc side. Rows with mass <=
    ``floor`` are dropped after every step — at floor=0 this only
    prunes dead zeros; production raises it (e.g. scale/10^6) to bound
    the per-query reachable set, the standard sparsification.

    Output: (q, d, mass BIGINT), mass > floor.

    100 TB shape: the degree-folded edge list shuffles once and is
    reused by every half-step's equi-join + map-side-combined groupBy —
    identical plan shape to pagerank, keyed alternately by q and d.
    Mega-queries (navigational heads) fan out along their edges but
    combine map-side on the receiving key; the floor bounds state
    growth across steps.
    """
    if steps < 1 or steps % 2 == 0:
        raise ValueError("steps must be odd and >= 1")
    e = clicks.select(
        F.col(q_col).cast("long").alias("q"),
        F.col(d_col).cast("long").alias("d"),
    ).distinct()
    e = (
        e.join(e.groupBy("q").agg(F.count("*").alias("qdeg")), "q")
        .join(e.groupBy("d").agg(F.count("*").alias("ddeg")), "d")
        .persist()
    )
    e.count()
    # m: (q0, node, mass); node is a doc after odd half-steps. m derives
    # from e, so every join below aliases both sides (self-join lineage).
    m = e.select(
        F.col("q").alias("q0"),
        F.col("d").alias("node"),
        F.expr(f"{scale} div qdeg").cast("long").alias("mass"),
    ).filter(F.col("mass") > floor)
    for i in range(2, steps + 1):
        side, out, deg = (
            ("d", "q", "ddeg") if i % 2 == 0 else ("q", "d", "qdeg")
        )
        m = (
            m.alias("m")
            .join(e.alias("e"), F.col("m.node") == F.col(f"e.{side}"))
            .select(
                F.col("m.q0").alias("q0"),
                F.col(f"e.{out}").alias("node"),
                F.expr(f"mass div {deg}").alias("c"),
            )
            .groupBy("q0", "node")
            .agg(F.sum("c").cast("long").alias("mass"))
            .filter(F.col("mass") > floor)
            .localCheckpoint(eager=False)
        )
    out = m.select(
        F.col("q0").alias("q"), F.col("node").alias("d"), "mass"
    )
    return out


def click_graph_walk_oracle_sql(
    clicks_cte: str, steps: int = 3, scale: int = 10**12, floor: int = 0
) -> str:
    """DuckDB oracle for :func:`click_graph_walk` — the same
    degree-folded edge list and one join-agg CTE per half-step, same
    integer division and floor."""
    if steps < 1 or steps % 2 == 0:
        raise ValueError("steps must be odd and >= 1")
    parts = [
        f"WITH c0 AS ({clicks_cte}),",
        "e0 AS (SELECT DISTINCT q, d FROM c0),",
        "e AS (SELECT e0.q, e0.d,"
        " COUNT(*) OVER (PARTITION BY e0.q) AS qdeg,"
        " COUNT(*) OVER (PARTITION BY e0.d) AS ddeg FROM e0),",
        f"m1 AS (SELECT q AS q0, d AS node, ({scale} // qdeg)::BIGINT AS mass"
        f" FROM e WHERE {scale} // qdeg > {floor}),",
    ]
    for i in range(2, steps + 1):
        if i % 2 == 0:
            parts.append(
                f"m{i} AS (SELECT m.q0, e.q AS node,"
                " SUM(m.mass // e.ddeg)::BIGINT AS mass"
                f" FROM m{i - 1} m JOIN e ON e.d = m.node"
                f" GROUP BY m.q0, e.q HAVING SUM(m.mass // e.ddeg) > {floor}),"
            )
        else:
            parts.append(
                f"m{i} AS (SELECT m.q0, e.d AS node,"
                " SUM(m.mass // e.qdeg)::BIGINT AS mass"
                f" FROM m{i - 1} m JOIN e ON e.q = m.node"
                f" GROUP BY m.q0, e.d HAVING SUM(m.mass // e.qdeg) > {floor}),"
            )
    parts.append(f"fin AS (SELECT * FROM m{steps})")
    parts.append("SELECT q0 AS q, node AS d, mass FROM fin")
    return "\n".join(parts)


def lru_stack_distances(
    log: DataFrame, q_col: str = "q", t_col: str = "event_id"
) -> DataFrame:
    """Per repeat occurrence of a query in a totally-ordered log, its
    LRU stack (reuse) distance: the number of DISTINCT other queries
    issued strictly between this occurrence and the previous occurrence
    of the same query (Mattson et al., IBM Sys J 1970). A repeat with
    reuse distance r hits an LRU cache of capacity k iff r < k.

    Output: (t, q, reuse BIGINT) — one row per non-first occurrence.

    Scale note (documented, not hidden): the between-occurrences
    distinct count is a range self-join, O(sum of gap lengths) — this
    is the OFFLINE cache-sizing analysis (run on a day's log or a
    sample to pick the result-cache capacity, cf. Markatos, IPM 2001),
    not an online component. Spark shape: one lag window per query
    partition + one range join re-using the log's time-partitioning;
    gaps longer than the analysis horizon can be pre-clamped upstream.
    """
    lg = log.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(q_col).cast("long").alias("q"),
    )
    w = Window.partitionBy("q").orderBy("t")
    occ0 = lg.withColumn("prev", F.lag("t").over(w))
    occ = occ0.filter(F.col("prev").isNotNull())
    # A raw (prev, t) strict-between theta join compiles to a nested
    # loop (O(n^2) — measured 68 s at sf0.1). Bucketing time into
    # fixed-width blocks turns it into a hash equi-join on the block id:
    # each gap explodes into its covered blocks (gap/B + 1 rows), the
    # log side is keyed by t div B, and the original strict inequalities
    # re-apply after the join — bit-identical output, join output
    # bounded by sum(gap) + 2*B per occurrence instead of n^2.
    #
    # The distinct count is a PLAIN count: a query q' with >= 1 event in
    # the gap (prev, t) has exactly one FIRST such event — the one whose
    # own previous occurrence (x.prev, the same lag) predates the gap
    # (null or <= o.prev; timestamps are unique so never equal) — so
    # counting first-in-gap events equals COUNT(DISTINCT x.q) row for
    # row, and the aggregate becomes map-side-combinable instead of the
    # two-phase distinct machinery over every in-gap event.
    B = 32
    o = occ.select(
        "t",
        "q",
        "prev",
        F.explode(
            F.sequence(
                F.expr(f"prev div {B}"), F.expr(f"t div {B}")
            )
        ).alias("_blk"),
    ).alias("o")
    x = occ0.select(
        "t", "q", F.col("prev").alias("xprev"),
        F.expr(f"t div {B}").alias("_blk"),
    ).alias("x")
    between = o.join(
        x,
        (F.col("o._blk") == F.col("x._blk"))
        & (F.col("x.t") > F.col("o.prev"))
        & (F.col("x.t") < F.col("o.t"))
        & (F.col("x.q") != F.col("o.q"))
        & (
            F.col("x.xprev").isNull()
            | (F.col("x.xprev") <= F.col("o.prev"))
        ),
        "left",
    )
    return (
        between.groupBy(F.col("o.t").alias("t"), F.col("o.q").alias("q"))
        .agg(F.count(F.col("x.q")).alias("reuse"))
        .select("t", "q", F.col("reuse").cast("long").alias("reuse"))
    )


def lru_hit_curve(
    log: DataFrame,
    capacities: tuple[int, ...] = (1, 4, 16, 64),
    q_col: str = "q",
    t_col: str = "event_id",
) -> DataFrame:
    """LRU result-cache hit-rate curve over a query log (Markatos, IPM
    2001 "On caching search engine query results"): for each candidate
    capacity k, the fraction of ALL queries served from a k-entry LRU
    cache — repeats with stack distance < k hit; first occurrences are
    compulsory misses. One pass over :func:`lru_stack_distances`; the
    curve is how production picks the frontend cache size.

    Output: (capacity, hits, total, hit_rate) — hit_rate rounded to 6
    decimals, exact-oracle graded."""
    sd = lru_stack_distances(log, q_col=q_col, t_col=t_col)
    # total rides the plan as a broadcast 1-row aggregate — the old
    # log.count() driver action re-derived the (md5-synthesized) log a
    # second time at construction (guide §5)
    tot = log.agg(F.count("*").cast("long").alias("_total"))
    caps = F.array([F.lit(int(k)) for k in capacities])
    per_cap = (
        sd.select(F.explode(caps).alias("capacity"), "reuse")
        .groupBy("capacity")
        .agg(
            F.sum((F.col("reuse") < F.col("capacity")).cast("long")).alias(
                "hits"
            )
        )
    )
    # capacities with zero hits still need a row
    base = sd.sparkSession.createDataFrame(
        [(int(k),) for k in capacities], "capacity long"
    )
    return (
        base.join(per_cap, "capacity", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "capacity",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.col("_total").alias("total"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.col("_total"), 6
            ).alias("hit_rate"),
        )
    )


def lru_hit_curve_oracle_sql(
    log_cte: str, capacities: tuple[int, ...] = (1, 4, 16, 64)
) -> str:
    """DuckDB oracle for :func:`lru_hit_curve` — same lag window, same
    strict-between distinct count, same rounded division.
    ``log_cte`` must yield (t, q)."""
    caps = ", ".join(f"({int(k)})" for k in capacities)
    return f"""
    WITH lg AS ({log_cte}),
    occ AS (
      SELECT t, q, lag(t) OVER (PARTITION BY q ORDER BY t) AS prev
      FROM lg
    ),
    sd AS (
      SELECT o.t, o.q, COUNT(DISTINCT x.q)::BIGINT AS reuse
      FROM occ o LEFT JOIN lg x
        ON x.t > o.prev AND x.t < o.t AND x.q != o.q
      WHERE o.prev IS NOT NULL
      GROUP BY o.t, o.q
    ),
    tot AS (SELECT COUNT(*)::BIGINT AS total FROM lg),
    caps AS (SELECT * FROM (VALUES {caps}) c(capacity)),
    hits AS (
      SELECT c.capacity::BIGINT AS capacity,
             COALESCE(SUM(CASE WHEN sd.reuse < c.capacity
                               THEN 1 ELSE 0 END), 0)::BIGINT AS hits
      FROM caps c LEFT JOIN sd ON TRUE
      GROUP BY c.capacity
    )
    SELECT h.capacity, h.hits, t.total,
           round(h.hits / t.total, 6) AS hit_rate
    FROM hits h CROSS JOIN tot t
    """


def query_intent(
    clicks: DataFrame,
    nav_share: float = 0.8,
    nav_docs: int = 2,
    q_col: str = "q",
    d_col: str = "d",
) -> DataFrame:
    """Navigational-vs-informational query intent from click
    concentration (Lee, Liu & Cho, WWW 2005 "Automatic identification
    of user goals in web search"; Broder SIGIR Forum 2002 taxonomy):
    a navigational query's clicks pile onto one result (low click
    entropy, dominant top share), an informational query's spread out.
    The router uses this to skip the expensive ranking stages for
    navigational traffic and to pick snippet length.

    Per query over clicked (q, d) rows:

    * ``n_clicks``, ``n_docs`` (distinct clicked docs) — integers;
    * ``entropy`` = -sum p_d * log2(p_d), folded in doc-id order and
      rounded to 6 decimals (the repo's FP-portability discipline:
      identical fold order on both engines);
    * ``top_share`` = clicks on the modal doc / n_clicks, rounded 6;
    * ``intent`` = 'navigational' iff top_share >= ``nav_share`` AND
      n_docs <= ``nav_docs``, else 'informational' — the paper's
      click-distribution rule with its standard thresholds.

    100 TB shape: one map-side-combinable groupBy (q, d) then one
    groupBy q whose sorted fold holds a single query's distinct-doc
    histogram (bounded by the SERP depth, ~10^1-10^2 rows) — nothing
    O(log) per key, no windows over the full log, no Python.
    """
    per_doc = (
        clicks.select(
            F.col(q_col).cast("long").alias("q"),
            F.col(d_col).cast("long").alias("d"),
        )
        .groupBy("q", "d")
        .agg(F.count("*").alias("c"))
    )
    agg = per_doc.groupBy("q").agg(
        F.sum("c").cast("long").alias("n_clicks"),
        F.count("*").cast("long").alias("n_docs"),
        F.max("c").cast("long").alias("_top"),
        F.collect_list(F.struct("d", "c")).alias("_xs"),
    )
    p = lambda x: x["c"].cast("double") / F.col("n_clicks")  # noqa: E731
    ent = F.round(
        -F.aggregate(
            F.array_sort("_xs"),
            F.lit(0.0),
            lambda acc, x: acc + p(x) * F.log2(p(x)),
        ),
        6,
    )
    share = F.round(F.col("_top") / F.col("n_clicks"), 6)
    return agg.select(
        "q",
        "n_clicks",
        "n_docs",
        ent.alias("entropy"),
        share.alias("top_share"),
        F.when(
            (share >= F.lit(float(nav_share)))
            & (F.col("n_docs") <= F.lit(int(nav_docs))),
            F.lit("navigational"),
        )
        .otherwise(F.lit("informational"))
        .alias("intent"),
    )


def query_intent_oracle_sql(
    clicks_cte: str, nav_share: float = 0.8, nav_docs: int = 2
) -> str:
    """DuckDB oracle for :func:`query_intent` — same doc-id-ordered
    entropy fold, same rounded shares and thresholds. ``clicks_cte``
    must yield (q, d) clicked rows."""
    return f"""
    WITH c0 AS ({clicks_cte}),
    per_doc AS (
      SELECT q, d, COUNT(*)::BIGINT AS c FROM c0 GROUP BY q, d
    ),
    agg AS (
      SELECT q, SUM(c)::BIGINT AS n_clicks, COUNT(*)::BIGINT AS n_docs,
             MAX(c)::BIGINT AS top,
             list(c ORDER BY d) AS cs
      FROM per_doc GROUP BY q
    )
    SELECT q, n_clicks, n_docs,
      round(-list_reduce(
          list_prepend(0.0, list_transform(cs,
            x -> (x::DOUBLE / n_clicks) * log2(x::DOUBLE / n_clicks))),
          (a, b) -> a + b), 6) AS entropy,
      round(top / n_clicks, 6) AS top_share,
      CASE WHEN round(top / n_clicks, 6) >= {float(nav_share)!r}
             AND n_docs <= {int(nav_docs)}
           THEN 'navigational' ELSE 'informational' END AS intent
    FROM agg
    """
