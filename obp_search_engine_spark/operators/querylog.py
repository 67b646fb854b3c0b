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
