"""Click models over search impression logs: the Position-Based Model
estimated by EM.

A production search engine closes the loop the reference never did:
its API serves ranked listings (apiserver/index.js:85-125) but learns
nothing from which results users click. Click models are the standard
way to mine a click log at web scale — the PBM (Craswell, Zoeter,
Taylor & Ramsey, WSDM 2008 "An experimental comparison of click
position-bias models"; Chuklin, Markov & de Rijke, *Click Models for
Web Search*, 2015, ch. 3) factorizes

    P(click | q, d shown at position p) = alpha_{qd} * gamma_p

into query-document attractiveness ``alpha`` and position examination
``gamma``, estimated by EM from (query, doc, position, click)
impressions. The learned alphas feed LTR as a relevance label
(cf. :func:`..operators.ranking.ltr_linear_topk`); the gammas quantify
position bias for de-biased evaluation.

EM recursion implemented here (standard PBM E/M steps):

* E-step per impression, given current (a, g): a clicked impression
  pins both latent attribution terms to 1; an unclicked one
  contributes ``a*(1-g) / (1-a*g)`` to attractiveness and
  ``g*(1-a) / (1-a*g)`` to examination (the posterior of the
  unobserved "attractive but unexamined" / "examined but
  unattractive" events);
* M-step: alpha_{qd} = mean contribution over (q, d)'s impressions,
  gamma_p = mean over position p's impressions; init a = g = 0.5.

FP portability (exact-oracle graded): parameters round to 6 decimals
after every M-step; the per-group mean folds contributions in
impression-id order (Catalyst ``F.aggregate(array_sort(...))`` ==
DuckDB ``list_reduce(list(... ORDER BY imp_id))``; the 0.0 init agrees
bitwise with DuckDB's first-element convention since contributions are
non-negative); every other expression is fixed-shape arithmetic on the
rounded parameters. The ``1 - a*g`` denominator is floored at 1e-12 on
both engines (identically), so an all-clicked cell can never divide by
zero.

100 TB shape: each EM iteration is two map-side-combinable groupBys
over the impression log — one keyed (q, d), one keyed p. The gamma
side is a broadcast join (positions are bounded, ~10 rows); the alpha
side co-partitions impressions with the alpha table on (q, d), the
natural key the log is already bucketed by. The sorted-fold
collect_list per (q, d) holds one query-doc cell's impressions — 10^2
at most in any real log (cells with more impressions than that have
converged alphas anyway and can be down-sampled upstream); nothing is
O(log) on a single key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.folds import ordered_sums

__all__ = [
    "pbm_em",
    "pbm_attractiveness",
    "pbm_examination",
    "pbm_oracle_sql",
    "cascade_mle",
    "cascade_oracle_sql",
    "dcm_mle",
    "dcm_attractiveness",
    "dcm_continuation",
    "dcm_oracle_sql",
    "sdbn_satisfaction",
    "sdbn_oracle_sql",
    "ubm_impressions",
    "ubm_em",
    "ubm_attractiveness",
    "ubm_examination",
    "ubm_oracle_sql",
]

_EPS = 1e-12


def pbm_em(
    impressions: DataFrame, iters: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` EM rounds over an impression log with columns
    (imp_id BIGINT unique, q, d, p, c in {0,1}). Returns
    ``(alphas, gammas)``: (q, d, alpha, n) and (p, gamma, n), both
    with parameters rounded to 6 decimals and ``n`` the cell's
    impression count."""
    if iters < 1:
        raise ValueError("pbm_em requires iters >= 1")
    # pin the impression log: it feeds the init distincts, every EM
    # iteration's E-step, and the final n counts — without the
    # checkpoint the (md5-derived) log re-derives per consumer
    # (measured 3 s/pass at the sf1.0 bench; ubm_em already did this)
    imp = impressions.select("imp_id", "q", "d", "p", "c").localCheckpoint(
        eager=False
    )
    a = (
        imp.select("q", "d")
        .distinct()
        .withColumn("a", F.lit(0.5))
    )
    g = imp.select("p").distinct().withColumn("g", F.lit(0.5))
    for _ in range(iters):
        denom = F.greatest(
            F.lit(1.0) - F.col("a") * F.col("g"), F.lit(_EPS)
        )
        av = F.when(F.col("c") == 1, F.lit(1.0)).otherwise(
            F.col("a") * (F.lit(1.0) - F.col("g")) / denom
        )
        gv = F.when(F.col("c") == 1, F.lit(1.0)).otherwise(
            F.col("g") * (F.lit(1.0) - F.col("a")) / denom
        )
        e = (
            imp.join(F.broadcast(a), ["q", "d"])
            .join(F.broadcast(g), ["p"])
            .select("imp_id", "q", "d", "p", av.alias("_av"), gv.alias("_gv"))
            # consumed by BOTH M-step passes; Catalyst won't share the
            # subtree across them, so pin the (O(log)-sized, but
            # per-iteration) frame
            .localCheckpoint(eager=False)
        )
        # M-step means fold contributions in imp_id order; the running
        # window computes the identical strict left fold without the
        # collect_list/array_sort/lambda chain (functions/folds.py —
        # the gamma side folded ~|log|/|positions|-element arrays)
        a = ordered_sums(e, ["q", "d"], "imp_id", {"_s": "_av"}).select(
            "q", "d", F.round(F.col("_s") / F.col("_n"), 6).alias("a")
        )
        g = ordered_sums(e, ["p"], "imp_id", {"_s": "_gv"}).select(
            "p", F.round(F.col("_s") / F.col("_n"), 6).alias("g")
        )
    na = imp.groupBy("q", "d").agg(F.count("*").alias("n"))
    ng = imp.groupBy("p").agg(F.count("*").alias("n"))
    alphas = a.join(na, ["q", "d"]).select(
        "q", "d", F.col("a").alias("alpha"), "n"
    )
    gammas = g.join(ng, ["p"]).select("p", F.col("g").alias("gamma"), "n")
    return alphas, gammas


def pbm_attractiveness(impressions: DataFrame, iters: int = 2) -> DataFrame:
    """(q, d, alpha, n) — the PBM attractiveness table after ``iters``
    EM rounds (the de-biased CTR usable as an LTR relevance label)."""
    return pbm_em(impressions, iters)[0]


def pbm_examination(impressions: DataFrame, iters: int = 2) -> DataFrame:
    """(p, gamma, n) — the PBM examination curve after ``iters`` EM
    rounds (the position-bias profile)."""
    return pbm_em(impressions, iters)[1]


def pbm_oracle_sql(
    imp_cte: str, iters: int = 2, output: str = "alpha"
) -> str:
    """DuckDB oracle for :func:`pbm_attractiveness` /
    :func:`pbm_examination` — the EM recursion unrolled into one CTE
    per (iteration, parameter family), same rounded parameters, same
    impression-id-ordered folds, same 1e-12 denominator floor.
    ``imp_cte`` must produce (imp_id, q, d, p, c)."""
    if output not in ("alpha", "gamma"):
        raise ValueError("output must be 'alpha' or 'gamma'")
    parts = [
        f"WITH imp AS ({imp_cte}),",
        "a0 AS (SELECT q, d, 0.5 AS a FROM (SELECT DISTINCT q, d FROM imp)),",
        "g0 AS (SELECT p, 0.5 AS g FROM (SELECT DISTINCT p FROM imp)),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"e{i} AS (\n"
            "  SELECT i.imp_id, i.q, i.d, i.p,\n"
            "    CASE WHEN i.c = 1 THEN 1.0\n"
            "         ELSE a.a * (1.0 - g.g)\n"
            f"              / greatest(1.0 - a.a * g.g, {_EPS!r}) END AS av,\n"
            "    CASE WHEN i.c = 1 THEN 1.0\n"
            "         ELSE g.g * (1.0 - a.a)\n"
            f"              / greatest(1.0 - a.a * g.g, {_EPS!r}) END AS gv\n"
            f"  FROM imp i JOIN a{i - 1} a ON a.q = i.q AND a.d = i.d\n"
            f"  JOIN g{i - 1} g ON g.p = i.p\n"
            "),"
        )
        parts.append(
            f"a{i} AS (SELECT q, d,"
            " round(list_reduce(list(av ORDER BY imp_id), (x, y) -> x + y)"
            f" / COUNT(*), 6) AS a FROM e{i} GROUP BY q, d),"
        )
        parts.append(
            f"g{i} AS (SELECT p,"
            " round(list_reduce(list(gv ORDER BY imp_id), (x, y) -> x + y)"
            f" / COUNT(*), 6) AS g FROM e{i} GROUP BY p),"
        )
    if output == "alpha":
        parts.append(
            "na AS (SELECT q, d, COUNT(*)::BIGINT AS n FROM imp GROUP BY q, d)"
        )
        parts.append(
            f"SELECT a.q, a.d, a.a AS alpha, na.n"
            f" FROM a{iters} a JOIN na ON na.q = a.q AND na.d = a.d"
        )
    else:
        parts.append(
            "ng AS (SELECT p, COUNT(*)::BIGINT AS n FROM imp GROUP BY p)"
        )
        parts.append(
            f"SELECT g.p, g.g AS gamma, ng.n"
            f" FROM g{iters} g JOIN ng ON ng.p = g.p"
        )
    return "\n".join(parts)


def cascade_mle(sessions: DataFrame) -> DataFrame:
    """Cascade-model attractiveness MLE (Craswell et al. WSDM 2008, the
    cascade hypothesis; Chuklin et al. 2015 §3.5) over a session log
    with columns (s BIGINT session, q, d, p position, c in {0,1}).

    Cascade semantics: the user scans a session's ranked list top-down
    and stops at the FIRST click — so a result is *examined* iff its
    position is at or above the session's first clicked position (all
    positions when the session has no click), and only the first click
    counts as a click (later clicks in the raw log are unexamined under
    the model and ignored). The MLE is then closed-form per (q, d):

        alpha = #(examined & first-click) / #examined

    Pure integer counting plus one final division rounded to 6
    decimals — exact on any engine at any parallelism, no EM needed
    (the cascade likelihood factorizes; cf. the PBM needing
    :func:`pbm_em`). Pairs never examined carry no evidence and are
    dropped (the MLE is undefined there).

    Output: (q, d, alpha, examined BIGINT, clicks BIGINT).

    100 TB shape: first-click position is one map-side-combinable
    groupBy(s) min; joining it back is co-partitioned on s (the log's
    natural bucketing); the MLE is one more groupBy (q, d). No windows,
    no Python, no skewed keys (sessions are uniformly sized).
    """
    first_click = sessions.groupBy("s").agg(
        F.min(F.when(F.col("c") == 1, F.col("p"))).alias("_fcp")
    )
    e = sessions.join(first_click, "s").select(
        "q",
        "d",
        (F.col("p") <= F.coalesce(F.col("_fcp"), F.lit(1 << 60)))
        .cast("long")
        .alias("_ex"),
        ((F.col("c") == 1) & (F.col("p") == F.col("_fcp")))
        .cast("long")
        .alias("_ck"),
    )
    return (
        e.groupBy("q", "d")
        .agg(
            F.sum("_ex").alias("examined"),
            F.sum("_ck").alias("clicks"),
        )
        .filter(F.col("examined") > 0)
        .select(
            "q",
            "d",
            F.round(F.col("clicks") / F.col("examined"), 6).alias("alpha"),
            "examined",
            "clicks",
        )
    )


def cascade_oracle_sql(sessions_cte: str) -> str:
    """DuckDB oracle for :func:`cascade_mle` — same first-click window,
    same integer counts, same single rounded division. ``sessions_cte``
    must produce (s, q, d, p, c)."""
    return f"""
    WITH sess AS ({sessions_cte}),
    fc AS (
      SELECT s, MIN(CASE WHEN c = 1 THEN p END) AS fcp FROM sess GROUP BY s
    ),
    e AS (
      SELECT sess.q, sess.d,
             (CASE WHEN sess.p <= COALESCE(fc.fcp, 1152921504606846976)
                   THEN 1 ELSE 0 END)::BIGINT AS ex,
             (CASE WHEN sess.c = 1 AND sess.p = fc.fcp
                   THEN 1 ELSE 0 END)::BIGINT AS ck
      FROM sess JOIN fc ON fc.s = sess.s
    )
    SELECT q, d,
           round(SUM(ck) / SUM(ex), 6) AS alpha,
           SUM(ex)::BIGINT AS examined,
           SUM(ck)::BIGINT AS clicks
    FROM e GROUP BY q, d
    HAVING SUM(ex) > 0
    """


def dcm_mle(sessions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dependent Click Model MLE (Guo, Liu & Wang, WSDM 2009 "Efficient
    multiple-click models in web search"; Chuklin et al. 2015 §3.6)
    over the same (s, q, d, p, c) ranked-session log as
    :func:`cascade_mle`.

    DCM generalizes the cascade to MULTIPLE clicks per session: the
    user scans top-down, always continues past an unclicked result,
    and continues past a CLICKED result at position j with a
    position-dependent continuation probability ``lambda_j``. Under
    the paper's last-click approximation the examined prefix of a
    session is

        positions 1 .. last-clicked-position   (sessions with clicks)
        the whole list                         (no-click sessions:
                                                non-click continuation
                                                is probability 1)

    and both parameter families are closed-form integer counts:

        alpha_{qd}  = clicks(q, d) / examinations(q, d)
        lambda_j    = 1 - last-clicks(j) / clicks(j)

    (every click sits at or above its session's last click, so all raw
    clicks count — the multi-click behaviour the cascade throws away).
    Pure counting plus one rounded division per output row — exact on
    any engine at any parallelism. (q, d) pairs never examined and
    positions never clicked carry no evidence and are dropped.

    Returns ``(alphas, lambdas)``:
    (q, d, alpha, examined BIGINT, clicks BIGINT) and
    (p, lam, clicks BIGINT, last_clicks BIGINT).

    100 TB shape: per-session last-click position is one
    map-side-combinable groupBy(s) max; joining it back is
    co-partitioned on s (the log's natural bucketing); each parameter
    family is one more map-side-combined groupBy. No windows, no
    Python, no skew (sessions are uniformly sized).
    """
    lc = sessions.groupBy("s").agg(
        F.max(F.when(F.col("c") == 1, F.col("p"))).alias("_lcp"),
        F.max("p").alias("_np"),
    )
    e = sessions.join(lc, "s")
    alphas = (
        e.select(
            "q",
            "d",
            (F.col("p") <= F.coalesce(F.col("_lcp"), F.col("_np")))
            .cast("long")
            .alias("_ex"),
            F.col("c").cast("long").alias("_ck"),
        )
        .groupBy("q", "d")
        .agg(
            F.sum("_ex").alias("examined"),
            F.sum("_ck").alias("clicks"),
        )
        .filter(F.col("examined") > 0)
        .select(
            "q",
            "d",
            F.round(F.col("clicks") / F.col("examined"), 6).alias("alpha"),
            "examined",
            "clicks",
        )
    )
    lambdas = (
        e.filter(F.col("c") == 1)
        .groupBy("p")
        .agg(
            F.count("*").alias("clicks"),
            F.sum((F.col("p") == F.col("_lcp")).cast("long")).alias(
                "last_clicks"
            ),
        )
        .select(
            "p",
            F.round(
                F.lit(1.0) - F.col("last_clicks") / F.col("clicks"), 6
            ).alias("lam"),
            "clicks",
            "last_clicks",
        )
    )
    return alphas, lambdas


def dcm_attractiveness(sessions: DataFrame) -> DataFrame:
    """(q, d, alpha, examined, clicks) — the DCM attractiveness table
    (multi-click position-debiased CTR under the last-click
    examination rule)."""
    return dcm_mle(sessions)[0]


def dcm_continuation(sessions: DataFrame) -> DataFrame:
    """(p, lam, clicks, last_clicks) — the DCM continuation curve: the
    probability a user keeps scanning after clicking at position p."""
    return dcm_mle(sessions)[1]


def dcm_oracle_sql(sessions_cte: str, output: str = "alpha") -> str:
    """DuckDB oracle for :func:`dcm_mle` — same last-click prefix, same
    integer counts, same single rounded division per row.
    ``sessions_cte`` must produce (s, q, d, p, c)."""
    if output not in ("alpha", "lambda"):
        raise ValueError("output must be 'alpha' or 'lambda'")
    head = f"""
    WITH sess AS ({sessions_cte}),
    lc AS (
      SELECT s, MAX(CASE WHEN c = 1 THEN p END) AS lcp, MAX(p) AS np
      FROM sess GROUP BY s
    )
    """
    if output == "alpha":
        return head + """
        , e AS (
          SELECT sess.q, sess.d,
                 (CASE WHEN sess.p <= COALESCE(lc.lcp, lc.np)
                       THEN 1 ELSE 0 END)::BIGINT AS ex,
                 sess.c::BIGINT AS ck
          FROM sess JOIN lc ON lc.s = sess.s
        )
        SELECT q, d,
               round(SUM(ck) / SUM(ex), 6) AS alpha,
               SUM(ex)::BIGINT AS examined,
               SUM(ck)::BIGINT AS clicks
        FROM e GROUP BY q, d
        HAVING SUM(ex) > 0
        """
    return head + """
    SELECT sess.p,
           round(1.0 - SUM(CASE WHEN sess.p = lc.lcp THEN 1 ELSE 0 END)
                       / COUNT(*), 6) AS lam,
           COUNT(*)::BIGINT AS clicks,
           SUM(CASE WHEN sess.p = lc.lcp THEN 1 ELSE 0 END)::BIGINT
             AS last_clicks
    FROM sess JOIN lc ON lc.s = sess.s
    WHERE sess.c = 1
    GROUP BY sess.p
    """


def sdbn_satisfaction(sessions: DataFrame) -> DataFrame:
    """Simplified-DBN satisfaction MLE (Chapelle & Zhang, WWW 2009 "A
    dynamic bayesian network click model for web search ranking", the
    gamma = 1 simplification; Chuklin et al. 2015 §3.8) over the same
    (s, q, d, p, c) ranked-session log as :func:`dcm_mle`.

    sDBN separates a clicked result's ATTRACTIVENESS (did it earn the
    click — :func:`dcm_attractiveness` under the shared last-click
    examination rule) from its SATISFACTION (did the click END the
    search). With continuation probability 1 after an unsatisfying
    click, the satisfaction MLE is closed-form per (q, d):

        s_{qd} = #(sessions where d's click is the session's LAST click)
                 / #(clicks on d)

    — the probability that clicking d satisfied the user. Pure integer
    counting plus one rounded division; pairs never clicked carry no
    evidence and are dropped. Note the structural difference from
    :func:`dcm_continuation`: DCM's lambda is per-POSITION (a browsing
    trait), sDBN's satisfaction is per-(query, document) — the signal a
    ranker consumes as a dwell-free "good abandonment" label.

    Output: (q, d, sat, clicks BIGINT, last_clicks BIGINT).

    100 TB shape: one groupBy(s) max joined back co-partitioned on s,
    one map-side-combined groupBy (q, d). No windows, no Python.
    """
    lc = sessions.groupBy("s").agg(
        F.max(F.when(F.col("c") == 1, F.col("p"))).alias("_lcp")
    )
    return (
        sessions.filter(F.col("c") == 1)
        .join(lc, "s")
        .groupBy("q", "d")
        .agg(
            F.count("*").alias("clicks"),
            F.sum((F.col("p") == F.col("_lcp")).cast("long")).alias(
                "last_clicks"
            ),
        )
        .select(
            "q",
            "d",
            F.round(F.col("last_clicks") / F.col("clicks"), 6).alias("sat"),
            "clicks",
            "last_clicks",
        )
    )


def sdbn_oracle_sql(sessions_cte: str) -> str:
    """DuckDB oracle for :func:`sdbn_satisfaction` — same last-click
    join, same integer counts, same rounded division."""
    return f"""
    WITH sess AS ({sessions_cte}),
    lc AS (
      SELECT s, MAX(CASE WHEN c = 1 THEN p END) AS lcp FROM sess GROUP BY s
    )
    SELECT sess.q, sess.d,
           round(SUM(CASE WHEN sess.p = lc.lcp THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS sat,
           COUNT(*)::BIGINT AS clicks,
           SUM(CASE WHEN sess.p = lc.lcp THEN 1 ELSE 0 END)::BIGINT
             AS last_clicks
    FROM sess JOIN lc ON lc.s = sess.s
    WHERE sess.c = 1
    GROUP BY sess.q, sess.d
    """


def ubm_impressions(sessions: DataFrame) -> DataFrame:
    """(s, q, d, p, c) ranked sessions -> the UBM impression log
    (imp_id, q, d, p, r, c) where ``r`` is the position of the nearest
    OBSERVED click above p in the same session (0 if none) — the
    conditioning variable that distinguishes UBM's examination from
    PBM's. ``imp_id = s * 1024 + p`` (requires p < 1024; web SERPs are
    10-100 deep) gives the unique, both-engines-computable fold key the
    exact-oracle discipline needs."""
    w = (
        Window.partitionBy("s")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sessions.select(
        (F.col("s") * 1024 + F.col("p")).cast("long").alias("imp_id"),
        "q",
        "d",
        "p",
        F.coalesce(
            F.max(F.when(F.col("c") == 1, F.col("p"))).over(w), F.lit(0)
        )
        .cast("long")
        .alias("r"),
        "c",
    )


def ubm_em(
    sessions: DataFrame, iters: int = 2
) -> tuple[DataFrame, DataFrame]:
    """User Browsing Model EM (Dupret & Piwowarski, SIGIR 2008 "A user
    browsing model to predict search engine click data from past
    observations"; Chuklin et al. 2015 §3.5) over (s, q, d, p, c)
    ranked sessions.

    UBM generalizes the PBM's examination from a per-position scalar to
    a (position, previous-click) pair:

        P(click | q, d at p, last click at r) = alpha_{qd} * gamma_{p,r}

    with r the position of the nearest click ABOVE p in the same
    session (0 = no click yet). The distance-to-last-click conditioning
    captures what PBM cannot: a user who just clicked at p-1 examines
    p far more often than one whose last click was 8 slots up. Since r
    is a function of the OBSERVED clicks, it is a static per-impression
    column (:func:`ubm_impressions`) and the EM recursion is exactly
    PBM-shaped with gamma keyed (p, r) — same E-step posteriors, same
    per-cell means, same 6-decimal rounding and imp_id-ordered folds
    and 1e-12 denominator floor as :func:`pbm_em`, so the same
    exact-oracle discipline holds (mirrored by :func:`ubm_oracle_sql`).

    Returns ``(alphas, gammas)``: (q, d, alpha, n) and (p, r, gamma, n).

    100 TB shape: one session-partitioned running-max window computes r
    (sessions are the log's native write order, so this is a non-shuffle
    sort within partitions after one partitionBy(s) exchange the log's
    bucketing already provides), then each EM round is the PBM's two
    map-side-combinable groupBys — the gamma table grows to ~positions²
    rows (≤ ~10^4 for 100-deep SERPs), still broadcast-sized.
    """
    if iters < 1:
        raise ValueError("ubm_em requires iters >= 1")
    imp = ubm_impressions(sessions).localCheckpoint(eager=False)
    a = imp.select("q", "d").distinct().withColumn("a", F.lit(0.5))
    g = imp.select("p", "r").distinct().withColumn("g", F.lit(0.5))
    for _ in range(iters):
        denom = F.greatest(
            F.lit(1.0) - F.col("a") * F.col("g"), F.lit(_EPS)
        )
        av = F.when(F.col("c") == 1, F.lit(1.0)).otherwise(
            F.col("a") * (F.lit(1.0) - F.col("g")) / denom
        )
        gv = F.when(F.col("c") == 1, F.lit(1.0)).otherwise(
            F.col("g") * (F.lit(1.0) - F.col("a")) / denom
        )
        e = (
            imp.join(F.broadcast(a), ["q", "d"])
            .join(F.broadcast(g), ["p", "r"])
            .select(
                "imp_id", "q", "d", "p", "r", av.alias("_av"), gv.alias("_gv")
            )
            .localCheckpoint(eager=False)
        )
        # same running-window strict-fold replacement as pbm_em
        a = ordered_sums(e, ["q", "d"], "imp_id", {"_s": "_av"}).select(
            "q", "d", F.round(F.col("_s") / F.col("_n"), 6).alias("a")
        )
        g = ordered_sums(e, ["p", "r"], "imp_id", {"_s": "_gv"}).select(
            "p", "r", F.round(F.col("_s") / F.col("_n"), 6).alias("g")
        )
    na = imp.groupBy("q", "d").agg(F.count("*").alias("n"))
    ng = imp.groupBy("p", "r").agg(F.count("*").alias("n"))
    alphas = a.join(na, ["q", "d"]).select(
        "q", "d", F.col("a").alias("alpha"), "n"
    )
    gammas = g.join(ng, ["p", "r"]).select(
        "p", "r", F.col("g").alias("gamma"), "n"
    )
    return alphas, gammas


def ubm_attractiveness(sessions: DataFrame, iters: int = 2) -> DataFrame:
    """(q, d, alpha, n) — UBM attractiveness after ``iters`` EM rounds
    (the browsing-debiased CTR; sharper than PBM's when click gaps
    matter)."""
    return ubm_em(sessions, iters)[0]


def ubm_examination(sessions: DataFrame, iters: int = 2) -> DataFrame:
    """(p, r, gamma, n) — UBM's examination surface over (position,
    previous-click-position) after ``iters`` EM rounds."""
    return ubm_em(sessions, iters)[1]


def ubm_oracle_sql(
    sessions_cte: str, iters: int = 2, output: str = "alpha"
) -> str:
    """DuckDB oracle for :func:`ubm_attractiveness` /
    :func:`ubm_examination` — r computed by the same running-max
    window, EM unrolled one CTE per (iteration, family), same rounded
    parameters / ordered folds / denominator floor as the Spark side.
    ``sessions_cte`` must produce (s, q, d, p, c)."""
    if output not in ("alpha", "gamma"):
        raise ValueError("output must be 'alpha' or 'gamma'")
    parts = [
        f"WITH sess AS ({sessions_cte}),",
        "imp AS (\n"
        "  SELECT s * 1024 + p AS imp_id, q, d, p,\n"
        "    COALESCE(MAX(CASE WHEN c = 1 THEN p END) OVER (\n"
        "      PARTITION BY s ORDER BY p\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING\n"
        "    ), 0) AS r, c\n"
        "  FROM sess\n"
        "),",
        "a0 AS (SELECT q, d, 0.5 AS a FROM (SELECT DISTINCT q, d FROM imp)),",
        "g0 AS (SELECT p, r, 0.5 AS g"
        " FROM (SELECT DISTINCT p, r FROM imp)),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"e{i} AS (\n"
            "  SELECT i.imp_id, i.q, i.d, i.p, i.r,\n"
            "    CASE WHEN i.c = 1 THEN 1.0\n"
            "         ELSE a.a * (1.0 - g.g)\n"
            f"              / greatest(1.0 - a.a * g.g, {_EPS!r}) END AS av,\n"
            "    CASE WHEN i.c = 1 THEN 1.0\n"
            "         ELSE g.g * (1.0 - a.a)\n"
            f"              / greatest(1.0 - a.a * g.g, {_EPS!r}) END AS gv\n"
            f"  FROM imp i JOIN a{i - 1} a ON a.q = i.q AND a.d = i.d\n"
            f"  JOIN g{i - 1} g ON g.p = i.p AND g.r = i.r\n"
            "),"
        )
        parts.append(
            f"a{i} AS (SELECT q, d,"
            " round(list_reduce(list(av ORDER BY imp_id), (x, y) -> x + y)"
            f" / COUNT(*), 6) AS a FROM e{i} GROUP BY q, d),"
        )
        parts.append(
            f"g{i} AS (SELECT p, r,"
            " round(list_reduce(list(gv ORDER BY imp_id), (x, y) -> x + y)"
            f" / COUNT(*), 6) AS g FROM e{i} GROUP BY p, r),"
        )
    if output == "alpha":
        parts.append(
            "na AS (SELECT q, d, COUNT(*)::BIGINT AS n FROM imp GROUP BY q, d)"
        )
        parts.append(
            f"SELECT a.q, a.d, a.a AS alpha, na.n"
            f" FROM a{iters} a JOIN na ON na.q = a.q AND na.d = a.d"
        )
    else:
        parts.append(
            "ng AS (SELECT p, r, COUNT(*)::BIGINT AS n"
            " FROM imp GROUP BY p, r)"
        )
        parts.append(
            f"SELECT g.p, g.r, g.g AS gamma, ng.n"
            f" FROM g{iters} g JOIN ng ON ng.p = g.p AND ng.r = g.r"
        )
    return "\n".join(parts)
