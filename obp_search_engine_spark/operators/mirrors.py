"""Mirror-host detection: find host PAIRS whose document content sets
overlap heavily — mirrored sites, CDN aliases, and scraped re-posts
that make a crawler fetch the same corpus twice. The reference dedups
single listings by content hash (crawler/db/mysql.go:293's seen-set
contract); this lifts that idea one level, to whole hosts, which is
where a 10^10-URL crawl actually saves budget (skip the mirror, not
just the page).

Semantics: per host, the DISTINCT set of content fingerprints
(md5(text)), with stop-capped fingerprints excluded from BOTH the
intersection and the set sizes (a syndicated page carries no mirror
signal, so it must not dilute the denominator either); for each host
pair sharing at least one surviving fingerprint,
``jaccard_pct = 100 * |A ∩ B| div (|A| + |B| - |A ∩ B|)`` — integer
division, so classification is bit-stable and exactly SQL-expressible.
Pairs are emitted once (host_a < host_b lexicographically).

100 TB shape: the pair explode happens per FINGERPRINT, so its cost is
sum over fingerprints of (hosts-carrying-it choose 2) — quadratic in
REPLICATION, not corpus size. The ``max_hosts_per_fp`` stop-fingerprint
cap bounds the worst case (an empty page or a boilerplate-only page
present on thousands of hosts would otherwise explode); dropped
fingerprints are the universally-shared ones that carry no mirror
signal. One shuffle on fingerprint, one on the (a, b) pair key, both
map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_fingerprints(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (host, fp) rows, fp = md5 of the raw text."""
    return docs.select(
        F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("fp")
    ).distinct()


def mirror_pairs(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
    max_hosts_per_fp: int = 64,
    materialize: bool = True,
) -> DataFrame:
    """Host pairs with integer-Jaccard content overlap >=
    ``min_jaccard_pct``: ``(host_a, host_b, n_common, n_a, n_b,
    jaccard_pct)``.

    ``materialize`` localCheckpoints the distinct (host, fp) frame —
    it is consumed four times (sizes, stop-fp counts, both self-join
    sides), and without materialization each consumer re-scans and
    re-distincts the corpus. The frame is one ~50-byte row per distinct
    doc, far smaller than its input; on a cluster it lands in executor
    storage, never the driver. Pass False to keep the plan lazy (e.g.
    under a streaming source)."""
    hf = host_fingerprints(docs, host_col=host_col, text_col=text_col)
    if materialize:
        hf = hf.localCheckpoint(eager=False)
    # stop-fingerprint cap: fingerprints on too many hosts are noise
    # (and the quadratic hazard) — count first, filter, then pair
    fp_hosts = hf.groupBy("fp").agg(
        F.count("*").alias("nh")
    ).filter(F.col("nh") <= F.lit(int(max_hosts_per_fp)))
    kept = hf.join(fp_hosts.select("fp"), "fp")
    # sizes from the KEPT frame, consistent with n_common: universally-
    # shared (capped) pages carry no mirror signal, so they must not
    # dilute the denominator either — two hosts whose unique content is
    # fully mirrored read 100 even when buried under syndicated pages
    sizes = kept.groupBy("host").agg(F.count("*").alias("n"))
    a = kept.select("fp", F.col("host").alias("host_a"))
    b = kept.select("fp", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")),
            "host_b",
        )
        .withColumn(
            "jaccard_pct",
            F.expr("(100 * n_common) div (n_a + n_b - n_common)").cast("long"),
        )
        .filter(F.col("jaccard_pct") >= F.lit(int(min_jaccard_pct)))
    )
    return out.select(
        "host_a", "host_b", "n_common", "n_a", "n_b", "jaccard_pct"
    )


def mirror_oracle_sql(
    docs_sql: str,
    host_col: str = "source",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
    max_hosts_per_fp: int = 64,
) -> str:
    """DuckDB oracle for :func:`mirror_pairs` over ``docs_sql``."""
    return f"""
    WITH d AS MATERIALIZED ({docs_sql}),
    hf AS (SELECT DISTINCT {host_col} AS host, md5({text_col}) AS fp FROM d),
    fps AS (SELECT fp FROM hf GROUP BY fp
            HAVING count(*) <= {int(max_hosts_per_fp)}),
    kept AS (SELECT hf.* FROM hf JOIN fps USING (fp)),
    sizes AS (SELECT host, count(*)::BIGINT AS n FROM kept GROUP BY host),
    pairs AS (
      SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS n_common
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.host < b.host
      GROUP BY 1, 2)
    SELECT p.host_a, p.host_b, p.n_common, sa.n AS n_a, sb.n AS n_b,
           ((100 * p.n_common) // (sa.n + sb.n - p.n_common))::BIGINT
             AS jaccard_pct
    FROM pairs p
    JOIN sizes sa ON sa.host = p.host_a
    JOIN sizes sb ON sb.host = p.host_b
    WHERE (100 * p.n_common) // (sa.n + sb.n - p.n_common)
          >= {int(min_jaccard_pct)}
    """


def cloaking_detect(
    fetches: DataFrame,
    ua_a: str = "bot",
    ua_b: str = "browser",
    min_jaccard_milli: int = 500,
    url_col: str = "url",
    ua_col: str = "ua",
    text_col: str = "text",
) -> DataFrame:
    """Cloaking detection by dual-fetch content comparison (Wu &
    Davison, AIRWeb 2005 "Cloaking and redirection: a preliminary
    study"; Wang, Savage & Voelker, SIGCOMM 2011 dual-crawl design):
    fetch every URL under a crawler user agent AND a browser user
    agent, shingle both texts, and flag URLs whose 3-token-shingle
    integer milli-Jaccard falls below the threshold — content served
    differently to the crawler than to users, the spam signal robots
    compliance can't see.

    Input: (url, ua, text) with one row per (url, fetch agent); rows
    for agents other than ``ua_a``/``ua_b`` are ignored. Degenerate
    texts: two sub-3-token (shingle-free) fetches count as identical
    (jaccard 1000); one shingle-free side against a real one reads 0.

    Output: (url, n_a, n_b, n_common, jaccard_milli, cloaked BOOLEAN)
    — all integers, exact-oracle graded.

    100 TB shape: shingling is per-row inside the scan (no Python),
    and the whole comparison is per-row codegen — each (url, ua)
    carries its DISTINCT shingle array (bounded by its own text
    length), the two agents meet in one url-keyed full-outer join,
    and n_common is ``array_intersect`` inside the projection. One
    (url, ua) shuffle + one url shuffle total; no shingle ever
    becomes its own row, so the exchange volume is the corpus text
    itself, not corpus × shingle blowup. (Two rounds of bench-driven
    rework, same exact oracle throughout: first from explode+distinct
    to the array form, then — the actual win — materializing the
    tokens column before the shingle lambda, because an inlined
    tokenizer expression re-evaluates per lambda element, making the
    build O(tokens^2) per row; the sf0.1 noop-sink wall went
    12.0 s → 1.1 s.)
    """
    from ..functions.textstats import nonempty_tokens_col

    empty = F.array().cast("array<string>")
    per = (
        fetches.filter(F.col(ua_col).isin([ua_a, ua_b]))
        # tokens materialized BEFORE the shingle lambda — see
        # _shingle3_expr on the O(tokens^2) inlining hazard
        .select(
            F.col(url_col).alias("url"),
            F.col(ua_col).alias("ua"),
            nonempty_tokens_col(F.lower(F.col(text_col))).alias("_toks"),
        )
        .select(
            "url", "ua", _shingle3_expr(F.col("_toks")).alias("shs")
        )
        # tolerate multiple fetch rows per (url, agent): union their
        # shingle sets, exactly like the explode+distinct form did
        .groupBy("url", "ua")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("shs"))).alias("shs")
        )
    )
    a = per.filter(F.col("ua") == ua_a).select(
        "url", F.col("shs").alias("sh_a")
    )
    b = per.filter(F.col("ua") == ua_b).select(
        "url", F.col("shs").alias("sh_b")
    )
    out = (
        a.join(b, "url", "full_outer")
        .select(
            "url",
            F.size(F.coalesce("sh_a", empty)).cast("long").alias("n_a"),
            F.size(F.coalesce("sh_b", empty)).cast("long").alias("n_b"),
            F.size(
                F.array_intersect(
                    F.coalesce("sh_a", empty), F.coalesce("sh_b", empty)
                )
            )
            .cast("long")
            .alias("n_common"),
        )
    )
    jac = F.when(
        F.col("n_a") + F.col("n_b") == 0, F.lit(1000)
    ).otherwise(
        F.expr("(1000 * n_common) div (n_a + n_b - n_common)")
    ).cast("long")
    return out.select(
        "url",
        "n_a",
        "n_b",
        "n_common",
        jac.alias("jaccard_milli"),
        (jac < F.lit(int(min_jaccard_milli))).alias("cloaked"),
    )


def cloaking_oracle_sql(
    fetches_cte: str,
    ua_a: str = "bot",
    ua_b: str = "browser",
    min_jaccard_milli: int = 500,
) -> str:
    """DuckDB oracle for :func:`cloaking_detect` — same tokenization,
    3-shingles, distinct sets, integer milli-Jaccard and threshold.
    ``fetches_cte`` must yield (url, ua, text)."""
    return rf"""
    WITH f AS ({fetches_cte}),
    tok AS (
      SELECT url, ua,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x != '') AS t
      FROM f WHERE ua IN ('{ua_a}', '{ua_b}')
    ),
    sh AS (
      SELECT DISTINCT url, ua,
             unnest(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
      FROM tok
    ),
    urls AS (SELECT DISTINCT url FROM tok),
    sizes AS (SELECT url, ua, COUNT(*)::BIGINT AS n FROM sh
              GROUP BY url, ua),
    com AS (
      SELECT a.url, COUNT(*)::BIGINT AS n_common
      FROM sh a JOIN sh b ON a.url = b.url AND a.sh = b.sh
      WHERE a.ua = '{ua_a}' AND b.ua = '{ua_b}'
      GROUP BY a.url
    ),
    j AS (
      SELECT u.url,
             COALESCE(na.n, 0)::BIGINT AS n_a,
             COALESCE(nb.n, 0)::BIGINT AS n_b,
             COALESCE(c.n_common, 0)::BIGINT AS n_common
      FROM urls u
      LEFT JOIN sizes na ON na.url = u.url AND na.ua = '{ua_a}'
      LEFT JOIN sizes nb ON nb.url = u.url AND nb.ua = '{ua_b}'
      LEFT JOIN com c ON c.url = u.url
    )
    SELECT url, n_a, n_b, n_common,
           CASE WHEN n_a + n_b = 0 THEN 1000
                ELSE (1000 * n_common) // (n_a + n_b - n_common)
           END::BIGINT AS jaccard_milli,
           (CASE WHEN n_a + n_b = 0 THEN 1000
                 ELSE (1000 * n_common) // (n_a + n_b - n_common)
            END < {int(min_jaccard_milli)}) AS cloaked
    FROM j
    """


def _shingle3_expr(t):
    """DISTINCT 3-token shingle array from an ALREADY-MATERIALIZED
    tokens column — empty array (never null) for sub-3-token texts;
    shared by cloaking_detect and soft404_detect.

    ``t`` must be a bound column reference (``F.col(...)``), never the
    tokenizer expression itself: expressions referenced inside a
    higher-order-function lambda are re-evaluated PER ELEMENT, so an
    inlined split() turns the shingle build O(tokens^2) per row —
    measured 10.2 s vs 0.36 s (28x) on the sf0.1 corpus. Callers
    project the tokens in a prior select."""
    return F.when(
        F.size(t) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i.cast("int")),
                    F.element_at(t, (i + 1).cast("int")),
                    F.element_at(t, (i + 2).cast("int")),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def soft404_detect(
    pages: DataFrame,
    probes: DataFrame,
    min_jaccard_milli: int = 500,
    host_col: str = "host",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Soft-404 detection by random-URL probing (Bar-Yossef, Broder,
    Kumar & Tomkins, WWW 2004 "Sic transit gloria telae": fetch a
    URL that cannot exist on the host; any real page whose content
    matches that error page is a soft 404 served with HTTP 200).
    The crawler-integrity filter that keeps decayed pages from
    polluting the index and the dedup pipeline — a host serving one
    "not found" template under thousands of URLs looks like a
    mega-duplicate-cluster to MinHash unless these rows are dropped
    first.

    Input: ``pages`` (host, url, text); ``probes`` (host, text) — ONE
    row per host, the fetched random-probe content. Pages on hosts
    with no probe row pass through unflagged (jaccard 0). Comparison
    is the module's 3-token-shingle integer milli-Jaccard with the
    same degenerate-text rule as cloaking_detect: two shingle-free
    sides read 1000 (a shingle-free page on a shingle-free probe IS
    the error page).

    Output: (host, url, n_page, n_probe, n_common, jaccard_milli,
    soft404 BOOLEAN — jaccard >= threshold) — all integers.

    100 TB shape: both sides shingle per-row in-scan; the compare is
    one host-keyed equi-join (probe side is one row per host —
    host-table-sized, AQE broadcasts it under any real corpus skew)
    and ``array_intersect`` in the projection. No shingle ever
    becomes a row.
    """
    from ..functions.textstats import nonempty_tokens_col

    empty = F.array().cast("array<string>")
    # tokens materialized BEFORE the shingle lambda — see _shingle3_expr
    # on the O(tokens^2) inlining hazard
    p = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        nonempty_tokens_col(F.lower(F.col(text_col))).alias("_toks"),
    ).select("host", "url", _shingle3_expr(F.col("_toks")).alias("sh_p"))
    pr = probes.select(
        F.col(host_col).alias("host"),
        nonempty_tokens_col(F.lower(F.col(text_col))).alias("_toks"),
    ).select("host", _shingle3_expr(F.col("_toks")).alias("sh_q"))
    out = (
        p.join(pr, "host", "left")
        .select(
            "host",
            "url",
            F.size("sh_p").cast("long").alias("n_page"),
            F.size(F.coalesce("sh_q", empty)).cast("long").alias("n_probe"),
            F.size(
                F.array_intersect("sh_p", F.coalesce("sh_q", empty))
            )
            .cast("long")
            .alias("n_common"),
            F.col("sh_q").isNotNull().alias("_probed"),
        )
    )
    jac = (
        F.when(~F.col("_probed"), F.lit(0))
        .when(F.col("n_page") + F.col("n_probe") == 0, F.lit(1000))
        .otherwise(
            F.expr("(1000 * n_common) div (n_page + n_probe - n_common)")
        )
        .cast("long")
    )
    return out.select(
        "host",
        "url",
        "n_page",
        "n_probe",
        "n_common",
        jac.alias("jaccard_milli"),
        (jac >= F.lit(int(min_jaccard_milli))).alias("soft404"),
    )


def soft404_oracle_sql(
    pages_cte: str,
    probes_cte: str,
    min_jaccard_milli: int = 500,
) -> str:
    """DuckDB oracle for :func:`soft404_detect` — same shingles, same
    left join, same degenerate rules. ``pages_cte`` must yield
    (host, url, text); ``probes_cte`` (host, text)."""
    toks = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "x -> x != '')"
    )
    shingle = (
        "list_distinct(list_transform("
        "range(1, greatest(len(t) - 2, 0) + 1), "
        "i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))"
    )
    return f"""
    WITH pages0 AS ({pages_cte}),
    probes0 AS ({probes_cte}),
    pt AS (SELECT host, url, {toks} AS t FROM pages0),
    qt AS (SELECT host, {toks} AS t FROM probes0),
    p AS (SELECT host, url, {shingle} AS sh_p FROM pt),
    q AS (SELECT host, {shingle} AS sh_q FROM qt),
    j AS (
      SELECT p.host, p.url,
             len(p.sh_p)::BIGINT AS n_page,
             COALESCE(len(q.sh_q), 0)::BIGINT AS n_probe,
             COALESCE(len(list_intersect(p.sh_p, q.sh_q)), 0)::BIGINT
               AS n_common,
             q.host IS NOT NULL AS probed
      FROM p LEFT JOIN q ON p.host = q.host
    )
    SELECT host, url, n_page, n_probe, n_common,
           CASE WHEN NOT probed THEN 0
                WHEN n_page + n_probe = 0 THEN 1000
                ELSE (1000 * n_common) // (n_page + n_probe - n_common)
           END::BIGINT AS jaccard_milli,
           (CASE WHEN NOT probed THEN 0
                 WHEN n_page + n_probe = 0 THEN 1000
                 ELSE (1000 * n_common) // (n_page + n_probe - n_common)
            END >= {int(min_jaccard_milli)}) AS soft404
    FROM j
    """
