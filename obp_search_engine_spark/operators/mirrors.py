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
