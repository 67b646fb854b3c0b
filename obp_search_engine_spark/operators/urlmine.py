"""URL path-template mining: collapse URLs to structural templates
(digit runs -> ``{n}``, long hex runs -> ``{h}``, query/fragment
stripped) and count URLs per (host, template). This is how a crawler
sees through infinite URL spaces — calendars (``/cal/{n}/{n}``),
session-id echoes (``/item/{h}``), paginated archives — BEFORE
fetching them: a template whose URL count keeps growing while its
content fingerprints don't is a trap, the URL-space generalization of
the per-host duplication signal in ``crawl.trap_hosts``. The reference
crawls a closed peer list and never needs this; an open-web frontier
at 10^10 URLs dies without it.

Template extraction is pure Catalyst (``regexp_extract`` +
``regexp_replace``), portable to DuckDB with RE2-safe character-class
patterns (no ``\\s``/``\\d`` shorthands — Java/RE2 divergence) and the
explicit ``'g'`` flag DuckDB needs for replace-all. The only shuffle
is the (host, template) groupBy with map-side partial aggregation —
template cardinality is bounded by site structure, not URL count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME = "^[a-z][a-z0-9+.-]*://"
HEX_RUN = "[0-9a-f]{8,}"
DIGIT_RUN = "[0-9]+"


def url_host_col(url: Column) -> Column:
    return F.regexp_extract(F.lower(url), _SCHEME + "([^/?#]+)", 1)


def url_template_col(url: Column) -> Column:
    """Path template: lowered path (query/fragment stripped), hex runs
    >= 8 chars -> ``{h}`` first (hex contains digits), then digit runs
    -> ``{n}``; URLs with no path read ``/``."""
    path = F.regexp_extract(F.lower(url), _SCHEME + "[^/?#]*(/[^?#]*)", 1)
    t = F.regexp_replace(path, HEX_RUN, "{h}")
    t = F.regexp_replace(t, DIGIT_RUN, "{n}")
    return F.when(t == "", F.lit("/")).otherwise(t)


def url_template_counts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per (host, template) URL counts: ``(host, template, n_urls)``
    with ``n_urls`` = distinct URLs collapsing to the template."""
    u = df.select(
        url_host_col(F.col(url_col)).alias("host"),
        url_template_col(F.col(url_col)).alias("template"),
        F.col(url_col).alias("_u"),
    )
    return u.groupBy("host", "template").agg(
        F.countDistinct("_u").alias("n_urls")
    )


def trap_templates(
    counts: DataFrame, min_urls: int = 1000, min_share_pct: int = 50
) -> DataFrame:
    """Trap candidates from :func:`url_template_counts`: templates with
    >= ``min_urls`` URLs that are >= ``min_share_pct``% of their host's
    frontier (integer arithmetic — bit-stable). Feed the result to
    frontier budgeting: cap or quarantine matching URLs."""
    tot = counts.groupBy("host").agg(F.sum("n_urls").alias("host_urls"))
    return (
        counts.join(tot, "host")
        .filter(
            (F.col("n_urls") >= F.lit(int(min_urls)))
            & (F.col("n_urls") * 100
               >= F.lit(int(min_share_pct)) * F.col("host_urls"))
        )
        .select("host", "template", "n_urls", "host_urls")
    )


def url_template_oracle_sql(urls_sql: str, url_col: str = "url") -> str:
    """DuckDB oracle for :func:`url_template_counts` over ``urls_sql``."""
    return f"""
    WITH u AS MATERIALIZED ({urls_sql}),
    t AS (
      SELECT regexp_extract(lower({url_col}),
                            '{_SCHEME}([^/?#]+)', 1) AS host,
             regexp_replace(
               regexp_replace(
                 regexp_extract(lower({url_col}),
                                '{_SCHEME}[^/?#]*(/[^?#]*)', 1),
                 '{HEX_RUN}', '{{h}}', 'g'),
               '{DIGIT_RUN}', '{{n}}', 'g') AS tmpl,
             {url_col} AS u2
      FROM u)
    SELECT host, CASE WHEN tmpl = '' THEN '/' ELSE tmpl END AS template,
           count(DISTINCT u2)::BIGINT AS n_urls
    FROM t GROUP BY 1, 2
    """
