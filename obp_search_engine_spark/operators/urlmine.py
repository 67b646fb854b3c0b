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

from pyspark.sql import Column, DataFrame, Window
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


def sitemap_loc_urls(
    sitemaps: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """Extract ``<loc>`` URLs from sitemap XML documents — the
    seed-discovery channel robots.txt points a crawler at (sitemaps.org
    protocol; the reference crawls a closed peer list and never parses
    one, but an open-web frontier bootstraps from exactly this).

    One output row per <loc> entry: (host, url, pos) with pos the
    1-based position of the entry inside its sitemap — position is what
    a scheduler keys on when a sitemap is larger than its fetch budget
    (the protocol orders entries by site-declared importance).

    Parsing is ``regexp_extract_all`` with an RE2-safe pattern
    (``<loc>[^<]*</loc>`` — no lazy quantifiers, whose semantics differ
    across regex engines) + ``posexplode``: pure Catalyst, portable to
    DuckDB verbatim, no XML library and no Python in the hot path. Real
    sitemap.xml.gz bodies arrive as the pages table's binary column and
    decompress in the same Arrow UDF stage as text extraction; the
    parse itself stays JVM-side.

    100 TB shape: per-row expression inside the scan's codegen (a
    sitemap row explodes to <= 50k locs by protocol cap); no shuffle at
    all until the caller joins the discovered URLs against the seen-set.
    """
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit("<loc>([^<]*)</loc>"), 1
    )
    return sitemaps.select(
        F.col(host_col), F.posexplode(locs).alias("pos0", "url")
    ).select(
        host_col,
        F.col("url"),
        (F.col("pos0") + 1).cast("long").alias("pos"),
    )


def sitemap_oracle_sql(sitemaps_cte: str) -> str:
    """DuckDB oracle for :func:`sitemap_loc_urls`; ``sitemaps_cte`` must
    yield (host, xml)."""
    return f"""
    WITH sm AS ({sitemaps_cte}),
    ex AS (
      SELECT host,
             regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1) AS locs
      FROM sm
    )
    SELECT host, locs[p] AS url, p::BIGINT AS pos
    FROM ex, unnest(generate_series(1, len(locs))) AS t(p)
    """


# multi-part public suffixes recognized by the PSL-lite extractor below.
# A production deployment loads the full publicsuffix.org list (a few
# thousand rows, broadcast); the ALGORITHM — longest-known-suffix match,
# registrable domain = suffix + one label — is what this implements.
MULTI_SUFFIXES = ("co.uk", "com.au", "co.jp", "github.io")


def registrable_domain_col(
    host: Column, multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
) -> Column:
    """Registrable domain (eTLD+1) of a hostname, PSL-lite: if the last
    two labels form a known multi-part public suffix the registrable
    domain is the last THREE labels, else the last two (bare/single-label
    hosts pass through). Host-level operators (politeness clocks, budget
    allocation, mirror detection, boilerplate) all over-split without
    this — ``a.example.co.uk`` and ``b.example.co.uk`` are one site, and
    treating ``co.uk`` itself as the site would glue half of Britain
    into one politeness queue.

    Pure Catalyst (split + element_at with negative indexes + an IN
    chain over the suffix set), portable to DuckDB verbatim — no UDF,
    no library, evaluated inside the scan's codegen.
    """
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when((n >= 3) & last2.isin(*multi_suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(F.lower(host))
    )


def registrable_domain_sql(
    host_sql: str, multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
) -> str:
    """DuckDB twin of :func:`registrable_domain_col` over ``host_sql``."""
    suf = ", ".join(f"'{s}'" for s in multi_suffixes)
    return f"""
    CASE
      WHEN len(string_split(lower({host_sql}), '.')) >= 3
           AND string_split(lower({host_sql}), '.')[-2] || '.' ||
               string_split(lower({host_sql}), '.')[-1] IN ({suf})
        THEN string_split(lower({host_sql}), '.')[-3] || '.' ||
             string_split(lower({host_sql}), '.')[-2] || '.' ||
             string_split(lower({host_sql}), '.')[-1]
      WHEN len(string_split(lower({host_sql}), '.')) >= 2
        THEN string_split(lower({host_sql}), '.')[-2] || '.' ||
             string_split(lower({host_sql}), '.')[-1]
      ELSE lower({host_sql})
    END
    """


# ---------------------------------------------------------------------------
# DUST: different URLs with similar text (Bar-Yossef et al., WWW 2006)
# ---------------------------------------------------------------------------
def _url_path_col(url: Column) -> Column:
    return F.regexp_extract(F.lower(url), _SCHEME + "[^/?#]*(/[^?#]*)", 1)


def _url_query_col(url: Column) -> Column:
    return F.regexp_extract(F.lower(url), "[?]([^#]*)", 1)


def _dust_rule_col(pa: Column, pb: Column, qa: Column, qb: Column) -> Column:
    """Classify a same-content URL pair into the rewrite rule that maps
    one onto the other, first match wins: strip_query (paths equal,
    queries differ), trailing_slash (queries equal, paths equal modulo
    a trailing '/'), index_file (queries equal, paths equal modulo a
    '/index.html' leaf), else other."""
    # '/+$' strip == DuckDB rtrim(p, '/') (F.rtrim has no trim-set arg)
    noslash = lambda p: F.regexp_replace(p, "/+$", "")
    slash_a, slash_b = noslash(pa), noslash(pb)
    idx = lambda p: noslash(F.regexp_replace(p, "/index[.]html$", "/"))
    return (
        F.when((pa == pb) & (qa != qb), F.lit("strip_query"))
        .when((qa == qb) & (slash_a == slash_b), F.lit("trailing_slash"))
        .when((qa == qb) & (idx(pa) == idx(pb)), F.lit("index_file"))
        .otherwise(F.lit("other"))
    )


def dust_url_pairs(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    max_group: int = 32,
) -> DataFrame:
    """DUST pair detection (Bar-Yossef et al. 2006, 'Do not crawl in the
    DUST'): URLs on the same host with identical content fingerprints are
    aliases; each pair is classified by the rewrite rule that maps one
    onto the other (strip_query / trailing_slash / index_file / other).
    Output: (host, url_a, url_b, rule) with url_a < url_b.

    100 TB shape: one groupBy on (host, fp) — the 16-byte fingerprint,
    never the text; alias groups larger than ``max_group`` URLs are
    dropped BEFORE the pair explode (they are mirror/trap pathology, not
    minable rules — the C(cap,2) amputation of mirror_host_pairs), so
    the self-join is bounded by C(max_group, 2) per group. Rule
    classification is per-row codegen."""
    u = df.select(
        url_host_col(F.col(url_col)).alias("host"),
        F.col(fp_col).alias("_fp"),
        F.col(url_col).alias("_u"),
    ).distinct()
    kept = (
        u.groupBy("host", "_fp")
        .agg(F.count("*").alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_group))
        .select("host", "_fp")
    )
    u = u.join(kept, ["host", "_fp"], "left_semi")
    a = u.select("host", "_fp", F.col("_u").alias("url_a"))
    b = u.select("host", "_fp", F.col("_u").alias("url_b"))
    pairs = a.join(b, ["host", "_fp"]).filter(F.col("url_a") < F.col("url_b"))
    return pairs.select(
        "host",
        "url_a",
        "url_b",
        _dust_rule_col(
            _url_path_col(F.col("url_a")),
            _url_path_col(F.col("url_b")),
            _url_query_col(F.col("url_a")),
            _url_query_col(F.col("url_b")),
        ).alias("rule"),
    )


def dust_rules(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    max_group: int = 32,
    min_support: int = 2,
) -> DataFrame:
    """Per-host DUST rewrite rules with support: (host, rule, n_pairs)
    for rules backed by >= ``min_support`` alias pairs — the mined rules
    a frontier applies at canonicalization time so known-alias URLs are
    never fetched twice (the paper's end goal). Tiny keyspace (hosts x 4
    rules): map-side combine does all the work."""
    return (
        dust_url_pairs(df, url_col=url_col, fp_col=fp_col, max_group=max_group)
        .groupBy("host", "rule")
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_support)
    )


def dust_rules_oracle_sql(
    urls_sql: str,
    url_col: str = "url",
    fp_col: str = "fp",
    max_group: int = 32,
    min_support: int = 2,
) -> str:
    """DuckDB oracle for :func:`dust_rules` over ``urls_sql`` rows of
    (url, fp)."""
    host = f"regexp_extract(lower({url_col}), '{_SCHEME}([^/?#]+)', 1)"
    path = f"regexp_extract(lower({url_col}), '{_SCHEME}[^/?#]*(/[^?#]*)', 1)"
    query = f"regexp_extract(lower({url_col}), '[?]([^#]*)', 1)"
    idx = (
        lambda p: f"rtrim(regexp_replace({p}, '/index[.]html$', '/'), '/')"
    )
    return f"""
    WITH raw AS MATERIALIZED ({urls_sql}),
    u AS (
      SELECT DISTINCT {host} AS host, {fp_col} AS fp, {url_col} AS u2,
             {path} AS p, {query} AS q
      FROM raw
    ),
    kept AS (
      SELECT host, fp FROM u GROUP BY host, fp
      HAVING COUNT(*) BETWEEN 2 AND {max_group}
    ),
    ku AS (SELECT u.* FROM u SEMI JOIN kept
           ON u.host = kept.host AND u.fp = kept.fp),
    pairs AS (
      SELECT a.host,
             CASE WHEN a.p = b.p AND a.q != b.q THEN 'strip_query'
                  WHEN a.q = b.q AND rtrim(a.p, '/') = rtrim(b.p, '/')
                    THEN 'trailing_slash'
                  WHEN a.q = b.q AND {idx("a.p")} = {idx("b.p")}
                    THEN 'index_file'
                  ELSE 'other' END AS rule
      FROM ku a JOIN ku b
        ON a.host = b.host AND a.fp = b.fp AND a.u2 < b.u2
    )
    SELECT host, rule, COUNT(*)::BIGINT AS n_pairs
    FROM pairs GROUP BY host, rule
    HAVING COUNT(*) >= {min_support}
    """


def sitemap_coverage_audit(
    listed: DataFrame,
    crawled: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Sitemap-vs-crawl coverage audit (Schonfeld & Shivakumar, WWW
    2009 "Sitemaps: above and beyond the crawl of duty" — the paper's
    two central metrics, per host): how much of what the site DECLARES
    did we fetch (coverage), and how much did we fetch that the site
    never declared (orphans — discovery-only pages, often the
    duplicate/parameter junk the DUST family mines). The audit is what
    decides, per host, whether the crawler should trust the sitemap
    channel (high coverage, few orphans) or keep link-discovery
    spending (many orphans).

    Inputs: ``listed`` (host, url) from :func:`sitemap_loc_urls`;
    ``crawled`` (host, url) from the crawl's visited set. Both
    deduplicated here.

    Output: (host, n_listed, n_crawled_listed, n_orphans,
    coverage_pct) — integer percent, ``(100 * crawled_listed) div
    listed`` (0 for hosts that published no sitemap), one row per host
    appearing on either side.

    100 TB shape: two distincts and one left-semi/anti pair, all
    keyed (host, url) — the partitioning both inputs already carry;
    rollup is map-side-combined per host. Nothing is O(corpus) on any
    single key.
    """
    L = listed.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).distinct()
    C = crawled.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).distinct()
    n_listed = L.groupBy("host").agg(F.count("*").alias("n_listed"))
    hit = C.join(L, ["host", "url"], "left_semi").groupBy("host").agg(
        F.count("*").alias("n_crawled_listed")
    )
    orphans = C.join(L, ["host", "url"], "left_anti").groupBy("host").agg(
        F.count("*").alias("n_orphans")
    )
    hosts = L.select("host").union(C.select("host")).distinct()
    return (
        hosts.join(n_listed, "host", "left")
        .join(hit, "host", "left")
        .join(orphans, "host", "left")
        .select(
            "host",
            F.coalesce("n_listed", F.lit(0)).cast("long").alias("n_listed"),
            F.coalesce("n_crawled_listed", F.lit(0))
            .cast("long")
            .alias("n_crawled_listed"),
            F.coalesce("n_orphans", F.lit(0)).cast("long").alias("n_orphans"),
            F.when(F.coalesce("n_listed", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr(
                    "(100 * coalesce(n_crawled_listed, 0)) div n_listed"
                )
            )
            .cast("long")
            .alias("coverage_pct"),
        )
    )


def sitemap_coverage_oracle_sql(listed_cte: str, crawled_cte: str) -> str:
    """DuckDB oracle for :func:`sitemap_coverage_audit`; both CTEs must
    yield (host, url)."""
    return f"""
    WITH L AS (SELECT DISTINCT host, url FROM ({listed_cte})),
    C AS (SELECT DISTINCT host, url FROM ({crawled_cte})),
    nl AS (SELECT host, COUNT(*)::BIGINT AS n_listed FROM L GROUP BY host),
    hit AS (
      SELECT c.host, COUNT(*)::BIGINT AS n_crawled_listed
      FROM C c JOIN L l ON l.host = c.host AND l.url = c.url
      GROUP BY c.host
    ),
    orph AS (
      SELECT c.host, COUNT(*)::BIGINT AS n_orphans
      FROM C c LEFT JOIN L l ON l.host = c.host AND l.url = c.url
      WHERE l.url IS NULL GROUP BY c.host
    ),
    hosts AS (SELECT host FROM L UNION SELECT host FROM C)
    SELECT h.host,
           COALESCE(nl.n_listed, 0)::BIGINT AS n_listed,
           COALESCE(hit.n_crawled_listed, 0)::BIGINT AS n_crawled_listed,
           COALESCE(orph.n_orphans, 0)::BIGINT AS n_orphans,
           CASE WHEN COALESCE(nl.n_listed, 0) = 0 THEN 0
                ELSE (100 * COALESCE(hit.n_crawled_listed, 0))
                     // nl.n_listed END::BIGINT AS coverage_pct
    FROM hosts h
    LEFT JOIN nl ON nl.host = h.host
    LEFT JOIN hit ON hit.host = h.host
    LEFT JOIN orph ON orph.host = h.host
    """


def url_front_coding(
    urls: DataFrame,
    block: int = 8,
    url_col: str = "url",
) -> DataFrame:
    """Front coding of the sorted URL list (IIR §5.2 blocked
    dictionary compression; the layout web-graph and seen-set stores
    keep their URL keys in): sort all URLs, cut into blocks of
    ``block``, store each block's first URL verbatim and every
    following URL as (shared-prefix length with its predecessor,
    suffix). URL lists front-code extremely well because lexicographic
    neighbors share long host+path prefixes — this operator MEASURES
    that win with an integer cost model: raw = sum(len(url)); coded =
    len(first) + per-follower (2 + len - lcp).

    LCP portability: lcp(a, b) = count of i in 1..min(len) with
    substring(a, 1, i) == substring(b, 1, i) — prefix equality is
    monotone in i, so the count IS the longest match; the expression is
    verbatim-portable to DuckDB (O(L^2) per pair on <=few-hundred-char
    URLs; a production build swaps in a bytes-compare, same output).

    Output: one row per block — (block_id, n_urls, raw_bytes,
    coded_bytes, ratio round 6) over the global sort.

    100 TB shape: the global sort is the URL-range partitioning the
    seen-set/dictionary store already maintains — blocks never cross
    range partitions there, so the lag window runs per partition; here
    it is one row_number over the sorted distinct list, per-block state
    ``block`` rows.
    """
    if block < 2:
        raise ValueError("url_front_coding requires block >= 2")
    u = urls.select(F.col(url_col).cast("string").alias("url")).distinct()
    w = Window.orderBy("url")
    r = u.withColumn("_rn", (F.row_number().over(w) - 1).cast("long")).select(
        "url",
        F.expr(f"_rn div {int(block)}").cast("long").alias("block_id"),
        (F.col("_rn") % int(block)).cast("long").alias("_pos"),
        F.lag("url").over(w).alias("_prev"),
    )
    n = F.least(F.length("url"), F.length("_prev"))
    lcp = F.when(
        (F.col("_pos") == 0) | F.col("_prev").isNull() | (n < 1), F.lit(0)
    ).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: F.col("url").substr(F.lit(1), i.cast("int"))
                == F.col("_prev").substr(F.lit(1), i.cast("int")),
            )
        )
    ).cast("long")
    cost = F.when(
        F.col("_pos") == 0, F.length("url").cast("long")
    ).otherwise(F.lit(2) + F.length("url").cast("long") - lcp)
    return (
        r.withColumn("_cost", cost)
        .groupBy("block_id")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sum(F.length("url")).cast("long").alias("raw_bytes"),
            F.sum("_cost").cast("long").alias("coded_bytes"),
        )
        .select(
            "block_id",
            "n_urls",
            "raw_bytes",
            "coded_bytes",
            F.round(F.col("coded_bytes") / F.col("raw_bytes"), 6).alias(
                "ratio"
            ),
        )
    )


def front_coding_oracle_sql(urls_cte: str, block: int = 8) -> str:
    """DuckDB oracle for :func:`url_front_coding` — same sort, blocks,
    monotone-prefix LCP count, and integer cost model. ``urls_cte``
    must yield (url)."""
    return f"""
    WITH u AS (SELECT DISTINCT url FROM ({urls_cte})),
    r AS (
      SELECT url,
             (row_number() OVER (ORDER BY url) - 1) AS rn,
             lag(url) OVER (ORDER BY url) AS prev
      FROM u
    ),
    c AS (
      SELECT url, rn // {int(block)} AS block_id,
             rn % {int(block)} AS pos,
             CASE WHEN rn % {int(block)} = 0 OR prev IS NULL
                    OR least(len(url), len(prev)) < 1 THEN 0
                  ELSE len(list_filter(
                         range(1, least(len(url), len(prev)) + 1),
                         i -> substr(url, 1, i) = substr(prev, 1, i)))
             END AS lcp
      FROM r
    )
    SELECT block_id::BIGINT AS block_id, COUNT(*)::BIGINT AS n_urls,
           SUM(len(url))::BIGINT AS raw_bytes,
           SUM(CASE WHEN pos = 0 THEN len(url)
                    ELSE 2 + len(url) - lcp END)::BIGINT AS coded_bytes,
           round(SUM(CASE WHEN pos = 0 THEN len(url)
                    ELSE 2 + len(url) - lcp END)::DOUBLE
                 / SUM(len(url)), 6) AS ratio
    FROM c GROUP BY block_id
    """
