"""Driver-graded queries for the reference's API surface that round 1 left
pytest-only: the composed /search/listings pipeline (apiserver/index.js:27-174),
F13 re-nesting (index.js:172-280), X9 two-candidate JSON decode
(crawler/rpc/rpc.go:107-115), F3 profile-completeness branch
(crawler/crawling/crawler.go:92-104), F8/F9/F12 search filters
(index.js:113-129, 295-309), S14/S17 point updates (crawler/db/mysql.go:476-502,
listingfiltering/learnNetwork.py:49-55) and S18 migrations
(crawler/db/migrate.go:24-78).

The testdata tables stand in for the reference's marketplace tables with a
DETERMINISTIC mapping (documented per query) applied identically in the
Spark plan and the DuckDB oracle:

    listings <- part       (title=p_name, tags=split(p_type),
                            rating=(p_retailprice-900)/32 — the /32 is a
                            binary-exact mantissa shift so double values
                            match across engines bit-for-bit,
                            peer_id = p_partkey % 200)
    nodes    <- customer   (peer_id=c_custkey, freshness clock derived from
                            c_custkey % 24 hours, listed/blocked from
                            segment/nation)
    mods     <- events     (peer_id=user_id, moderator_id=event_type)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .testdata_queries import _t, register

_NOW = "2024-01-30 00:00:00"


def _docs(spark, sf_dir):
    """part -> listings rows (see module docstring for the mapping)."""
    return _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("listing_id"),
        F.col("p_name").alias("title"),
        F.col("p_brand").alias("text"),
        F.split("p_type", " ").alias("tags"),
        ((F.col("p_retailprice") - F.lit(900.0)) / F.lit(32.0)).alias("avg_rating"),
        (F.col("p_partkey") % 200).alias("peer_id"),
        F.concat(
            F.lit("http://peer"),
            (F.col("p_partkey") % 200).cast("string"),
            F.lit(".x/item/"),
            F.col("p_partkey").cast("string"),
        ).alias("url"),
        (F.col("p_size") % 7 == 0).alias("blocked"),
        (F.col("p_size") % 5 == 0).alias("testnet"),
        (F.col("p_size") % 3 == 0).alias("nsfw"),
    )


def _nodes(spark, sf_dir):
    """customer -> nodes_meta rows. last_crawled = NOW - (c_custkey % 24) h,
    so the 8-hour freshness window keeps c_custkey % 24 < 8."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("peer_id"),
        F.col("c_name").alias("node_name"),
        F.col("c_mktsegment").alias("user_agent"),
        F.expr(
            f"timestamp'{_NOW}' - make_interval(0, 0, 0, 0, "
            "cast(c_custkey % 24 as int), 0, 0)"
        ).alias("last_crawled"),
        (F.col("c_mktsegment") != "MACHINERY").alias("listed"),
        (F.col("c_nationkey") == 3).alias("node_blocked"),
        (F.col("c_custkey") % 3 == 0).alias("moderator"),
        (F.col("c_custkey") % 6 == 0).alias("verified_moderator"),
    )


def _mods(spark, sf_dir):
    return _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("peer_id"),
        F.col("event_type").alias("moderator_id"),
    )


# ---------------------------------------------------------------------------
# the composed /search/listings pipeline — reference entry point #1
# (apiserver/index.js:27-174): strict keyword-WHERE replacement quirk (F6),
# rating threshold (F5), 8h-freshness+listed+unblocked node join (F7/J1),
# moderator group-collect left join (J2), deterministic sort + page (O3/O4)
# ---------------------------------------------------------------------------
@register(
    "search_listings_page",
    """
    WITH docs AS (
      SELECT p_partkey AS listing_id,
             p_name AS title,
             (p_retailprice - 900.0) / 32.0 AS rating,
             p_partkey % 200 AS peer_id,
             'http://peer' || CAST(p_partkey % 200 AS VARCHAR)
               || '.x/item/' || CAST(p_partkey AS VARCHAR) AS url
      FROM part
      WHERE (lower(p_name) LIKE '%green%'
             OR lower(array_to_string(string_split(p_type, ' '), ',')) LIKE '%green%'
             OR lower(p_name) LIKE '%bolt%'
             OR lower(array_to_string(string_split(p_type, ' '), ',')) LIKE '%bolt%')
        AND (p_retailprice - 900.0) / 32.0 >= 2.0
    ),
    nodes AS (
      SELECT c_custkey AS peer_id, c_name AS node_name
      FROM customer
      WHERE (c_custkey % 24) < 8
        AND c_mktsegment <> 'MACHINERY'
        AND c_nationkey <> 3
    ),
    mods AS (
      SELECT user_id AS peer_id,
             array_to_string(list_sort(list(DISTINCT event_type)), ',') AS moderators
      FROM events GROUP BY user_id
    )
    SELECT d.listing_id, d.title, d.url, d.rating, d.peer_id, n.node_name,
           coalesce(m.moderators, '') AS moderators
    FROM docs d
    JOIN nodes n ON d.peer_id = n.peer_id
    LEFT JOIN mods m ON d.peer_id = m.peer_id
    ORDER BY d.rating DESC, d.url ASC
    LIMIT 10 OFFSET 10
    """,
    "composed /search/listings: strict keyword-replace quirk + rating >= 2 "
    "+ fresh/listed/unblocked node join + moderator collect-join + page 2 "
    "of 10 sorted by rating desc",
)
def q_search_listings_page(spark, sf_dir):
    from .search import search_listings

    out = search_listings(
        _docs(spark, sf_dir),
        _nodes(spark, sf_dir),
        doc_moderators=_mods(spark, sf_dir),
        q="green bolt",
        rating=2,
        sort_by="avg_rating",
        ascending=False,
        page=1,
        page_size=10,
        now=_NOW,
        fidelity="strict",
    )
    return out.select(
        "listing_id",
        "title",
        "url",
        F.col("avg_rating").alias("rating"),
        "peer_id",
        "node_name",
        F.coalesce(F.array_join("moderators", ","), F.lit("")).alias("moderators"),
    )


# ---------------------------------------------------------------------------
# F13 — re-nesting projection (apiserver/index.js:172-280): flat row ->
# vendor/thumbnail/price structs, positional 5-way thumbnail split (X2),
# safeSplit null->[] (X3), rating cast (X11)
# ---------------------------------------------------------------------------
@register(
    "renest_listing",
    """
    WITH flat AS (
      SELECT 'http://peer' || CAST(p_partkey % 200 AS VARCHAR)
               || '.x/item/' || CAST(p_partkey AS VARCHAR) AS url,
             p_partkey % 200 AS peer_id,
             p_brand AS node_name,
             'ua/' || CAST(p_size AS VARCHAR) AS user_agent,
             CASE WHEN p_size % 10 = 0 THEN NULL
                  WHEN p_size % 2 = 0 THEN
                    'th/' || CAST(p_partkey AS VARCHAR) || '/t,'
                    || 'th/' || CAST(p_partkey AS VARCHAR) || '/s,'
                    || 'th/' || CAST(p_partkey AS VARCHAR) || '/m,'
                    || 'th/' || CAST(p_partkey AS VARCHAR) || '/o,'
                    || 'th/' || CAST(p_partkey AS VARCHAR) || '/l'
                  ELSE 'th/' || CAST(p_partkey AS VARCHAR) || '/t,'
                    || 'th/' || CAST(p_partkey AS VARCHAR) || '/s'
             END AS thumbnail,
             p_size * 100 AS price_amount,
             CASE p_size % 3 WHEN 0 THEN 'PHR' WHEN 1 THEN 'BTC' ELSE 'USD' END
               AS price_currency,
             (p_retailprice - 900.0) / 32.0 AS avg_rating,
             CASE WHEN p_size % 11 = 0 THEN NULL
                  ELSE array_to_string(string_split(p_type, ' '), ',') END AS tags_str
      FROM part
    ),
    split AS (
      SELECT *, string_split(coalesce(thumbnail, ''), ',') AS th FROM flat
    )
    SELECT url,
           peer_id AS vendor_peer_id,
           node_name AS vendor_name,
           user_agent AS vendor_user_agent,
           th[1] AS th_tiny, th[2] AS th_small, th[3] AS th_medium,
           th[4] AS th_original, th[5] AS th_large,
           price_amount, price_currency,
           avg_rating AS averageRating,
           coalesce(tags_str, '') AS tags_csv
    FROM split
    """,
    "F13 re-nesting: flat listing row -> vendor/thumbnail/price structs "
    "with positional thumbnail split and null-safe tag split. Graded as the "
    "FLATTENED scalar projection of the nested result (the driver's hash "
    "canonicalizer cannot sort array/struct cells); the nested operator "
    "itself (plans/search.py renest_listing) is exact-oracle pytest-covered",
)
def q_renest_listing(spark, sf_dir):
    from .search import renest_listing

    pk = F.col("p_partkey").cast("string")
    full_thumb = F.concat_ws(
        ",",
        *[F.concat(F.lit("th/"), pk, F.lit(f"/{s}")) for s in ["t", "s", "m", "o", "l"]],
    )
    short_thumb = F.concat_ws(
        ",", *[F.concat(F.lit("th/"), pk, F.lit(f"/{s}")) for s in ["t", "s"]]
    )
    flat = _t(spark, sf_dir, "part").select(
        F.concat(
            F.lit("http://peer"),
            (F.col("p_partkey") % 200).cast("string"),
            F.lit(".x/item/"),
            pk,
        ).alias("url"),
        (F.col("p_partkey") % 200).alias("peer_id"),
        F.col("p_brand").alias("node_name"),
        F.concat(F.lit("ua/"), F.col("p_size").cast("string")).alias("user_agent"),
        F.when(F.col("p_size") % 10 == 0, F.lit(None).cast("string"))
        .when(F.col("p_size") % 2 == 0, full_thumb)
        .otherwise(short_thumb)
        .alias("thumbnail"),
        (F.col("p_size") * 100).alias("price_amount"),
        F.when(F.col("p_size") % 3 == 0, F.lit("PHR"))
        .when(F.col("p_size") % 3 == 1, F.lit("BTC"))
        .otherwise(F.lit("USD"))
        .alias("price_currency"),
        ((F.col("p_retailprice") - F.lit(900.0)) / F.lit(32.0)).alias("avg_rating"),
        F.when(F.col("p_size") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.array_join(F.split("p_type", " "), ","))
        .alias("tags_str"),
    )
    nested = renest_listing(flat)
    # graded projection: flatten the nested result back to scalars so the
    # driver's hash canonicalizer (which cannot sort list/struct cells) can
    # grade it; the struct/array construction above is still exercised
    return nested.select(
        "url",
        F.col("vendor.peerID").alias("vendor_peer_id"),
        F.col("vendor.name").alias("vendor_name"),
        F.col("vendor.userAgent").alias("vendor_user_agent"),
        F.col("thumbnail.tiny").alias("th_tiny"),
        F.col("thumbnail.small").alias("th_small"),
        F.col("thumbnail.medium").alias("th_medium"),
        F.col("thumbnail.original").alias("th_original"),
        F.col("thumbnail.large").alias("th_large"),
        F.col("price.amount").alias("price_amount"),
        F.col("price.currencyCode").alias("price_currency"),
        "averageRating",
        F.array_join("tags", ",").alias("tags_csv"),
    )


# ---------------------------------------------------------------------------
# X9 — two-candidate JSON decode (crawler/rpc/rpc.go:107-115, 137-145): try
# the typed item schema; on a miss, try the {success, reason} error shape
# (-> empty items / fail-silently); only then give up
# ---------------------------------------------------------------------------
@register(
    "json_decode_fallback",
    """
    WITH p AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0
                  THEN '{"success": false, "reason": "ERR_NOT_FOUND"}'
                  ELSE props END AS payload
      FROM events WHERE event_id < 400
    )
    SELECT event_id,
           CAST(json_extract_string(payload, '$.k') AS INT) AS k,
           json_extract_string(payload, '$.reason') AS err_reason,
           CASE WHEN json_extract_string(payload, '$.k') IS NOT NULL THEN 'ok'
                WHEN json_extract_string(payload, '$.success') IS NOT NULL
                     THEN 'error_fallback'
                ELSE 'unparseable' END AS status
    FROM p
    """,
    "X9 typed decode with error-schema fallback: item schema first, "
    "{success,reason} second, unparseable last",
)
def q_json_decode_fallback(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    payload = F.when(
        F.col("event_id") % 7 == 0,
        F.lit('{"success": false, "reason": "ERR_NOT_FOUND"}'),
    ).otherwise(F.col("props"))
    parsed = ev.select(
        "event_id",
        F.from_json(payload, "k INT").alias("_item"),
        F.from_json(payload, "success BOOLEAN, reason STRING").alias("_err"),
    )
    return parsed.select(
        "event_id",
        F.col("_item.k").alias("k"),
        F.col("_err.reason").alias("err_reason"),
        F.when(F.col("_item.k").isNotNull(), F.lit("ok"))
        .when(F.col("_err.success").isNotNull(), F.lit("error_fallback"))
        .otherwise(F.lit("unparseable"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# F3 — profile-completeness branch (crawler/crawling/crawler.go:92-104):
# complete profiles SaveNode (full columns), incomplete SaveNodeUninitialized
# (minimal columns only)
# ---------------------------------------------------------------------------
@register(
    "profile_branch_upsert",
    """
    WITH f AS (
      SELECT o_custkey AS c_custkey,
             CAST(count(*) AS DOUBLE) AS new_bal,
             max(o_orderpriority) AS new_seg,
             count(*) >= 10 AS complete
      FROM orders GROUP BY o_custkey
    )
    SELECT coalesce(c.c_custkey, f.c_custkey) AS c_custkey,
           CASE WHEN f.c_custkey IS NOT NULL THEN f.new_bal
                ELSE c.c_acctbal END AS c_acctbal,
           CASE WHEN f.c_custkey IS NOT NULL AND f.complete THEN f.new_seg
                ELSE c.c_mktsegment END AS c_mktsegment
    FROM customer c FULL OUTER JOIN f ON c.c_custkey = f.c_custkey
    """,
    "F3 full-vs-minimal save: complete fetches (>=10 orders) update balance"
    " AND segment (S10), incomplete update balance only (S11)",
)
def q_profile_branch_upsert(spark, sf_dir):
    from ..operators.merge import profile_branch_upsert

    target = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    fetched = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").cast("double").alias("c_acctbal"),
            F.max("o_orderpriority").alias("c_mktsegment"),
            (F.count("*") >= 10).alias("profile_complete"),
        )
    )
    return profile_branch_upsert(
        target,
        fetched,
        key="c_custkey",
        full_cols=["c_acctbal", "c_mktsegment"],
        minimal_cols=["c_acctbal"],
    )


# ---------------------------------------------------------------------------
# F8 — moderators radio filter (apiserver/index.js:113-120)
# ---------------------------------------------------------------------------
@register(
    "moderator_radio_filter",
    """
    SELECT 'all_mods' AS mode, c_custkey AS peer_id, c_name AS node_name
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT 'verified_mods' AS mode, c_custkey AS peer_id, c_name AS node_name
    FROM customer WHERE c_custkey % 6 = 0
    """,
    "F8 moderators radio: all_mods keeps moderator=true nodes, "
    "verified_mods keeps verifiedModerator=true nodes",
)
def q_moderator_radio_filter(spark, sf_dir):
    from .search import moderator_filter

    nodes = _nodes(spark, sf_dir)
    parts = []
    for mode in ("all_mods", "verified_mods"):
        parts.append(
            moderator_filter(nodes, mode).select(
                F.lit(mode).alias("mode"), "peer_id", "node_name"
            )
        )
    return parts[0].unionByName(parts[1])


# ---------------------------------------------------------------------------
# F9 — contractType filter (apiserver/index.js:127-129)
# ---------------------------------------------------------------------------
@register(
    "contract_type_filter",
    """
    SELECT o_orderkey AS listing_id, o_orderpriority AS contract_type,
           o_totalprice
    FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    "F9 contractType equality filter on the item side ('all' disables it)",
)
def q_contract_type_filter(spark, sf_dir):
    from .search import contract_type_predicate

    items = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("listing_id"),
        F.col("o_orderpriority").alias("contract_type"),
        "o_totalprice",
    )
    assert contract_type_predicate("all") is None  # 'all' = no filter
    return items.filter(contract_type_predicate("2-HIGH"))


# ---------------------------------------------------------------------------
# F12 — /verified_moderators endpoint (apiserver/index.js:295-309)
# ---------------------------------------------------------------------------
@register(
    "verified_moderators_endpoint",
    """
    SELECT s_suppkey AS moderator_id, s_name AS name,
           'standard' AS mod_type,
           'https://search.example/images/verified_moderator_badge_tiny.png'
             AS badge_tiny
    FROM supplier WHERE s_acctbal > 5000
    ORDER BY moderator_id ASC
    """,
    "F12 verified moderators: isVerified=true projection with the fixed "
    "endpoint metadata",
)
def q_verified_moderators(spark, sf_dir):
    from .search import verified_moderators

    mods = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("moderator_id"),
        F.col("s_name").alias("name"),
        (F.col("s_acctbal") > 5000).alias("is_verified"),
    )
    return verified_moderators(mods)


# ---------------------------------------------------------------------------
# S14 — point update (crawler/db/mysql.go:476-502)
# ---------------------------------------------------------------------------
@register(
    "point_update",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey = 42 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer
    """,
    "S14 UPDATE customer SET acctbal=0 WHERE custkey=42 over a snapshot",
)
def q_point_update(spark, sf_dir):
    from ..operators.merge import point_update

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    return point_update(cust, "c_custkey", 42, "c_acctbal", 0.0)


# ---------------------------------------------------------------------------
# S17 — classifier label write-back (listingfiltering/learnNetwork.py:49-55)
# ---------------------------------------------------------------------------
@register(
    "label_writeback",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 17 = 0 THEN true ELSE NULL END AS label
    FROM documents
    """,
    "S17 write predicted labels back onto the corpus (MERGE on doc_id; "
    "unlabeled rows stay NULL)",
)
def q_label_writeback(spark, sf_dir):
    from ..operators.merge import merge_upsert

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lit(None).cast("boolean").alias("label")
    )
    predicted = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", F.lit(True).alias("label"))
    )
    return merge_upsert(docs, predicted, "doc_id", update_cols=["label"])


# ---------------------------------------------------------------------------
# S18 — versioned schema migrations (crawler/db/migrate.go:24-78)
# ---------------------------------------------------------------------------
@register(
    "schema_migration",
    """
    SELECT c_custkey, c_name, c_acctbal,
           c_mktsegment AS segment,
           true AS listed
    FROM customer
    """,
    "S18 three versioned migrations (add listed default true, rename "
    "mktsegment->segment, drop nationkey) applied through the migration "
    "runner",
)
def q_schema_migration(spark, sf_dir):
    from ..operators.migrate import (
        Migration,
        add_column,
        apply_migrations,
        drop_column,
        rename_column,
    )

    migrations = [
        Migration(1, "add listed flag (migration002 analogue)", add_column("listed", "true")),
        Migration(2, "rename mktsegment -> segment", rename_column("c_mktsegment", "segment")),
        Migration(3, "drop nationkey", drop_column("c_nationkey")),
    ]
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment", "c_nationkey"
    )
    migrated, version = apply_migrations(cust, migrations, from_version=0)
    assert version == 3
    return migrated.select("c_custkey", "c_name", "c_acctbal", "segment", "listed")
