"""The reference's search/moderation query surface as DataFrame plans.

Ports the *semantics* of the apiserver/banserver endpoints (SURVEY.md §2.2,
§2.3, §2.4, §3.2, §3.3) onto the engine's ``documents`` + ``frontier``
tables. One Spark job per request — no N+1 loops (the reference issues one
moderator query per distinct peerID, apiserver/index.js:140-158; we
aggregate once and left-join).

Quirk fidelity (each reference bug is reproduced under fidelity='strict'
and corrected under fidelity='fixed'):
  * F6 keyword search REPLACES the base where — blocked/testnet/nsfw
    filters are dropped whenever q is present (apiserver/index.js:85-102).
  * A5 ban ratio is items/banned (>=1 whenever any item is flagged), not
    banned/items (crawler/crawling/crawler.go:125-146).
  * A1 tag pagination overlaps pages (offset=batch*page but
    limit=batch*(page+1), apiserver/tagsCache.js:78-79) double-counting the
    overlap; 'fixed' counts each row once.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# rating buckets: apiserver/index.js:50-60
RATING_THRESHOLDS = {5: 4.75, 4: 4.0, 3: 3.0, 2: 2.0, 1: 0.0}


def base_predicate(nsfw: bool = False, testnet: bool = False):
    """F4: blocked=false AND testnet=? [AND nsfw=false] (apiserver/index.js:41-47)."""
    p = (F.col("blocked") == F.lit(False)) & (F.col("testnet") == F.lit(testnet))
    if not nsfw:
        p = p & (F.col("nsfw") == F.lit(False))
    return p


def keyword_predicate(q: str, fidelity: str = "strict"):
    """F6: OR-of-LIKEs, lower()ed on both sides to mirror MySQL's
    case-insensitive collation. strict searches TITLE and TAGS only — the
    reference ORs the word-likes over exactly those two columns
    (apiserver/index.js:96-101); 'fixed' widens to the body text too."""
    words = [w for w in q.split(" ") if w]
    if not words:
        # whitespace-only q: the reference splits ' ' into empty words and
        # each LIKE '%%' matches everything (apiserver/index.js:85-102) —
        # and reduce() over an empty list would raise
        return F.lit(True)
    cols = ["title", "tags_str"] if fidelity == "strict" else ["title", "text", "tags_str"]
    return reduce(
        or_,
        [F.lower(F.col(c)).contains(w.lower()) for w in words for c in cols],
    )


def moderator_filter(nodes_meta: DataFrame, mode: str | None = None) -> DataFrame:
    """F8 (apiserver/index.js:113-120): the moderators radio filter on the
    NODE side of the search join — 'verified_mods' keeps verified
    moderators, 'all_mods' keeps any moderator, anything else keeps all."""
    if mode == "verified_mods":
        return nodes_meta.filter(F.col("verified_moderator"))
    if mode == "all_mods":
        return nodes_meta.filter(F.col("moderator"))
    return nodes_meta


def contract_type_predicate(contract_type: str | None):
    """F9 (apiserver/index.js:127-129): item-side contractType equality,
    skipped when the param is absent or 'all'. Returns a Column or None."""
    if contract_type is None or contract_type == "all":
        return None
    return F.col("contract_type") == F.lit(contract_type)


def verified_moderators(moderators: DataFrame) -> DataFrame:
    """F12 (apiserver/index.js:295-309): the /verified_moderators endpoint —
    moderators WHERE isVerified=true, projected into the response rows with
    the endpoint's fixed badge metadata."""
    return (
        moderators.filter(F.col("is_verified"))
        .select(
            F.col("moderator_id"),
            F.col("name"),
            F.lit("standard").alias("mod_type"),
            F.lit("https://search.example/images/verified_moderator_badge_tiny.png").alias(
                "badge_tiny"
            ),
        )
        .orderBy(F.asc("moderator_id"))
    )


def search_listings(
    documents: DataFrame,
    nodes_meta: DataFrame,
    doc_moderators: DataFrame | None = None,
    q: str | None = None,
    rating: int | None = None,
    sort_by: str | None = None,
    ascending: bool = True,
    page: int = 0,
    page_size: int = 20,
    nsfw: bool = False,
    testnet: bool = False,
    now=None,
    moderators_mode: str | None = None,
    contract_type: str | None = None,
    fidelity: str = "strict",
) -> DataFrame:
    """/search/listings (apiserver/index.js:27-339) as one DataFrame plan.

    nodes_meta: frontier/profile rows (url/peer_id, last_crawled, listed,
    blocked, moderator flags). The node-side freshness+listed filter is F7
    (apiserver/index.js:104-110); the join is J1 (index.js:122-125).
    """
    page_size = min(page_size, 100)  # apiserver/index.js:31 clamp
    docs = documents.withColumn("tags_str", F.array_join("tags", ","))

    where = base_predicate(nsfw=nsfw, testnet=testnet)
    if q:
        kw = keyword_predicate(q, fidelity=fidelity)
        # strict: keyword where REPLACES the base filters (reference quirk)
        where = kw if fidelity == "strict" else (where & kw)
    docs = docs.filter(where)
    if rating is not None:
        docs = docs.filter(
            F.col("avg_rating") >= F.lit(RATING_THRESHOLDS[rating])
        )
    ct = contract_type_predicate(contract_type)  # F9, item side
    if ct is not None:
        docs = docs.filter(ct)

    fresh_nodes = nodes_meta
    if now is not None:
        fresh_nodes = fresh_nodes.filter(
            (F.col("last_crawled") > F.lit(now) - F.expr("INTERVAL 8 HOURS"))
            & F.col("listed")
            & ~F.col("node_blocked")
        )
    fresh_nodes = moderator_filter(fresh_nodes, moderators_mode)  # F8, node side
    out = docs.join(fresh_nodes, "peer_id", "inner")

    if doc_moderators is not None:
        mods = doc_moderators.groupBy("peer_id").agg(
            F.sort_array(F.collect_set("moderator_id")).alias("moderators")
        )
        out = out.join(mods, "peer_id", "left")

    order = [F.col("url").asc()]  # deterministic tiebreaker always last
    if sort_by:
        c = F.col(sort_by)
        order = [c.asc() if ascending else c.desc()] + order
    return out.orderBy(*order).offset(page * page_size).limit(page_size)


def renest_listing(row_df: DataFrame) -> DataFrame:
    """F13 (apiserver/index.js:172-280): flat row -> nested response shape.

    vendor struct from node columns, thumbnail struct from the positional
    5-way comma split (X2, apiserver/index.js:188,243-249; reference stores
    5 urls comma-joined, crawler/db/mysql.go:407), price struct with
    cast("double") ratings (X11), safeSplit null->[] (X3).
    """
    thumb = F.split(F.coalesce(F.col("thumbnail"), F.lit("")), ",")
    return row_df.select(
        "url",
        F.struct(
            F.col("peer_id").alias("peerID"),
            F.col("node_name").alias("name"),
            F.col("user_agent").alias("userAgent"),
        ).alias("vendor"),
        F.struct(
            *[F.get(thumb, i).alias(n)  # get() -> null past the end (ANSI-safe)
              for i, n in enumerate(["tiny", "small", "medium", "original", "large"])]
        ).alias("thumbnail"),
        F.struct(
            F.col("price_amount").alias("amount"),
            F.col("price_currency").alias("currencyCode"),
        ).alias("price"),
        F.col("avg_rating").cast("double").alias("averageRating"),
        F.coalesce(F.split("tags_str", ","), F.array()).alias("tags"),
    )


def capitalize_first(col_name: str):
    """X4 (apiserver/tagsCache.js:87): first char upper + rest lower —
    deliberately NOT initcap (initcap capitalizes every word)."""
    return F.concat(
        F.upper(F.substring(col_name, 1, 1)),
        F.lower(F.expr(f"substring({col_name}, 2)")),
    )


def top_tags(
    documents: DataFrame,
    nodes_meta: DataFrame | None = None,
    k: int = 11,
    now=None,
    fidelity: str = "fixed",
    batch: int = 100,
    order_col: str = "url",
) -> DataFrame:
    """A1 /search/toptags (apiserver/tagsCache.js:51-125): explode tags,
    capitalize first char, count, top-K — one hash-agg job instead of the
    reference's page-scan loop.

    fidelity='strict' reproduces the reference's pagination bug
    (tagsCache.js:78-79: offset = batch*page but limit = batch*(page+1)), so
    page p reads scan rows [p*b, p*b + b*(p+1)) and rows in the overlaps
    count multiple times. Re-expressed exactly (no loop): row r of the
    `order_col`-ordered scan is read by every page p <= r/b with
    r < b*(2p+1); its tag occurrences get that multiplicity as a weight.
    The multiplicity is a pure Catalyst expression (sequence + filter)."""
    df = documents
    if nodes_meta is not None and now is not None:
        fresh = nodes_meta.filter(
            F.col("last_crawled") > F.lit(now) - F.expr("INTERVAL 24 HOURS")
        ).select("peer_id")
        df = df.join(F.broadcast(fresh), "peer_id", "left_semi")

    if fidelity == "strict":
        w = Window.orderBy(F.asc(order_col))
        df = df.withColumn("_r", F.row_number().over(w) - 1)
        b = F.lit(batch)
        mult = F.size(
            F.filter(
                F.sequence(F.lit(0), F.floor(F.col("_r") / b).cast("int")),
                lambda p: F.col("_r") < b * (2 * p + 1),
            )
        )
        df = df.withColumn("_w", mult.cast("long"))
    else:
        df = df.withColumn("_w", F.lit(1).cast("long"))

    tags = (
        df.select(F.explode("tags").alias("tag"), "_w")
        .filter(F.col("tag") != "")
        .select(
            F.concat(
                F.upper(F.substring("tag", 1, 1)), F.lower(F.expr("substring(tag, 2)"))
            ).alias("tag"),
            "_w",
        )
    )
    return (
        tags.groupBy("tag")
        .agg(F.sum("_w").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tag"))
        .limit(k)
    )


def user_agent_histogram(nodes_meta: DataFrame) -> DataFrame:
    """A2 (banserver/app.js:185-192)."""
    return (
        nodes_meta.groupBy("user_agent")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("user_agent"))
    )


def ban_ratio_decision(
    documents: DataFrame,
    allow_threshold: float = 0.1,
    ban_threshold: float = 0.5,
    fidelity: str = "strict",
) -> DataFrame:
    """A5 (crawler/crawling/crawler.go:108-148): per peer, compare a flag
    ratio against thresholds -> decision in {ban, allow, review}.

    strict: ratio = items/banned (the reference's inverted fraction — >=1
    whenever any item is flagged, so any flag trips the ban branch);
    fixed: ratio = banned/items.
    """
    agg = documents.groupBy("peer_id").agg(
        F.count("*").alias("n_items"),
        # coalesce: a peer whose is_blocked values are ALL NULL (tri-state:
        # never classified) has sum(NULL)=NULL, which would null out every
        # threshold branch and land on 'review' — the reference counts it
        # as bannedCnt==0 and lists the peer (crawler.go:125-134)
        F.coalesce(
            F.sum(F.col("is_blocked").cast("int")), F.lit(0)
        ).alias("n_banned"),
    )
    if fidelity == "strict":
        # crawler.go:125-134: bannedCnt==0 OR items/banned < allow -> listed
        # (allow); items/banned > ban -> blocked; else undecided. Strict
        # inequalities, zero-banned short-circuits to allow.
        ratio = F.when(F.col("n_banned") > 0, F.col("n_items") / F.col("n_banned"))
        decision = (
            F.when((F.col("n_banned") == 0) | (ratio < allow_threshold), F.lit("allow"))
            .when(ratio > ban_threshold, F.lit("ban"))
            .otherwise(F.lit("review"))
        )
    else:
        ratio = F.col("n_banned") / F.col("n_items")
        decision = (
            F.when(ratio > ban_threshold, F.lit("ban"))
            .when(ratio < allow_threshold, F.lit("allow"))
            .otherwise(F.lit("review"))
        )
    return agg.withColumn("ratio", ratio).withColumn("decision", decision)
