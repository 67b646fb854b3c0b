"""robots.txt parsing + rule evaluation.

The reference has NO robots handling (a P2P network has no robots.txt; its
only politeness is the 10-goroutine cap, crawler/main.go:36) — this is the
web-scale generalization the north_rule names: per-host crawl-delay budgets
and allow/deny prefix rules feeding ``host_state``.

Design: robots bodies are fetched like any page (they live in the corpus as
``http://host/robots.txt`` rows); ``parse_robots`` reduces a body to a
compact serialized rule set stored in ``host_state.robots_rules``
('D:/private|A:/private/ok|CD:2.5' format); ``disallowed_col`` evaluates
rules against url paths JVM-side after exploding the (small) per-host rule
strings — longest-prefix-match wins, allow beats disallow on ties (the
Google/RFC 9309 rule).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_UA_ALL = "*"


def parse_robots(body: str | None, user_agent: str = _UA_ALL) -> str:
    """robots.txt body -> compact rule string 'D:p|A:p|CD:x'.

    Honors the group for `user_agent` if present, else the '*' group.
    Pure function (oracle + UDF share it)."""
    if not body:
        return ""
    groups: dict[str, list[str]] = {}
    delays: dict[str, float] = {}
    current: list[str] = []
    in_ua_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            # CONSECUTIVE User-agent lines form ONE group (RFC 9309 §2.2.1:
            # 'User-agent: bot\nUser-agent: *\nDisallow: /p' applies /p to
            # both) — accumulate while in a UA run, reset when a rule line
            # ended the previous run
            ua = val.lower()
            current = current + [ua] if in_ua_run else [ua]
            groups.setdefault(ua, [])
            in_ua_run = True
        elif key in ("disallow", "allow") and current:
            in_ua_run = False
            for ua in current:
                if val:
                    groups[ua].append(("D:" if key == "disallow" else "A:") + val)
        elif key == "crawl-delay" and current:
            in_ua_run = False
            try:
                for ua in current:
                    delays[ua] = float(val)
            except ValueError:
                pass

    ua = user_agent.lower()
    # a matching UA group takes the WHOLE group (RFC 9309 §2.2.1) — its
    # missing crawl-delay does not fall back to the '*' group's
    if ua in groups:
        rules, delay = groups[ua], delays.get(ua)
    else:
        rules, delay = groups.get(_UA_ALL, []), delays.get(_UA_ALL)
    parts = list(rules)
    if delay is not None:
        parts.append(f"CD:{delay}")
    return "|".join(parts)


@F.pandas_udf(T.StringType())
def parse_robots_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(parse_robots, na_action="ignore").fillna("")


def crawl_delay_col(rules: Column, default: float = 0.0) -> Column:
    """Extract CD: value from a rule string (JVM regexp)."""
    s = F.regexp_extract(rules, r"(?:^|\|)CD:([0-9.]+)", 1)
    return F.when(s == "", F.lit(default)).otherwise(s.cast("double"))


def path_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def disallowed(url_path: str, rules: str) -> bool:
    """Pure oracle: longest-prefix match; allow wins ties (RFC 9309 §2.2.2)."""
    best_len, best_allow = -1, True
    for part in (rules or "").split("|"):
        if part.startswith(("D:", "A:")):
            prefix = part[2:]
            if url_path.startswith(prefix) and len(prefix) >= best_len:
                if len(prefix) > best_len:
                    best_len, best_allow = len(prefix), part.startswith("A:")
                elif part.startswith("A:"):
                    best_allow = True
    return not best_allow if best_len >= 0 else False


def filter_robots_allowed(
    urls: DataFrame,
    host_state: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool | None = None,
) -> DataFrame:
    """Drop urls whose path is disallowed by their host's rules.

    JVM-side: explode each host's (few) rules, prefix-test with startswith,
    longest-match + allow-wins aggregation; rows of hosts with no rules
    pass through.

    Join strategy is SIZE-GATED, not hard-coded: per-host rulebooks at
    10^8-host scale do not broadcast, so ``broadcast_rules=None`` (the
    default) leaves the choice to the planner/AQE — a small rulebook
    still becomes a runtime broadcast join, a huge one degrades to a
    plain shuffled equi-join on host instead of an OOM. Callers that
    KNOW the rulebook is bounded (fixtures, a vetted host subset) can
    force the old hint with ``broadcast_rules=True``."""
    rules = host_state.select(
        "host", F.split(F.coalesce(F.col("robots_rules"), F.lit("")), r"\|").alias("_rules")
    )
    if broadcast_rules:
        rules = F.broadcast(rules)
    u = urls.withColumn("_path", path_of(F.col(url_col)))
    joined = u.join(rules, "host", "left")
    # per url: longest matching prefix; allow wins ties
    matches = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda r: r.rlike("^[DA]:")
        & F.col("_path").startswith(F.substring(r, 3, 100000)),
    )
    best = F.aggregate(
        matches,
        F.struct(F.lit(-1).alias("len"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            F.length(r) - 2 > acc["len"],
            F.struct(
                (F.length(r) - 2).alias("len"),
                F.substring(r, 1, 1).eqNullSafe("A").alias("allow"),
            ),
        )
        .when(
            (F.length(r) - 2 == acc["len"]) & F.substring(r, 1, 1).eqNullSafe("A"),
            F.struct(acc["len"].alias("len"), F.lit(True).alias("allow")),
        )
        .otherwise(acc),
    )
    return (
        joined.withColumn("_best", best)
        .filter(F.col("_best.allow") | (F.col("_best.len") < 0))
        .drop("_rules", "_path", "_best")
    )


def host_state_from_pages(spark, pages: DataFrame, n_default_delay: float = 0.0) -> DataFrame:
    """Build host_state from robots.txt rows present in the pages corpus."""
    from .urls import host_col, host_hash_col

    from pyspark.sql import Window

    # exactly the ROOT robots file (path == /robots.txt — a deeper
    # /a/robots.txt is just a page), and exactly ONE row per host: scheme
    # twins / duplicate rows would otherwise fan out the left join in
    # filter_robots_allowed and duplicate every candidate url on that host.
    # Deterministic pick: lowest url wins.
    robots = (
        pages.filter(path_of(F.col("url")) == "/robots.txt")
        .select(
            host_col(F.col("url")).alias("host"),
            F.col("url"),
            parse_robots_udf(F.col("text")).alias("robots_rules"),
        )
        .withColumn(
            "_rn", F.row_number().over(Window.partitionBy("host").orderBy("url"))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "url")
    )
    return robots.select(
        "host",
        host_hash_col(F.col("host")).alias("host_hash"),
        crawl_delay_col(F.col("robots_rules"), n_default_delay).alias("crawl_delay"),
        F.lit(None).cast("timestamp").alias("next_allowed_ts"),
        "robots_rules",
    )
