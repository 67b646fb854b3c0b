"""MERGE / upsert / partition-overwrite semantics over snapshot tables.

Reference analogues:
  * S10/S11 ``INSERT ... ON DUPLICATE KEY UPDATE`` node upserts
    (crawler/db/mysql.go:132-274)
  * S13 delete-then-reinsert of a peer's items (crawler/db/mysql.go:339-474)
  * S14/S17 point updates ``UPDATE ... SET f=? WHERE id=?``
    (crawler/db/mysql.go:476-502, listingfiltering/learnNetwork.py:49-55)

On Iceberg these are literal ``MERGE INTO`` / dynamic partition overwrite;
here (plain parquet snapshots) the same semantics are DataFrame functions
producing the post-merge table, which the caller snapshots — the Iceberg
write path would swap in transparently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE: matched rows take `update_cols` from updates (others kept),
    unmatched update rows insert. Column set = target's.

    One full-outer join on the key; when updates is small Catalyst
    broadcasts it, so the target side never shuffles."""
    keys = [key] if isinstance(key, str) else list(key)
    update_cols = update_cols or [c for c in updates.columns if c not in keys]
    missing = [c for c in target.columns if c not in updates.columns]

    u = updates
    for c in missing:
        u = u.withColumn(c, F.lit(None).cast(dict(target.dtypes)[c]))
    t = target.select(
        *[F.col(c).alias(f"_t_{c}") for c in target.columns]
    ).withColumn("_t_hit", F.lit(True))
    u = u.select(*[F.col(c).alias(f"_u_{c}") for c in target.columns]).withColumn(
        "_u_hit", F.lit(True)
    )
    cond = [t[f"_t_{k}"].eqNullSafe(u[f"_u_{k}"]) for k in keys]
    joined = t.join(u, on=cond, how="full_outer")

    out_cols = []
    for c in target.columns:
        if c in keys:
            expr = F.coalesce(F.col(f"_t_{c}"), F.col(f"_u_{c}"))
        elif c in update_cols:
            # matched -> update value; insert -> update value; else keep
            expr = F.when(F.col("_u_hit").isNotNull(), F.col(f"_u_{c}")).otherwise(
                F.col(f"_t_{c}")
            )
        else:
            expr = F.coalesce(F.col(f"_t_{c}"), F.col(f"_u_{c}"))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def profile_branch_upsert(
    target: DataFrame,
    fetched: DataFrame,
    key: str,
    full_cols: list[str],
    minimal_cols: list[str],
    complete_col: str = "profile_complete",
) -> DataFrame:
    """F3 (crawler/crawling/crawler.go:92-104): the full-vs-minimal save
    split. Fetched rows whose profile payload is COMPLETE (profile != nil &&
    profile.Stats != nil) upsert the full column set (S10 SaveNode); rows
    with a missing/partial profile upsert only the minimal columns (S11
    SaveNodeUninitialized) — the minimal pass projects away the full-only
    columns so an uninitialized insert leaves them NULL, exactly like the
    reference's empty-node row.

    Two disjoint merge passes over the same key — each one full-outer join;
    when ``fetched`` is wave-sized Catalyst broadcasts it both times.
    """
    full = fetched.filter(F.col(complete_col)).drop(complete_col)
    minimal = fetched.filter(~F.col(complete_col)).select(key, *minimal_cols)
    out = merge_upsert(target, full, key, update_cols=full_cols)
    return merge_upsert(out, minimal, key, update_cols=minimal_cols)


def point_update(
    target: DataFrame, key: str, key_value, field: str, value
) -> DataFrame:
    """S14: UPDATE target SET field=value WHERE key=key_value."""
    return target.withColumn(
        field,
        F.when(F.col(key) == F.lit(key_value), F.lit(value)).otherwise(F.col(field)),
    )


def partition_overwrite(
    target: DataFrame, replacement: DataFrame, partition_key: str
) -> DataFrame:
    """S13: replace ALL rows of the partitions present in `replacement`
    (delete-then-insert per peerID = dynamic partition overwrite)."""
    parts = replacement.select(partition_key).distinct()
    kept = target.join(F.broadcast(parts), partition_key, "left_anti")
    return kept.unionByName(replacement)
