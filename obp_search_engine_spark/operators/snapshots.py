"""Cross-snapshot change detection: classify every url between two crawl
snapshots as unchanged / changed / gone / new.

This is the recrawl scheduler's input signal: the reference crawls on a
staleness clock alone (`lastUpdated` ordering, crawler/db/mysql.go:238),
but a web-scale recrawler prioritizes by OBSERVED change (Cho &
Garcia-Molina 2003) — which requires exactly this diff between the last
two snapshots of the corpus. The store layer already produces snapshot
reads (operators/store.py bookmarks); this operator compares them.

100 TB shape: both sides are reduced map-side to ``(key, md5 fingerprint)``
— 16 bytes/row, never shipping text into the join — then ONE full outer
shuffled-hash join on the key; the status is a pure projection over the
join's null pattern. Fingerprint comparison deterministically equals text
comparison (md5 on exact content), and everything is Catalyst, so the
operator is exactly SQL-expressible (:func:`snapshot_diff_oracle_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Diff two snapshots by content fingerprint.

    Returns ``(key, status)`` with status in ``{'unchanged', 'changed',
    'gone', 'new'}`` for every key present in either snapshot. Inputs
    must be key-unique (snapshot semantics). NULL content is a valid
    page state: two NULLs compare unchanged, NULL vs text compares
    changed (null-safe fingerprint equality; presence is tracked by
    explicit markers because ``md5(NULL)`` is NULL).
    """
    o = old.select(
        F.col(key_col).alias("k"),
        F.md5(F.col(content_col)).alias("fp_old"),
        F.lit(1).alias("has_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.md5(F.col(content_col)).alias("fp_new"),
        F.lit(1).alias("has_new"),
    )
    j = o.join(n, "k", "full_outer")
    # presence comes from explicit markers, NOT fingerprint nullness:
    # md5(NULL) is NULL, so a NULL-content row would otherwise be
    # indistinguishable from an absent row
    status = (
        F.when(F.col("has_old").isNull(), F.lit("new"))
        .when(F.col("has_new").isNull(), F.lit("gone"))
        .when(F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("k").alias(key_col), status.alias("status"))


def snapshot_diff_oracle_sql(
    old_cte: str,
    new_cte: str,
    key_col: str = "url",
    content_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`snapshot_diff`. The CTEs must each yield
    (key_col, content_col) key-unique rows."""
    return f"""
    WITH o0 AS ({old_cte}), n0 AS ({new_cte}),
    o AS (SELECT {key_col} AS k, md5({content_col}) AS fp_old,
                 1 AS has_old FROM o0),
    n AS (SELECT {key_col} AS k, md5({content_col}) AS fp_new,
                 1 AS has_new FROM n0),
    j AS (SELECT COALESCE(o.k, n.k) AS k, fp_old, fp_new, has_old, has_new
          FROM o FULL OUTER JOIN n ON o.k = n.k)
    SELECT k AS {key_col},
           CASE WHEN has_old IS NULL THEN 'new'
                WHEN has_new IS NULL THEN 'gone'
                WHEN fp_old IS NOT DISTINCT FROM fp_new THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM j
    """


def change_rate(
    statuses: DataFrame,
    group_col: str,
    status_col: str = "status",
) -> DataFrame:
    """Per-group observed change rates from a diff (or a union of diffs
    across rounds): counts per status plus ``changed_ratio`` — the
    fraction of keys present in BOTH snapshots that changed, the
    Cho-Garcia-Molina estimator's numerator at one observation.

    Output: (group, n_unchanged, n_changed, n_gone, n_new BIGINT,
    changed_ratio DOUBLE — NULL when no key survived both snapshots).
    One map-side-combined groupBy; scale-free.
    """
    c = lambda s: F.sum((F.col(status_col) == s).cast("long"))  # noqa: E731
    agg = statuses.groupBy(F.col(group_col).alias("grp")).agg(
        c("unchanged").alias("n_unchanged"),
        c("changed").alias("n_changed"),
        c("gone").alias("n_gone"),
        c("new").alias("n_new"),
    )
    both = F.col("n_unchanged") + F.col("n_changed")
    return agg.select(
        F.col("grp").alias(group_col),
        "n_unchanged",
        "n_changed",
        "n_gone",
        "n_new",
        F.when(both > 0, F.col("n_changed").cast("double") / both)
        .alias("changed_ratio"),
    )
