"""Ordered FP folds without collect_list.

Several operators need per-group sums of doubles folded in a specific
row order (the repo's FP-portability recipe: Catalyst
``F.aggregate(array_sort(collect_list(struct(o, v))))`` == DuckDB
``list_reduce(list(v ORDER BY o))``).  The collect_list form pays a
per-group array materialization, an O(n log n) interpreted array_sort,
and an interpreted per-element lambda fold — brutal when groups are
large (the PBM gamma side folds 10^5-element arrays).

:func:`ordered_sums` computes the identical values with one running
window: Spark evaluates an UNBOUNDED PRECEDING..CURRENT ROW sum frame
incrementally, adding one row at a time in sort order, so the running
sum at the group's last row IS the strict left fold
``((0.0 + x_1) + x_2) + ...`` — same additions, same order, same double
rounding, bit-for-bit (the 0.0 + x_1 first step equals x_1 exactly,
including for -0.0 where both yield +0.0).  One exchange + one sort +
one linear JVM pass replace the whole collect/sort/fold chain; plans
drop the ObjectHashAggregate and every higher-order-function node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["ordered_sums"]


def ordered_sums(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    sums: dict[str, Column | str],
    n_alias: str = "_n",
) -> DataFrame:
    """One row per group: each entry of ``sums`` (alias -> column)
    summed as a strict left fold in ``order_col`` order, plus the group
    row count as ``n_alias``.  ``order_col`` must be unique within a
    group (the same precondition array_sort(struct(o, v)) relied on).

    All outputs ride a single ordered window spec (running sums +
    running count + lead-is-null last-row filter), so the plan is one
    exchange, one sort, one WindowExec.
    """
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols = list(group_cols)
    out = df
    for alias, col in sums.items():
        c = F.col(col) if isinstance(col, str) else col
        out = out.withColumn(alias, F.sum(c).over(wrun))
        cols.append(alias)
    out = (
        out.withColumn(n_alias, F.count(F.lit(1)).over(wrun))
        .withColumn("_is_last", F.lead(order_col).over(w).isNull())
        .filter(F.col("_is_last"))
    )
    cols.append(n_alias)
    return out.select(*cols)
