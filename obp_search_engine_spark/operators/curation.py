"""Training-data curation operators: deterministic selection + packing.

The dedup/quality/lang-ID family (dedup.py, textstats.py) decides what to
KEEP; these decide what to SHIP to a training run:

* ``stratified_topk`` — per-group best-k selection (e.g. top documents per
  language by quality): the deterministic counterpart of stratified random
  sampling for curriculum/data-mix construction. One window per group key;
  shuffles only the group key — scale-safe.
* ``pack_by_token_budget`` — greedy sequence packing: assign documents, in
  a deterministic order, to consecutive bins of at most ``budget`` tokens
  (the pretraining sequence-packing shape). Implemented as a running-sum
  window + integer division — pure Catalyst, no Python, and expressible in
  ANSI SQL so the driver's oracle checks it exactly.

Both are window ops, so hot-group skew is bounded by the group's own size;
packing uses a single global order — at 100 TB you run it per shard/source
partition (the ``order_cols`` prefix) exactly like the frontier's salted
windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_topk(
    df: DataFrame, group_col: str, order_cols: list, k: int
) -> DataFrame:
    """Top-k rows per group under a deterministic total order."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: list,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign each row a ``bin`` id by budget-ALIGNED contiguous chunking:
    documents (never split) walk in order_cols order and bin ``b`` holds
    every document whose preceding-token total lies in
    [b*budget, (b+1)*budget) — the concat-then-chunk-at-global-boundaries
    shape of pretraining loaders.

    Properties: order is preserved; bin totals AVERAGE exactly ``budget``
    over the run and each lies in (0, budget + max_doc_tokens) — an
    overrunning document eats into the next bin's span, so a bin can also
    come up short; a document longer than the budget spans several
    multiples (monotone bin ids then SKIP — apply dense_rank for dense
    ids). The global alignment is the point at scale: a shard can pack
    independently knowing only its absolute token offset, no sequential
    state. Closed form bin = floor((cumsum(tokens) - tokens) / budget) —
    pure window arithmetic, identical in ANSI SQL for the oracle.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    part = [partition_col] if partition_col else []
    # ROWS frame, not the default RANGE: with tied order keys RANGE sums all
    # peers into every row's cum, breaking the preceding-total invariant
    w = (
        Window.partitionBy(*part)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    # bin stays BIGINT: ~25T tokens / budget 2000 is ~1.2e10 bins — an int
    # cast would wrap silently under non-ANSI Spark
    return df.withColumn("bin", F.floor((cum - F.col(token_col)) / F.lit(budget)))
