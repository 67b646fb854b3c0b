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

from pyspark.sql import Column, DataFrame, Window
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


def pack_by_token_budget_distributed(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: list,
    shard_col: str,
) -> DataFrame:
    """The 100 TB shape of :func:`pack_by_token_budget`: identical global
    bin ids, no global window. Two levels —

      1. per-shard token totals -> EXCLUSIVE prefix offsets. This window
         is global but runs over n_shards rows (one per shard), a bounded
         tiny frame regardless of corpus size;
      2. per-shard ROWS cum-sum at full shard parallelism, plus the
         broadcast offset.

    Output equals ``pack_by_token_budget(df, ..., order_cols)`` whenever
    the global order is (shard_col asc, *order_cols asc) — e.g. shard =
    a range bucket of the order key. That equality is exactly the
    docstring claim of the single-window version ("a shard can pack
    independently knowing only its absolute token offset") — here it is
    implemented, pytest-asserted, and graded against the SAME single-window
    SQL oracle. The plan's only Exchange SinglePartition is the n_shards
    offsets frame (asserted in tests/test_curation.py)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    totals = df.groupBy(shard_col).agg(F.sum(F.col(token_col)).alias("_tot"))
    w_sh = Window.orderBy(shard_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        shard_col,
        (F.sum("_tot").over(w_sh) - F.col("_tot")).alias("_tok_offset"),
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w) + F.col("_tok_offset")
    return (
        df.join(F.broadcast(offsets), shard_col)
        .withColumn("bin", F.floor((cum - F.col(token_col)) / F.lit(budget)))
        .drop("_tok_offset")
    )


def sample_bucket_col(key: Column, salt: str = "mix") -> Column:
    """Deterministic uniform bucket in [0, 2^32) from a row key.

    First 8 hex chars of md5(key || ':' || salt) as an integer — portable
    arithmetic (DuckDB: ``('0x' || substr(md5(..),1,8))::BIGINT``), so the
    driver's oracle reproduces it exactly; no RNG state, so re-runs,
    retries and shard-local evaluation all agree (the property seeded
    ``rand()`` does NOT give across partition re-splits). NULL keys yield
    NULL (F.concat propagates, matching the oracle's ``||``), so
    ``domain_mix_resample`` drops NULL-key rows on both engines —
    concat_ws would instead silently collapse them all into one bucket.
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def domain_mix_resample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-domain downsampling to a target data mix.

    Keeps a ``weights[domain]`` fraction of each domain's rows (1.0 = keep
    all; upsampling >1.0 is out of scope — repeat rows downstream). The
    keep decision is a pure function of (key, salt), so the sampled set is
    stable across runs and partitionings — a plain Catalyst filter: no
    shuffle, predicate evaluated at the scan, scale-indifferent at 100 TB.
    """
    for d, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {d!r} must be in [0,1], got {w}")
    if not 0.0 <= default_weight <= 1.0:
        raise ValueError(f"default_weight must be in [0,1], got {default_weight}")
    thresh = F.lit(int(default_weight * 2**32))
    for d, w in weights.items():
        thresh = F.when(F.col(domain_col) == d, F.lit(int(w * 2**32))).otherwise(
            thresh
        )
    return df.filter(sample_bucket_col(F.col(key_col), salt) < thresh)


def contamination_screen(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: docs sharing any word ``n``-gram with a
    benchmark/eval set, with the count of distinct shared grams.

    Returns (id_col, n_shared_grams) for contaminated docs only. Grams are
    compared via md5 (fixed 32 bytes through the join instead of arbitrary
    text). The benchmark side is explicitly broadcast: eval sets are tiny
    next to a 100 TB corpus, so the screen is a map-side hash semi-join —
    the corpus never shuffles.
    """
    from ..functions import textstats as ts

    def grams(d, idcols):
        return d.select(
            *idcols,
            F.explode(
                F.array_distinct(ts.ngrams_col(ts.tokens_col(F.col(text_col)), n))
            ).alias("_gram"),
        ).select(*idcols, F.md5(F.col("_gram")).alias("_g"))

    bench_grams = F.broadcast(grams(benchmark, []).distinct())
    return (
        grams(docs, [id_col])
        .join(bench_grams, "_g")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("_g")).alias("n_shared_grams"))
    )


def assign_splits(
    df: DataFrame,
    group_key: Column,
    pcts: list[int] | None = None,
    names: list[str] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split assignment: adds a ``split``
    column that is a pure function of ``group_key`` — every row sharing
    the key lands in the SAME split, so passing a dedup-group key (the
    md5 content fingerprint, or a near-dup cluster label from
    ``graph.connected_components``) guarantees duplicates never
    straddle the train/eval boundary. Plain-random row splits leak:
    with ~10% exact-dup rate a 90/10 split puts a twin of ~1 in 10 eval
    docs in training, and the eval is contaminated before a single
    step.

    ``pcts`` are INTEGER percents summing to 100 (default [90, 5, 5]);
    the bucket is :func:`sample_bucket_col`'s md5 arithmetic scaled to
    [0, 100), compared against cumulative integer edges — portable, no
    FP, no RNG state. A Catalyst projection: no shuffle, no UDF; at
    100 TB the split predicate evaluates at the scan.
    """
    pcts = [90, 5, 5] if pcts is None else pcts
    names = ["train", "val", "test"] if names is None else names
    if len(pcts) != len(names):
        raise ValueError("pcts and names must align")
    if sum(pcts) != 100 or any(p < 0 for p in pcts):
        raise ValueError(f"integer pcts must sum to 100, got {pcts}")
    bucket = sample_bucket_col(group_key, salt) % 100
    expr, edge = None, 0
    for name, p in zip(names, pcts):
        edge += p
        cond = bucket < edge
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn("split", expr)


def split_oracle_case(key_expr: str, pcts: list[int], names: list[str],
                      salt: str = "split") -> str:
    """DuckDB CASE expression mirroring :func:`assign_splits`."""
    b = (f"(('0x' || substr(md5(({key_expr})::VARCHAR || ':{salt}'), 1, 8))"
         f"::BIGINT % 100)")
    parts, edge = [], 0
    for name, p in zip(names, pcts):
        edge += p
        parts.append(f"WHEN {b} < {edge} THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"


def weighted_sample_k(
    df: DataFrame,
    weight_sql: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sample-without-replacement of k rows:
    integer-exact priority sampling in the Efraimidis-Spirakis shape
    (take the k best random keys, each key's distribution tilted by the
    row's weight), with the float key u^(1/w) replaced by the integer
    key ``u div w`` — u a 60-bit md5-derived uniform — so selection is
    bit-identical at any parallelism AND exactly SQL-oracle-checkable
    (true A-ES needs pow/ln, whose last-ULP differences across engines
    could flip near-ties).

    ``weight_sql`` is a SQL expression over the frame's columns (e.g.
    ``"1 + n_chars"``), clamped to >= 1. Semantics: key =
    md5_60bit(id || ':' || salt) div w; the k smallest (key, id) win.
    P(selection) increases monotonically in w (doubling w halves the
    expected key); documented as a priority-sampling variant, not exact
    PPS inclusion probabilities — for corpus curation the monotone
    quality tilt is the contract, and cross-engine reproducibility
    beats last-decimal PPS fidelity.

    100 TB shape: the key is a pure per-row Catalyst expression inside
    the scan's codegen; top-k is TakeOrdered (per-partition heaps, no
    global sort, no corpus shuffle). Output: (id, weight, skey).
    """
    keyed = df.select(
        F.col(id_col),
        F.expr(f"greatest(cast(({weight_sql}) as bigint), 1)").alias("weight"),
    ).withColumn(
        "skey",
        F.expr(
            f"cast(conv(substring(md5(concat(cast({id_col} as string), "
            f"':{salt}')), 1, 15), 16, 10) as bigint) div weight"
        ),
    )
    return keyed.orderBy(F.col("skey").asc(), F.col(id_col).asc()).limit(k)


def weighted_sample_oracle_sql(
    weight_sql: str,
    k: int,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    salt: str = "ws",
) -> str:
    """DuckDB oracle for :func:`weighted_sample_k`; ``weight_sql`` is the
    weight expression over ``docs_table`` columns (clamped to >= 1 here,
    mirroring the operator)."""
    return f"""
    WITH keyed AS (
      SELECT {id_col},
             greatest(({weight_sql})::BIGINT, 1) AS weight,
             ('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 15))::BIGINT
               // greatest(({weight_sql})::BIGINT, 1) AS skey
      FROM {docs_table}
    )
    SELECT {id_col}, weight, skey FROM keyed
    ORDER BY skey ASC, {id_col} ASC LIMIT {k}
    """
