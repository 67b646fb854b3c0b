"""SemDeDup — semantic deduplication over embedding space.

Abbas, Tirumala, Simig, Ganguli & Morcos, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" (arXiv:2303.09540,
2023): cluster the corpus embeddings with a coarse quantizer, then inside
each cluster treat pairs whose cosine similarity exceeds a threshold as
*semantic* duplicates (paraphrases, boilerplate re-renders, machine
translations of the same page — things MinHash never catches) and keep,
from every duplicate relation, the example FARTHEST from its cluster
centroid (the paper's "low centroid similarity" keep rule: the most
extreme phrasing is the most informative one).

This is the embedding-space counterpart of the lexical near-dup family in
``operators/dedup.py`` and reuses the md5-portable IVF machinery from
``operators/similarity.py`` (deterministic centroid seeding + literal-
centroid argmin assignment), so the whole operator has an exact DuckDB
oracle — no model, no RNG, no FP-order hazard:

* centroids  = the ``n_cells`` rows with the smallest
  ``md5(CAST(id AS STRING))`` (portable pseudo-random sample; bounded
  ``n_cells``-row collect, exactly like ``md5_ivf_centroids``);
* assignment = argmin L2 over the literal centroid arrays, computed as a
  strict left fold so the doubles agree bitwise with DuckDB's
  ``list_reduce``; ties break to the lower centroid id via struct
  ordering (``array_min`` over ``struct(d, cid)``);
* drop rule  = x is dropped iff SOME same-cell y has
  ``round(cos(x, y), 5) >= threshold`` and y outranks x under the strict
  total order (d2c DESC, id ASC) — i.e. y is farther from the centroid,
  or equally far with a smaller id.  A pure EXISTS semi-join: no
  connected components, no iteration, deterministic at any parallelism.
  (Chains of near-duplicates can drop every non-maximal member — the
  behaviour of the paper's reference implementation, which also compares
  against the per-cluster keep rule rather than building cliques.)

Scale shape (the 100 TB story): ONE shuffle on the cell id, then a
self-join that is quadratic only *within* a cell — identical cost model
to the paper (pairwise inside clusters) and to the IVF probe: ``n_cells``
grows with the corpus so the per-cell member count stays bounded, and no
all-pairs comparison ever happens across cells.  The scoring path is
pure Catalyst (``zip_with`` + ``aggregate`` folds) — zero Python.

Reference analogue: the reference dedups listings only by exact hash
(crawler/db/mysql.go:359-445 delete+reinsert per node); SemDeDup is the
beyond-reference curation step the brief's training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _as_double, _l2_col, md5_ivf_centroids

__all__ = ["semdedup_assign", "semdedup_keep", "semdedup_oracle_sql"]


def _pair_cos(va, vb):
    """Cosine between two array columns as strict left folds (bitwise
    portable to DuckDB ``list_reduce``), rounded to 5 decimals before the
    threshold compare on BOTH engines."""
    a, b = _as_double(va), _as_double(vb)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return F.round(dot / (na * nb), 5)


def semdedup_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every row to its nearest literal centroid (argmin L2, ties
    to the lower centroid id) and carry the distance: columns
    ``(id, vec, cell, d2c)``."""
    cell_structs = F.array(
        *[
            F.struct(
                _l2_col(F.col(vec_col), ce).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, ce in centroids
        ]
    )
    best = F.array_min(cell_structs)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        best["cid"].alias("cell"),
        best["d"].alias("d2c"),
    )


def semdedup_keep(
    df: DataFrame,
    threshold: float = 0.35,
    n_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Per-row SemDeDup verdict: ``(vec_id, cell, d2c, kept)``.

    ``kept = false`` iff some same-cell neighbour with pair cosine >=
    ``threshold`` outranks this row under (d2c DESC, id ASC).  ``d2c`` is
    emitted rounded to 6 decimals (the comparison itself uses the
    unrounded strict-fold doubles, which are bit-identical across
    engines)."""
    if centroids is None:
        centroids = md5_ivf_centroids(df, n_cells, vec_col, id_col)
    asg = semdedup_assign(df, centroids, vec_col, id_col)
    # Cast and take each vector's norm ONCE per row, not once per pair —
    # the fold values are bit-identical to computing them inside the
    # pair (same expression over the same array), so the oracle is
    # untouched, but the within-cell quadratic pass now pays only the
    # dot product per pair instead of dot + two norms + two casts.
    vd = _as_double(F.col("vec"))
    prep = asg.withColumn("_vd", vd).withColumn(
        "_nrm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("_vd"), lambda x: x * x),
                F.lit(0.0),
                lambda s, x: s + x,
            )
        ),
    )
    a = prep.select(
        F.col("id").alias("id_a"),
        F.col("_vd").alias("v_a"),
        "cell",
        F.col("d2c").alias("d_a"),
        F.col("_nrm").alias("n_a"),
    )
    b = prep.select(
        F.col("id").alias("id_b"),
        F.col("_vd").alias("v_b"),
        F.col("cell").alias("cell_b"),
        F.col("d2c").alias("d_b"),
        F.col("_nrm").alias("n_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v_a"), F.col("v_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cos = F.round(dot / (F.col("n_a") * F.col("n_b")), 5)
    # LEFT SEMI: a row is dropped iff SOME outranking neighbour passes
    # the threshold — the semi join stops probing a row's cell-mates at
    # its first such witness (no pair materialization, no distinct()),
    # which matters precisely where semantic duplication is dense.
    dropped = a.join(
        b,
        (a.cell == b.cell_b)
        & (F.col("id_a") != F.col("id_b"))
        & (
            (F.col("d_b") > F.col("d_a"))
            | ((F.col("d_b") == F.col("d_a")) & (F.col("id_b") < F.col("id_a")))
        )
        & (cos >= F.lit(float(threshold))),
        "left_semi",
    ).select(F.col("id_a").alias("_drop_id"))
    return (
        asg.join(dropped, asg.id == dropped._drop_id, "left")
        .select(
            F.col("id").alias("vec_id"),
            "cell",
            F.round("d2c", 6).alias("d2c"),
            F.col("_drop_id").isNull().alias("kept"),
        )
    )


def semdedup_oracle_sql(
    threshold: float = 0.35,
    n_cells: int = 8,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Exact DuckDB oracle for :func:`semdedup_keep` — same md5 centroid
    seeding, same strict-left-fold L2/cosine arithmetic (``list_reduce``
    folds match Spark's ``aggregate`` bitwise on these inputs), same
    (d2c DESC, id ASC) drop rule."""
    l2 = (
        "list_reduce(list_transform(list_zip({v}, {c}),"
        " pr -> (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))"
        " * (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))),"
        " (acc, x) -> acc + x)"
    )
    sq = (
        "sqrt(list_reduce(list_transform({v},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, y) -> acc + y))"
    )
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)),"
        " (acc, x) -> acc + x)"
    )
    return f"""
    WITH cents AS (
      SELECT {id_col} AS cid, {vec_col} AS ce
      FROM {table}
      ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
      LIMIT {int(n_cells)}
    ),
    asg0 AS (
      SELECT e.{id_col} AS id, e.{vec_col} AS vec, c.cid,
             {l2.format(v=f'e.{vec_col}', c='c.ce')} AS d,
             row_number() OVER (
               PARTITION BY e.{id_col}
               ORDER BY {l2.format(v=f'e.{vec_col}', c='c.ce')}, c.cid
             ) AS rn
      FROM {table} e CROSS JOIN cents c
    ),
    asg AS (SELECT id, vec, cid AS cell, d AS d2c FROM asg0 WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT a.id AS drop_id
      FROM asg a JOIN asg b ON a.cell = b.cell AND a.id != b.id
      WHERE round(
              {dot.format(a='a.vec', b='b.vec')}
              / ({sq.format(v='a.vec')} * {sq.format(v='b.vec')}), 5
            ) >= {float(threshold)}
        AND (b.d2c > a.d2c OR (b.d2c = a.d2c AND b.id < a.id))
    )
    SELECT asg.id AS vec_id, asg.cell, round(asg.d2c, 6) AS d2c,
           (dropped.drop_id IS NULL) AS kept
    FROM asg LEFT JOIN dropped ON asg.id = dropped.drop_id
    """
