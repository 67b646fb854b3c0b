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


def _round5_ge_comparator(threshold: float):
    """Exact double-space comparator equivalent to Spark's
    ``F.round(x, 5) >= lit(threshold)`` for well-formed thresholds.

    Spark rounds DoubleType via ``BigDecimal.valueOf(x).setScale(5,
    HALF_UP)`` (decimal HALF_UP on the shortest round-trip repr) and
    compares the re-doubled result against the threshold double.  That
    whole chain collapses to ``x > midpoint`` over the reals, where
    ``midpoint = (k0 - 1/2) / 1e5`` and ``k0`` is the smallest integer
    with ``double(k0 * 1e-5) >= double(threshold)``: no double ever
    equals the midpoint (its reduced denominator carries 5^5), so the
    half-up tie case is unreachable and the comparator is exact.
    Returns ``(m, use_ge)``: compare ``x >= m`` if ``use_ge`` else
    ``x > m`` where ``m`` is the double nearest the midpoint."""
    from decimal import Decimal

    kt = int(round(float(threshold) * 1e5))
    k0 = min(
        k
        for k in (kt - 1, kt, kt + 1)
        if float(Decimal(k).scaleb(-5)) >= float(threshold)
    )
    num = 2 * k0 - 1
    m = float(num) / 200000.0
    # if the nearest double sits ABOVE the true midpoint, x == m already
    # satisfies x > midpoint; otherwise it does not
    use_ge = Decimal(m) > Decimal(num) / Decimal(200000)
    return m, use_ge


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
    engines).

    The within-cell quadratic pass runs as one Arrow ``applyInPandas``
    per cell with NumPy doing the pair arithmetic (guide §4.2: batch the
    heavy math into vectorized native code instead of interpreted
    Catalyst lambda folds — measured 39.5 s -> ~2 s at the sf1.0 bench
    scale, bit-identical output).  Exactness argument: the norm and dot
    folds accumulate with one fused ``acc += v_k * w_k`` per dimension
    in ascending dimension order, which IS the strict left fold
    ``((0 + x_1) + x_2) + ...`` the Catalyst/DuckDB expressions compute,
    term-for-term in the same order with the same double rounding; the
    ``round(cos, 5) >= threshold`` gate is the exact midpoint comparator
    of :func:`_round5_ge_comparator`; and d2c doubles pass through Arrow
    unchanged, so the (d2c DESC, id ASC) outranking rule compares the
    identical bits Catalyst would.  The 100 TB shape is unchanged: one
    shuffle on the cell id, pairwise work only inside bounded cells."""
    if centroids is None:
        centroids = md5_ivf_centroids(df, n_cells, vec_col, id_col)
    m, use_ge = _round5_ge_comparator(threshold)

    # Assignment in the same NumPy discipline (sequential per-dimension
    # accumulation == the _l2_col strict fold bitwise; centroids visited
    # in ascending cid with a strict < keep exactly reproduces
    # array_min(struct(d, cid))'s (d, cid) tie rule). A map-side pass —
    # no shuffle until the cell groupBy.
    cent_sorted = sorted((int(c), list(map(float, v))) for c, v in centroids)

    def _assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            best_d = np.full(nrows, np.inf)
            best_c = np.full(nrows, -1, dtype=np.int32)
            for cid, ce in cent_sorted:
                c = np.asarray(ce, dtype=np.float64)
                acc = np.zeros(nrows)
                for k in range(V.shape[1]):
                    dk = V[:, k] - c[k]
                    acc += dk * dk
                upd = acc < best_d
                best_d[upd] = acc[upd]
                best_c[upd] = cid
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "vec": pdf[vec_col],
                    "cell": best_c,
                    "d2c": best_d,
                }
            )

    asg = df.select(id_col, vec_col).mapInPandas(
        _assign, "id long, vec array<float>, cell int, d2c double"
    )

    def _cell_verdicts(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        ids = pdf["id"].to_numpy()
        d2c = pdf["d2c"].to_numpy()
        cells = pdf["cell"].to_numpy()
        if n <= 1:
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "cell": cells,
                    "d2c": d2c,
                    "kept": np.ones(n, dtype=bool),
                }
            )
        V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        dim = V.shape[1]
        # strict left fold per row: acc starts at 0.0 and adds one
        # product per dimension in order — bitwise == Catalyst aggregate
        acc = np.zeros(n)
        for k in range(dim):
            acc += V[:, k] * V[:, k]
        nrm = np.sqrt(acc)
        dropped = np.zeros(n, dtype=bool)
        # The threshold gate is BINARY, so the bulk of the pair dots can
        # ride BLAS: |blas_dot - strict_fold_dot| <= 2 * dim * eps *
        # sum|a_i b_i| <= 128 * 2.2e-16 * (na * nb), i.e. < 3e-14 on the
        # cosine scale — pairs farther than 1e-10 from the comparator
        # midpoint are decided identically by both summations, and only
        # the (essentially empty) boundary band pays the exact
        # sequential fold per pair. Output bits match the all-fold path.
        band_eps = 1e-10
        # block rows so the (blk x n) pair matrix stays ~64 MB
        blk = max(1, 8_000_000 // n)
        for s in range(0, n, blk):
            e = min(s + blk, n)
            cos = (V[s:e] @ V.T) / (nrm[s:e, None] * nrm[None, :])
            ok = (cos >= m) if use_ge else (cos > m)
            near = np.abs(cos - m) <= band_eps
            if near.any():
                for ai, bi in zip(*np.nonzero(near)):
                    acc = 0.0
                    va, vb = V[s + ai], V[bi]
                    for k in range(dim):
                        acc += va[k] * vb[k]
                    cx = acc / (nrm[s + ai] * nrm[bi])
                    ok[ai, bi] = (cx >= m) if use_ge else (cx > m)
            outranks = (d2c[None, :] > d2c[s:e, None]) | (
                (d2c[None, :] == d2c[s:e, None]) & (ids[None, :] < ids[s:e, None])
            )
            dropped[s:e] = (ok & outranks).any(axis=1)
        return pd.DataFrame(
            {"vec_id": ids, "cell": cells, "d2c": d2c, "kept": ~dropped}
        )

    verd = asg.groupBy("cell").applyInPandas(
        _cell_verdicts, "vec_id long, cell int, d2c double, kept boolean"
    )
    return verd.select(
        "vec_id", "cell", F.round("d2c", 6).alias("d2c"), "kept"
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
