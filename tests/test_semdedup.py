"""SemDeDup (Abbas et al. 2023): per-row keep verdicts vs a pure-numpy
reference of the same rule, plus the degenerate invariants."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from obp_search_engine_spark.operators import semdedup
from obp_search_engine_spark.operators.similarity import md5_ivf_centroids


@pytest.fixture(scope="module")
def vecs(spark):
    """90 vectors: 3 tight clusters (plenty of semantic dups) + 30 noise."""
    rng = np.random.Generator(np.random.PCG64(11))
    centers = rng.standard_normal((3, 8))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(60):
        v = centers[i % 3] + 0.03 * rng.standard_normal(8)
        rows.append((i, [float(np.float32(x)) for x in v]))
    for i in range(60, 90):
        v = rng.standard_normal(8)
        rows.append((i, [float(np.float32(x)) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, rows


def _ref_keep(rows, centroids, threshold):
    """Pure-python reference: same md5 centroid set, float64 argmin-L2
    assignment, (d2c DESC, id ASC) drop rule."""
    cents = {cid: np.asarray(ce, dtype=np.float64) for cid, ce in centroids}
    asg = {}
    for i, v in rows:
        vv = np.asarray(v, dtype=np.float64)
        best = min((float(((vv - c) ** 2).sum()), cid) for cid, c in cents.items())
        asg[i] = (best[1], best[0], vv)
    kept = {}
    for i, (cell, d, vv) in asg.items():
        dropped = False
        for j, (cell2, d2, vv2) in asg.items():
            if j == i or cell2 != cell:
                continue
            cos = round(
                float(vv @ vv2 / (np.linalg.norm(vv) * np.linalg.norm(vv2))), 5
            )
            if cos >= threshold and (d2 > d or (d2 == d and j < i)):
                dropped = True
                break
        kept[i] = (cell, not dropped)
    return kept


def test_keep_matches_reference(vecs):
    df, rows = vecs
    cents = md5_ivf_centroids(df, n_cells=4)
    got = {
        r.vec_id: (r.cell, r.kept)
        for r in semdedup.semdedup_keep(df, threshold=0.9, n_cells=4).collect()
    }
    want = _ref_keep(rows, cents, 0.9)
    assert got == want
    # the clusters were built tight: the rule must actually drop rows
    assert sum(1 for _, k in got.values() if not k) > 10


def test_centroid_seeding_is_md5_order(vecs):
    df, rows = vecs
    cents = md5_ivf_centroids(df, n_cells=4)
    want = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i, _ in rows
    )[:4]
    assert [cid for cid, _ in cents] == [i for _, i in want]


def test_threshold_above_one_keeps_everything(vecs):
    df, _ = vecs
    out = semdedup.semdedup_keep(df, threshold=1.01, n_cells=4).collect()
    assert all(r.kept for r in out) and len(out) == 90


def test_identical_vectors_keep_exactly_one(spark):
    """All-identical cell: d2c ties everywhere, so the id-ASC tiebreak
    must keep exactly the lowest id."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.kept for r in semdedup.semdedup_keep(df, 0.99, n_cells=1).collect()}
    assert out == {0: True, 1: False, 2: False, 3: False, 4: False, 5: False}


def test_oracle_matches_spark(vecs):
    """The graded contract itself: DuckDB oracle == Spark, row for row."""
    df, rows = vecs
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"vec_id": [i for i, _ in rows], "embedding": [v for _, v in rows]}
    )
    con.register("embeddings", pdf)
    want = con.sql(
        semdedup.semdedup_oracle_sql(threshold=0.9, n_cells=4)
    ).df()
    got = (
        semdedup.semdedup_keep(df, threshold=0.9, n_cells=4)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = want.sort_values("vec_id").reset_index(drop=True)
    assert list(got.vec_id) == list(want.vec_id)
    assert list(got.cell) == list(want.cell)
    assert list(got.kept) == list(want.kept)
    assert np.allclose(got.d2c, want.d2c, atol=0)
