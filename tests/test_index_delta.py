"""Incremental inverted-index merge: the merge==rebuild theorem on
randomized corpora (adds, deletes, both), verbatim pass-through of
untouched terms, and term disappearance when its last postings die."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.ranking import (
    inverted_index,
    merge_index_delta,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]


def _docs(rng, ids):
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 12))))
        for i in ids
    ]


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("seed", [4, 29])
def test_merge_equals_batch_rebuild(spark, seed):
    rng = random.Random(seed)
    base = _docs(rng, range(0, 60))
    delta = _docs(rng, range(100, 125))
    deleted = [base[i] for i in range(0, 60, 7)]
    sch = "doc_id long, text string"
    bdf = spark.createDataFrame(base, sch)
    ddf = spark.createDataFrame(delta, sch)
    xdf = spark.createDataFrame(deleted, sch)
    merged = merge_index_delta(inverted_index(bdf), ddf, deleted_docs=xdf)
    gone = {d for d, _ in deleted}
    new_corpus = spark.createDataFrame(
        [r for r in base if r[0] not in gone] + delta, sch
    )
    assert _rows(merged) == _rows(inverted_index(new_corpus))


def test_delta_only_and_delete_only(spark):
    rng = random.Random(11)
    base = _docs(rng, range(0, 40))
    sch = "doc_id long, text string"
    bdf = spark.createDataFrame(base, sch)
    idx = inverted_index(bdf)
    # delta only
    delta = _docs(rng, range(50, 70))
    ddf = spark.createDataFrame(delta, sch)
    merged = merge_index_delta(idx, ddf)
    assert _rows(merged) == _rows(
        inverted_index(spark.createDataFrame(base + delta, sch))
    )
    # delete only (empty delta)
    deleted = base[:10]
    empty = spark.createDataFrame([], sch)
    merged2 = merge_index_delta(idx, empty, deleted_docs=spark.createDataFrame(deleted, sch))
    assert _rows(merged2) == _rows(
        inverted_index(spark.createDataFrame(base[10:], sch))
    )


def test_untouched_terms_pass_through_verbatim(spark):
    sch = "doc_id long, text string"
    base = [(1, "alpha beta"), (2, "alpha gamma"), (3, "rare alpha")]
    delta = [(9, "beta beta")]
    bdf = spark.createDataFrame(base, sch)
    idx = inverted_index(bdf)
    merged = merge_index_delta(idx, spark.createDataFrame(delta, sch))
    before = {r.term: tuple(r) for r in idx.collect()}
    after = {r.term: tuple(r) for r in merged.collect()}
    # terms not in the delta keep byte-identical rows
    for t in ("alpha", "gamma", "rare"):
        assert after[t] == before[t]
    assert after["beta"] != before["beta"]


def test_term_vanishes_when_last_posting_deleted(spark):
    sch = "doc_id long, text string"
    base = [(1, "unique alpha"), (2, "alpha")]
    bdf = spark.createDataFrame(base, sch)
    merged = merge_index_delta(
        inverted_index(bdf),
        spark.createDataFrame([], sch),
        deleted_docs=spark.createDataFrame([base[0]], sch),
    )
    terms = {r.term for r in merged.collect()}
    assert terms == {"alpha"}
    row = merged.filter(F.col("term") == "alpha").first()
    assert (row.df_docs, row.total_tf, row.postings) == (1, 1, "2:1")


# ---------------------------------------------------------------------------
# ANN (SRP) index delta maintenance — merge == rebuild theorem + the
# persisted partition-overwrite path rewriting only touched buckets
# ---------------------------------------------------------------------------
from obp_search_engine_spark.operators import similarity as sim


def _vecs(spark, ids, dim=8, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [(int(i), [float(x) for x in rng.standard_normal(dim)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_srp_merge_equals_batch_rebuild(spark):
    base = _vecs(spark, range(0, 60), seed=1)
    delta = _vecs(spark, range(60, 80), seed=2)
    deleted = spark.createDataFrame([(i,) for i in range(0, 60, 7)], "vec_id long")
    base_idx = sim.assign_srp_buckets(base, n_planes=4, tables=2)
    merged = sim.merge_srp_index_delta(
        base_idx, delta, deleted_ids=deleted, n_planes=4, tables=2
    )
    surviving = base.join(deleted, "vec_id", "left_anti").unionByName(delta)
    rebuilt = sim.assign_srp_buckets(surviving, n_planes=4, tables=2)
    key = lambda r: (r.vec_id, r.tbl, r.bucket)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(map(key, rebuilt.collect()))


def test_srp_partition_overwrite_rewrites_only_touched_buckets(spark, tmp_path):
    import os
    import time

    path = str(tmp_path / "srp_index")
    base = _vecs(spark, range(0, 120), seed=3)
    sim.build_srp_index(base, path, n_planes=4, tables=2)

    def partition_dirs():
        out = {}
        for tbl in os.listdir(path):
            if not tbl.startswith("tbl="):
                continue
            for bkt in os.listdir(f"{path}/{tbl}"):
                if bkt.startswith("bucket="):
                    d = f"{path}/{tbl}/{bkt}"
                    out[(tbl, bkt)] = max(
                        os.path.getmtime(f"{d}/{f}") for f in os.listdir(d)
                        if f.endswith(".parquet")
                    )
        return out

    before = partition_dirs()
    time.sleep(1.1)  # mtime resolution guard
    delta = _vecs(spark, range(200, 208), seed=4)
    deleted = spark.createDataFrame([(5,), (17,)], "vec_id long")
    # build_srp_index uses seeded Gaussian planes (seed=42, seed+t per
    # table) — the delta path must use the same planes
    sim.overwrite_srp_index_partitions(
        spark, path, delta, deleted_ids=deleted, n_planes=4, tables=2
    )
    after = partition_dirs()

    # expected touched partitions: delta rows' buckets + deleted ids' buckets
    touched_idx = sim.assign_srp_buckets(delta, n_planes=4, tables=2)
    base_idx = sim.assign_srp_buckets(base, n_planes=4, tables=2)
    del_parts = base_idx.join(deleted, "vec_id", "left_semi").select("tbl", "bucket")
    exp_touched = {
        (f"tbl={r.tbl}", f"bucket={r.bucket}")
        for r in touched_idx.select("tbl", "bucket").union(del_parts).distinct().collect()
    }
    changed = {k for k in after if k not in before or after[k] > before[k]}
    assert changed == {k for k in exp_touched}
    # untouched partitions: same files, untouched mtimes
    for k in before:
        if k not in exp_touched:
            assert after[k] == before[k], f"untouched partition {k} was rewritten"

    # content theorem on the persisted table too
    surviving = base.join(deleted, "vec_id", "left_anti").unionByName(delta)
    rebuilt = sim.assign_srp_buckets(surviving, n_planes=4, tables=2)
    got = spark.read.parquet(path).select("vec_id", "tbl", "bucket")
    key = lambda r: (r.vec_id, r.tbl, r.bucket)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, rebuilt.collect()))


def test_ivf_merge_equals_fixed_centroid_rebuild(spark):
    base = _vecs(spark, range(0, 80), seed=6)
    delta = _vecs(spark, range(80, 100), seed=7)
    deleted = spark.createDataFrame([(i,) for i in range(0, 80, 9)], "vec_id long")
    from pyspark.sql import functions as F

    cents = sim.md5_ivf_centroids(base, n_cells=8)
    base_assigned = base.select(
        "vec_id", "embedding",
        sim.ivf_cell_col(F.col("embedding"), cents).alias("cell"),
    )
    merged = sim.merge_ivf_index_delta(
        base_assigned, delta, centroids=cents, deleted_ids=deleted
    )
    surviving = base.join(deleted, "vec_id", "left_anti").unionByName(delta)
    rebuilt = surviving.select(
        "vec_id", "embedding",
        sim.ivf_cell_col(F.col("embedding"), cents).alias("cell"),
    )
    key = lambda r: (r.vec_id, r.cell)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(map(key, rebuilt.collect()))
    # centroid FIXITY is the semantic point: retraining on the merged
    # corpus picks a different md5-seeded set, so merge != retrained-rebuild
    retrained = sim.md5_ivf_centroids(surviving, n_cells=8)
    assert {c for c, _ in retrained} != {c for c, _ in cents}
