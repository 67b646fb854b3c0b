"""Similarity search: brute-force correctness, LSH-ANN recall, near-dup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    """120 vectors in 3 tight clusters + noise (deterministic)."""
    rng = np.random.Generator(np.random.PCG64(7))
    centers = rng.standard_normal((3, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(120):
        c = centers[i % 3]
        v = c + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, rows


def _pure_cos(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_brute_force_matches_numpy(vecs):
    df, rows = vecs
    q = rows[0][1]
    got = similarity.brute_force_topk(df, q, k=10).collect()
    want = sorted(
        ((round(_pure_cos(q, v), 5), i) for i, v in rows),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r.vec_id, r.cos) for r in got] == [(i, pytest.approx(c, abs=1e-5)) for c, i in want]


def test_lsh_ann_recall(vecs):
    df, rows = vecs
    q = rows[3][1]
    exact = [r.vec_id for r in similarity.brute_force_topk(df, q, k=10).collect()]
    ann = [r.vec_id for r in similarity.lsh_ann_topk(df, q, k=10, n_planes=6, tables=4).collect()]
    recall = len(set(exact) & set(ann)) / 10
    assert recall >= 0.8, f"ANN recall {recall}: {ann} vs {exact}"


def test_embedding_neardup_subset_of_bruteforce(vecs):
    df, rows = vecs
    thr = 0.95
    got = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardup_pairs(df, threshold=thr, n_planes=6).collect()
    }
    byid = dict(rows)
    # precision 1: every reported pair is genuinely >= threshold
    for a, b in got:
        assert _pure_cos(byid[a], byid[b]) >= thr - 1e-9
    # recall: same-bucket probability for ~0.96-cos pairs with 6 planes is
    # ~(1 - angle/pi)^6 ~ 0.57 in expectation; require a healthy fraction
    ids = sorted(byid)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _pure_cos(byid[a], byid[b]) >= thr
    }
    assert got <= brute
    assert len(brute) > 100
    assert len(got) >= 0.3 * len(brute), f"{len(got)}/{len(brute)}"


def test_ivf_ann_recall(vecs):
    df, rows = vecs
    q = rows[5][1]
    exact = [r.vec_id for r in similarity.brute_force_topk(df, q, k=10).collect()]
    index = similarity.ivf_index(df, n_cells=6)
    ann = [
        r.vec_id
        for r in similarity.ivf_ann_topk(df, q, k=10, nprobe=2, index=index).collect()
    ]
    recall = len(set(exact) & set(ann)) / 10
    # 3 tight clusters, 6 cells, 2 probes: the query's cluster is covered
    assert recall >= 0.9, f"IVF recall {recall}: {ann} vs {exact}"
    # determinism: same seed -> same assignment
    c1, _ = similarity.ivf_index(df, n_cells=6)
    c2, _ = similarity.ivf_index(df, n_cells=6)
    import numpy as np

    assert np.allclose(c1, c2)


def test_indexed_lsh_matches_inline_and_prunes(vecs, tmp_path):
    """The materialized (tbl, bucket)-partitioned index must return the
    same top-k as the inline bucket expression (same planes/seed => same
    candidate set) AND probe via partition pruning, not a full scan."""
    df, rows = vecs
    q = rows[3][1]
    path = str(tmp_path / "srp")
    similarity.build_srp_index(df, path, n_planes=6, tables=4)
    spark = df.sparkSession
    inline = [r.vec_id for r in similarity.lsh_ann_topk(df, q, k=10, n_planes=6, tables=4).collect()]
    indexed = similarity.lsh_ann_topk_indexed(spark, path, q, k=10, n_planes=6, tables=4)
    assert [r.vec_id for r in indexed.collect()] == inline

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "EvalPython" not in plan


def test_indexed_ivf_matches_inline(vecs, tmp_path):
    df, rows = vecs
    q = rows[5][1]
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(df, path, n_cells=6)
    spark = df.sparkSession
    inline = [
        r.vec_id
        for r in similarity.ivf_ann_topk(
            df, q, k=10, nprobe=2, index=similarity.ivf_index(df, n_cells=6)
        ).collect()
    ]
    indexed = similarity.ivf_ann_topk_indexed(spark, path, q, k=10, nprobe=2)
    assert [r.vec_id for r in indexed.collect()] == inline
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan


def test_auto_planes_scales_with_corpus():
    assert similarity.auto_planes(1_000) == 4
    assert similarity.auto_planes(1_000_000) == 10
    assert similarity.auto_planes(10_000_000_000) == 24  # ~10^10: 16M buckets
    # monotone non-decreasing
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9, 10**11):
        p = similarity.auto_planes(n)
        assert p >= prev
        prev = p


def test_scoring_stays_jvm_side(vecs):
    df, rows = vecs
    plan = (
        similarity.brute_force_topk(df, rows[0][1], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k without a full sort


def test_md5_lsh_topk_recall_and_selfhit(vecs):
    df, rows = vecs
    q = rows[0][1]
    got = similarity.lsh_ann_topk_md5(df, q, k=10, n_planes=4, tables=2).collect()
    # the query vector itself is in the corpus -> must be rank 1, cos 1.0
    assert got[0].vec_id == 0 and got[0].cos == pytest.approx(1.0, abs=1e-5)
    # recall vs brute force: cluster structure means bucket-mates are the
    # true neighbors; require >= 6/10 overlap (2 tables x 4 planes)
    brute = {r.vec_id for r in similarity.brute_force_topk(df, q, k=10).collect()}
    assert len(brute & {r.vec_id for r in got}) >= 6


def test_md5_lsh_candidates_subset_scored_exactly(vecs):
    # every returned cos must equal the brute-force cos for that id
    # (candidates are a subset; scoring inside buckets is exact)
    df, rows = vecs
    q = rows[3][1]
    full = {r.vec_id: r.cos for r in similarity.brute_force_topk(df, q, k=120).collect()}
    for r in similarity.lsh_ann_topk_md5(df, q, k=10).collect():
        assert r.cos == full[r.vec_id]


def test_md5_sign_planes_portable():
    # the Spark-side sign derivation must equal the oracle's SQL formula
    import duckdb

    planes = similarity.md5_sign_planes(dim=8, n_planes=3, table=1)
    con = duckdb.connect()
    sql = (
        "SELECT p.p, j.j, CASE WHEN ('0x' || substr(md5(1 || '_' || p.p || '_' || j.j), 1, 8))::BIGINT & 1 = 1 "
        "THEN 1.0 ELSE -1.0 END AS s FROM range(3) p(p), range(8) j(j)"
    )
    for p, j, s in con.execute(sql).fetchall():
        assert planes[int(p), int(j)] == float(s)


def test_md5_ivf_topk_selfhit_and_exact_scoring(vecs):
    df, rows = vecs
    q = rows[0][1]
    got = similarity.ivf_ann_topk_md5(df, q, k=10, nprobe=4, n_cells=8).collect()
    assert got[0].vec_id == 0 and got[0].cos == pytest.approx(1.0, abs=1e-5)
    # nprobe=n_cells degenerates to the exact brute-force answer
    all_cells = similarity.ivf_ann_topk_md5(df, q, k=10, nprobe=8, n_cells=8).collect()
    brute = similarity.brute_force_topk(df, q, k=10).collect()
    assert [(r.vec_id, r.cos) for r in all_cells] == [(r.vec_id, r.cos) for r in brute]


def test_md5_ann_jvm_only(vecs):
    # graded path must stay whole-stage JVM: no Python UDF eval nodes
    df, rows = vecs
    q = rows[0][1]
    for plan_df in (
        similarity.lsh_ann_topk_md5(df, q, k=5),
        similarity.ivf_ann_topk_md5(df, q, k=5, n_cells=4, nprobe=2),
    ):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_md5_neardup_pairs_match_python_reference(vecs):
    """embedding_neardup_pairs_md5 == an independent Python reference:
    buckets from the same md5-Rademacher signs (strict left-fold sign
    test), candidates = same bucket in any table, exact cosine filter.
    Note float32 storage: the reference must fold the float32-rounded
    coordinates, like both engines do."""
    df, rows = vecs
    thr, n_planes, tables = 0.9, 4, 2
    got = {
        (r.id_a, r.id_b): r.cos
        for r in similarity.embedding_neardup_pairs_md5(
            df, threshold=thr, n_planes=n_planes, tables=tables
        ).collect()
    }

    f32 = {i: [float(np.float32(x)) for x in v] for i, v in rows}
    buckets = {}  # (table, id) -> bucket
    for t in range(tables):
        planes = similarity.md5_sign_planes(16, n_planes, table=t)
        for i, v in f32.items():
            b = 0
            for p in range(n_planes):
                acc = 0.0
                for x, y in zip(v, planes[p]):
                    acc = acc + x * y
                if acc >= 0:
                    b |= 1 << p
            buckets[(t, i)] = b
    ref = {}
    ids = sorted(f32)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if any(buckets[(t, a)] == buckets[(t, b)] for t in range(tables)):
                c = round(_pure_cos(f32[a], f32[b]), 5)
                if c >= thr:
                    ref[(a, b)] = c
    assert got == ref
    assert len(got) > 0  # clustered fixture must produce near-dup pairs


# ---------------------------------------------------------------------------
# MMR diversified re-ranking
# ---------------------------------------------------------------------------


def _py_mmr(vecs, query, k, pool, lam):
    """Pure-Python greedy MMR mirroring the documented recipe: rel/sim
    rounded to 5, combination to 6, ties by id."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 5)

    rel = {i: cos(v, query) for i, v in vecs.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    out, sel = [], []
    for step in range(1, k + 1):
        if not sel:
            scored = [(round(lam * rel[i], 6), None, i) for i in cand]
        else:
            scored = []
            for i in cand:
                if i in sel:
                    continue
                ms = max(cos(vecs[i], vecs[s]) for s in sel)
                scored.append(
                    (round(lam * rel[i] - (1 - lam) * ms, 6), ms, i)
                )
        scored.sort(key=lambda t: (-t[0], t[2]))
        mmr, ms, i = scored[0]
        out.append((step, i, rel[i], ms, mmr))
        sel.append(i)
    return out


def test_mmr_matches_python_reference(spark):
    import random

    from obp_search_engine_spark.operators.similarity import mmr_rerank

    rng = random.Random(3)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)
    }
    query = [rng.uniform(-1, 1) for _ in range(8)]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # cast to float32 like the real table, then read back the exact
    # float32 values for the reference
    f32 = {
        r.vec_id: [float(x) for x in r.embedding] for r in df.collect()
    }
    want = _py_mmr(f32, query, k=5, pool=12, lam=0.7)
    got = [
        (r.step, r.vec_id, r.rel, r.maxsim, r.mmr)
        for r in mmr_rerank(df, query, k=5, pool=12, lam=0.7).collect()
    ]
    assert got == want


def test_mmr_diversifies_duplicate_cluster(spark):
    """Three near-identical top-relevance vectors: pure relevance would
    return all three first; MMR must interleave the diverse vector."""
    from obp_search_engine_spark.operators.similarity import mmr_rerank

    # query NOT colinear with the duplicate cluster (when it is, maxsim
    # equals rel and MMR stays monotone in relevance — no reordering is
    # possible at step 2, by algebra): cluster a0/a1 at rel~0.898 with
    # sim(a0,a1)~1, diverse b at rel~0.79 with sim(b,a0)~0.44; at
    # lam=0.7 mmr(b)=0.42 > mmr(a1)=0.33
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0]),
        (2, [0.44, 0.9, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [0.9, 0.44, 0.0]
    got = [
        r.vec_id
        for r in mmr_rerank(df, q, k=3, pool=3, lam=0.7).collect()
    ]
    # doc1's tiny y-component makes it the most relevant; MMR then
    # promotes the diverse doc2 over the near-duplicate doc0
    assert got == [1, 2, 0]
    from obp_search_engine_spark.operators.similarity import brute_force_topk

    rel_order = [r.vec_id for r in brute_force_topk(df, q, k=3).collect()]
    assert rel_order == [1, 0, 2]   # pure relevance keeps the duplicate 2nd


def test_mmr_step1_is_top_relevance_and_validation(spark):
    import pytest as _pytest

    from obp_search_engine_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    rows = [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [1.0, 0.5, 0.25]
    top1 = brute_force_topk(df, q, k=1).first().vec_id
    first = mmr_rerank(df, q, k=2, pool=8).orderBy("step").first()
    assert first.vec_id == top1 and first.maxsim is None
    with _pytest.raises(ValueError):
        mmr_rerank(df, q, k=5, pool=3)
