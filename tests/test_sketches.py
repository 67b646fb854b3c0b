"""HyperLogLog register sketches: parity against an independent
pure-Python HLL mirroring the documented md5/bucket/rank semantics, the
merge-equals-sketch-of-union theorem, DuckDB oracle agreement, and the
estimator's accuracy envelope."""

from __future__ import annotations

import hashlib
import random

import pytest

from obp_search_engine_spark.operators.sketches import (
    _alpha,
    hll_estimate,
    hll_merge,
    hll_oracle_sql,
    hll_registers,
)


def _py_registers(pairs, b=6):
    """Independent reference: dict (group, bucket) -> max_rank."""
    p = 32 - b
    pmax = p + 1
    out = {}
    for g, v in pairs:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        bucket = h >> p
        w = h % (1 << p)
        rank = pmax if w == 0 else pmax - w.bit_length()
        key = (g, bucket)
        out[key] = max(out.get(key, 0), rank)
    return out


def _rand_pairs(rng, n=400, groups=4, card=120):
    return [
        (f"g{rng.randrange(groups)}", rng.randrange(card)) for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [7, 23])
def test_registers_match_python_reference(spark, seed):
    pairs = _rand_pairs(random.Random(seed))
    df = spark.createDataFrame(pairs, "source string, doc_id long")
    got = {
        (r.source, r.bucket): r.max_rank
        for r in hll_registers(df, ["source"], "doc_id", b=6).collect()
    }
    assert got == _py_registers(pairs, b=6)


def test_merge_equals_sketch_of_union(spark):
    rng = random.Random(41)
    a = _rand_pairs(rng, n=300, card=200)
    b = _rand_pairs(rng, n=300, card=200)
    da = spark.createDataFrame(a, "source string, doc_id long")
    db = spark.createDataFrame(b, "source string, doc_id long")
    merged = {
        (r.source, r.bucket): r.max_rank
        for r in hll_merge(
            hll_registers(da, ["source"], "doc_id"),
            hll_registers(db, ["source"], "doc_id"),
        ).collect()
    }
    union = {
        (r.source, r.bucket): r.max_rank
        for r in hll_registers(
            da.unionByName(db), ["source"], "doc_id"
        ).collect()
    }
    assert merged == union


def test_estimate_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    pairs = _rand_pairs(random.Random(3), n=500, groups=3, card=300)
    df = spark.createDataFrame(pairs, "source string, doc_id long")
    got = sorted(
        (r.source, r.buckets_hit, r.z_scaled, r.est_hll)
        for r in hll_estimate(
            hll_registers(df, ["source"], "doc_id", b=6), ["source"], b=6
        ).collect()
    )
    vals = ", ".join(f"('{g}', {v})" for g, v in pairs)
    sql = hll_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(source, doc_id)",
        ["source"],
        "doc_id",
        b=6,
    )
    oracle = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == oracle  # including the DOUBLE column, bit-exact


def test_estimator_accuracy_envelope(spark):
    """Raw HLL at m=64 has sigma ~= 1.04/sqrt(64) = 13%; assert the
    estimate lands within 3 sigma of the true cardinality for a few
    true-distinct counts well past the small-range bias zone."""
    for card, seed in ((800, 1), (3000, 2)):
        rng = random.Random(seed)
        vals = [(("g"), rng.randrange(10**12)) for _ in range(card)]
        truth = len({v for _, v in vals})
        df = spark.createDataFrame(vals, "source string, doc_id long")
        est = hll_estimate(
            hll_registers(df, ["source"], "doc_id", b=6), ["source"], b=6
        ).collect()[0]
        assert abs(est.est_hll - truth) / truth < 3 * 1.04 / 8


def test_alpha_table():
    assert _alpha(64) == 0.709
    assert abs(_alpha(256) - 0.7213 / (1 + 1.079 / 256)) < 1e-12


# ---------------------------------------------------------------------------
# histogram quantile sketch
# ---------------------------------------------------------------------------
def test_hist_merge_equals_sketch_of_union(spark):
    from obp_search_engine_spark.operators.sketches import (
        hist_merge,
        hist_registers,
    )

    import random

    rng = random.Random(5)
    a = spark.createDataFrame([(rng.randrange(500),) for _ in range(400)], "v long")
    b = spark.createDataFrame([(rng.randrange(500),) for _ in range(300)], "v long")
    merged = {
        (r.bin, r.n) for r in hist_merge(
            hist_registers(a, "v"), hist_registers(b, "v")
        ).collect()
    }
    direct = {
        (r.bin, r.n)
        for r in hist_registers(a.unionByName(b), "v").collect()
    }
    assert merged == direct


def test_hist_quantiles_error_bound_and_reference(spark):
    from obp_search_engine_spark.operators.sketches import (
        hist_quantiles,
        hist_registers,
    )

    import random

    rng = random.Random(11)
    vals = [rng.randrange(1000) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    regs = hist_registers(df, "v", bin_width=16)
    got = {r.q_pct: r.est for r in hist_quantiles(regs, [50, 90, 99], 16).collect()}

    # independent python reference: same rank rule on the raw values
    svals = sorted(vals)
    for q in (50, 90, 99):
        rank = -(-q * len(svals) // 100)  # ceil
        true_val = svals[rank - 1]
        # estimate = midpoint of the bin holding the rank-th value
        assert got[q] == (true_val // 16) * 16 + 8
        assert abs(got[q] - true_val) <= 8  # bin_width/2 bound


def test_hist_quantiles_partitioning_invariant(spark):
    from obp_search_engine_spark.operators.sketches import (
        hist_quantiles,
        hist_registers,
    )

    import random

    rng = random.Random(23)
    df = spark.createDataFrame(
        [(rng.randrange(300),) for _ in range(500)], "v long"
    )
    a = hist_quantiles(hist_registers(df.repartition(1), "v"), [50, 90, 99]).collect()
    b = hist_quantiles(hist_registers(df.repartition(13), "v"), [50, 90, 99]).collect()
    assert sorted((r.q_pct, r.est) for r in a) == sorted((r.q_pct, r.est) for r in b)
