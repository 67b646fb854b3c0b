"""Curation operators (operators/curation.py): stratified top-k membership
and the packing invariants — bins contiguous and monotone, every closed bin
reaches the budget, documents never split, oversized docs isolated."""

from __future__ import annotations

from pyspark.sql import functions as F

from obp_search_engine_spark.operators.curation import (
    contamination_screen,
    domain_mix_resample,
    pack_by_token_budget,
    stratified_topk,
)


def test_stratified_topk_membership(spark):
    rows = [(i, "en" if i % 2 else "de", 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, n_chars int")
    got = stratified_topk(df, "lang", [F.col("n_chars").desc(), F.col("doc_id")], 2)
    by_lang = {}
    for r in got.collect():
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    # largest n_chars = smallest doc_id within each parity class
    assert sorted(by_lang["de"]) == [0, 2]
    assert sorted(by_lang["en"]) == [1, 3]


def test_packing_rows_frame_on_tied_order_keys(spark):
    # regression: the default RANGE frame gives all three tied rows cum=180
    # (peers included) -> preceding=120 -> every doc lands in bin 1 and bin
    # 0 is empty; the ROWS frame walks them 0/60/120 -> bins [0,0,1]
    df = spark.createDataFrame(
        [(1, "a", 60), (2, "a", 60), (3, "a", 60)],
        "doc_id int, grp string, n_tokens int",
    )
    out = pack_by_token_budget(df, "n_tokens", 100, [F.col("grp")])
    assert sorted(r.bin for r in out.collect()) == [0, 0, 1]


def test_packing_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id int, n_tokens int")
    try:
        pack_by_token_budget(df, "n_tokens", 0, [F.col("doc_id")])
        raise AssertionError("budget=0 must raise")
    except ValueError:
        pass


def test_domain_mix_resample_deterministic_and_weighted(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    out1 = domain_mix_resample(df, "lang", {"de": 0.0, "en": 0.5}, "doc_id")
    got1 = sorted(r.doc_id for r in out1.collect())
    # de fully dropped; en kept at ~50% (md5-uniform: loose 2-sided bound)
    assert all(i % 2 == 1 for i in got1)
    assert 350 < len(got1) < 650
    # pure function of (key, salt): identical on re-evaluation and under a
    # different partitioning
    got2 = sorted(
        r.doc_id
        for r in domain_mix_resample(
            df.repartition(7), "lang", {"de": 0.0, "en": 0.5}, "doc_id"
        ).collect()
    )
    assert got1 == got2
    # unknown domains fall back to default_weight
    kept_all = domain_mix_resample(df, "lang", {"xx": 0.5}, "doc_id").count()
    assert kept_all == 2000
    # NULL keys are dropped (NULL-propagating hash, matching the oracle's
    # || semantics), never lumped into one shared bucket
    with_null = spark.createDataFrame(
        [(None, "en"), (1, "en")], "doc_id int, lang string"
    )
    kept = domain_mix_resample(with_null, "lang", {}, "doc_id").collect()
    assert [r.doc_id for r in kept] == [1]
    try:
        domain_mix_resample(df, "lang", {"en": 1.5}, "doc_id")
        raise AssertionError("weight > 1 must raise")
    except ValueError:
        pass


def test_contamination_screen_flags_only_overlapping_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    bench = spark.createDataFrame(
        [(100, f"intro words {shared} trailing words here")],
        "doc_id int, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, f"prefix {shared} suffix tokens go here now"),  # contaminated
            (2, "totally different words with no overlap at all present"),
            (3, "short doc"),  # < 8 tokens: no grams at all
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.n_shared_grams for r in contamination_screen(docs, bench).collect()}
    assert set(got) == {1}
    assert got[1] == 1  # exactly the one shared 8-gram


def test_packing_invariants(spark):
    budget = 100
    toks = [30, 30, 30, 30, 250, 10, 95, 95, 5]  # includes an oversized doc
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id int, n_tokens int"
    )
    out = pack_by_token_budget(df, "n_tokens", budget, [F.col("doc_id")])
    rows = sorted((r.doc_id, r.n_tokens, r.bin) for r in out.collect())
    bins: dict[int, list[int]] = {}
    for _i, t, b in rows:
        bins.setdefault(b, []).append(t)
    ids = [b for (_i, _t, b) in rows]
    assert ids == sorted(ids), "bins must be monotone in pack order"
    # ids may skip after a doc larger than the budget (it spans several
    # budget multiples) but never elsewhere
    present = sorted(bins)
    for prev, nxt in zip(present, present[1:]):
        if nxt != prev + 1:
            assert max(bins[prev]) > budget, f"gap {prev}->{nxt} without oversized doc"
    # budget ALIGNMENT: each doc's bin is its preceding-token total // budget
    prefix = 0
    for _i, t, b in rows:
        assert b == prefix // budget
        prefix += t
    # every bin bounded by budget + its largest doc; totals average to
    # budget across closed spans
    for b, ts in bins.items():
        assert sum(ts) < budget + max(ts)
    big_bin = next(b for (_i, t, b) in rows if t == 250)
    assert sum(bins[big_bin]) >= 250  # oversized doc dominates its bin


def test_pack_distributed_equals_global(spark):
    """The two-level distributed packing must produce IDENTICAL bins to the
    single-global-window version whenever shard is a range bucket of the
    order key — the scale decomposition the global version's docstring
    promises. Also assert the plan's only single-partition exchange is the
    tiny n_shards offsets frame, not the corpus."""
    from pyspark.sql import functions as F

    from obp_search_engine_spark.operators.curation import (
        pack_by_token_budget,
        pack_by_token_budget_distributed,
    )

    rows = [(i, 37 + (i * 131) % 400) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    glob = pack_by_token_budget(df, "n_tokens", 1000, [F.col("doc_id")])
    dist = pack_by_token_budget_distributed(
        df.withColumn("_shard", F.floor(F.col("doc_id") / F.lit(50))),
        "n_tokens",
        1000,
        [F.col("doc_id")],
        "_shard",
    )
    g = {(r.doc_id): r.bin for r in glob.collect()}
    d = {(r.doc_id): r.bin for r in dist.collect()}
    assert d == g
    # AQE's toString prints Final AND Initial plans — count the final only
    plan = (
        dist._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange SinglePartition") <= 1, plan
