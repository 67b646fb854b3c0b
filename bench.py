"""Headline benchmark: crawl throughput + query latencies at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "frontier_urls_per_sec", "value": N, "unit": "sec"?, ...}

The headline metric matches BASELINE.json: frontier URLs processed/sec by
the scale-mode crawl (synthetic pages corpus, seen-set anti-join dedup,
per-host budget + salting). Query timings for the SURVEY.md §2 surface run
on the driver's sf tables.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# crawl corpus sizing: ~240k pages keeps the whole bench run a few minutes
CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "240000"))
CRAWL_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "512"))
CRAWL_ROUNDS = int(os.environ.get("BENCH_CRAWL_ROUNDS", "5"))
# seen-set mode: 'auto' (default — adaptive escalation: exact anti-join
# while the frontier is below run_crawl's bloom_auto_threshold, sharded
# bloom probe past it, mirroring the 10^10 deployment where re-shuffling
# frontier hashes every round is the bottleneck), 'bloom' (force the probe),
# or 'exact' (force the anti-join)
SEEN_MODE = os.environ.get("BENCH_SEEN", "auto")

BENCH_QUERIES = [
    "filtered_join_agg",
    "top_tags",
    "window_dequeue",
    "ban_ratio",
    "group_collect_join",
    "anti_join_dedup",
    "dedup_exact_groups",
    "neardup_minhash_lsh",
    "ann_cosine_topk",
    "doc_quality_score",
    "search_listings_page",
    "event_window_counts",
    "event_sessions",
    # round-4 additions: exact-substring spans (single-pass rework),
    # span excision, md5-portable ANN probe, CC clustering
    "dup_substring_spans",
    "dup_substring_excise",
    "ann_lsh_topk_md5",
    "dedup_cluster_labels",
    "host_pagerank",
    # round-4 (cont. 3) additions: search-side ranking + BFS frontier depths
    "search_bm25_topk",
    "inverted_index_postings",
    "link_bfs_depths",
    # round-4 (cont. 4) additions: temporal joins + rollup
    "asof_join_events",
    "range_join_window_counts",
    "event_rollup",
    # round-4 (cont. 5) additions: pointer-doubling redirects + budget alloc
    "redirect_resolution",
    "crawl_budget_alloc",
    "anchor_text_topk",
    # round-4 (cont. 6) additions: recrawl diff, HLL sketch, integer HITS
    "snapshot_change_detection",
    "host_distinct_hll",
    "link_hits",
    "cms_term_freq",
    "doc_lm_perplexity",
    # round-4 (cont. 8) additions: graph structure (triangles, k-core,
    # label prop), retrieval (boolean AND, phrase), weighted sampling,
    # rendezvous sharding, df-pruned index
    "link_triangle_counts",
    "link_kcore",
    "link_label_propagation",
    "search_boolean_and",
    "search_phrase",
    "weighted_sample_k",
    "shard_rendezvous",
    "index_df_pruned",
    # round-4 (cont. 10) additions: SALSA, spam mass, bow-tie structure,
    # CCNet paragraph dedup, Gopher/C4 quality gates
    "link_salsa",
    "link_spam_mass",
    "web_bowtie_structure",
    "par_dedup_corpus",
    "gopher_quality_flags",
    "c4_line_clean",
    # round-4 (cont. 11) additions: fielded BM25F, HyperBall-based
    # harmonic centrality, large-star/small-star CC (RRF / focused-crawl
    # / canonical-doc entries compose shapes already benched above)
    "search_bm25f",
    "link_harmonic_centrality",
    "dedup_cluster_labels_twostar",
    # round-5 additions: learned BPE merges, ANN index delta maintenance,
    # positional-index phrase + proximity search
    "bpe_train_merges",
    "ann_index_delta",
    "search_phrase_indexed",
    "search_proximity_pairs",
    "ccnet_pipeline",
    "search_eval_ndcg",
    # round-5 (cont.) additions: query-assist family — SymSpell
    # deletion-neighborhood spell suggest, prefix autocomplete index,
    # document-PMI related terms
    "search_spell_suggest",
    "search_autocomplete",
    "search_related_pmi",
    "search_serve_pipeline",
    "autocomplete_index_delta",
    "webgraph_gap_encoding",
    "shard_selection_cori",
    "search_query_likelihood",
    "search_rm3_expansion",
    "search_sdm",
    "index_quantized_impacts",
    "search_quantized_topk",
    # round-5 (cont.) additions: embedding-space semantic dedup and
    # DSIR importance resampling — the two curation operators closing
    # the distributional-match gap next to the absolute-quality filters
    "semdedup_keep",
    "dsir_resample_topk",
    "doc_stupid_backoff",
    # round-5 (cont.) additions: click-model family over the md5 session
    # log, LTR serving, clustering coefficient, and the
    # pruned/tiered/sampled serving structures (block-max, champion
    # lists, ReDDE) + the UCB1 crawl-host bandit
    "click_model_pbm_ctr",
    "click_model_cascade",
    "click_model_dcm_ctr",
    "click_model_sdbn_sat",
    "search_ltr_linear",
    "link_clustering_coeff",
    "search_bm25_blockmax",
    "index_champion_lists",
    "search_champion_topk",
    "shard_selection_redde",
    "crawl_host_bandit_ucb1",
    "search_qpp_preretrieval",
    "search_query_reformulations",
    "search_related_queries_coclick",
    "search_mmr_rerank",
    # round-5 (cont.) additions: UBM click model, personalized PageRank,
    # RFC 9309 robots gate, team-draft interleaving, click-graph walk,
    # LRU cache curve
    "click_model_ubm_ctr",
    "link_ppr",
    "robots_rules_eval",
    "search_eval_interleaving",
    "click_graph_walk",
    "cache_lru_hit_curve",
    "query_intent_classes",
    "search_xquad_rerank",
    "search_eval_alpha_ndcg",
    "search_rank_fusion_borda",
    "search_eval_bootstrap",
    "index_docid_assignment",
    "crawl_cloaking_detect",
    "sitemap_coverage_audit",
    "crawl_makespan_plan",
    "link_assortativity",
    "serp_host_crowding",
    "url_front_coding",
    # round-5 (final) additions: EF-vs-varint codec table, ranker-delta
    # Kendall tau, Heaps-law dictionary growth
    "index_elias_fano_size",
    "search_eval_kendall_tau",
    "corpus_heaps_curve",
    "search_qpp_postretrieval",
    "corpus_zipf_octaves",
    "index_codec_decision",
    "crawl_soft404_detect",
]


# Telemetry bracketing the graded run: /proc/stat steal/iowait over the
# bench window plus a one-shot memory-bus probe GB/s before and after.
# This host shows documented 60% same-config swings (hypervisor steal +
# bus throttling); with these fields in the graded artifact a headline
# swing like round-3's -16% is adjudicatable from the JSON alone instead
# of by conjecture. (Shared impl lives in the package — this file shadows
# the bench/ directory, so bench/run_crawl.py is not importable here.)
from obp_search_engine_spark.telemetry import host_telemetry as _host_telemetry
from obp_search_engine_spark.telemetry import proc_stat as _proc_stat


def _host_window() -> dict:
    return {"stat": _proc_stat(), "t": time.monotonic()}


def _bus_probe_gbps() -> float | None:
    try:
        from tools.scaling_pair import bw_probe

        return round(bw_probe(procs=8, secs=2.0), 1)
    except Exception:
        return None


def main() -> None:
    t_setup = time.monotonic()
    from obp_search_engine_spark.operators.checkpoint import run_crawl
    from obp_search_engine_spark.session import get_spark
    from obp_search_engine_spark.sources.pages import (
        PAGES_SCHEMA_REV,
        bucketed_pages_table,
        synth_pages_df,
        url_of,
    )
    from obp_search_engine_spark.plans.testdata_queries import REGISTRY
    from obp_search_engine_spark.plans import api_queries  # noqa: F401
    from obp_search_engine_spark.plans import pipeline_queries  # noqa: F401

    spark = get_spark(
        "bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, int(CPUS)),
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/derby",
        },
    )

    results: dict[str, float] = {}

    # --- crawl throughput (the BASELINE.json headline) ---
    # deployment shape: url-BUCKETED pages table (co-located fetch join, no
    # pages shuffle / driver broadcast) + sharded BLOOM seen-set dedup —
    # the configuration the 10^10 design actually ships with.
    # corpus cache keyed by (schema-rev, size, hosts, seed): a generator
    # change bumps PAGES_SCHEMA_REV and invalidates stale caches instead
    # of silently reusing them (VERDICT r04 next-round #5)
    CRAWL_SEED = 42
    key = f"{PAGES_SCHEMA_REV}_{CRAWL_PAGES}_{CRAWL_HOSTS}_s{CRAWL_SEED}"
    pages_path = f"/tmp/bench_pages_{key}"
    if not os.path.exists(pages_path):
        synth_pages_df(spark, CRAWL_PAGES, CRAWL_HOSTS, seed=CRAWL_SEED).write.mode(
            "overwrite"
        ).parquet(pages_path)
    # 128 buckets (4x cores): with buckets == cores one straggler bucket
    # sets the round wall; 2-4x gives the scheduler task smoothing
    pages = bucketed_pages_table(
        spark,
        spark.read.parquet(pages_path),
        f"bench_pages_b128_{key}",
        n_buckets=128,
    )
    seeds = [url_of(i, CRAWL_SEED, CRAWL_HOSTS) for i in range(2048)]

    # telemetry window opens HERE — after session startup and corpus
    # setup — so host.steal_pct measures the graded crawl+queries only
    # (a steal burst diluted by a clean setup minute must not read clean)
    bus_before = _bus_probe_gbps()
    win_start = _host_window()
    # true setup cost: session startup + corpus build/load, i.e. everything
    # BEFORE the telemetry window. (Through round 4 the field named
    # setup_sec recorded the WHOLE main() wall — r04's "251.3 s setup" was
    # actually 15.6 s of setup plus the 235.7 s graded window; the totals
    # now live in run_sec.)
    setup_sec = round(win_start["t"] - t_setup, 1)

    t0 = time.monotonic()
    crawl = run_crawl(
        spark,
        pages,
        seeds=seeds,
        rounds=CRAWL_ROUNDS,
        per_host_budget=20000,
        hot_host_salts=8,
        # auto: small waves broadcast (no shuffle at all against the
        # bucketed table), big waves fall back to the co-located bucketed
        # join (only the wave shuffles — pages never does)
        broadcast_batch="auto",
        use_bloom_seen={"bloom": True, "exact": False, "auto": "auto"}[SEEN_MODE],
        extract_documents=True,  # full round incl. byte-identical text
        discard_harvest=True,  # benchmark spill is dead weight once counted
    )
    crawl_wall = time.monotonic() - t0
    # headline = steady-state throughput: drop round 1 (JIT + page-cache
    # warmup dominates it), aggregate the rest
    steady = crawl["per_round"][1:] or crawl["per_round"]
    sv = sum(r["visited"] for r in steady)
    sw = sum(r["wall_sec"] for r in steady)
    urls_per_sec = sv / sw if sw else 0.0
    results["crawl_urls_per_sec"] = round(urls_per_sec, 1)
    results["crawl_visited"] = crawl["visited"]
    results["crawl_frontier"] = crawl["frontier_size"]

    # --- query latencies on the driver tables ---
    # neardup_minhash_lsh: the registry entry now grades the md5-portable
    # hash variant; the bench times the xxhash64 scale path. NOTE on
    # round-over-round comparability: the round-3 closure fix changed
    # xxhash64 minhash SEMANTICS (pre-fix, a defaulted-lambda-param bug
    # made all 32 signature slots identical — degenerate single-band LSH),
    # so round-3+ latencies for this query are the first real banded-LSH
    # numbers and are NOT comparable to rounds 1-2.
    def _minhash_xxhash(s, sf):
        from obp_search_engine_spark.operators import dedup

        return dedup.minhash_lsh_pairs(
            s.read.parquet(f"{sf}/documents.parquet"), threshold=0.3
        )

    # keys are self-describing where the timed plan differs from the graded
    # registry entry: neardup_minhash_lsh_xxhash64 IS the substitution
    # marker (the graded entry runs the md5-portable variant; the bench
    # times the xxhash64 scale path) — BENCH_r0N.json consumers comparing
    # across rounds see the variant in the key itself
    overrides = {"neardup_minhash_lsh": ("neardup_minhash_lsh_xxhash64", _minhash_xxhash)}
    queries: dict[str, float] = {}
    for name in BENCH_QUERIES:
        out_key, fn = overrides.get(name) or (name, REGISTRY[name].fn)
        fn(spark, SF_DIR).limit(1).collect()  # warm (plan + scan caches)
        t0 = time.monotonic()
        # noop sink: materializes every row/column without driver collect
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        queries[out_key] = round(time.monotonic() - t0, 3)

    win_end = _host_window()
    host = _host_telemetry(win_start["stat"], win_end["stat"])
    host["window_sec"] = round(win_end["t"] - win_start["t"], 1)
    host["bus_probe_gbps"] = {"before": bus_before, "after": _bus_probe_gbps()}

    out = {
        "metric": "frontier_urls_per_sec",
        "value": results["crawl_urls_per_sec"],
        "unit": "urls/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "crawl": {
            "pages": CRAWL_PAGES,
            "hosts": CRAWL_HOSTS,
            "rounds": CRAWL_ROUNDS,
            "visited": crawl["visited"],
            "frontier_size": crawl["frontier_size"],
            "wall_sec": round(crawl_wall, 2),
            "steady_visited": sv,
            "steady_wall_sec": round(sw, 2),
            "per_round_urls_per_sec": [round(r["urls_per_sec"], 1) for r in crawl["per_round"]],
        },
        "cpus": int(CPUS),
        "host": host,
        "seen_mode": SEEN_MODE,
        "setup_sec": setup_sec,
        "run_sec": round(time.monotonic() - t_setup, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
