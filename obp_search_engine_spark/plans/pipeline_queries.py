"""Training-data pipeline queries over documents/embeddings — the
100 TB-corpus operators (dedup, similarity, text analysis) with DuckDB
oracles where SQL-expressible; LSH/hash families are rows-only here and
property-tested against exact oracles in tests/test_dedup.py /
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import textstats as ts
from ..operators import dedup, graph, scheduling, similarity
from .testdata_queries import QuerySpec, _t, register

def _graded_tmpdir(name: str) -> str:
    """Per-entry scratch dir under /tmp, wiped on entry: repeated runs in
    one Spark app REUSE the path instead of stranding a fresh mkdtemp each
    run (this host has an ENOSPC history). The path is suffixed with the
    Spark applicationId so a driver grading run and a concurrent
    check_oracle run (separate apps) cannot rmtree each other's live
    checkpoint mid-query; per-app reuse keeps the no-strand property. The
    returned DataFrames stay readable until the caller collects because
    the wipe happens before the new run's writes, never after."""
    import os
    import shutil

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    app = spark.sparkContext.applicationId if spark is not None else "noapp"
    path = f"/tmp/graded_{name}_{app}"
    # reap siblings from finished apps (mtime > 2 h — graded queries run
    # seconds) so the per-app suffix can't re-grow into the ENOSPC strand
    import glob
    import time

    # the bare path is the pre-round-4 scheme (no app suffix) — reap it too
    for old in glob.glob(f"/tmp/graded_{name}_*") + [f"/tmp/graded_{name}"]:
        if old != path:
            try:
                if time.time() - os.path.getmtime(old) > 7200:
                    shutil.rmtree(old, ignore_errors=True)
            except OSError:
                pass
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


# ---------------------------------------------------------------------------
# text analysis (all JVM-side; full oracles)
# ---------------------------------------------------------------------------
@register(
    "doc_token_stats",
    r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           length(text) AS n_chars_measured,
           round(len(list_distinct(string_split_regex(trim(text), '\s+')))
                 / len(string_split_regex(trim(text), '\s+')), 6) AS distinct_ratio
    FROM documents
    """,
    "token counting + lexical diversity per document (JVM split/size)",
)
def q_doc_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = ts.tokens_col(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("distinct_ratio"),
    )


@register(
    "doc_quality_score",
    r"""
    SELECT doc_id,
           round(
             0.4 * least(length(text) / 500.0, 1.0)
             + 0.4 * (len(list_distinct(string_split_regex(trim(text), '\s+')))
                      / len(string_split_regex(trim(text), '\s+')))
             + 0.2 * (1.0 - least(
                 2.0 * len(list_filter(string_split_regex(trim(text), '\s+'),
                           t -> t IN ('a', 'the', 'row', 'value', 'table')))
                     / len(string_split_regex(trim(text), '\s+')), 1.0)),
             6) AS quality
    FROM documents
    """,
    "composite quality score: length norm + lexical diversity + stop-token "
    "filler penalty (fixed weights, oracle-expressible)",
)
def q_doc_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.quality_score_col(F.col("text")).alias("quality"))


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    "document fingerprint: md5 of normalized text",
)
def q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.fingerprint_col(F.col("text")).alias("fp"))


@register(
    "lang_id_heuristic",
    """
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN contains(' ' || lower(text) || ' ', ' de ')
              AND contains(' ' || lower(text) || ' ', ' shi ')
              AND contains(' ' || lower(text) || ' ', ' le ') THEN 'zh'
             WHEN contains(' ' || lower(text) || ' ', ' el ')
              AND contains(' ' || lower(text) || ' ', ' que ')
              AND contains(' ' || lower(text) || ' ', ' los ') THEN 'es'
             WHEN contains(' ' || lower(text) || ' ', ' der ')
              AND contains(' ' || lower(text) || ' ', ' und ')
              AND contains(' ' || lower(text) || ' ', ' nicht ') THEN 'de'
             ELSE 'en'
           END AS lang_guess
    FROM documents
    """,
    "marker-token language-ID heuristic (deterministic scoring, no Python)",
)
def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        ts.lang_id_col(F.col("text")).alias("lang_guess"),
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------
@register(
    "bpe_token_estimate",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]')) AS n_bpe
    FROM documents
    """,
    "BPE-ish subword-count estimate (word-piece regex) for LLM token budgeting",
)
def q_bpe_token_estimate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.bpe_ish_token_estimate_col(F.col("text")).alias("n_bpe"))


@register(
    "set_ops",
    """
    SELECT user_id AS k, 'both' AS src FROM events
    INTERSECT
    SELECT c_custkey AS k, 'both' AS src FROM customer
    UNION ALL
    SELECT * FROM (
      SELECT c_custkey AS k, 'cust_only' AS src FROM customer WHERE c_custkey < 500
      EXCEPT
      SELECT user_id AS k, 'cust_only' AS src FROM events
    )
    """,
    "set operations (INTERSECT / UNION ALL / EXCEPT) over key domains "
    "(SURVEY §2.7: the frontier merge's union family)",
)
def q_set_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    cu = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    both = ev.intersect(cu).withColumn("src", F.lit("both"))
    cust_only = (
        cu.filter(F.col("k") < 500).exceptAll(ev).distinct().withColumn("src", F.lit("cust_only"))
    )
    return both.unionByName(cust_only)


@register(
    "dedup_exact_groups",
    r"""
    SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
    "exact dedup: fingerprint groupBy, keeper = min id",
)
def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


@register(
    "dedup_prefix_groups",
    r"""
    SELECT fp, min(doc_id) AS keep_id, count(*) AS n_docs
    FROM (
      SELECT doc_id,
             md5(array_to_string(
               string_split_regex(trim(lower(text)), '\s+')[1:8], ' ')) AS fp
      FROM documents
    )
    GROUP BY fp
    HAVING count(*) > 1
    """,
    "boilerplate-prefix dedup groups (first-8-token fingerprint)",
)
def q_dedup_prefix(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", ts.prefix_fingerprint_col(F.col("text"), 8).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "neardup_jaccard_exact",
    r"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 3
                  THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
             END AS shingles
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents WHERE doc_id < 150)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.08
    """,
    "exact 3-gram Jaccard near-dup pairs (bounded brute force; the oracle "
    "for the MinHash-LSH scale path)",
)
def q_neardup_jaccard_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return dedup.ngram_jaccard_pairs(d, threshold=0.08, n=3)


def _minhash_pairs_oracle(docs_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """Full md5-portable MinHash(32)+LSH(8 bands) pairs oracle over any
    (doc_id, text) relation — shared by neardup_minhash_lsh (documents)
    and neardup_incremental (the snapshot-B corpus: the incremental
    signature maintenance must equal a full recompute, so its oracle IS
    the full recompute)."""
    return rf"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 3
                  THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
             END AS shingles
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM ({docs_sql}) docs0)
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    mh AS (
      SELECT doc_id, i,
             min(('0x' || substr(md5(i::VARCHAR || ':' || s), 1, 8))::BIGINT) AS h
      FROM ex, range(32) t(i)
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mh GROUP BY doc_id),
    bk AS (
      SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], '-') AS bucket
      FROM sig, range(8) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bk x JOIN bk y
        ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
             AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b
    WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                / len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
          >= 0.3
    """


@register(
    "neardup_minhash_lsh",
    _minhash_pairs_oracle(),
    "MinHash(32)+LSH(8 bands) near-dup pairs, exact-Jaccard verified. "
    "Graded variant uses the portable md5-32 hash so DuckDB reproduces the "
    "EXACT signature/band/candidate pipeline (not just the output contract); "
    "the scale/bench default stays xxhash64 (identical plan shape, tested "
    "for recall vs brute force in pytest)",
)
def q_neardup_minhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, threshold=0.3, hash="md5")


# Shared by dedup_cluster_labels AND dedup_cluster_labels_twostar: the
# min-label CC result is algorithm-independent, so one recursive-CTE
# oracle grades both implementations (label-propagation and the SoCC'14
# alternating large-star/small-star) — the driver verifying two
# different distributed algorithms against the identical ground truth.
_CLUSTER_LABELS_ORACLE = r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 3
                  THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
             END AS shingles
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    mh AS (
      SELECT doc_id, i,
             min(('0x' || substr(md5(i::VARCHAR || ':' || s), 1, 8))::BIGINT) AS h
      FROM ex, range(32) t(i)
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mh GROUP BY doc_id),
    bk AS (
      SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], '-') AS bucket
      FROM sig, range(8) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bk x JOIN bk y
        ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
            >= 0.3
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, MIN(lab) AS cluster FROM reach GROUP BY node)
    SELECT d.doc_id, CAST(COALESCE(cc.cluster, d.doc_id) AS BIGINT) AS cluster
    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    """


@register(
    "dedup_cluster_labels",
    _CLUSTER_LABELS_ORACLE,
    "near-dup CLUSTERING: connected components over the md5-portable "
    "MinHash-LSH candidate pairs by distributed min-label propagation; "
    "cluster label = min doc_id in the component (algorithm-independent, "
    "hence exactly oracle-checkable via a DuckDB recursive CTE computing "
    "min-reachable-id); singletons label themselves. The reference's "
    "PK-dedup contract (crawler/db/mysql.go:293) lifted from exact keys "
    "to similarity clusters — keep min(doc_id) per cluster to dedup",
)
def q_dedup_cluster_labels(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.3, hash="md5").select(
        "id_a", "id_b"
    )
    labels = dedup.connected_components(
        pairs, nodes=d.select("doc_id")
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("cluster")
    ).orderBy("doc_id")


@register(
    "dedup_cluster_labels_twostar",
    _CLUSTER_LABELS_ORACLE,
    "the SAME near-dup clustering graded through a DIFFERENT distributed "
    "algorithm: alternating large-star/small-star CC (Kiveris et al., "
    "SoCC 2014) over the md5-portable MinHash-LSH pairs. Min-label CC is "
    "algorithm-independent, so the identical recursive-CTE oracle grades "
    "both — and unlike label propagation (O(diameter) rounds), two-star "
    "converges in O(log^2 n) rounds on ANY topology, the variant a "
    "10^10-node graph with redirect-chain components actually runs",
)
def q_dedup_cluster_labels_twostar(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.3, hash="md5").select(
        "id_a", "id_b"
    )
    labels = dedup.connected_components_twostar(
        pairs, nodes=d.select("doc_id")
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("cluster")
    ).orderBy("doc_id")


_PAGERANK_EDGES_CTE = """
  SELECT d.doc_id AS src,
         ('0x'||substr(md5(d.doc_id::VARCHAR||'#'||j::VARCHAR),1,8))::BIGINT
           % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents d, unnest(generate_series(1, (1 + d.doc_id % 4)::INT)) AS t(j)
"""


def _pagerank_edges(spark, sf_dir):
    """Deterministic md5-derived link graph over documents: each doc_id
    links to 1 + doc_id%4 pseudo-random targets — the Spark twin of
    _PAGERANK_EDGES_CTE (md5-portable hash pattern)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    deg = (F.col("doc_id") % 4 + 1).cast("int")
    return d.select(
        F.col("doc_id").alias("src"),
        F.explode(F.sequence(F.lit(1), deg)).alias("j"),
    ).select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit("#"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    )


@register(
    "host_pagerank",
    graph.pagerank_oracle_sql(_PAGERANK_EDGES_CTE, iters=5),
    "fixed-point integer PageRank (5 iterations, d=0.85) over a "
    "deterministic md5-derived link graph on documents — ranks carried as "
    "BIGINT mass units, so the result is bit-identical at ANY shuffle "
    "parallelism and engine (integer sums are associative; float PageRank "
    "is not reproducible), making the iterative operator exactly "
    "oracle-checkable via an unrolled DuckDB CTE chain. The web-scale "
    "upgrade of the reference's depth-then-discovery frontier ranking "
    "(crawler/crawler.go:116)",
)
def q_host_pagerank(spark, sf_dir):
    return graph.pagerank(_pagerank_edges(spark, sf_dir), iters=5)


_PPR_SEEDS = [0, 3, 7]


@register(
    "link_ppr",
    graph.personalized_pagerank_oracle_sql(
        _PAGERANK_EDGES_CTE, seeds=_PPR_SEEDS, iters=5
    ),
    "Personalized PageRank (Haveliwala WWW 2002) over the same "
    "md5-derived link graph, teleporting ONLY to a 3-host seed set: "
    "rank becomes link-proximity to the seeds, the focused-crawl "
    "frontier prior (Chakrabarti et al. 1999) complementing the NB "
    "topic classifier. Same fixed-point BIGINT discipline as "
    "host_pagerank (bit-identical at any parallelism, exact "
    "unrolled-CTE oracle); nodes unreachable from the seeds converge "
    "to 0 — the defining PPR property. The seed set compiles to an "
    "isin predicate, no extra join or broadcast",
)
def q_link_ppr(spark, sf_dir):
    return graph.personalized_pagerank(
        _pagerank_edges(spark, sf_dir), seeds=_PPR_SEEDS, iters=5
    )


@register(
    "frontier_opic_priority",
    graph.opic_oracle_sql(_PAGERANK_EDGES_CTE, rounds=4),
    "OPIC on-line page importance (Abiteboul, Preda & Cobéna, WWW 2003) "
    "— THE frontier-priority algorithm designed for crawling: integer "
    "cash diffuses one round per crawl round (cash div (deg+1) per "
    "out-link plus the paper's virtual node absorbing dangling mass), "
    "history accumulates, and importance ≈ history is available at ANY "
    "point of the crawl instead of after convergence. Same fixed-point "
    "BIGINT discipline as host_pagerank (bit-identical at any "
    "parallelism; exact unrolled-CTE oracle); the virtual node's cash "
    "rides a 1-row broadcast, never driver state",
)
def q_frontier_opic_priority(spark, sf_dir):
    return graph.opic(_pagerank_edges(spark, sf_dir), rounds=4)


@register(
    "link_degree_hist",
    f"""
    WITH e0 AS ({_PAGERANK_EDGES_CTE}),
    e1 AS (SELECT DISTINCT src, dst FROM e0 WHERE src != dst),
    nodes AS (SELECT src AS node FROM e1 UNION SELECT dst FROM e1),
    od AS (SELECT src AS node, COUNT(*) AS d FROM e1 GROUP BY src),
    idg AS (SELECT dst AS node, COUNT(*) AS d FROM e1 GROUP BY dst),
    outd AS (SELECT COALESCE(od.d, 0)::BIGINT AS degree
             FROM nodes LEFT JOIN od ON od.node = nodes.node),
    ind AS (SELECT COALESCE(idg.d, 0)::BIGINT AS degree
            FROM nodes LEFT JOIN idg ON idg.node = nodes.node)
    SELECT 'out' AS direction, degree, COUNT(*)::BIGINT AS n_nodes
    FROM outd GROUP BY degree
    UNION ALL
    SELECT 'in' AS direction, degree, COUNT(*)::BIGINT AS n_nodes
    FROM ind GROUP BY degree
    """,
    "degree histogram of the md5-derived link graph (both directions, "
    "degree-0 nodes included) — the crawl-corpus health check companion "
    "to host_pagerank; O(distinct degrees) output, pure map-side "
    "partial-agg shuffles",
)
def q_link_degree_hist(spark, sf_dir):
    return graph.degree_histogram(_pagerank_edges(spark, sf_dir))


@register(
    "crawl_trap_hosts",
    """
    WITH corpus AS (
      SELECT source AS host, text FROM documents
      UNION ALL
      -- deterministic trap host: 10 urls serving doc 0's body verbatim
      -- (the synthetic corpus has no real per-source duplication, so the
      -- flag would otherwise be vacuously false everywhere)
      SELECT 'trap.example' AS host, d.text
      FROM documents d, unnest(generate_series(1, 10)) AS t(j)
      WHERE d.doc_id = 0
    ),
    agg AS (
      SELECT host,
             COUNT(*) AS n_pages,
             COUNT(DISTINCT md5(lower(trim(text)))) AS n_distinct
      FROM corpus GROUP BY host
    )
    SELECT host, n_pages, n_distinct,
           round(1.0 - n_distinct::DOUBLE / n_pages, 6) AS dup_ratio,
           (n_pages >= 5 AND round(1.0 - n_distinct::DOUBLE / n_pages, 6)
              >= 0.5) AS is_trap
    FROM agg
    """,
    "crawl-trap detection: hosts (documents.source as the host proxy, "
    "plus a deterministic synthetic trap host) whose pages are mostly "
    "duplicate content behind distinct urls — fingerprint count-distinct "
    "per host, dup_ratio flag feeding per-host budget cuts in "
    "dequeue_wave; one shuffle, 32-byte map-side rows",
)
def q_crawl_trap_hosts(spark, sf_dir):
    from ..operators.crawl import trap_hosts

    d = _t(spark, sf_dir, "documents")
    trap = (
        d.filter(F.col("doc_id") == 0)
        .select(
            F.lit("trap.example").alias("host"),
            "text",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("j"),
        )
        .select("host", "text")
    )
    corpus = d.select(F.col("source").alias("host"), "text").unionAll(trap)
    return trap_hosts(corpus, min_pages=5, dup_threshold=0.5)


_REDIRECT_EDGES_CTE = """
  SELECT d.doc_id AS src,
         ('0x'||substr(md5(d.doc_id::VARCHAR||'~t'),1,8))::BIGINT
           % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents d
  WHERE ('0x'||substr(md5(d.doc_id::VARCHAR||'~r'),1,8))::BIGINT % 100 < 35
"""


def _redirect_edges(spark, sf_dir):
    """Deterministic md5-derived redirect map over documents: ~35% of
    urls redirect, each to one md5-chosen target — the Spark twin of
    _REDIRECT_EDGES_CTE (same md5-portable pattern as _pagerank_edges).
    Chains and the occasional cycle arise naturally from composition."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()

    def md5_32(suffix: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(suffix))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    return d.filter(md5_32("~r") % 100 < 35).select(
        F.col("doc_id").alias("src"), (md5_32("~t") % n).alias("dst")
    )


@register(
    "redirect_resolution",
    graph.resolve_redirects_oracle_sql(_REDIRECT_EDGES_CTE, doublings=4),
    "redirect-chain resolution by POINTER DOUBLING (Wyllie pointer "
    "jumping): 4 self-joins resolve every chain of <= 16 hops — the "
    "O(log n)-round form of the reference's one-hop-at-a-time redirect "
    "following (crawler fetch path) lifted to a corpus-scale redirect "
    "TABLE. resolved=false marks cycles/over-budget chains (redirect "
    "traps). Pure function composition, bit-identical at any "
    "parallelism, exact unrolled-CTE oracle like host_pagerank",
)
def q_redirect_resolution(spark, sf_dir):
    return graph.resolve_redirects(
        _redirect_edges(spark, sf_dir), doublings=4
    ).orderBy("url")


@register(
    "crawl_budget_alloc",
    scheduling.allocate_budget_oracle_sql(
        "SELECT source AS host, COUNT(*)::BIGINT AS demand "
        "FROM documents GROUP BY source",
        budget="(SELECT COUNT(*) // 2 FROM documents)",
    ),
    "crawl-budget scheduling: exact integer MAX-MIN FAIR (water-filling) "
    "allocation of a global per-round fetch budget across hosts — "
    "unsaturated hosts fully granted, saturated hosts get the water "
    "level with the remainder spread deterministically; "
    "sum(alloc) == min(budget, total demand). Operator runs the "
    "two-level (distinct-demand-level) decomposition with NO global "
    "host-order window; the oracle is the naive single-global-window "
    "formulation — the exact match proves the scale decomposition "
    "(same proof shape as token_budget_packing_dist)",
)
def q_crawl_budget_alloc(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    demands = d.groupBy(F.col("source").alias("host")).agg(
        F.count("*").alias("demand")
    )
    budget = int(d.count()) // 2  # scalar: half the total demand
    return scheduling.allocate_budget(demands, budget).orderBy("host")


# Deterministic md5-derived per-pull host rewards (new-URL yield of a
# host's j-th fetch): hosts are the 20 documents.source values, reward =
# md5(host#r<j>) % 100 — same '0x'||substr(md5(...)) portable-hash
# pattern as _PAGERANK_EDGES_CTE.
_UCB1_ROUNDS, _UCB1_BATCH = 8, 5
_UCB1_REWARDS_CTE = f"""
  SELECT h.host, g.pull,
         ('0x' || substr(md5(h.host || '#r' || g.pull::VARCHAR), 1, 6))::BIGINT
           % 100 AS reward
  FROM (SELECT DISTINCT source AS host FROM documents) h
  CROSS JOIN (SELECT unnest(range(1, {_UCB1_ROUNDS + 1})) AS pull) g
"""


def _ucb1_rewards(spark, sf_dir):
    """Spark twin of _UCB1_REWARDS_CTE — (host, pull, reward)."""
    hosts = (
        _t(spark, sf_dir, "documents")
        .select(F.col("source").alias("host"))
        .distinct()
    )
    return hosts.select(
        "host",
        F.explode(F.sequence(F.lit(1), F.lit(_UCB1_ROUNDS))).alias("pull"),
    ).select(
        "host",
        F.col("pull").cast("long").alias("pull"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("host"),
                            F.lit("#r"),
                            F.col("pull").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("reward"),
    )


@register(
    "crawl_host_bandit_ucb1",
    scheduling.ucb1_oracle_sql(
        _UCB1_REWARDS_CTE, rounds=_UCB1_ROUNDS, batch=_UCB1_BATCH
    ),
    "batched UCB1 crawl-host bandit (Auer et al. 2002): 8 rounds x 5 "
    "fetch slots over the 20 document hosts, learning per-host yield "
    "online — unplayed hosts first (play-each-arm-once init), then "
    "round(mean + sqrt(2 ln T / n), 6) DESC with host tie-break; "
    "rewards are the md5-derived per-pull yields. The explore/exploit "
    "layer crawl_budget_alloc (known demands) and host_revisit_priority "
    "(known change rates) lack. Bandit state is one (n, s) integer row "
    "per host; each round is a top-batch TakeOrdered over that frame "
    "plus one co-partitioned reward join, so the 8-round recursion "
    "unrolls into an exact DuckDB oracle",
)
def q_crawl_host_bandit_ucb1(spark, sf_dir):
    return scheduling.ucb1_crawl_schedule(
        _ucb1_rewards(spark, sf_dir),
        rounds=_UCB1_ROUNDS,
        batch=_UCB1_BATCH,
    )


@register(
    "dup_substring_spans",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x != '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest([{'pos': i, 'fp': md5(array_to_string(t[i:i+7], ' '))}
                     for i in range(1, len(t) - 6)]) AS g
      FROM toks WHERE len(t) >= 8
    ),
    g2 AS (SELECT doc_id, g.pos AS pos, g.fp AS fp FROM grams),
    marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY fp) AS n_occ
      FROM g2
    ),
    dpos AS (SELECT doc_id, pos FROM marked WHERE n_occ >= 2),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM dpos
    ),
    grpd AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM isl
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + 7 AS span_end,
           MAX(pos) + 7 - MIN(pos) + 1 AS n_tokens
    FROM grpd GROUP BY doc_id, grp
    """,
    "exact-substring duplication spans (Lee et al. 2022 style): 8-token "
    "window fingerprints, corpus-wide >=2 occurrence mark via a single "
    "count-over-fp window pass, per-doc gaps-and-islands merge (gap <= 8 "
    "keeps token coverage contiguous) to MAXIMAL non-overlapping spans — "
    "linear shuffle on 16-byte fps, exact DuckDB oracle via portable md5",
)
def q_dup_substring_spans(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.duplicate_spans(d, L=8)


@register(
    "dup_substring_excise",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x != '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest([{'pos': i, 'fp': md5(array_to_string(t[i:i+7], ' '))}
                     for i in range(1, len(t) - 6)]) AS g
      FROM toks WHERE len(t) >= 8
    ),
    g2 AS (SELECT doc_id, g.pos AS pos, g.fp AS fp FROM grams),
    marked AS (
      SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY fp) AS n_occ FROM g2
    ),
    dpos AS (SELECT doc_id, pos FROM marked WHERE n_occ >= 2),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM dpos
    ),
    grpd AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM isl
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
      FROM grpd GROUP BY doc_id, grp
    ),
    pos AS (
      SELECT doc_id, u.i AS i, t[u.i] AS tok
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ),
    flags AS (
      SELECT p.doc_id, p.i, p.tok,
             EXISTS(SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id AND p.i BETWEEN s.s AND s.e)
               AS cov
      FROM pos p
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN NOT cov THEN 1 ELSE 0 END) AS INT) AS n_kept,
             CAST(SUM(CASE WHEN cov THEN 1 ELSE 0 END) AS INT) AS n_removed,
             COALESCE(string_agg(CASE WHEN NOT cov THEN tok END, ' '
                                 ORDER BY i), '') AS txt
      FROM flags GROUP BY doc_id
    )
    -- drive from toks so zero-token docs keep their row: blank text ->
    -- (0, 0, ''), NULL text -> NULLs (the Spark operator's exact outputs;
    -- the pos CTE yields no rows for either, so agg alone would drop them)
    SELECT toks.doc_id,
           CASE WHEN toks.t IS NULL THEN NULL
                ELSE COALESCE(a.n_kept, 0) END AS n_kept,
           CASE WHEN toks.t IS NULL THEN NULL
                ELSE COALESCE(a.n_removed, 0) END AS n_removed,
           CASE WHEN toks.t IS NULL THEN NULL
                ELSE COALESCE(a.txt, '') END AS text_deduped
    FROM toks LEFT JOIN agg a ON a.doc_id = toks.doc_id
    """,
    "substring-dedup EXCISION: tokens inside any duplicate_spans range "
    "drop, survivors keep order (Lee et al. 2022 removal step as a pure "
    "Catalyst filter-with-index over the token array — no per-token rows, "
    "no Python); output (doc_id, n_kept, n_removed, text_deduped) with an "
    "exact DuckDB oracle over the same span pipeline",
)
def q_dup_substring_excise(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.excise_spans(d, dedup.duplicate_spans(d, L=8))


@register(
    "winnow_fingerprints",
    dedup.winnow_oracle_sql(g=4, w=4),
    "winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 "
    "— MOSS): 4-token gram hashes, 4-gram sliding window, each window's "
    "minimum selected via the arithmetic argmin key h*2^24+pos (single "
    "window MIN, no second pass) — guaranteed >=1 fingerprint per 4 "
    "consecutive grams at ~2/(w+1) density, robust to insertions. "
    "Per-doc windows only: nothing shuffles across documents; the "
    "selected ~40% of grams is all downstream dedup joins ever see. "
    "Exact DuckDB oracle via the portable md5_32 hash",
)
def q_winnow_fingerprints(spark, sf_dir):
    return dedup.winnow_fingerprints(_t(spark, sf_dir, "documents"), g=4, w=4)


@register(
    "winnow_dup_pairs",
    dedup.winnow_pairs_oracle_sql(g=4, w=4, min_shared=2, max_fp_docs=64),
    "near-duplicate candidate pairs from shared winnowing fingerprints "
    "(MOSS match step): docs sharing >=2 selected fps, with fps living "
    "in >64 docs dropped as stop fingerprints BEFORE the pair explode — "
    "the same C(cap,2) skew amputation as mirror_host_pairs, bounding "
    "the self-join at any corpus size. Complements minhash-LSH: "
    "position-aware (catches long verbatim passages the bag-of-shingles "
    "signature dilutes) at a fraction of the signature cost",
)
def q_winnow_dup_pairs(spark, sf_dir):
    return dedup.winnow_dup_pairs(
        _t(spark, sf_dir, "documents"), g=4, w=4, min_shared=2, max_fp_docs=64
    )


@register(
    "neardup_simhash",
    r"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents)
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
          FROM toks),
    v AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
      FROM h, range(32) t(b)
      GROUP BY doc_id, b
    ),
    sim AS (
      SELECT doc_id,
             SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sim
      FROM v GROUP BY doc_id
    ),
    ch AS (
      SELECT doc_id, sim, c, (sim >> (c * 8)) & 255 AS cv
      FROM sim, range(4) t(c)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                      x.sim AS sim_a, y.sim AS sim_b
      FROM ch x JOIN ch y
        ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
    "SimHash near-dup pairs (hamming<=3 via chunk pigeonhole). Graded "
    "variant = 32-bit md5 simhash, pure integer Catalyst arithmetic with an "
    "exact DuckDB oracle of the identical bit-vote pipeline; the 64-bit "
    "vectorized simhash stays the scale default (pytest-covered)",
)
def q_neardup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs_md5(d, max_hamming=3)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# politeness + robots golden (north_rule: crawl-delay budgets + robots rules)
# ---------------------------------------------------------------------------
_POLITENESS_ORACLE = """
    SELECT * FROM (VALUES
      ('http://fast.x/a', 'done'), ('http://fast.x/b', 'done'),
      ('http://fast.x/c', 'done'), ('http://slow.x/a', 'done'),
      ('http://slow.x/b', 'done'), ('http://slow.x/c', 'due')
    ) AS t(url, state)
"""


@register(
    "crawl_politeness_states",
    _POLITENESS_ORACLE,
    "6 crawl rounds over a 2-host corpus where slow.x has robots "
    "Crawl-delay 3 + Disallow /private: delay gates slow.x to 2 waves, "
    "the disallowed url never enters the frontier (golden constant)",
)
def q_crawl_politeness(spark, sf_dir):
    import datetime as dt

    from ..functions.robots import host_state_from_pages
    from ..operators.checkpoint import run_crawl
    from ..schemas import PAGES_SCHEMA

    rows = []

    def page(url, links, robots=None):
        html = (
            None
            if robots is not None
            else ("".join(f'<a href="{l}">x</a>' for l in links) + "<p>b</p>").encode()
        )
        rows.append((url, dt.datetime(2026, 1, 1), html, robots, "en"))

    page("http://slow.x/robots.txt", [], robots="User-agent: *\nCrawl-delay: 3\nDisallow: /private")
    page("http://slow.x/a", ["http://slow.x/b", "http://slow.x/private/p", "http://fast.x/a"])
    page("http://slow.x/b", ["http://slow.x/c"])
    page("http://slow.x/c", [])
    page("http://slow.x/private/p", [])
    page("http://fast.x/a", ["http://fast.x/b"])
    page("http://fast.x/b", ["http://fast.x/c"])
    page("http://fast.x/c", [])
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    hs = host_state_from_pages(spark, pages)
    res = run_crawl(
        spark,
        pages,
        seeds=["http://slow.x/a", "http://fast.x/a"],
        rounds=6,
        host_state=hs,
        stop_when_exhausted=False,
    )
    return res["frontier"].select("url", "state")


def _nb_oracle_sql() -> str:
    """Full first-principles NB oracle: tokenization (process_text: strip
    ASCII punctuation, split on whitespace, drop stopwords case-insensitively
    — listingfiltering/learnNetwork.py:183-196), train counts with alpha=0.3
    Lidstone smoothing (learnNetwork.py:38-47), score = prior + sum of
    per-occurrence log-probs over in-vocab tokens, argmax with the
    deterministic first-max tie-break (smallest class, i.e. FALSE).

    Scope: the SQL models the UNCAPPED vocabulary, which equals train_nb's
    behavior while the labeled corpus has < max_vocab (2^18) distinct
    tokens with min_df=1 — true by orders of magnitude at every graded SF
    (sf0.01: ~10^3 tokens; sf0.1 verified exact too). A corpus that
    actually tripped the distributive cap would need the top-k token CTE
    mirrored here."""
    from ..functions.tokenize import ENGLISH_STOPWORDS

    stop = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ENGLISH_STOPWORDS))
    # [!-/:-@[-`{-~] == string.punctuation (ASCII 33-47, 58-64, 91-96, 123-126)
    tok_expr = (
        r"unnest(string_split_regex("
        r"regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'), '\s+'))"
    )
    return f"""
    WITH labeled AS (
      SELECT doc_id, (lang = 'en') AS y, text FROM documents
      WHERE doc_id % 2 = 0 AND lang IS NOT NULL
    ),
    unlabeled AS (
      SELECT doc_id, text FROM documents
      WHERE NOT (doc_id % 2 = 0 AND lang IS NOT NULL)
    ),
    lab_tok AS (
      SELECT doc_id, y, tok FROM (
        SELECT doc_id, y, {tok_expr} AS tok FROM labeled)
      WHERE tok <> '' AND lower(tok) NOT IN ({stop})
    ),
    unl_tok AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, {tok_expr} AS tok FROM unlabeled)
      WHERE tok <> '' AND lower(tok) NOT IN ({stop})
    ),
    counts AS (SELECT y, tok, COUNT(*) AS c FROM lab_tok GROUP BY y, tok),
    vocab AS (SELECT DISTINCT tok FROM lab_tok),
    vs AS (SELECT COUNT(*)::DOUBLE AS v FROM vocab),
    ct AS (SELECT y, SUM(c)::DOUBLE AS tot FROM counts GROUP BY y),
    cls AS (SELECT y, COUNT(*)::DOUBLE AS nd FROM labeled GROUP BY y),
    pri AS (SELECT y, ln(nd / (SELECT SUM(nd) FROM cls)) AS lp FROM cls),
    lpr AS (
      SELECT c2.y, v.tok,
             ln(COALESCE(cnt.c, 0)::DOUBLE + 0.3)
               - ln(ct.tot + 0.3 * (SELECT v FROM vs)) AS w
      FROM vocab v
      CROSS JOIN cls c2
      JOIN ct ON ct.y = c2.y
      LEFT JOIN counts cnt ON cnt.y = c2.y AND cnt.tok = v.tok
    ),
    sc AS (
      SELECT u.doc_id, p.y, p.lp + COALESCE(SUM(l.w), 0) AS score
      FROM unlabeled u
      CROSS JOIN pri p
      LEFT JOIN unl_tok t ON t.doc_id = u.doc_id
      LEFT JOIN lpr l ON l.y = p.y AND l.tok = t.tok
      GROUP BY u.doc_id, p.y, p.lp
    ),
    pred AS (
      SELECT doc_id, y,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, y ASC) AS rn
      FROM sc
    )
    SELECT doc_id, y AS predicted_blocked FROM labeled
    UNION ALL
    SELECT doc_id, y AS predicted_blocked FROM pred WHERE rn = 1
    """


@register(
    "classify_documents_nb",
    _nb_oracle_sql(),
    "U1/U2 distributed multinomial NB (alpha=0.3): train on labeled half "
    "(label = lang=='en'), predict the rest — EXACT first-principles DuckDB "
    "oracle (tokenize -> smoothed counts -> argmax CTEs); sklearn parity "
    "additionally pytest-asserted",
)
def q_classify_documents(spark, sf_dir):
    from ..operators.classifier import classify_documents

    d = _t(spark, sf_dir, "documents").withColumn(
        "is_blocked",
        F.when(F.col("doc_id") % 2 == 0, F.col("lang") == "en").otherwise(
            F.lit(None).cast("boolean")
        ),
    )
    out = classify_documents(spark, d)
    return out.select("doc_id", "predicted_blocked")


@register(
    "focused_crawl_priority",
    f"""
    WITH nb AS MATERIALIZED (
      {_nb_oracle_sql()}
    ),
    agg AS (
      SELECT d.source AS host, COUNT(*)::BIGINT AS n_docs,
             SUM(CASE WHEN nb.predicted_blocked THEN 1 ELSE 0 END)::BIGINT
               AS n_topic
      FROM documents d JOIN nb ON nb.doc_id = d.doc_id
      GROUP BY d.source
    )
    SELECT host, n_docs, n_topic,
           ((n_topic * 1000000) // n_docs)::BIGINT AS topic_ppm,
           row_number() OVER (ORDER BY (n_topic * 1000000) // n_docs DESC,
                              host ASC)::INT AS priority
    FROM agg
    """,
    "focused crawling (Chakrabarti, van den Berg & Dom, WWW 1999): the "
    "NB topic classifier's per-doc relevance rolls up to a per-host "
    "on-topic fraction (integer ppm — exact), ranked into the frontier "
    "priority a focused crawler dequeues by (hosts yielding on-topic "
    "pages get fetch budget first). The graded oracle nests the FULL "
    "first-principles NB chain (tokenize -> smoothed counts -> argmax) "
    "as a scoped CTE plus the host rollup — classifier and scheduler "
    "verified in one row",
)
def q_focused_crawl_priority(spark, sf_dir):
    from ..operators.classifier import classify_documents

    d = _t(spark, sf_dir, "documents").withColumn(
        "is_blocked",
        F.when(F.col("doc_id") % 2 == 0, F.col("lang") == "en").otherwise(
            F.lit(None).cast("boolean")
        ),
    )
    out = classify_documents(spark, d)
    agg = out.groupBy(F.col("source").alias("host")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("predicted_blocked").cast("long"))
        .cast("long")
        .alias("n_topic"),
    )
    from pyspark.sql import Window as W

    agg = agg.withColumn(
        "topic_ppm", F.expr("(n_topic * 1000000) div n_docs").cast("long")
    )
    # scale-safe exact global rank WITHOUT a single-partition window over
    # hosts: topic_ppm has <= 10^6+1 distinct values BY CONSTRUCTION, so
    # the cross-host offset rides a bounded ppm histogram (the packer's
    # offsets-frame pattern) and the within-ppm tie-break is a
    # partitioned window — at 10^8 hosts nothing serializes on one task
    hist = agg.groupBy("topic_ppm").agg(F.count("*").alias("_n"))
    off = hist.select(
        "topic_ppm",
        F.coalesce(
            F.sum("_n").over(
                W.orderBy(F.col("topic_ppm").desc()).rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    within = F.row_number().over(
        W.partitionBy("topic_ppm").orderBy(F.col("host").asc())
    )
    return (
        agg.join(F.broadcast(off), "topic_ppm")
        .select(
            "host",
            "n_docs",
            "n_topic",
            "topic_ppm",
            (F.col("_off") + within).cast("int").alias("priority"),
        )
    )


@register(
    "dedup_canonical_docs",
    rf"""
    WITH cc AS MATERIALIZED (
      {_CLUSTER_LABELS_ORACLE}
    ),
    dl AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             x -> x != ''))::BIGINT AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT cc.cluster, cc.doc_id, dl.n_tokens,
             row_number() OVER (PARTITION BY cc.cluster
                                ORDER BY dl.n_tokens DESC, cc.doc_id ASC)
               AS rn,
             COUNT(*) OVER (PARTITION BY cc.cluster)::BIGINT AS n_members
      FROM cc JOIN dl ON dl.doc_id = cc.doc_id
    )
    SELECT cluster, doc_id AS kept_doc_id, n_tokens, n_members
    FROM ranked WHERE rn = 1
    """,
    "near-dup RETENTION POLICY: per minhash-LSH cluster keep the "
    "LONGEST member (ties to min doc_id) — the quality-aware election "
    "CCNet/RefinedWeb-style pipelines apply where the reference's "
    "PK contract keeps min-id (crawler/db/mysql.go:293). One window "
    "over the cluster key; the graded oracle nests the full recursive-"
    "CTE clustering plus the tokenizer-exact length, so clustering, "
    "doclen, and the election grade in one row",
)
def q_dedup_canonical_docs(spark, sf_dir):
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.3, hash="md5").select(
        "id_a", "id_b"
    )
    labels = dedup.connected_components(pairs, nodes=d.select("doc_id"))
    dl = d.select(
        "doc_id",
        F.size(ts.nonempty_tokens_col(F.lower(F.col("text"))))
        .cast("long")
        .alias("n_tokens"),
    )
    ranked = labels.join(dl, labels.node == dl.doc_id).select(
        "cluster",
        "doc_id",
        "n_tokens",
        F.row_number()
        .over(
            W.partitionBy("cluster").orderBy(
                F.col("n_tokens").desc(), F.col("doc_id").asc()
            )
        )
        .alias("rn"),
        F.count("*").over(W.partitionBy("cluster")).cast("long").alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster",
        F.col("doc_id").alias("kept_doc_id"),
        "n_tokens",
        "n_members",
    )


_ANN_ORACLE = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             round(
               list_sum(list_transform(list_zip(e.embedding, q.qe),
                                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))),
               5) AS cos
      FROM embeddings e, q
    )
    SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# the crawl itself, as a graded golden query (reference fixture graph —
# crawler/mock/mockrpc.go:3; expected order per SURVEY.md §3.1 semantics)
# ---------------------------------------------------------------------------
_MOCK4_ORACLE = """
    SELECT * FROM (VALUES
      (1, 0, 'http://n1.example/'), (1, 1, 'http://n2.example/'),
      (1, 2, 'http://n3.example/'), (1, 3, 'http://n4.example/'),
      (2, 0, 'http://n1.example/'), (2, 1, 'http://n2.example/'),
      (2, 2, 'http://n3.example/'), (2, 3, 'http://n4.example/')
    ) AS t(rnd, seq, url)
"""


@register(
    "crawl_mock4_visits",
    _MOCK4_ORACLE,
    "2 strict-fidelity crawl rounds on the reference's mock graph; visit "
    "log must equal the reference scheduler's order (golden constant)",
)
def q_crawl_mock4_visits(spark, sf_dir):
    from ..operators.crawl import strict_crawl
    from ..sources.pages import MOCK4_SEED_URL, mock4_pages_df

    visits, _ = strict_crawl(spark, mock4_pages_df(spark), [MOCK4_SEED_URL], rounds=2)
    return spark.createDataFrame(
        [(r, s, u) for (r, s, u) in visits], "rnd int, seq int, url string"
    )


# ---------------------------------------------------------------------------
# streaming-shaped aggregations (batch path graded here; the identical plan
# runs as a Structured Stream in tests/test_streaming_events.py)
# ---------------------------------------------------------------------------
@register(
    "event_window_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "tumbling 1h window counts per event_type — the watermarked streaming "
    "telemetry aggregation (same plan batch/stream; stream equality tested "
    "in tests/test_streaming_events.py)",
)
def q_event_window_counts(spark, sf_dir):
    from ..streaming.events import windowed_event_counts

    return windowed_event_counts(_t(spark, sf_dir, "events"))


@register(
    "event_sessions",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    "per-user session windows (native session_window, 30-min gap; window "
    "end exclusive so a gap of exactly 30min opens a new session) vs a "
    "first-principles lag/cumsum SQL oracle",
)
def q_event_sessions(spark, sf_dir):
    from ..streaming.events import session_windows

    return session_windows(_t(spark, sf_dir, "events"))


_MOCK4_BLOOM_FRONTIER_ORACLE = """
    SELECT * FROM (VALUES
      ('http://n1.example/', 0, 'done'), ('http://n2.example/', 1, 'done'),
      ('http://n3.example/', 1, 'done'), ('http://n4.example/', 2, 'done')
    ) AS t(url, depth, state)
"""


@register(
    "crawl_mock4_bloom_frontier",
    _MOCK4_BLOOM_FRONTIER_ORACLE,
    "U5 driver-graded: scale-mode crawl on the reference mock graph with the "
    "sharded BLOOM seen-set (probe + exact confirm on the maybe-residue — "
    "result is exact, not probabilistic); final frontier must equal the "
    "exact-anti-join path's (golden constant)",
)
def q_crawl_mock4_bloom_frontier(spark, sf_dir):
    from ..operators.checkpoint import latest_round, load_frontier, run_crawl
    from ..sources.pages import MOCK4_SEED_URL, mock4_pages_df

    ckpt = _graded_tmpdir("mock4_bloom")
    run_crawl(
        spark, mock4_pages_df(spark), seeds=[MOCK4_SEED_URL], rounds=4,
        ckpt_dir=ckpt, use_bloom_seen=True,
    )
    f = load_frontier(spark, ckpt, latest_round(ckpt))
    return f.select("url", "depth", "state")


@register(
    "stratified_topk",
    """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents) t
    WHERE rk <= 5
    """,
    "curation: deterministic stratified selection — top-5 documents per "
    "language by size (window rank per group; the data-mix construction "
    "counterpart of stratified sampling)",
)
def q_stratified_topk(spark, sf_dir):
    from ..operators.curation import stratified_topk

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return stratified_topk(d, "lang", [F.col("n_chars").desc(), F.col("doc_id")], 5)


@register(
    "token_budget_packing",
    r"""
    SELECT doc_id, n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2000.0) AS BIGINT) AS bin
    FROM (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM (SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
                     AS n_tokens
            FROM documents) a) b
    """,
    "curation: budget-aligned contiguous sequence packing - bin b holds docs whose "
    "preceding-token total lies in [b*2000,(b+1)*2000), documents never "
    "split (the pretraining concat-then-chunk shape; pure window "
    "arithmetic)",
)
def q_token_budget_packing(spark, sf_dir):
    from ..operators.curation import pack_by_token_budget

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ts.token_count_col(F.col("text")).alias("n_tokens")
    )
    out = pack_by_token_budget(d, "n_tokens", 2000, [F.col("doc_id")])
    return out.select("doc_id", "n_tokens", "bin")


@register(
    "token_budget_packing_dist",
    r"""
    SELECT doc_id, n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2000.0) AS BIGINT) AS bin
    FROM (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM (SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
                     AS n_tokens
            FROM documents) a) b
    """,
    "curation: the DISTRIBUTED two-level packing (per-shard cum-sum + "
    "exclusive shard-offset prefix over a bounded n_shards frame; shard = "
    "doc_id range bucket) graded against the SAME single-global-window "
    "SQL oracle as token_budget_packing — the exact match proves the "
    "scale decomposition",
)
def q_token_budget_packing_dist(spark, sf_dir):
    from ..operators.curation import pack_by_token_budget_distributed

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ts.token_count_col(F.col("text")).alias("n_tokens"),
        F.floor(F.col("doc_id") / F.lit(64)).alias("_shard"),
    )
    out = pack_by_token_budget_distributed(
        d, "n_tokens", 2000, [F.col("doc_id")], "_shard"
    )
    return out.select("doc_id", "n_tokens", "bin")


@register(
    "doc_repetition_ratio",
    r"""
    SELECT doc_id,
           CASE WHEN len(g) > 0
                THEN round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
           END AS rep_ratio
    FROM (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(t)-2, 0)),
                            i -> array_to_string(t[i:i+2], ' ')) AS g
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents) a) b
    """,
    "curation: intra-document repetition — fraction of word 3-grams that "
    "repeat an earlier gram (duplicate-n-gram family of Gopher-style "
    "quality rules); NULL for docs shorter than 3 tokens; pure Catalyst",
)
def q_doc_repetition_ratio(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", ts.repetition_ratio_col(F.col("text"), 3).alias("rep_ratio")
    )


@register(
    "pii_redaction",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?(?:\d{1,3}[ .-]?)?\(?\d{3,4}\)?[ .-]?\d{3,4}[ .-]?\d{2,4}',
             '<PHONE>', 'g') AS clean
    FROM (SELECT doc_id,
                 text || ' contact: user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or +1 (555) 010-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text2
          FROM documents) a
    """,
    "curation: C4-style PII scrub — emails then phone-like digit runs "
    "replaced with typed placeholders; the query appends a synthetic "
    "email+phone per doc so the redaction is actually exercised (the "
    "corpus itself carries no PII); RE2-safe patterns so Java and DuckDB "
    "regex engines agree byte-for-byte",
)
def q_pii_redaction(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    text2 = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select("doc_id", ts.redact_pii_col(text2).alias("clean"))


@register(
    "domain_mix_resample",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT
               AS b,
             CASE lang WHEN 'en' THEN 2147483648
                       WHEN 'de' THEN 1073741824
                       ELSE 4294967296 END AS thr
      FROM documents) t
    WHERE b < thr
    """,
    "curation: deterministic per-domain downsampling to a target data mix "
    "(keep 50% en, 25% de, all else) — the keep decision is a pure md5 "
    "function of (doc_id, salt), so it is stable across runs and "
    "partitionings; a plain Catalyst filter, no shuffle",
)
def q_domain_mix_resample(spark, sf_dir):
    from ..operators.curation import domain_mix_resample

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return domain_mix_resample(
        d, "lang", {"en": 0.5, "de": 0.25}, "doc_id", default_weight=1.0
    )


@register(
    "contamination_screen",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t)-3, 0)),
                    i -> md5(array_to_string(t[i:i+3], ' ')))) AS g
      FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    corp AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
    SELECT corp.doc_id, CAST(COUNT(DISTINCT corp.g) AS BIGINT) AS n_shared_grams
    FROM corp JOIN bench USING (g)
    GROUP BY corp.doc_id
    """,
    "curation: benchmark decontamination — corpus docs sharing any word "
    "4-gram with a held-out 'benchmark' slice (doc_id % 97), with the "
    "count of distinct shared grams; the benchmark gram set is broadcast, "
    "so the corpus side is a map-side semi-join (never shuffles). n=4 here "
    "because the synthetic small-vocab corpus has no 8-gram overlap; real "
    "decontamination uses the operator default n=8",
)
def q_contamination_screen(spark, sf_dir):
    from ..operators.curation import contamination_screen

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_screen(corpus, bench, n=4)


@register(
    "curation_pipeline",
    r"""
    WITH dedup AS (
      SELECT doc_id, lang, text
      FROM documents
      QUALIFY row_number() OVER (
          PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
          ORDER BY doc_id) = 1
    ),
    qual AS (
      SELECT * FROM dedup
      WHERE round(
          0.4 * least(length(text) / 500.0, 1.0)
          + 0.4 * (len(list_distinct(string_split_regex(trim(text), '\s+')))
                   / len(string_split_regex(trim(text), '\s+')))
          + 0.2 * (1.0 - least(
              2.0 * len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> t IN ('a', 'the', 'row', 'value', 'table')))
                  / len(string_split_regex(trim(text), '\s+')), 1.0)),
          6) >= 0.5
    ),
    toks_all AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                 FROM documents),
    grams AS (SELECT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(t)-3, 0)),
                            i -> md5(array_to_string(t[i:i+3], ' ')))) AS g
              FROM toks_all),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    contaminated AS (SELECT DISTINCT grams.doc_id FROM grams
                     JOIN bench USING (g) WHERE grams.doc_id % 97 <> 0),
    clean AS (SELECT * FROM qual WHERE doc_id % 97 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
    mixed AS (
      SELECT doc_id, lang, text FROM clean
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT
            < CASE lang WHEN 'en' THEN 2147483648
                        WHEN 'de' THEN 1073741824
                        ELSE 4294967296 END
    ),
    sized AS (SELECT doc_id, lang,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
                       AS n_tokens
              FROM mixed)
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING)
                       - n_tokens) / 2000.0) AS BIGINT) AS bin
    FROM sized
    """,
    "the composed training-data curation pipeline, end to end: exact dedup "
    "(keep-first by fingerprint) -> quality gate (score >= 0.5) -> "
    "benchmark decontamination (4-gram overlap vs the held-out doc_id%97 "
    "slice, broadcast semi-join) -> deterministic domain-mix resample "
    "(50% en / 25% de) -> budget-aligned token packing. Every stage is the "
    "same operator the standalone queries grade; the composition is what a "
    "user actually runs before training",
)
def q_curation_pipeline(spark, sf_dir):
    from ..operators.curation import (
        contamination_screen,
        domain_mix_resample,
        pack_by_token_budget,
        stratified_topk,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d = d.withColumn("fp", ts.fingerprint_col(F.col("text")))
    d = stratified_topk(d, "fp", [F.col("doc_id")], 1).drop("fp")
    d = d.filter(ts.quality_score_col(F.col("text")) >= 0.5)
    bench = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", "text")
    )
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    contaminated = contamination_screen(corpus, bench, n=4).select("doc_id")
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    mixed = domain_mix_resample(clean, "lang", {"en": 0.5, "de": 0.25}, "doc_id")
    sized = mixed.select(
        "doc_id", "lang", ts.token_count_col(F.col("text")).alias("n_tokens")
    )
    return pack_by_token_budget(sized, "n_tokens", 2000, [F.col("doc_id")]).select(
        "doc_id", "lang", "n_tokens", "bin"
    )


@register(
    "documents_incremental",
    """
    SELECT * FROM (VALUES
      (2, 'http://n2.example/', 'peer node 2', 'en', 3, CAST(0.6088 AS DOUBLE)),
      (2, 'http://n3.example/', 'peer peer node 3', 'en', 4, CAST(0.5128 AS DOUBLE)),
      (3, 'http://n4.example/', 'peer node 4', 'en', 3, CAST(0.6088 AS DOUBLE))
    ) AS t(rnd, url, text, lang, n_tokens, quality)
    """,
    "Iceberg-style incremental documents read (operators/store.py): crawl "
    "3 rounds, consume only rounds > bookmark 1; each row carries its "
    "round so consumers advance bookmarks transactionally. Replaces the "
    "reference consumers' full-table re-scans (apiserver/listingfiltering "
    "reads of items)",
)
def q_documents_incremental(spark, sf_dir):
    from ..operators.checkpoint import run_crawl
    from ..operators.store import read_documents
    from ..sources.pages import MOCK4_SEED_URL, mock4_pages_df

    ckpt = _graded_tmpdir("docs_incr")
    run_crawl(
        spark, mock4_pages_df(spark), seeds=[MOCK4_SEED_URL], rounds=4,
        ckpt_dir=ckpt, extract_documents=True,
    )
    d = read_documents(spark, ckpt, since_round=1)
    return d.select(
        F.col("round").alias("rnd"), "url", "text", "lang", "n_tokens", "quality"
    )


@register(
    "crawl_one_node",
    """
    SELECT * FROM (VALUES
      ('http://n1.example/', 0, 'due'), ('http://n3.example/', 0, 'done'),
      ('http://n4.example/', 1, 'due')
    ) AS t(url, depth, state)
    """,
    "on-demand single-node crawl (reference GET /crawl/{nodeID} -> "
    "ProcessOneNodeSync, crawler/server/server.go:26-40): crawl n3 against "
    "a frontier holding only n1 — n3 inserted+done, n4 discovered, n1's "
    "discovery deduped (INSERT IGNORE), n1 untouched",
)
def q_crawl_one_node(spark, sf_dir):
    from ..operators.crawl import crawl_one, init_frontier
    from ..sources.pages import MOCK4_SEED_URL, mock4_pages_df

    f = init_frontier(spark, [MOCK4_SEED_URL])
    res = crawl_one(spark, f, mock4_pages_df(spark), "http://n3.example/")
    return res.frontier.select("url", "depth", "state")


_MOCK4_METRICS_ORACLE = """
    SELECT * FROM (VALUES
      (1, 1, 3), (2, 2, 4), (3, 1, 4)
    ) AS t(rnd, visited, frontier_size)
"""


@register(
    "crawl_round_metrics",
    _MOCK4_METRICS_ORACLE,
    "A7 driver-graded: per-round metrics (visited count, frontier size) of a "
    "scale-mode crawl on the mock graph; stops when exhausted (round 4 never "
    "runs). Reference: crawler/crawling/crawler.go:184-238 round logging",
)
def q_crawl_round_metrics(spark, sf_dir):
    from ..operators.checkpoint import run_crawl
    from ..sources.pages import MOCK4_SEED_URL, mock4_pages_df

    res = run_crawl(spark, mock4_pages_df(spark), seeds=[MOCK4_SEED_URL], rounds=4)
    return spark.createDataFrame(
        [(r["round"], r["visited"], r["frontier_size"]) for r in res["per_round"]],
        "rnd int, visited int, frontier_size int",
    )


@register(
    "ann_cosine_topk",
    _ANN_ORACLE,
    "brute-force cosine top-10 around embeddings[vec_id=0] (JVM zip_with/"
    "aggregate dot product)",
)
def q_ann_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.brute_force_topk(e, query, k=10)


@register(
    "search_mmr_rerank",
    similarity.mmr_oracle_sql(k=5, pool=20, lam=0.7),
    "MMR diversified re-ranking (Carbonell & Goldstein SIGIR 1998): "
    "greedy top-5 from the cosine top-20 pool around "
    "embeddings[vec_id=0], each step maximizing lam*rel - "
    "(1-lam)*max-sim-to-selected (lam=0.7) — the serving-side "
    "diversification pass between ANN retrieval and the result page. "
    "Corpus-sized work is ONE TakeOrdered relevance scan; the k greedy "
    "rounds run over the bounded pool (pool^2 pairwise sims), each "
    "pick a 1-row TakeOrdered joined back broadcast (no driver "
    "collect). 5-decimal portable cosines + 6-decimal combination + id "
    "tie-break make the greedy recursion grade via unrolled "
    "MATERIALIZED CTEs",
)
def q_search_mmr_rerank(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.mmr_rerank(e, query, k=5, pool=20, lam=0.7)


@register(
    "ann_lsh_topk",
    None,
    "SRP-LSH bucketed ANN top-10 (multi-table probe + exact re-rank) — "
    "rows-only; recall vs brute force tested in pytest",
)
def q_ann_lsh_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.lsh_ann_topk(e, query, k=10)


@register(
    "ann_ivf_topk",
    None,
    "IVF ANN top-10: k-means(16) coarse quantizer, 4-cell probe, exact "
    "cosine re-rank — rows-only; recall vs brute force tested in pytest",
)
def q_ann_ivf_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_ann_topk(e, query, k=10)


_INDEX_CACHE: dict[tuple, str] = {}


def _index_path(kind: str, sf_dir: str) -> str:
    import hashlib

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"/tmp/{kind}_index_{h}"


@register(
    "ann_lsh_topk_indexed",
    None,
    "SRP-LSH ANN top-10 against the MATERIALIZED index (parquet partitioned "
    "by (tbl, bucket); probe = partition-pruned scan, the 10^9-vector "
    "shape) — rows-only; equality with the inline probe + recall tested in "
    "pytest",
)
def q_ann_lsh_indexed(spark, sf_dir):
    import os

    e = _t(spark, sf_dir, "embeddings")
    path = _index_path("srp", sf_dir)
    if ("srp", sf_dir) not in _INDEX_CACHE or not os.path.exists(path):
        similarity.build_srp_index(e, path)
        _INDEX_CACHE[("srp", sf_dir)] = path
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.lsh_ann_topk_indexed(spark, path, query, k=10)


@register(
    "ann_ivf_topk_indexed",
    None,
    "IVF ANN top-10 against the MATERIALIZED index (parquet partitioned by "
    "_cell + saved centroids; probe prunes to nprobe cells) — rows-only; "
    "equality with the inline probe tested in pytest",
)
def q_ann_ivf_indexed(spark, sf_dir):
    import os

    e = _t(spark, sf_dir, "embeddings")
    path = _index_path("ivf", sf_dir)
    if ("ivf", sf_dir) not in _INDEX_CACHE or not os.path.exists(f"{path}/centroids.npy"):
        similarity.build_ivf_index(e, path)
        _INDEX_CACHE[("ivf", sf_dir)] = path
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_ann_topk_indexed(spark, path, query, k=10)


@register(
    "embedding_neardup",
    None,
    "embedding-cosine near-dup pairs via SRP bucket join + exact cosine, "
    "with the AUTO plane count (n_planes=None -> auto_planes sizes the "
    "bucket fan-out to the corpus — the 100 TB knob) — rows-only; "
    "subset-of-bruteforce tested in pytest",
)
def q_embedding_neardup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    # testdata embeddings are near-orthogonal (max pairwise cos ~0.46), so
    # the demo threshold is 0.35; real near-dup thresholds (>=0.95) have
    # far better bucket selectivity at the same auto-derived plane count
    return similarity.embedding_neardup_pairs(e, threshold=0.35, n_planes=None)


# ---------------------------------------------------------------------------
# md5-portable ANN — the graded oracle variants. Every random choice
# (hyperplane signs, IVF seed rows) derives from md5, which DuckDB
# computes identically, so bucket assignment + exact re-rank are plain
# SQL and the driver hash-matches the full ANN pipeline. The bucket-sign
# and distance folds use list_reduce (strict left fold) to match
# Catalyst's F.aggregate bitwise — no rounding protects the >= 0 sign
# test, so FP summation order must agree exactly.
# ---------------------------------------------------------------------------
_ANN_LSH_MD5_ORACLE = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    dim AS (SELECT len(qe) AS n FROM q),
    signs AS (
      -- plane length derived from the data (the Spark side uses
      -- len(query)) so a fixture dim change cannot desynchronize the
      -- hyperplanes between the two sides
      SELECT t.t AS tbl, p.p AS plane,
             [CASE WHEN ('0x' || substr(md5(t.t || '_' || p.p || '_' || j), 1, 8))::BIGINT & 1 = 1
                   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
              FOR j IN range(0, (SELECT n FROM dim))] AS sv
      FROM range(2) t(t), range(4) p(p)
    ),
    pb AS (
      SELECT e.vec_id, s.tbl, s.plane,
             CASE WHEN list_reduce(
                    list_transform(list_zip(e.embedding, s.sv),
                                   pr -> CAST(pr[1] AS DOUBLE) * pr[2]),
                    (a, b) -> a + b) >= 0
                  THEN (1 << s.plane) ELSE 0 END AS bit
      FROM embeddings e, signs s
    ),
    buckets AS (
      SELECT vec_id, tbl, SUM(bit) AS bucket FROM pb GROUP BY vec_id, tbl
    ),
    qb AS (SELECT tbl, bucket FROM buckets WHERE vec_id = 0),
    cand AS (
      SELECT DISTINCT b.vec_id
      FROM buckets b JOIN qb ON b.tbl = qb.tbl AND b.bucket = qb.bucket
    ),
    scored AS (
      SELECT e.vec_id,
             round(
               list_sum(list_transform(list_zip(e.embedding, q.qe),
                                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))),
               5) AS cos
      FROM embeddings e JOIN cand USING (vec_id), q
    )
    SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


@register(
    "ann_lsh_topk_md5",
    _ANN_LSH_MD5_ORACLE,
    "SRP-LSH ANN top-10 with md5-Rademacher hyperplanes (2 tables x 4 "
    "planes, exact cosine re-rank of the bucket-candidate union) — the "
    "graded ANN entry: hashes, buckets, and re-rank all SQL-expressible, "
    "exact DuckDB oracle; the seeded-Gaussian SRP stays the scale default",
)
def q_ann_lsh_topk_md5(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.lsh_ann_topk_md5(e, query, k=10, n_planes=4, tables=2)


_ANN_IVF_MD5_ORACLE = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cents AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, c.cid,
             list_reduce(
               list_transform(list_zip(e.embedding, c.ce),
                 pr -> (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))
                       * (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))),
               (a, b) -> a + b) AS d2
      FROM embeddings e, cents c
    ),
    cells AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT cid FROM d WHERE vec_id = 0 ORDER BY d2, cid LIMIT 4
    ),
    cand AS (
      SELECT vec_id FROM cells WHERE cell IN (SELECT cid FROM qcells)
    ),
    scored AS (
      SELECT e.vec_id,
             round(
               list_sum(list_transform(list_zip(e.embedding, q.qe),
                                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))),
               5) AS cos
      FROM embeddings e JOIN cand USING (vec_id), q
    )
    SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


@register(
    "ann_ivf_topk_md5",
    _ANN_IVF_MD5_ORACLE,
    "IVF ANN top-10 with md5-seeded centroids (the 16 rows with smallest "
    "md5(vec_id) as seeds, argmin-L2 cell assignment, 4-cell probe, exact "
    "cosine re-rank) — SQL-expressible graded variant with exact DuckDB "
    "oracle; k-means IVF stays the scale default",
)
def q_ann_ivf_topk_md5(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_ann_topk_md5(e, query, k=10, nprobe=4, n_cells=16)


# ---------------------------------------------------------------------------
# Search-side ranking: BM25 + inverted index (operators/ranking.py).
# The reference answers keyword search with OR-of-LIKE scans
# (apiserver/index.js:85-102); these are the web-scale form of the same
# product feature — build the index as a distributed groupBy, rank with
# BM25. Query terms come from the synthetic corpus vocabulary.
# ---------------------------------------------------------------------------
from ..operators import ranking  # noqa: E402

_BM25_TERMS = ["hash", "join", "spark"]


@register(
    "search_bm25_topk",
    ranking.bm25_oracle_sql(_BM25_TERMS, k=10),
    "BM25 top-10 over documents for a 3-term keyword query — the "
    "web-scale replacement for the reference's OR-of-LIKE keyword scan "
    "(apiserver/index.js:85-102). FP-portable: the per-doc score folds "
    "its per-term components in sorted-term order on both sides "
    "(F.aggregate over array_sort == DuckDB list_reduce over "
    "list(ORDER BY term)), so the doubles agree bitwise before the "
    "round(6)",
)
def q_search_bm25_topk(spark, sf_dir):
    return ranking.bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@register(
    "search_bm25_maxscore",
    ranking.bm25_oracle_sql(_BM25_TERMS, k=10),
    "max-score pruned BM25 top-10 (Turtle & Flood 1995) — "
    "result-identical to search_bm25_topk (graded against the SAME "
    "exact oracle), but the wide full-scoring fold only runs over docs "
    "that can still beat the phase-1 threshold: per-term upper bounds "
    "are broadcast, θ rides a 1-row lazy cross join, and pruned docs "
    "never enter the struct-collect aggregation. The DAAT pruning that "
    "makes 10^10-doc keyword queries read one hot-term partition plus "
    "a bounded survivor set instead of every posting",
)
def q_search_bm25_maxscore(spark, sf_dir):
    return ranking.bm25_maxscore_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=10
    )


@register(
    "search_bm25_blockmax",
    ranking.bm25_oracle_sql(_BM25_TERMS, k=10),
    "block-max pruned BM25 top-10 (Ding & Suel SIGIR 2011) — "
    "result-identical to search_bm25_topk (graded against the SAME "
    "exact oracle), but phase-2 bounds read per-(term, docid-block) "
    "maxima from a broadcast skip table instead of max-score's one "
    "global bound per term, so strictly more docs prune before the "
    "wide struct-collect fold. The skip table is one extra "
    "map-side-combined groupBy over the postings scan max-score "
    "already reads; θ stays a 1-row lazy cross join, no driver collect",
)
def q_search_bm25_blockmax(spark, sf_dir):
    return ranking.bm25_blockmax_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=10, block=64
    )


@register(
    "inverted_index_postings",
    ranking.inverted_index_oracle_sql(),
    "inverted-index build: one row per term with document frequency, "
    "total tf, and the ascending-doc-id postings list serialized as "
    "doc:tf pairs (scalar output for the driver's hash canonicalizer) — "
    "pure integer/string aggregation, one groupBy(term) shuffle; the "
    "shard_size variant that bounds hot-term postings at web scale is "
    "pytest-asserted to concatenate back to this exact output",
)
def q_inverted_index_postings(spark, sf_dir):
    return ranking.inverted_index(_t(spark, sf_dir, "documents"))


@register(
    "link_bfs_depths",
    graph.bfs_oracle_sql(_PAGERANK_EDGES_CTE, seeds=[0, 1], max_depth=4),
    "minimum-hop BFS depth from a 2-seed set over the md5-derived link "
    "graph (4 levels) — the reference's depth-then-discovery frontier "
    "rank (crawler/crawler.go:116) as a standalone graph operator; pure "
    "set semantics (no FP), bit-identical at any parallelism, exact "
    "unrolled-CTE oracle like host_pagerank",
)
def q_link_bfs_depths(spark, sf_dir):
    return graph.bfs_depths(
        _pagerank_edges(spark, sf_dir), seeds=[0, 1], max_depth=4
    )


_EMB_NEARDUP_MD5_ORACLE = """
    WITH dim AS (SELECT len(embedding) AS n FROM embeddings LIMIT 1),
    signs AS (
      SELECT t.t AS tbl, p.p AS plane,
             [CASE WHEN ('0x' || substr(md5(t.t || '_' || p.p || '_' || j), 1, 8))::BIGINT & 1 = 1
                   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
              FOR j IN range(0, (SELECT n FROM dim))] AS sv
      FROM range(2) t(t), range(4) p(p)
    ),
    pb AS (
      SELECT e.vec_id, s.tbl, s.plane,
             CASE WHEN list_reduce(
                    list_transform(list_zip(e.embedding, s.sv),
                                   pr -> CAST(pr[1] AS DOUBLE) * pr[2]),
                    (a, b) -> a + b) >= 0
                  THEN (1 << s.plane) ELSE 0 END AS bit
      FROM embeddings e, signs s
    ),
    buckets AS (
      SELECT vec_id, tbl, SUM(bit) AS bucket FROM pb GROUP BY vec_id, tbl
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             round(
               list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * x)))),
               5) AS cos
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.35
"""


@register(
    "embedding_neardup_md5",
    _EMB_NEARDUP_MD5_ORACLE,
    "embedding-cosine near-dup pairs via md5-Rademacher SRP buckets "
    "(2 tables x 4 planes, candidate = same bucket in any table, exact "
    "cosine >= 0.35 filter) — completes the md5-portable exact-oracle "
    "pattern across the ANN family; the seeded-Gaussian + auto_planes "
    "variant (embedding_neardup) stays the scale default",
)
def q_embedding_neardup_md5(spark, sf_dir):
    return similarity.embedding_neardup_pairs_md5(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=4, tables=2
    )


from ..operators import semdedup as _semdedup  # noqa: E402


@register(
    "semdedup_keep",
    _semdedup.semdedup_oracle_sql(threshold=0.35, n_cells=8),
    "SemDeDup semantic dedup (Abbas et al. 2023): md5-seeded coarse "
    "quantizer -> within-cell cosine pruning keeping the member farthest "
    "from its centroid (d2c DESC, id ASC total order) — the embedding-"
    "space counterpart of the MinHash family; one cell shuffle, pairwise "
    "only inside bounded cells, strict-left-fold FP so both engines "
    "agree bitwise; per-row verdict (vec_id, cell, d2c, kept)",
)
def q_semdedup_keep(spark, sf_dir):
    return _semdedup.semdedup_keep(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_cells=8
    )


from ..operators import dsir as _dsir  # noqa: E402


@register(
    "dsir_resample_topk",
    _dsir.dsir_oracle_sql(target_pred="lang = 'en'", k=50, n_buckets=64),
    "DSIR importance resampling (Xie et al. NeurIPS 2023): hashed "
    "unigram+bigram multinomials over target (lang='en') vs raw corpus, "
    "per-doc log-importance via bucket-ordered strict fold, md5-Gumbel "
    "top-50 without replacement — distributional-match curation "
    "complementing the absolute-quality Gopher/CCNet filters; ratio "
    "table B-bounded broadcast, totals on a 1-row crossJoin, TakeOrdered "
    "top-k, zero Python",
)
def q_dsir_resample_topk(spark, sf_dir):
    return _dsir.dsir_resample_topk(
        _t(spark, sf_dir, "documents"), target_pred="lang = 'en'", k=50, n_buckets=64
    )


@register(
    "more_like_this",
    ranking.more_like_this_oracle_sql(query_doc_id=0, k=10),
    "related-document retrieval: top-10 docs by TF-IDF cosine to doc 0 "
    "— the web-scale form of the reference's shared-tag related "
    "listings; norms AND the dot fold in sorted-term order on both "
    "sides so the doubles agree bitwise before round(6); the query "
    "side is one broadcast document, the corpus side filters to its "
    "terms before the shuffle",
)
def q_more_like_this(spark, sf_dir):
    return ranking.more_like_this(_t(spark, sf_dir, "documents"), query_doc_id=0, k=10)


@register(
    "search_snippets",
    ranking.search_snippets_oracle_sql(_BM25_TERMS, window=5),
    "result-page snippets: earliest query-term hit position and the "
    "pos±5-token context (clamped at text edges) for every matching "
    "document — pure Catalyst (split/array_position/slice/array_join, "
    "no FP, no Python), bit-identical at any parallelism",
)
def q_search_snippets(spark, sf_dir):
    return ranking.search_snippets(_t(spark, sf_dir, "documents"), _BM25_TERMS, window=5)


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py): as-of join and bucketed range
# join — the two classic non-equi joins Spark lacks as operators,
# re-expressed as shuffle-friendly compositions. DuckDB has both natively
# (ASOF JOIN / theta join), giving exact oracles for the compositions.
# ---------------------------------------------------------------------------
from ..operators import temporal  # noqa: E402


@register(
    "asof_join_events",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           coalesce(p.value, -1.0) AS asof_value,
           coalesce(epoch_us(p.ts), -1) AS asof_us
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "backward as-of join: every click picks up the user's most recent "
    "prior-or-simultaneous purchase (value + its epoch-us timestamp, "
    "-1 sentinels when none) — Spark has no ASOF JOIN, so the operator "
    "is a tag-union + one (key, ts) window carrying the last right "
    "value forward: ONE shuffle, no nested loop; DuckDB's native "
    "ASOF LEFT JOIN is the oracle. Right side pre-deduped per "
    "(user, ts) because duplicate equal timestamps make 'the' match "
    "ill-defined in both engines",
)
def q_asof_join_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = temporal.asof_join(
        clicks, purchases, key="user_id", value_cols=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("asof_value"), F.lit(-1.0)).alias("asof_value"),
        F.coalesce(F.unix_micros(F.col("asof_ts").cast("timestamp")), F.lit(-1)).alias("asof_us"),
    )


@register(
    "range_join_window_counts",
    """
    SELECT p.event_id, COUNT(c.ts) AS n_in_window
    FROM events p
    LEFT JOIN events c
      ON c.event_type = 'click'
     AND c.ts >= p.ts
     AND c.ts < p.ts + INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    "range (interval-containment) join: clicks counted into each "
    "purchase's [ts, ts+30min) window — Catalyst executes the raw "
    "theta join as BroadcastNestedLoopJoin, so the operator buckets "
    "both sides to width-sized bins (each window spans <= 2 bins), joins "
    "EQUI on the bin, and post-filters exact containment; zero-count "
    "purchases kept (left-outer semantics). Oracle: the literal theta "
    "LEFT JOIN in DuckDB",
)
def q_range_join_window_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    return temporal.range_count_join(clicks, purchases, width_minutes=30)


_ANCHOR_LINKS_CTE = rf"""
  SELECT q.dst, array_to_string(q.t[q.pos:q.pos+1], ' ') AS anchor
  FROM (
    SELECT e0.dst, s.t,
           1 + ('0x'||substr(md5(e0.src::VARCHAR||'@'||e0.dst::VARCHAR),1,8))::BIGINT
               % greatest(len(s.t) - 1, 1) AS pos
    FROM ({_PAGERANK_EDGES_CTE}) e0
    JOIN (SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             x -> x != '') AS t
          FROM documents) s ON s.doc_id = e0.src) q
"""


@register(
    "anchor_text_topk",
    ranking.anchor_profiles_oracle_sql(_ANCHOR_LINKS_CTE, k=3),
    "per-target ANCHOR-TEXT profiles over the md5-derived link graph: "
    "each link carries a 2-token anchor sliced from the SOURCE page at "
    "an md5-chosen offset; top-3 anchor terms per destination "
    "(count desc, term asc — total order). The link-based ranking "
    "signal the reference's LIKE-scan search cannot see (Brin & Page "
    "1998 §2.2); one (dst,term) map-side-combined shuffle + a window "
    "over per-dst distinct terms",
)
def q_anchor_text_topk(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    e = _pagerank_edges(spark, sf_dir)
    toks = d.select(
        "doc_id", ts.nonempty_tokens_col(F.lower(F.col("text"))).alias("t")
    )
    pos = (
        dedup.md5_32_col(
            F.concat(
                F.col("src").cast("string"),
                F.lit("@"),
                F.col("dst").cast("string"),
            )
        )
        % F.greatest(F.size("t") - 1, F.lit(1))
        + 1
    )
    links = e.join(toks, e.src == toks.doc_id).select(
        "dst", F.concat_ws(" ", F.slice("t", pos, 2)).alias("anchor")
    )
    return ranking.anchor_profiles(links, k=3).orderBy("dst", "rnk")


# ---------------------------------------------------------------------------
# BM25F — fielded ranking over body/title/anchor (round 4 cont. 11)
# ---------------------------------------------------------------------------
_BM25F_WEIGHTS = {"body": 1.0, "title": 3.0, "anchor": 4.0}
_BM25F_B = {"body": 0.75, "title": 0.5, "anchor": 0.4}

#: (doc, field, text) — body = full text, title = first 6 tokens,
#: anchor = ALL inbound anchor strings (the _ANCHOR_LINKS_CTE slices)
#: aggregated per destination. Join order inside the anchor field is a
#: total order (ORDER BY anchor == array_sort) though BM25F only reads
#: the token multiset.
_BM25F_FIELDS_CTE = rf"""
  SELECT doc_id AS doc, 'body' AS field, text FROM documents
  UNION ALL
  SELECT doc_id AS doc, 'title' AS field,
         array_to_string(
           list_filter(string_split_regex(trim(lower(text)), '\s+'),
                       x -> x != '')[1:6], ' ') AS text
  FROM documents
  UNION ALL
  SELECT dst AS doc, 'anchor' AS field,
         string_agg(anchor, ' ' ORDER BY anchor) AS text
  FROM ({_ANCHOR_LINKS_CTE}) a GROUP BY dst
"""


@register(
    "search_bm25f",
    ranking.bm25f_oracle_sql(
        _BM25F_FIELDS_CTE, _BM25_TERMS, _BM25F_WEIGHTS, _BM25F_B, k=10
    ),
    "BM25F top-10 (Robertson, Zaragoza & Taylor, CIKM 2004) over three "
    "fields — body, title (first 6 tokens), and the graded link graph's "
    "inbound ANCHOR TEXT (weights 1/3/4): per-field length-normalized "
    "term frequencies combine BEFORE the single saturation, the fielded "
    "ranking function web engines actually run (a term in 3 fields must "
    "not triple-dip BM25's tf curve). FP-portable like search_bm25_topk: "
    "field fold sorted by field, term fold sorted by term, both strict "
    "left folds, round(6) after",
)
def q_search_bm25f(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = ts.nonempty_tokens_col(F.lower(F.col("text")))
    body = d.select(
        F.col("doc_id").alias("doc"),
        F.lit("body").alias("field"),
        F.col("text"),
    )
    title = d.select(
        F.col("doc_id").alias("doc"),
        F.lit("title").alias("field"),
        F.concat_ws(" ", F.slice(toks, 1, 6)).alias("text"),
    )
    e = _pagerank_edges(spark, sf_dir)
    src_toks = d.select("doc_id", toks.alias("t"))
    pos = (
        dedup.md5_32_col(
            F.concat(
                F.col("src").cast("string"),
                F.lit("@"),
                F.col("dst").cast("string"),
            )
        )
        % F.greatest(F.size("t") - 1, F.lit(1))
        + 1
    )
    links = e.join(src_toks, e.src == src_toks.doc_id).select(
        "dst", F.concat_ws(" ", F.slice("t", pos, 2)).alias("anchor")
    )
    anchor = (
        links.groupBy(F.col("dst").alias("doc"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("anchor")), " ").alias(
                "text"
            )
        )
        .select("doc", F.lit("anchor").alias("field"), "text")
    )
    fields = body.unionByName(title).unionByName(anchor)
    return ranking.bm25f_topk(
        fields, _BM25_TERMS, weights=_BM25F_WEIGHTS, field_b=_BM25F_B, k=10
    )


# ---------------------------------------------------------------------------
# cardinality sketches + cross-snapshot change detection (round 4 cont. 6)
# ---------------------------------------------------------------------------
from ..operators import sketches, snapshots  # noqa: E402

#: deterministic "next crawl snapshot" of documents: an md5-derived
#: cohort (decorrelated from doc_id/host assignment, unlike a bare
#: doc_id % 10 — testdata hosts are doc_id-modular) picks ~30% of
#: surviving docs to change text, ~10% to disappear, and ~10% to also
#: spawn a brand-new doc (id offset 10^9) — the synthetic twin a
#: recrawl diff needs; shared by the snapshot/sketch entries below.
_SNAPSHOT_B_CTE = """
  SELECT doc_id, source,
         CASE WHEN c < 3 THEN text || ' [rev2]' ELSE text END AS text
  FROM (SELECT doc_id, source, text,
               ('0x'||substr(md5(doc_id::VARCHAR||'~snap'),1,8))::BIGINT % 10
                 AS c
        FROM documents) q WHERE c != 3
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, source, text
  FROM (SELECT doc_id, source, text,
               ('0x'||substr(md5(doc_id::VARCHAR||'~snap'),1,8))::BIGINT % 10
                 AS c
        FROM documents) q WHERE c = 4
"""


def _snapshot_b(spark, sf_dir):
    """Spark twin of _SNAPSHOT_B_CTE."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    c = (
        dedup.md5_32_col(
            F.concat(F.col("doc_id").cast("string"), F.lit("~snap"))
        )
        % 10
    )
    q = d.withColumn("c", c)
    mutated = q.filter(F.col("c") != 3).select(
        "doc_id",
        "source",
        F.when(F.col("c") < 3, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    born = q.filter(F.col("c") == 4).select(
        (F.col("doc_id") + F.lit(10**9)).alias("doc_id"), "source", "text"
    )
    return mutated.unionByName(born)


@register(
    "host_distinct_hll",
    sketches.hll_oracle_sql(
        "SELECT source, doc_id FROM documents", ["source"], "doc_id", b=6
    ),
    "HyperLogLog distinct-doc sketch per host (b=6, md5-portable hash): "
    "graded output is the INTEGER register aggregate (buckets_hit, "
    "z_scaled) plus the raw harmonic-mean estimate — a sketch with an "
    "EXACT oracle, because bucket=top-6 md5 bits and rank=first-set-bit "
    "(via length(bin(w)), identical in both engines) are pure integers. "
    "At 10^10 URLs this replaces COUNT(DISTINCT)'s full key shuffle with "
    "a map-side-combined groupBy().max() bounded at 64 rows/host "
    "(Flajolet et al. 2007)",
)
def q_host_distinct_hll(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    regs = sketches.hll_registers(d, ["source"], "doc_id", b=6)
    return sketches.hll_estimate(regs, ["source"], b=6)


@register(
    "link_hyperball",
    graph.hyperball_oracle_sql(_PAGERANK_EDGES_CTE, iters=4, b=4),
    "HyperBall (Boldi & Vigna, ICDM-W 2013 — the 'four degrees of "
    "separation' algorithm): neighborhood function N(v,t)=|ball(v,t)| "
    "for every node at every radius t=0..4, one md5-portable HLL "
    "counter per node absorbing its out-neighbors' counters each round "
    "(merge = MAX per (node,bucket) — associative/idempotent, so every "
    "level's register state is bit-identical at any parallelism and in "
    "the unrolled DuckDB oracle). The reachability-growth profile a "
    "frontier scheduler budgets by, and the quantitative twin of the "
    "graded bow-tie decomposition; per round ONE edge-join + map-side-"
    "combined groupBy-max, ~(E + 16N) 3-int rows — the HyperBall cost "
    "model itself",
)
def q_link_hyperball(spark, sf_dir):
    return graph.hyperball(_pagerank_edges(spark, sf_dir), iters=4, b=4)


@register(
    "link_harmonic_centrality",
    graph.harmonic_centrality_oracle_sql(_PAGERANK_EDGES_CTE, iters=4, b=4),
    "harmonic centrality via HyperBall (Boldi & Vigna 2013; their "
    "'Axioms for Centrality' case that this is THE web centrality — "
    "closeness breaks on unreachable pairs, harmonic does not): "
    "H(v) = sum_t (1/t)(|ball(v,t)|-|ball(v,t-1)|), every node first "
    "reached at distance t contributes 1/t. The graded oracle nests the "
    "FULL hyperball register chains + per-level estimates and adds the "
    "ascending-t telescoping fold (strict left fold both sides, "
    "round(6)) — one slot re-verifies the whole sketch pipeline plus "
    "the centrality it exists to compute",
)
def q_link_harmonic_centrality(spark, sf_dir):
    return graph.harmonic_centrality(
        _pagerank_edges(spark, sf_dir), iters=4, b=4
    )


@register(
    "web_distance_distribution",
    graph.distance_distribution_oracle_sql(_PAGERANK_EDGES_CTE, iters=4, b=4),
    "distance distribution + effective diameter via HyperBall (the "
    "'Four Degrees of Separation' measurement, Backstrom et al. WebSci "
    "2012): N(t) = sum_v |ball(v,t)| per radius with cumulative ppm; "
    "d_eff(0.9) = first t with at_or_past_p90. Scale-portable sum: each "
    "node contributes floor(est*2^20) so the corpus-wide reduction is "
    "an associative BIGINT sum — order-free at any parallelism, exact "
    "in DuckDB — instead of an order-dependent double sum over 10^10 "
    "nodes",
)
def q_web_distance_distribution(spark, sf_dir):
    return graph.distance_distribution(
        _pagerank_edges(spark, sf_dir), iters=4, b=4
    )


@register(
    "search_rank_fusion_rrf",
    rf"""
    WITH bm AS MATERIALIZED (
      {ranking.bm25_oracle_sql(_BM25_TERMS, k=50)}
    ),
    pr0 AS MATERIALIZED (
      {graph.pagerank_oracle_sql(_PAGERANK_EDGES_CTE, iters=5)}
    ),
    pr AS (SELECT node, rank FROM pr0 ORDER BY rank DESC, node ASC LIMIT 50),
    bmr AS (SELECT doc_id AS doc, 'bm25' AS sys,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
            FROM bm),
    prr AS (SELECT node AS doc, 'pagerank' AS sys,
                   row_number() OVER (ORDER BY rank DESC, node ASC) AS rnk
            FROM pr),
    u AS (SELECT * FROM bmr UNION ALL SELECT * FROM prr),
    f AS (SELECT doc,
                 round(list_reduce(
                   list_prepend(0.0, list(1.0 / (60.0 + rnk) ORDER BY sys)),
                   (x, y) -> x + y), 6) AS rrf
          FROM u GROUP BY doc)
    SELECT doc, rrf FROM f ORDER BY rrf DESC, doc ASC LIMIT 10
    """,
    "reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009): "
    "RRF(d) = sum_s 1/(60 + rank_s(d)) fusing the query-DEPENDENT BM25 "
    "top-50 with the query-INDEPENDENT integer-PageRank top-50 — the "
    "standard calibration-free way a web engine folds its link prior "
    "into text retrieval. The graded oracle nests BOTH upstream oracles "
    "(the BM25 fold chain and the 5-iteration unrolled rank chain) as "
    "scoped CTEs, so one row re-verifies text scoring, link ranking, "
    "and the fusion fold (sorted-system strict left fold, round(6))",
)
def q_search_rank_fusion_rrf(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bm = ranking.bm25_topk(d, _BM25_TERMS, k=50)
    pr = (
        graph.pagerank(_pagerank_edges(spark, sf_dir), iters=5)
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(50)
        .select(F.col("node").alias("doc_id"), F.col("rank").alias("score"))
    )
    return ranking.rrf_fuse(
        {"bm25": bm.select(F.col("doc_id"), F.col("score")), "pagerank": pr},
        k0=60,
        k=10,
        id_col="doc_id",
    ).select(F.col("doc_id").alias("doc"), "rrf")


def _allpairs_cosine_oracle(threshold: float) -> str:
    """Brute-force tf-idf cosine all-pairs oracle: the literal O(n^2)
    scan the prefix-filtered operator must equal (pruning exactness
    graded as a theorem). Same weighting, same sorted-term folds."""
    return rf"""
    WITH corpus AS (
      SELECT doc_id AS doc,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x != '') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    nd AS (SELECT COUNT(*)::DOUBLE AS n FROM corpus),
    tf AS (
      SELECT doc, term, COUNT(*)::BIGINT AS tf
      FROM (SELECT doc, unnest(t) AS term FROM corpus) q
      GROUP BY doc, term
    ),
    dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
    w AS (
      SELECT doc, term,
             tf::DOUBLE * ln(((SELECT n FROM nd) + 1.0) / (df + 1.0)) AS w
      FROM tf JOIN dfreq USING (term)
    ),
    nrm AS (
      SELECT doc,
             sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY term)),
                              (x, y) -> x + y)) AS nm
      FROM w GROUP BY doc
    ),
    wn AS (SELECT w.doc, w.term, w.w / nrm.nm AS w
           FROM w JOIN nrm ON nrm.doc = w.doc),
    prods AS (
      SELECT a.doc AS id_a, b.doc AS id_b, a.term, a.w * b.w AS p
      FROM wn a JOIN wn b ON a.term = b.term AND a.doc < b.doc
    ),
    cosmat AS (
      SELECT id_a, id_b,
             round(list_reduce(list_prepend(0.0, list(p ORDER BY term)),
                               (x, y) -> x + y), 6) AS cos
      FROM prods GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, cos FROM cosmat WHERE cos >= {float(threshold)!r}
    """


_ALLPAIRS_THRESHOLD = 0.9


@register(
    "allpairs_cosine_prefix",
    _allpairs_cosine_oracle(_ALLPAIRS_THRESHOLD),
    "all-pairs tf-idf cosine similarity with PREFIX FILTERING (Bayardo, "
    "Ma & Srikant, WWW 2007): each doc indexes only the head of its "
    "term list (terms whose inclusive tail bound sum w*maxw can still "
    "reach the threshold) and candidates come from index-vs-full-vector "
    "term joins — provably no false negatives — then exact cosine "
    "verifies. Graded against the literal O(n^2) brute-force oracle, so "
    "the exact match IS the pruning theorem. High-df terms carry tiny "
    "idf weights and fall out of every index: the join skips exactly "
    "the posting lists that explode a naive term self-join at 10^10",
)
def q_allpairs_cosine_prefix(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.allpairs_cosine(d, threshold=_ALLPAIRS_THRESHOLD)


@register(
    "neardup_incremental",
    _minhash_pairs_oracle(
        "SELECT doc_id, text FROM (" + _SNAPSHOT_B_CTE + ") snapb"
    ),
    "INCREMENTAL near-dup maintenance across recrawl snapshots: the "
    "next snapshot's MinHash signatures are the prior snapshot's CACHED "
    "rows for unchanged docs plus fresh signatures for changed/new docs "
    "only — graded against the FULL-recompute oracle over the B corpus, "
    "so the exact match proves carry-forward == recompute (the "
    "merge==rebuild theorem pattern of index_delta_merge, applied to "
    "dedup). At 10^10 docs with ~30% churn per recrawl this is the "
    "difference between re-signing 3*10^9 docs and 10^10 every round; "
    "the unchanged-doc probe is one doc_id join + text equality",
)
def q_neardup_incremental(spark, sf_dir):
    a = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b = _snapshot_b(spark, sf_dir).select("doc_id", "text")
    # the prior snapshot's signature artifact (in production: read back
    # from the signatures table the last round wrote)
    sigs_a = dedup.with_minhash(
        dedup.with_shingles(a, "text", 3), 32, hash="md5"
    )
    old = a.select("doc_id", F.col("text").alias("_old"))
    delta = (
        b.join(old, "doc_id", "left")
        .filter(F.col("_old").isNull() | (F.col("_old") != F.col("text")))
        .select("doc_id", "text")
    )
    carried = (
        b.join(old, "doc_id", "inner")
        .filter(F.col("_old") == F.col("text"))
        .select("doc_id")
    )
    sigs_b = sigs_a.join(carried, "doc_id", "left_semi").unionByName(
        dedup.with_minhash(dedup.with_shingles(delta, "text", 3), 32, hash="md5")
    )
    return dedup.minhash_lsh_pairs(b, threshold=0.3, hash="md5", sigs=sigs_b)


@register(
    "corpus_distinct_hll_merge",
    sketches.hll_oracle_sql(
        f"""SELECT source, doc_id FROM documents
        UNION ALL SELECT source, doc_id FROM ({_SNAPSHOT_B_CTE}) b""",
        ["source"],
        "doc_id",
        b=6,
    ),
    "sketch MERGEABILITY graded as a theorem: Spark merges the two "
    "snapshots' per-host HLL register tables (hll_merge = groupBy MAX), "
    "while the oracle sketches the UNION of the raw inputs — equality "
    "holds iff max-merge is lossless, which is the property that lets "
    "crawl rounds maintain distinct-URL counts incrementally (merge the "
    "per-round sketch, never rescan history)",
)
def q_corpus_distinct_hll_merge(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    a = sketches.hll_registers(d, ["source"], "doc_id", b=6)
    b = sketches.hll_registers(_snapshot_b(spark, sf_dir), ["source"], "doc_id", b=6)
    return sketches.hll_estimate(sketches.hll_merge(a, b), ["source"], b=6)


_DOCLEN_VALS_CTE = r"""
  SELECT len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> x != '')) AS v
  FROM documents WHERE text IS NOT NULL
"""


@register(
    "doclen_quantile_hist",
    sketches.hist_quantile_oracle_sql(
        _DOCLEN_VALS_CTE, q_pcts=[50, 90, 99], bin_width=16
    ),
    "mergeable histogram quantile sketch: doc token-length p50/p90/p99 "
    "from a fixed-width (16-token) integer histogram — the quantile "
    "member of the sketch family (HLL distinct, CMS frequency, this). "
    "All-integer rank arithmetic (ceil(q*N/100) via div), so estimates "
    "are bit-stable at any parallelism, unlike interpolated FP "
    "percentiles (doclen_percentiles grades those exactly; this grades "
    "the sketch a 1000-executor telemetry pipeline would actually "
    "ship: per-partition histograms merge by groupBy-sum, keyspace "
    "bounded by max_len/16 at ANY corpus size; error <= bin_width/2 "
    "by construction)",
)
def q_doclen_quantile_hist(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    vals = d.select(
        F.size(ts.nonempty_tokens_col(F.lower(F.col("text")))).alias("v")
    )
    regs = sketches.hist_registers(vals, "v", bin_width=16)
    return sketches.hist_quantiles(regs, q_pcts=[50, 90, 99], bin_width=16)


@register(
    "snapshot_change_detection",
    snapshots.snapshot_diff_oracle_sql(
        "SELECT doc_id, text FROM documents",
        f"SELECT doc_id, text FROM ({_SNAPSHOT_B_CTE}) b",
        key_col="doc_id",
        content_col="text",
    ),
    "cross-snapshot recrawl diff: every doc_id classified unchanged/"
    "changed/gone/new between the corpus and its deterministic next "
    "snapshot — the observed-change signal a web-scale recrawler "
    "schedules by (Cho & Garcia-Molina 2003) where the reference uses "
    "staleness alone (crawler/db/mysql.go:238). Both sides reduce to "
    "16-byte md5 fingerprints map-side before ONE full-outer join; the "
    "status is a projection over the join's null pattern",
)
def q_snapshot_change_detection(spark, sf_dir):
    old = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new = _snapshot_b(spark, sf_dir).select("doc_id", "text")
    return snapshots.snapshot_diff(old, new, key_col="doc_id", content_col="text")


@register(
    "host_change_rates",
    f"""
    WITH n0 AS ({_SNAPSHOT_B_CTE}),
    o AS (SELECT doc_id AS k, source, md5(text) AS fp_old,
                 1 AS has_old FROM documents),
    n AS (SELECT doc_id AS k, source, md5(text) AS fp_new,
                 1 AS has_new FROM n0),
    j AS (SELECT COALESCE(o.k, n.k) AS k,
                 COALESCE(o.source, n.source) AS grp,
                 fp_old, fp_new, has_old, has_new
          FROM o FULL OUTER JOIN n ON o.k = n.k),
    s AS (SELECT grp,
                 CASE WHEN has_old IS NULL THEN 'new'
                      WHEN has_new IS NULL THEN 'gone'
                      WHEN fp_old IS NOT DISTINCT FROM fp_new
                        THEN 'unchanged'
                      ELSE 'changed' END AS status
          FROM j),
    agg AS (SELECT grp,
                   SUM((status = 'unchanged')::BIGINT) AS n_unchanged,
                   SUM((status = 'changed')::BIGINT) AS n_changed,
                   SUM((status = 'gone')::BIGINT) AS n_gone,
                   SUM((status = 'new')::BIGINT) AS n_new
            FROM s GROUP BY grp)
    SELECT grp AS source, n_unchanged, n_changed, n_gone, n_new,
           CASE WHEN n_unchanged + n_changed > 0
                THEN n_changed::DOUBLE / (n_unchanged + n_changed) END
             AS changed_ratio
    FROM agg
    """,
    "per-host observed change rates from the snapshot diff: status "
    "counts plus changed_ratio over docs present in both snapshots — "
    "one observation of the Cho-Garcia-Molina change-rate estimator, "
    "the per-host revisit-priority input. Diff + host attribution + one "
    "map-side-combined groupBy",
)
def q_host_change_rates(spark, sf_dir):
    old = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    new = _snapshot_b(spark, sf_dir)
    st = snapshots.snapshot_diff(
        old.select("doc_id", "text"),
        new.select("doc_id", "text"),
        key_col="doc_id",
        content_col="text",
    )
    hosts = (
        old.select("doc_id", "source")
        .unionByName(new.select("doc_id", "source"))
        .distinct()
    )
    rates = snapshots.change_rate(st.join(hosts, "doc_id"), "source")
    # the oracle's SUM((...)::BIGINT) returns HUGEINT, which DuckDB hands
    # to pandas as float64 — match that serialization (equal values,
    # driver hashes the fetched frame) by emitting DOUBLE counts here
    return rates.select(
        "source",
        *[F.col(c).cast("double").alias(c)
          for c in ("n_unchanged", "n_changed", "n_gone", "n_new")],
        "changed_ratio",
    )


@register(
    "link_hits",
    graph.hits_oracle_sql(_PAGERANK_EDGES_CTE, iters=4),
    "fixed-point integer HITS (Kleinberg 1999, 4 iterations) over the "
    "md5-derived link graph: hub + authority mass in BIGINT units, "
    "L1-renormalized by integer division each half-step, so the "
    "iterative dual of host_pagerank is bit-identical at any shuffle "
    "parallelism and exactly oracle-checkable via an unrolled CTE "
    "chain. Hubs are what the frontier scheduler lacks in pure "
    "PageRank: a high-hub page's OUTLINKS are the high-value frontier",
)
def q_link_hits(spark, sf_dir):
    return graph.hits(_pagerank_edges(spark, sf_dir), iters=4)


@register(
    "related_pages_cocitation",
    graph.cocitation_oracle_sql(_PAGERANK_EDGES_CTE, k=5, max_out_degree=64),
    "related pages by CO-CITATION (Dean & Henzinger 1999): top-5 "
    "partners per page by count of common in-linking sources — the "
    "link-structure form of the reference's related-listings feature "
    "(more_like_this is its text-side dual). The out-degree cap (64) "
    "that bounds the quadratic pair explode is the operator's skew "
    "guard at web scale; the synthetic graph's degrees sit under it, "
    "so the cap's drop semantics are pinned by pytest instead",
)
def q_related_pages_cocitation(spark, sf_dir):
    return graph.cocitation_topk(
        _pagerank_edges(spark, sf_dir), k=5, max_out_degree=64
    )


_TOKS_CTE = r"""
  SELECT unnest(list_filter(
           string_split_regex(trim(lower(text)), '\s+'), x -> x != '')) AS term
  FROM documents
"""


@register(
    "cms_term_freq",
    sketches.cms_oracle_sql(
        source_sql=_TOKS_CTE,
        value_expr="term",
        candidates_sql=f"SELECT DISTINCT term FROM ({_TOKS_CTE}) t",
        cand_expr="term",
        depth=4,
        width=64,
        out_col="term",
    ),
    "Count-Min sketch term frequencies (Cormode & Muthukrishnan 2005, "
    "d=4 x w=64, md5-portable row hashes): estimated corpus frequency "
    "for every distinct term (the synthetic vocab is small; at 10^10 "
    "scale candidates would be an md5 sample or suspected heavy "
    "hitters) — the frequency dual of host_distinct_hll, and like it "
    "a probabilistic sketch "
    "graded against an EXACT oracle because the register matrix is "
    "pure integers. The heavy-hitter detector at 10^10 URLs: one "
    "map-side-combined groupBy onto <=256 cells, probes broadcast-join "
    "the tiny matrix",
)
def q_cms_term_freq(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # aggregate the token stream to (term, count) BEFORE sketching: the
    # register matrix is a pure integer sum, so hashing each distinct
    # term once with its count as the CMS weight yields cell-for-cell
    # the same matrix as hashing every occurrence (counter addition is
    # associative) — depth x |vocab| md5s instead of depth x |tokens|
    # (guide §2.3 "aggregate before you shuffle"; the map-side-combined
    # groupBy replaces both the raw-token checkpoint and the distinct()
    # pass, since the vocab table IS the candidate set)
    tc = (
        d.select(
            F.explode(
                ts.nonempty_tokens_col(F.lower(F.col("text")))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("_w"))
        .localCheckpoint(eager=False)
    )
    regs = sketches.cms_registers(tc, "term", depth=4, width=64, weight_col="_w")
    cands = tc.select("term")
    return sketches.cms_estimate(regs, cands, "term", depth=4, width=64)


@register(
    "host_revisit_priority",
    f"""
    WITH n0 AS ({_SNAPSHOT_B_CTE}),
    o AS (SELECT doc_id AS k, source, md5(text) AS fp_old,
                 1 AS has_old FROM documents),
    n AS (SELECT doc_id AS k, source, md5(text) AS fp_new,
                 1 AS has_new FROM n0),
    j AS (SELECT COALESCE(o.k, n.k) AS k,
                 COALESCE(o.source, n.source) AS grp,
                 fp_old, fp_new, has_old, has_new
          FROM o FULL OUTER JOIN n ON o.k = n.k),
    s AS (SELECT grp,
                 CASE WHEN has_old IS NULL THEN 'new'
                      WHEN has_new IS NULL THEN 'gone'
                      WHEN fp_old IS NOT DISTINCT FROM fp_new
                        THEN 'unchanged'
                      ELSE 'changed' END AS status
          FROM j),
    agg AS (SELECT grp,
                   SUM((status = 'unchanged')::BIGINT) AS n_unchanged,
                   SUM((status = 'changed')::BIGINT) AS n_changed,
                   SUM((status = 'gone')::BIGINT) AS n_gone,
                   SUM((status = 'new')::BIGINT) AS n_new
            FROM s GROUP BY grp),
    pct AS (SELECT grp,
                   CASE WHEN n_unchanged + n_changed > 0
                        THEN (100 * n_changed) // (n_unchanged + n_changed)
                        WHEN n_gone + n_new > 0 THEN 100
                        ELSE 0 END AS change_pct
            FROM agg),
    ages AS (SELECT DISTINCT source,
                    1 + ('0x'||substr(md5(source||'~age'),1,8))::BIGINT % 8
                      AS age_rounds
             FROM documents)
    SELECT a.source, a.age_rounds::BIGINT AS age_rounds,
           COALESCE(p.change_pct, 100)::BIGINT AS change_pct,
           (a.age_rounds * (1 + COALESCE(p.change_pct, 100)))::BIGINT
             AS priority
    FROM ages a LEFT JOIN pct p ON p.grp = a.source
    """,
    "change-aware revisit priority per host (Cho & Garcia-Molina): "
    "priority = age_rounds * (1 + observed change_pct), ALL-INTEGER so "
    "the recrawl ordering is bit-stable at any parallelism — the "
    "upgrade of the reference's staleness-only lastUpdated clock "
    "(crawler/db/mysql.go:238). Ages are md5-derived rounds-since-"
    "visit; change_pct comes from the snapshot diff; the result feeds "
    "frontier.dequeue_wave(priority=...) (wired in pytest)",
)
def q_host_revisit_priority(spark, sf_dir):
    old = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    new = _snapshot_b(spark, sf_dir)
    st = snapshots.snapshot_diff(
        old.select("doc_id", "text"),
        new.select("doc_id", "text"),
        key_col="doc_id",
        content_col="text",
    )
    hosts = (
        old.select("doc_id", "source")
        .unionByName(new.select("doc_id", "source"))
        .distinct()
    )
    rates = snapshots.change_rate(st.join(hosts, "doc_id"), "source")
    ages = (
        old.select("source")
        .distinct()
        .select(
            "source",
            (
                1
                + dedup.md5_32_col(
                    F.concat(F.col("source"), F.lit("~age"))
                )
                % 8
            ).alias("age_rounds"),
        )
    )
    return scheduling.revisit_priority(rates, ages, host_col="source")


from ..operators import lm  # noqa: E402


@register(
    "doc_lm_perplexity",
    lm.lm_oracle_sql(),
    "bigram-LM average log-likelihood per document (the CCNet-style "
    "perplexity quality filter, Wenzek et al. 2020): add-0.5-smoothed "
    "bigram model trained on the corpus itself with two vocab-bounded "
    "groupBys, scored via broadcast join; per-doc ln-terms folded in "
    "POSITION order (Catalyst aggregate over array_sort == DuckDB "
    "list_reduce ORDER BY pos) and rounded to 6 decimals, so the "
    "probabilistic score grades against an EXACT oracle. At 100 TB this "
    "IS the head/middle/tail corpus split",
)
def q_doc_lm_perplexity(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm.score_perplexity(d)


@register(
    "doc_stupid_backoff",
    lm.stupid_backoff_oracle_sql(),
    "Stupid Backoff trigram LM self-score per document (Brants, Popat, "
    "Xu, Och & Dean, EMNLP 2007 — the distributed MapReduce n-gram LM "
    "the web-scale deployments actually ran): relative-frequency scores "
    "with fixed 0.4 backoff through trigram -> bigram -> unigram, no "
    "normalization (what makes it embarrassingly distributable); one "
    "map-side-combined trigram groupBy, bigram/unigram/total counts "
    "re-aggregated from the materialized trigram table, broadcast-join "
    "scoring, position-ordered ln fold, 6-decimal round -> exact oracle. "
    "Complements doc_lm_perplexity: higher-order fluency signal for the "
    "head/middle/tail corpus split",
)
def q_doc_stupid_backoff(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm.stupid_backoff_scores(d)


from ..operators import boilerplate, mirrors  # noqa: E402

# The synthetic corpus has no newlines and no cross-host duplication, so
# (crawl_trap_hosts pattern) the graded entries inject a deterministic
# discriminating signal IDENTICALLY on both sides: md5-gated header/
# footer lines for boilerplate, md5-selected mirrored hosts for mirrors.
_BP_DOCS_CTE = """
  SELECT doc_id::VARCHAR AS doc_id, source,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 4 != 0
              THEN 'HDR ' || source || chr(10) || text || chr(10)
                   || 'FTR ' || substr(md5(source), 1, 8)
              ELSE 'HDR ' || source || chr(10) || text END AS text
  FROM documents
"""


@register(
    "host_boilerplate_lines",
    boilerplate.boilerplate_oracle_sql(_BP_DOCS_CTE, min_pct=80, min_docs=3),
    "per-host boilerplate line detection (the trafilatura/CCNet nav-bar"
    "/footer strip): a line is boilerplate when >= 80% of the host's "
    "docs carry it — ALL-INTEGER threshold (100*n_docs >= pct*host_docs)"
    " so classification is bit-stable. Headers are injected in 100% of "
    "docs (always detected), footers in an md5-gated ~75% (detected "
    "only where a host's small-sample share crosses 80% — the "
    "threshold does real work). One (host,line) shuffle, map-side "
    "combined; per-host line cardinality bounded by page size",
)
def q_host_boilerplate_lines(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    )
    hdr = F.concat(F.lit("HDR "), F.col("source"))
    ftr = F.concat(
        F.lit("FTR "), F.substring(F.md5(F.col("source")), 1, 8)
    )
    with_ftr = dedup.md5_32_col(F.col("doc_id")) % 4 != 0
    text2 = F.when(
        with_ftr,
        F.concat(hdr, F.lit("\n"), F.col("text"), F.lit("\n"), ftr),
    ).otherwise(F.concat(hdr, F.lit("\n"), F.col("text")))
    d2 = d.select("doc_id", "source", text2.alias("text"))
    return boilerplate.boilerplate_lines(d2, min_pct=80, min_docs=3)


_MIRROR_DOCS_CTE = """
  SELECT doc_id::VARCHAR AS doc_id, source, text FROM documents
  UNION ALL
  SELECT 'm-' || doc_id::VARCHAR, 'src1-mirror', text FROM documents
  WHERE source = 'src1'
  UNION ALL
  SELECT 'p-' || doc_id::VARCHAR, 'src2-partial', text FROM documents
  WHERE source = 'src2'
    AND ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 2 = 0
"""


@register(
    "mirror_host_pairs",
    mirrors.mirror_oracle_sql(
        _MIRROR_DOCS_CTE, min_jaccard_pct=30, max_hosts_per_fp=64
    ),
    "mirror-host detection: host pairs whose distinct content-"
    "fingerprint sets overlap at integer-Jaccard >= 30% — the host-"
    "level lift of the reference's per-listing seen-set contract "
    "(crawler/db/mysql.go:293), where a 10^10-URL crawl actually saves "
    "budget (skip the mirrored SITE). Pair explode is per fingerprint "
    "(quadratic in replication, not corpus size) with a stop-"
    "fingerprint cap as the skew guard. Graded over documents + an "
    "injected full mirror of src1 and an md5-chosen ~50% partial "
    "mirror of src2: the full pair reads 100, the partial ~50, "
    "everything else is below threshold",
)
def q_mirror_host_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    )
    full = d.filter(F.col("source") == "src1").select(
        F.concat(F.lit("m-"), F.col("doc_id")).alias("doc_id"),
        F.lit("src1-mirror").alias("source"),
        "text",
    )
    part = (
        d.filter(F.col("source") == "src2")
        .filter(dedup.md5_32_col(F.col("doc_id")) % 2 == 0)
        .select(
            F.concat(F.lit("p-"), F.col("doc_id")).alias("doc_id"),
            F.lit("src2-partial").alias("source"),
            "text",
        )
    )
    d2 = d.unionByName(full).unionByName(part)
    return mirrors.mirror_pairs(d2, min_jaccard_pct=30, max_hosts_per_fp=64)


from ..operators import urlmine  # noqa: E402

# No URL column exists in the synthetic tables, so the graded entry
# derives four deterministic URL families per document on BOTH sides:
# a numeric-id article path ({n}), a hex item path ({h}), a two-level
# calendar path with a session-id query (query stripped; the classic
# trap shape), and one static page per host.
_URLS_CTE = """
  SELECT 'http://' || source || '.example/article/' || doc_id AS url
  FROM documents
  UNION ALL
  SELECT 'http://' || source || '.example/item/'
         || substr(md5(doc_id::VARCHAR), 1, 12) FROM documents
  UNION ALL
  SELECT 'http://' || source || '.example/cal/' || (doc_id % 12)
         || '/' || (doc_id % 28) || '?sess='
         || substr(md5(doc_id::VARCHAR || '~s'), 1, 16) FROM documents
  UNION ALL
  SELECT DISTINCT 'http://' || source || '.example/about' FROM documents
"""


@register(
    "url_template_mining",
    urlmine.url_template_oracle_sql(_URLS_CTE),
    "URL path-template mining: URLs collapse to structural templates "
    "(digit runs -> {n}, hex runs >= 8 -> {h}, query/fragment "
    "stripped) counted per (host, template) — how an open-web frontier "
    "detects calendars/session traps BEFORE fetching (the URL-space "
    "generalization of crawl_trap_hosts). Pure-Catalyst regexp with "
    "RE2-safe classes and DuckDB's explicit 'g' flag; one map-side-"
    "combined groupBy, template cardinality bounded by site structure. "
    "Graded over four deterministic URL families per doc",
)
def q_url_template_mining(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("doc_id").alias("doc_num"),
        "source",
    )
    base = F.concat(F.lit("http://"), F.col("source"), F.lit(".example"))
    article = F.concat(base, F.lit("/article/"), F.col("doc_id"))
    item = F.concat(
        base, F.lit("/item/"), F.substring(F.md5(F.col("doc_id")), 1, 12)
    )
    cal = F.concat(
        base,
        F.lit("/cal/"),
        (F.col("doc_num") % 12).cast("string"),
        F.lit("/"),
        (F.col("doc_num") % 28).cast("string"),
        F.lit("?sess="),
        F.substring(
            F.md5(F.concat(F.col("doc_id"), F.lit("~s"))), 1, 16
        ),
    )
    urls = d.select(
        F.explode(F.array(article, item, cal)).alias("url")
    ).unionByName(
        d.select(F.concat(base, F.lit("/about")).alias("url")).distinct()
    )
    return urlmine.url_template_counts(urls)


# DUST fixture: each doc's canonical URL plus deterministic alias
# variants (session-id query for doc_id%3==0, trailing slash for %4==0,
# /index.html leaf for %5==0), all sharing the doc's content
# fingerprint; cross-doc exact-dup texts on one host alias too ('other').
_DUST_URLS_CTE = """
  SELECT 'http://' || source || '.example/p/' || doc_id AS url,
         md5(coalesce(text, '')) AS fp
  FROM documents
  UNION ALL
  SELECT 'http://' || source || '.example/p/' || doc_id
         || '?sess=' || substr(md5(doc_id::VARCHAR || '~q'), 1, 8),
         md5(coalesce(text, ''))
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'http://' || source || '.example/p/' || doc_id || '/',
         md5(coalesce(text, ''))
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT 'http://' || source || '.example/p/' || doc_id || '/index.html',
         md5(coalesce(text, ''))
  FROM documents WHERE doc_id % 5 = 0
"""


@register(
    "dust_mining_rules",
    urlmine.dust_rules_oracle_sql(_DUST_URLS_CTE, max_group=32, min_support=2),
    "DUST rule mining (Bar-Yossef et al., WWW 2006 — 'Do not crawl in "
    "the DUST'): same-host URLs with identical content fingerprints are "
    "aliases; each alias pair is classified by the rewrite rule mapping "
    "one onto the other (strip_query / trailing_slash / index_file / "
    "other) and rules with >=2 supporting pairs are emitted per host — "
    "what the frontier applies at canonicalization time so known-alias "
    "URLs are never fetched twice. One groupBy on (host, 16-byte fp), "
    "alias groups >32 URLs amputated before the C(n,2) pair explode, "
    "rule classification pure per-row codegen",
)
def q_dust_mining_rules(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("_id"),
        F.col("doc_id").alias("_num"),
        "source",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
    )
    base = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example/p/"), F.col("_id")
    )
    canon = d.select(base.alias("url"), "fp")
    sess = d.filter(F.col("_num") % 3 == 0).select(
        F.concat(
            base,
            F.lit("?sess="),
            F.substring(F.md5(F.concat(F.col("_id"), F.lit("~q"))), 1, 8),
        ).alias("url"),
        "fp",
    )
    slash = d.filter(F.col("_num") % 4 == 0).select(
        F.concat(base, F.lit("/")).alias("url"), "fp"
    )
    index = d.filter(F.col("_num") % 5 == 0).select(
        F.concat(base, F.lit("/index.html")).alias("url"), "fp"
    )
    urls = canon.unionByName(sess).unionByName(slash).unionByName(index)
    return urlmine.dust_rules(urls, max_group=32, min_support=2)


from ..operators import curation as _cur  # noqa: E402

_SPLIT_CASE = _cur.split_oracle_case(
    "md5(text)", [90, 5, 5], ["train", "val", "test"]
)


@register(
    "leakage_safe_split",
    f"""
    SELECT doc_id::VARCHAR AS doc_id, source, {_SPLIT_CASE} AS split
    FROM documents
    """,
    "leakage-safe train/val/test assignment: split is a pure function "
    "of the EXACT-DEDUP GROUP KEY (md5 of content), so duplicate docs "
    "can never straddle the train/eval boundary — the contamination "
    "mode a plain random row split bakes in. Integer md5 bucket "
    "arithmetic against cumulative percent edges (90/5/5), a Catalyst "
    "projection evaluated at the scan: no shuffle, no RNG state, "
    "stable under re-runs and repartitioning. Near-dup-safe variant "
    "passes graph.connected_components labels as the key (pytest)",
)
def q_leakage_safe_split(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    )
    out = _cur.assign_splits(d, F.md5(F.col("text")))
    return out.select("doc_id", "source", "split")


# base corpus = md5-chosen 75% of documents; delta = the other 25%
# (new docs); deletions = an md5-chosen tenth of the base. The merged
# index must be ROW-IDENTICAL to a batch rebuild over
# (base - deleted + delta) — the oracle IS that batch rebuild.
_IDX_IN_DELTA = "('0x'||substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 4 = 0"
_IDX_DELETED = (
    "('0x'||substr(md5(doc_id::VARCHAR || '~del'),1,8))::BIGINT % 10 = 0"
)
_IDX_MERGED_DOCS = f"""(
  SELECT doc_id, text FROM documents
  WHERE NOT ({_IDX_IN_DELTA}) AND NOT ({_IDX_DELETED})
  UNION ALL
  SELECT doc_id, text FROM documents WHERE {_IDX_IN_DELTA}
) AS d"""


@register(
    "index_delta_merge",
    ranking.inverted_index_oracle_sql(docs_table=_IDX_MERGED_DOCS),
    "incremental inverted-index maintenance: fold a 25% delta batch "
    "plus deletions into an existing index without rebuilding — "
    "untouched terms pass through VERBATIM (broadcast anti-join, no "
    "postings parsing), only affected terms explode and re-serialize, "
    "so work scales with the DELTA's vocabulary. Graded as a theorem: "
    "the merged index is row-identical to the batch rebuild over "
    "(base - deleted + delta), which is exactly what the oracle "
    "computes",
)
def q_index_delta_merge(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    in_delta = dedup.md5_32_col(F.col("doc_id").cast("string")) % 4 == 0
    deleted_flag = (
        dedup.md5_32_col(
            F.concat(F.col("doc_id").cast("string"), F.lit("~del"))
        )
        % 10
        == 0
    )
    base_docs = d.filter(~in_delta)
    # in production the base index is a stored table read twice (the
    # pass-through anti-join and the rebuild semi-join); materialize the
    # synthetic one so the graded plan has the same shape instead of
    # re-running the full index groupBy per consumer
    base_index = ranking.inverted_index(base_docs).localCheckpoint(
        eager=False
    )
    return ranking.merge_index_delta(
        base_index,
        delta_docs=d.filter(in_delta),
        deleted_docs=base_docs.filter(deleted_flag),
    )


@register(
    "link_trustrank",
    graph.trustrank_oracle_sql(_PAGERANK_EDGES_CTE, seeds=[0, 1, 2]),
    "fixed-point integer TrustRank (Gyongyi et al., VLDB 2004) from a "
    "3-node trusted seed set over the md5-derived link graph: the "
    "teleport lands ONLY on seeds, so trust flows out along links and "
    "spam farms unreachable from good pages starve — the classic "
    "web-scale spam-demotion signal, paired with host_pagerank exactly "
    "as in the paper. Same BIGINT mass units / div truncation as "
    "pagerank (bit-identical at any parallelism), exact unrolled-CTE "
    "oracle",
)
def q_link_trustrank(spark, sf_dir):
    return graph.trustrank(
        _pagerank_edges(spark, sf_dir), seeds=[0, 1, 2]
    )


# ---------------------------------------------------------------------------
# round 4 (cont. 8): link-graph structure (triangles, label propagation),
# positional/boolean retrieval, containment dedup, weighted sampling —
# every one exact-oracle-backed, extending the graph / search / dedup /
# curation families laid down earlier this round.
# ---------------------------------------------------------------------------


@register(
    "link_triangle_counts",
    graph.triangle_oracle_sql(_PAGERANK_EDGES_CTE),
    "per-node triangle counts over the undirected md5-derived link graph "
    "via degree orientation (Suri & Vassilvitskii WWW'11): each edge "
    "points from the smaller (degree, id) endpoint, so every triangle is "
    "counted at exactly one wedge and the oriented out-degree is "
    "O(sqrt(m)) — the skew defense that keeps the wedge self-join "
    "O(m^1.5) on power-law web graphs instead of quadratic at hub "
    "nodes. Exact integer counts, bit-identical at any parallelism; "
    "the link-farm/near-clique detection signal complementing "
    "link_trustrank",
)
def q_link_triangle_counts(spark, sf_dir):
    return graph.triangle_counts(_pagerank_edges(spark, sf_dir))


@register(
    "link_label_propagation",
    graph.label_propagation_oracle_sql(
        _PAGERANK_EDGES_CTE, seeds={0: 0, 1: 0, 2: 1}, iters=4
    ),
    "deterministic synchronous label propagation (Zhu & Ghahramani 2002, "
    "hard labels) over the undirected md5-derived link graph from 3 "
    "hand-labeled seeds (2 ham, 1 spam): per round every non-seed node "
    "takes the majority neighbor label, ties to the SMALLEST label — a "
    "deterministic function of exact integer vote counts, so the "
    "iterative classifier grades exactly via an unrolled-CTE oracle "
    "(classic LPA's random tie-break cannot). The categorical complement "
    "of link_trustrank's continuous trust mass",
)
def q_link_label_propagation(spark, sf_dir):
    return graph.label_propagation(
        _pagerank_edges(spark, sf_dir), seeds={0: 0, 1: 0, 2: 1}, iters=4
    )


@register(
    "search_boolean_and",
    ranking.boolean_and_oracle_sql(["data", "join", "spark"], k=10),
    "conjunctive (AND) boolean retrieval: docs containing EVERY query "
    "term, ranked by total query-term frequency — the posting-list "
    "intersection query (IIR ch.1), i.e. the web-scale form of the "
    "reference's ANDed LIKE containment search "
    "(apiserver/index.js:85-102). The exploded token stream is filtered "
    "to the query terms BEFORE the shuffle; pure integer counts",
)
def q_search_boolean_and(spark, sf_dir):
    return ranking.boolean_and_topk(
        _t(spark, sf_dir, "documents"), ["data", "join", "spark"], k=10
    )


@register(
    "search_phrase",
    ranking.phrase_search_oracle_sql("hash join", k=10),
    "exact phrase search ('hash join'): occurrence count of the "
    "consecutive-token run per doc — the positional-index query the "
    "reference's LIKE '%phrase%' approximates (LIKE matches substrings "
    "across token boundaries; this matches whole-token runs). The count "
    "is a pure per-row Catalyst expression (tokenize + "
    "size(filter(sequence(...)))) inside whole-stage codegen: no "
    "explode, no shuffle, no Python — the corpus scan is the entire "
    "cost and the top-k is a TakeOrdered",
)
def q_search_phrase(spark, sf_dir):
    return ranking.phrase_search(
        _t(spark, sf_dir, "documents"), "hash join", k=10
    )


@register(
    "dup_containment_pairs",
    dedup.containment_oracle_sql(
        threshold_milli=350,
        docs_table="(SELECT * FROM documents WHERE doc_id < 250)",
    ),
    "asymmetric near-dup via Broder containment C = |A∩B| / min(|A|,|B|) "
    "in exact integer milli-units: catches quote-inclusion and "
    "page-plus-boilerplate dups whose Jaccard is tiny because the "
    "larger doc dilutes the union. Pairs materialize ONLY through the "
    "inverted shingle index (explode + shuffle on the shingle key), "
    "never a doc self-join; bounded here like neardup_jaccard_exact "
    "(the LSH families are the low-threshold scale path)",
)
def q_dup_containment_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return dedup.containment_pairs(d, threshold_milli=350)


@register(
    "weighted_sample_k",
    _cur.weighted_sample_oracle_sql("1 + n_chars", k=200),
    "deterministic weighted sample-without-replacement (k=200, weight "
    "1+n_chars): integer-exact priority sampling in the "
    "Efraimidis-Spirakis shape — key = md5-60bit-uniform div weight, "
    "take the k smallest — so the selection tilts monotonically toward "
    "heavier docs yet is bit-identical at any parallelism and engine "
    "(float u^(1/w) keys could flip near-ties across libm "
    "implementations). Key is pure scan-side codegen; top-k is "
    "TakeOrdered, no corpus shuffle. The quality-weighted subsampling "
    "step of a curation pipeline, joining seeded_sample_md5's "
    "uniform-sample family",
)
def q_weighted_sample_k(spark, sf_dir):
    return _cur.weighted_sample_k(
        _t(spark, sf_dir, "documents"), "1 + n_chars", k=200
    )


from ..operators import urlmine  # noqa: E402

_SITEMAPS_CTE = """
  SELECT source AS host,
         '<urlset>' || string_agg(
           '<url><loc>https://' || source || '/doc/' || doc_id
             || '</loc></url>', '' ORDER BY doc_id)
           || '</urlset>' AS xml
  FROM documents GROUP BY source
"""


def _sitemaps_df(spark, sf_dir):
    """Deterministic synthetic sitemaps: one XML doc per source host,
    entries ordered by doc_id — the Spark twin of _SITEMAPS_CTE."""
    d = _t(spark, sf_dir, "documents").select("source", "doc_id")
    entry = lambda i: F.concat(  # noqa: E731
        F.lit("<url><loc>https://"),
        F.col("source"),
        F.lit("/doc/"),
        i.cast("string"),
        F.lit("</loc></url>"),
    )
    return (
        d.groupBy("source")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("_ids"))
        .select(
            F.col("source").alias("host"),
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.expr(
                        "transform(_ids, i -> concat('<url><loc>https://', "
                        "source, '/doc/', cast(i as string), '</loc></url>'))"
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )


@register(
    "sitemap_extract",
    urlmine.sitemap_oracle_sql(_SITEMAPS_CTE),
    "extract <loc> URLs (with their in-sitemap position) from sitemap "
    "XML documents — the robots.txt-advertised seed-discovery channel an "
    "open-web crawler bootstraps from (sitemaps.org protocol). Parsing "
    "is regexp_extract_all with an RE2-safe pattern + posexplode: pure "
    "Catalyst inside the scan's codegen, no XML library, no Python, no "
    "shuffle until the frontier merge. Sitemaps synthesized "
    "deterministically per source host (entries ordered by doc_id) on "
    "both engines",
)
def q_sitemap_extract(spark, sf_dir):
    return urlmine.sitemap_loc_urls(_sitemaps_df(spark, sf_dir))


@register(
    "link_kcore",
    graph.kcore_oracle_sql(_PAGERANK_EDGES_CTE, k=3, peels=4),
    "k-core peeling (k=3, 4 synchronous rounds) over the undirected "
    "md5-derived link graph: repeatedly delete degree<k nodes, return "
    "survivors with their in-subgraph degree (Seidman 1983). Link farms "
    "live in high-k cores; the coarse dual of link_triangle_counts at a "
    "fraction of the join cost — 2 shuffles per round, exact integer "
    "thresholds, unrolled-CTE oracle",
)
def q_link_kcore(spark, sf_dir):
    return graph.kcore_nodes(_pagerank_edges(spark, sf_dir), k=3, peels=4)


@register(
    "link_ktruss",
    graph.ktruss_oracle_sql(_PAGERANK_EDGES_CTE, k=3, peels=3),
    "k-truss edge peeling (k=3, 3 synchronous rounds; Cohen 2008) over "
    "the undirected md5-derived link graph: repeatedly delete edges in "
    "fewer than k-2 triangles, return survivors with their in-subgraph "
    "support. The EDGE-level sharpening of link_kcore — a core can be "
    "a star, but every truss edge closes triangles, so trusses isolate "
    "the clique-like link-farm rings degree alone cannot. Per round "
    "one degree-oriented wedge join (O(m^1.5), hub-skew safe) + one "
    "edge-support join; exact integer supports, unrolled-CTE oracle",
)
def q_link_ktruss(spark, sf_dir):
    return graph.ktruss_edges(_pagerank_edges(spark, sf_dir), k=3, peels=3)


@register(
    "link_reciprocity",
    graph.reciprocity_oracle_sql(_PAGERANK_EDGES_CTE),
    "per-node link reciprocity in integer milli-units: how many of a "
    "node's out-links point back — near-total reciprocity across hosts "
    "is a link-exchange-ring signature (the cheap, non-iterative spam "
    "heuristic complementing link_trustrank). One reversed-key "
    "self-equi-join (output <= input, no explosion) + one "
    "map-side-combined groupBy",
)
def q_link_reciprocity(spark, sf_dir):
    return graph.reciprocity(_pagerank_edges(spark, sf_dir))


@register(
    "index_df_pruned",
    ranking.prune_index_oracle_sql(max_df_pct=80, min_df=2),
    "dynamic-stopword index pruning: keep terms with "
    "2 <= df <= 80% of N (Luhn's resolving-power band) — corpus-derived "
    "stopword cuts catch template/boilerplate/function words "
    "automatically on web text, and the dropped high-df terms are "
    "exactly the skewed postings rows. Same single-shuffle shape as "
    "inverted_index_postings (the band is a HAVING on the grouped row); "
    "integer-exact thresholds",
)
def q_index_df_pruned(spark, sf_dir):
    return ranking.prune_index_by_df(
        _t(spark, sf_dir, "documents"), max_df_pct=80, min_df=2
    )


@register(
    "shard_rendezvous",
    scheduling.rendezvous_oracle_sql(n_shards=16),
    "rendezvous (highest-random-weight) shard assignment of doc_ids to "
    "16 shards (Thaler & Ravishankar 1998): each key goes to its "
    "top-scoring shard, so resharding to S+1 moves only ~1/(S+1) of "
    "keys — how seen-set partitions / index shards / ANN buckets pin to "
    "executors without a coordinator. Pure per-row codegen (the argmax "
    "unrolls to a comparison chain — no explode, no shuffle); md5 "
    "scores make it engine-portable and exactly graded",
)
def q_shard_rendezvous(spark, sf_dir):
    return scheduling.rendezvous_assign(
        _t(spark, sf_dir, "documents"), n_shards=16
    )


_DIRTY_TEXT_SPARK = (
    "concat(substring(text, 1, 40), '-', char(10), '  ', "
    "substring(text, 41, 2147483647), char(7), ' tail', char(9), char(9))"
)
_DIRTY_TEXT_DUCK = (
    "substr(text, 1, 40) || '-' || chr(10) || '  ' || "
    "substr(text, 41) || chr(7) || ' tail' || chr(9) || chr(9)"
)


@register(
    "text_normalize",
    rf"""
    SELECT doc_id,
           {ts.NORMALIZE_TEXT_SQL.format(col=_DIRTY_TEXT_DUCK)} AS clean_text,
           length({ts.NORMALIZE_TEXT_SQL.format(col=_DIRTY_TEXT_DUCK)})::BIGINT
             AS n_chars_clean
    FROM documents WHERE text IS NOT NULL
    """,
    "web-text normalization (dehyphenate line breaks, strip C0 control "
    "chars, collapse whitespace runs — the CCNet/C4-style pre-tokenize "
    "cleanup) as a pure Catalyst regexp_replace chain with RE2-safe "
    "explicit classes; graded over deterministically dirtied text (both "
    "engines inject the same line-break hyphen, BEL and tab artifacts) "
    "so the transform is exercised, not a no-op. Scan-side codegen, "
    "zero shuffle",
)
def q_text_normalize(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    dirty = F.expr(_DIRTY_TEXT_SPARK)
    clean = ts.normalize_text_col(dirty)
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_chars_clean"),
    )


_HOSTS_SPARK = (
    "concat(element_at(array('', 'www.', 'cdn.'), cast("
    "conv(substring(md5(concat(source, '~sub')), 1, 8), 16, 10) % 3 as int)"
    " + 1), source, '.', element_at(array('com', 'org', 'net', 'co.uk', "
    "'com.au', 'github.io'), cast(conv(substring(md5(concat(source, "
    "'~tld')), 1, 8), 16, 10) % 6 as int) + 1))"
)
_HOSTS_DUCK = (
    "(['', 'www.', 'cdn.'])[(('0x' || substr(md5(source || '~sub'), 1, 8))"
    "::BIGINT % 3)::INT + 1] || source || '.' || "
    "(['com', 'org', 'net', 'co.uk', 'com.au', 'github.io'])"
    "[(('0x' || substr(md5(source || '~tld'), 1, 8))::BIGINT % 6)::INT + 1]"
)


@register(
    "host_registrable_domain",
    f"""
    WITH hosts AS (
      SELECT doc_id, {_HOSTS_DUCK} AS host FROM documents
    )
    SELECT {urlmine.registrable_domain_sql("host")} AS domain,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT host)::BIGINT AS n_hosts
    FROM hosts GROUP BY 1
    """,
    "registrable-domain (eTLD+1) rollup, PSL-lite: longest-known-suffix "
    "match so a.example.co.uk / b.example.co.uk aggregate to one site "
    "while co.uk itself never becomes a 'site' — the grouping key every "
    "host-level operator (politeness, budget, mirrors, boilerplate) "
    "actually wants. Hostnames synthesized deterministically (md5 "
    "subdomain/TLD choice, incl. multi-part suffixes) on both engines; "
    "extraction is pure split/element_at codegen, one map-side-combined "
    "groupBy",
)
def q_host_registrable_domain(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn(
        "host", F.expr(_HOSTS_SPARK)
    )
    return d.groupBy(
        urlmine.registrable_domain_col(F.col("host")).alias("domain")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )


# ---------------------------------------------------------------------------
# round 4 (cont. 10): SALSA (the degree-normalized HITS actually shipped
# for related-pages) and spam mass (the actionable PageRank-vs-TrustRank
# per-node signal) — both exact-oracle iterative graph entries over the
# same md5-derived link graph as host_pagerank.
# ---------------------------------------------------------------------------


@register(
    "link_salsa",
    graph.salsa_oracle_sql(_PAGERANK_EDGES_CTE, iters=4),
    "fixed-point integer SALSA (Lempel & Moran, WWW 2000; the algorithm "
    "behind Twitter's who-to-follow, WWW 2013): HITS with every half-"
    "step a degree-normalized random WALK instead of a raw mass sum, so "
    "the tightly-knit-community (TKC) capture that lets a spam clique "
    "dominate HITS disappears. Pure BIGINT mass (no multiplications at "
    "all), bit-identical at any shuffle parallelism; exact unrolled-CTE "
    "oracle like host_pagerank / link_hits",
)
def q_link_salsa(spark, sf_dir):
    return graph.salsa(_pagerank_edges(spark, sf_dir), iters=4)


@register(
    "link_spam_mass",
    graph.spam_mass_oracle_sql(_PAGERANK_EDGES_CTE, seeds=[0, 1, 2]),
    "relative spam mass in ppm (Gyongyi et al., VLDB 2006): the "
    "fraction of each node's PageRank NOT flowing from the trusted "
    "core, via trust_scaled = (tr * total_pr) div total_tr on the "
    "shared 10^9 integer scale — the per-node DECISION the "
    "host_pagerank/link_trustrank pair exists to feed (demote "
    "spam-boosted hosts before spending fetch budget). The combine is "
    "one node join + two 1-row crossJoin totals; oracle nests both "
    "unrolled rank chains as scoped subquery-CTEs",
)
def q_link_spam_mass(spark, sf_dir):
    return graph.spam_mass(
        _pagerank_edges(spark, sf_dir), seeds=[0, 1, 2]
    )


# The synthetic corpus has no newlines, so (host_boilerplate_lines
# pattern) the graded entry injects three paragraphs per document
# IDENTICALLY on both sides: a near-unique head (its own text prefix),
# a 'SHARED n' banner duplicated across ~1/7 of the corpus (the
# cross-host cookie-banner shape CCNet exists to strip), and an
# md5-gated third paragraph that is per-host boilerplate for ~1/3 of
# docs and near-unique filler otherwise.
_PAR_DOCS_CTE = """
  SELECT doc_id,
         'U ' || substr(text, 1, 64)
         || chr(10) || 'SHARED ' || (doc_id % 7)::VARCHAR
         || chr(10) || CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR),
                                                 1, 8))::BIGINT % 3 = 0
                            THEN 'FTR ' || source
                            ELSE 'TAIL ' || substr(md5(doc_id::VARCHAR),
                                                   9, 6) END AS text
  FROM documents
"""


@register(
    "par_dedup_corpus",
    dedup.paragraph_dedup_oracle_sql(_PAR_DOCS_CTE),
    "corpus-wide paragraph dedup (CCNet, Wenzek et al. LREC 2020 §3.2): "
    "keep only the FIRST (doc_id, pos) occurrence of every distinct "
    "trimmed paragraph across the whole corpus, reassemble in position "
    "order — the cross-host banner strip per-host boilerplate detection "
    "cannot see. First-wins is ONE window over the md5 paragraph key "
    "(16-byte shuffle key, never the text), reassembly one "
    "groupBy(doc_id); graded over documents + injected shared/host/"
    "unique paragraphs so every rule does real work",
)
def q_par_dedup_corpus(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    did_s = F.col("doc_id").cast("string")
    third = F.when(
        dedup.md5_32_col(did_s) % 3 == 0,
        F.concat(F.lit("FTR "), F.col("source")),
    ).otherwise(F.concat(F.lit("TAIL "), F.substring(F.md5(did_s), 9, 6)))
    text2 = F.concat(
        F.lit("U "),
        F.substring(F.col("text"), 1, 64),
        F.lit("\nSHARED "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("\n"),
        third,
    )
    return dedup.paragraph_dedup(
        d.select("doc_id", text2.alias("text"))
    )


from ..operators import quality  # noqa: E402

# The synthetic corpus is single-line, punctuation-free prose, so the
# graded quality entries synthesize the discriminating features
# IDENTICALLY on both sides: variable-length bodies (word-count rule),
# doc_id-gated stopword/symbol/numeric-word injections, bullet and
# ellipsis line blocks (Gopher); terminal-punctuation sentence blocks
# plus javascript / brace / lorem-ipsum tripwires (C4).
_GOPHER_DOCS_CTE = """
  SELECT doc_id,
    substr(text, 1, (1 + (doc_id % 240) * 3)::INT)
    || CASE WHEN doc_id % 4 != 0 THEN ' the of and' ELSE ' xx yy zz' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' # # # # # # # # # #' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' 11 22 33 44 55 66 77 88 99 00 12 34 56 78 90 21 43 65'
            ELSE '' END
    || CASE WHEN doc_id % 6 = 0
            THEN repeat(chr(10) || '- bullet item', 10) ELSE '' END
    || CASE WHEN doc_id % 9 = 0
            THEN chr(10) || 'to be continued...' || chr(10) || 'more soon...'
            ELSE '' END AS text
  FROM documents
"""


@register(
    "gopher_quality_flags",
    quality.gopher_oracle_sql(_GOPHER_DOCS_CTE),
    "the Gopher quality rules (Rae et al. 2021 Appendix A1.1): word-"
    "count window, mean word length, symbol-to-word ratio, bullet/"
    "ellipsis line fractions, alphabetic-word fraction, stop-word "
    "probe — THE standard webtext pre-training gate (MassiveText/"
    "RefinedWeb/FineWeb all remix it). ALL-INTEGER decision arithmetic "
    "(100*a >= k*b), zero shuffles — every rule is a Catalyst filter/"
    "aggregate lambda inside whole-stage codegen. Graded over bodies "
    "of varying length + doc_id-gated rule tripwires so every rule "
    "discriminates both ways",
)
def q_gopher_quality_flags(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.col("text").substr(
        F.lit(1), (F.lit(1) + (did % 240) * 3).cast("int")
    )
    text2 = F.concat(
        body,
        F.when(did % 4 != 0, F.lit(" the of and")).otherwise(
            F.lit(" xx yy zz")
        ),
        F.when(did % 7 == 0, F.lit(" # # # # # # # # # #")).otherwise(
            F.lit("")
        ),
        F.when(
            did % 11 == 0,
            F.lit(" 11 22 33 44 55 66 77 88 99 00 12 34 56 78 90 21 43 65"),
        ).otherwise(F.lit("")),
        F.when(
            did % 6 == 0, F.repeat(F.lit("\n- bullet item"), 10)
        ).otherwise(F.lit("")),
        F.when(
            did % 9 == 0,
            F.lit("\nto be continued...\nmore soon..."),
        ).otherwise(F.lit("")),
    )
    return quality.gopher_flags(d.select("doc_id", text2.alias("text")))


_C4_DOCS_CTE = """
  SELECT doc_id,
    'Intro header without punctuation'
    || chr(10) || 'This is sentence number ' || doc_id
    || ' in the corpus.'
    || chr(10) || 'Sentence two is also here with words.'
    || CASE WHEN doc_id % 3 = 0
            THEN chr(10) || 'Third sentence appears for some docs.'
                 || chr(10) || 'Fourth one too, yes indeed.'
                 || chr(10) || 'And a fifth to cross the gate.'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN chr(10) || 'Enable javascript to view this.' ELSE '' END
    || CASE WHEN doc_id % 10 = 0
            THEN chr(10) || 'function() { return }' ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
    || chr(10) || 'Too short.' AS text
  FROM documents
"""


@register(
    "c4_line_clean",
    quality.c4_oracle_sql(_C4_DOCS_CTE),
    "C4's line-level cleaning (Raffel et al. 2020 JMLR 2.2): keep "
    "trimmed lines ending in terminal punctuation with >= 3 words and "
    "no 'javascript'; page gates for '{', 'lorem ipsum', and >= 5 "
    "surviving lines — the other canonical webtext filter next to "
    "gopher_quality_flags. Pure projection (one Catalyst filter "
    "lambda), no shuffle; graded over injected sentence blocks + "
    "gated tripwires so the keep rule, the word floor, and all three "
    "page gates each discriminate",
)
def q_c4_line_clean(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    text2 = F.concat(
        F.lit("Intro header without punctuation"),
        F.lit("\nThis is sentence number "),
        did.cast("string"),
        F.lit(" in the corpus."),
        F.lit("\nSentence two is also here with words."),
        F.when(
            did % 3 == 0,
            F.lit(
                "\nThird sentence appears for some docs."
                "\nFourth one too, yes indeed."
                "\nAnd a fifth to cross the gate."
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0, F.lit("\nEnable javascript to view this.")
        ).otherwise(F.lit("")),
        F.when(
            did % 10 == 0, F.lit("\nfunction() { return }")
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0, F.lit("\nLorem ipsum dolor sit amet.")
        ).otherwise(F.lit("")),
        F.lit("\nToo short."),
    )
    return quality.c4_clean(d.select("doc_id", text2.alias("text")))


# The md5 link graph is one giant SCC + IN fringe (433/63/4 at sf0.01),
# so the graded entry appends a 10-edge deterministic appendage (node ids
# offset at 10^7, far above any testdata corpus) that instantiates the
# remaining bow-tie classes: an extra IN node, an SCC->fresh OUT chain,
# a TENDRIL_OUT feeder, a TENDRIL_IN sink, an IN->OUT TUBE bypass, and
# a DISCONNECTED pair — all seven labels then discriminate.
_BOWTIE_APPENDAGE = [
    (10_000_001, 0),            # IN
    (0, 10_000_002),            # OUT
    (10_000_002, 10_000_003),   # OUT (second hop)
    (10_000_004, 10_000_002),   # TENDRIL_OUT
    (10_000_001, 10_000_005),   # TENDRIL_IN
    (10_000_001, 10_000_006),   # TUBE entry
    (10_000_006, 10_000_002),   # TUBE exit
    (10_000_007, 10_000_008),   # DISCONNECTED pair
]

_BOWTIE_EDGES_CTE = (
    _PAGERANK_EDGES_CTE
    + "  UNION ALL SELECT * FROM (VALUES "
    + ", ".join(f"({a}::BIGINT, {b}::BIGINT)" for a, b in _BOWTIE_APPENDAGE)
    + ") AS app(src, dst)"
)


@register(
    "web_bowtie_structure",
    graph.bowtie_oracle_sql(_BOWTIE_EDGES_CTE, pivot=0, max_depth=12),
    "bow-tie decomposition of the link graph (Broder et al., WWW 2000): "
    "SCC / IN / OUT / TUBE / TENDRIL_IN / TENDRIL_OUT / DISCONNECTED "
    "relative to the core around pivot 0 — the canonical web-structure "
    "measurement and the frontier-budget argument (a crawler seeded in "
    "SCC never discovers IN without outside seeds). Four depth-capped "
    "multi-source BFS sweeps, each level one shuffled-hash join + one "
    "anti-join (the production crawl-round shape); pure set algebra so "
    "bit-identical at any parallelism; oracle = four unrolled "
    "MATERIALIZED reach chains + the same precedence CASE",
)
def q_web_bowtie_structure(spark, sf_dir):
    spark_app = spark.createDataFrame(
        _BOWTIE_APPENDAGE, "src long, dst long"
    )
    edges = _pagerank_edges(spark, sf_dir).unionByName(spark_app)
    return graph.bowtie_components(edges, pivot=0, max_depth=12)


# ---------------------------------------------------------------------------
# BPE-merge training (round 5) — the learned-vocabulary upgrade of
# bpe_token_estimate (VERDICT r04 next-round #3)
# ---------------------------------------------------------------------------
from ..operators import bpe  # noqa: E402

_BPE_DOCS_CTE = "SELECT doc_id, text FROM documents"


@register(
    "bpe_train_merges",
    bpe.bpe_oracle_sql(_BPE_DOCS_CTE, rounds=8),
    "distributed BPE-merge training (Sennrich et al., ACL 2016): 8 rounds "
    "of pair-count -> lexicographic argmax -> greedy left-to-right merge "
    "over the corpus vocabulary, one learned merge per output row. The "
    "corpus is touched once (tokenize + groupBy(word)); every round is a "
    "per-row slice/zip expression + one combinable (lhs,rhs) groupBy + a "
    "1-row broadcast argmax + a per-row anchored string replace (the "
    "separator trick makes replace() exactly BPE's non-overlapping greedy "
    "merge in both engines). Integer counts => bit-identical at any "
    "parallelism; oracle = the same 8 rounds as unrolled MATERIALIZED CTEs",
)
def q_bpe_train_merges(spark, sf_dir):
    return bpe.bpe_train_merges(_t(spark, sf_dir, "documents"), rounds=8)


# ---------------------------------------------------------------------------
# ANN index delta-merge (round 5, VERDICT r04 item 4) — graded as a
# theorem like index_delta_merge: merged index == batch rebuild over
# (base - deleted + delta), with md5-Rademacher buckets so the rebuild
# is plain SQL.
# ---------------------------------------------------------------------------
_ANN_IN_DELTA = "('0x'||substr(md5(vec_id::VARCHAR),1,8))::BIGINT % 4 = 0"
_ANN_DELETED = (
    "('0x'||substr(md5(vec_id::VARCHAR || '~del'),1,8))::BIGINT % 10 = 0"
)

_ANN_INDEX_DELTA_ORACLE = f"""
    WITH merged AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings
      WHERE NOT ({_ANN_IN_DELTA}) AND NOT ({_ANN_DELETED})
      UNION ALL
      SELECT vec_id, embedding FROM embeddings WHERE {_ANN_IN_DELTA}
    ),
    dim AS (SELECT max(len(embedding)) AS n FROM merged),
    signs AS (
      SELECT t.t AS tbl, p.p AS plane,
             [CASE WHEN ('0x' || substr(md5(t.t || '_' || p.p || '_' || j), 1, 8))::BIGINT & 1 = 1
                   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
              FOR j IN range(0, (SELECT n FROM dim))] AS sv
      FROM range(2) t(t), range(4) p(p)
    ),
    pb AS (
      SELECT e.vec_id, s.tbl,
             CASE WHEN list_reduce(
                    list_transform(list_zip(e.embedding, s.sv),
                                   pr -> CAST(pr[1] AS DOUBLE) * pr[2]),
                    (a, b) -> a + b) >= 0
                  THEN (1 << s.plane) ELSE 0 END AS bit
      FROM merged e, signs s
    )
    SELECT vec_id::BIGINT AS vec_id, tbl::INT AS tbl, SUM(bit)::INT AS bucket
    FROM pb GROUP BY vec_id, tbl
"""


@register(
    "ann_index_delta",
    _ANN_INDEX_DELTA_ORACLE,
    "ANN (SRP-LSH) index delta maintenance: fold a 25% delta batch plus "
    "md5-chosen deletions into an existing bucket index without a "
    "rebuild — deletions are one broadcast anti-join, insertions "
    "bucket-assign only the delta (stateless per-row sign fold, the "
    "property that makes SRP exactly delta-maintainable where trained "
    "IVF centroids are not). Graded as a theorem: the merged index is "
    "row-identical to the batch rebuild over (base - deleted + delta), "
    "which is exactly what the oracle computes (md5-Rademacher planes, "
    "portable to SQL). Persisted form rewrites only touched (tbl, "
    "bucket) partitions (overwrite_srp_index_partitions, pytest)",
)
def q_ann_index_delta(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    in_delta = dedup.md5_32_col(F.col("vec_id").cast("string")) % 4 == 0
    deleted = (
        dedup.md5_32_col(
            F.concat(F.col("vec_id").cast("string"), F.lit("~del"))
        )
        % 10
        == 0
    )
    base_vecs = e.filter(~in_delta)
    delta_vecs = e.filter(in_delta)
    base_idx = similarity.assign_srp_buckets(
        base_vecs, n_planes=4, tables=2, planes_fn=similarity.md5_sign_planes
    )
    merged = similarity.merge_srp_index_delta(
        base_idx,
        delta_vecs,
        deleted_ids=base_vecs.filter(deleted).select("vec_id"),
        n_planes=4,
        tables=2,
        planes_fn=similarity.md5_sign_planes,
    )
    return merged.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("tbl").cast("int").alias("tbl"),
        F.col("bucket").cast("int").alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Positional-index phrase + proximity search (round 5, VERDICT r04 item 7)
# ---------------------------------------------------------------------------
@register(
    "search_phrase_indexed",
    ranking.phrase_search_oracle_sql("slow hash batch", k=10),
    "positional-index phrase search ('slow hash batch'): the postings-"
    "INTERSECTION evaluator (IIR ch.2) — each phrase offset i emits "
    "candidate starts (pos - i) for its term, a start emitted by all m "
    "offsets is one occurrence. The position-exploded stream filters to "
    "the query terms AT THE SCAN (against a prebuilt positional index "
    "this reads only the query postings, never the corpus); two "
    "combinable integer groupBys. Oracle = the sliding-window scan-side "
    "semantics over a different phrase than search_phrase, so the two "
    "slots verify different computations; pytest asserts the indexed and "
    "scan-side evaluators agree on randomized corpora",
)
def q_search_phrase_indexed(spark, sf_dir):
    return ranking.phrase_search_indexed(
        _t(spark, sf_dir, "documents"), "slow hash batch", k=10
    )


@register(
    "search_proximity_pairs",
    ranking.proximity_pairs_oracle_sql("hash", "join", window=5, k=10),
    "within-k proximity ranking (/k-NEAR, IIR ch.2): docs scored by the "
    "number of ('hash', 'join') occurrence pairs within 5 tokens — the "
    "proximity generalization of phrase search. Both postings streams "
    "filter to their term at the scan; the pair count is a per-doc band "
    "join bounded by per-doc term frequency; integer counts",
)
def q_search_proximity_pairs(spark, sf_dir):
    return ranking.proximity_pairs_topk(
        _t(spark, sf_dir, "documents"), "hash", "join", window=5, k=10
    )


@register(
    "bpe_apply_tokens",
    bpe.bpe_apply_oracle_sql(_BPE_DOCS_CTE, rounds=8),
    "train-then-apply BPE: per-doc token counts under the 8-merge vocab "
    "learned from the same corpus — the token budgeting a pipeline runs "
    "under a trained tokenizer. The apply side is ZERO-shuffle (one "
    "scan-side Catalyst expression per row: words -> anchored char seqs "
    "-> merge list folded as literal replaces -> separator-count/2); the "
    "merge list is a bounded driver collect (8 rows) from the in-window "
    "trainer. Oracle re-derives the merges inside the unrolled training "
    "CTE chain (never smuggled as constants) and applies them as nested "
    "scalar-subquery replaces",
)
def q_bpe_apply_tokens(spark, sf_dir):
    trained = bpe.bpe_train_merges(
        _t(spark, sf_dir, "documents"), rounds=8
    ).collect()  # bounded: exactly `rounds` rows
    merges = [(r.lhs, r.rhs) for r in trained]
    return bpe.bpe_apply_merges(_t(spark, sf_dir, "documents"), merges)


_ANN_IVF_DELTA_ORACLE = f"""
    WITH base AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE NOT ({_ANN_IN_DELTA})
    ),
    merged AS MATERIALIZED (
      SELECT vec_id, embedding FROM base WHERE NOT ({_ANN_DELETED})
      UNION ALL
      SELECT vec_id, embedding FROM embeddings WHERE {_ANN_IN_DELTA}
    ),
    cents AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM base ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, c.cid,
             list_reduce(
               list_transform(list_zip(e.embedding, c.ce),
                 pr -> (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))
                       * (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))),
               (a, b) -> a + b) AS d2
      FROM merged e, cents c
    )
    SELECT vec_id::BIGINT AS vec_id, cid::INT AS cell FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM d
    ) WHERE rn = 1
"""


@register(
    "ann_ivf_index_delta",
    _ANN_IVF_DELTA_ORACLE,
    "IVF index delta maintenance under the production fixed-quantizer "
    "rule: centroids trained on the BASE corpus stay fixed across the "
    "delta (retraining would re-assign the whole corpus — production "
    "retrains on a schedule instead); deletions are a broadcast "
    "anti-join, insertions assign cells to only the delta with the old "
    "centroids — O(delta). Graded as a theorem: merged index == "
    "assigning (base - deleted + delta) with the SAME centroids, which "
    "is what the oracle computes (md5-seeded centroids from base only, "
    "strict-left-fold L2, argmin tie to lower cid — the portable "
    "arithmetic the graded ann_ivf_topk_md5 already proved)",
)
def q_ann_ivf_index_delta(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    in_delta = dedup.md5_32_col(F.col("vec_id").cast("string")) % 4 == 0
    deleted = (
        dedup.md5_32_col(
            F.concat(F.col("vec_id").cast("string"), F.lit("~del"))
        )
        % 10
        == 0
    )
    base_vecs = e.filter(~in_delta)
    delta_vecs = e.filter(in_delta)
    cents = similarity.md5_ivf_centroids(base_vecs, n_cells=16)
    base_assigned = base_vecs.select(
        "vec_id",
        "embedding",
        similarity.ivf_cell_col(F.col("embedding"), cents).alias("cell"),
    )
    merged = similarity.merge_ivf_index_delta(
        base_assigned,
        delta_vecs,
        centroids=cents,
        deleted_ids=base_vecs.filter(deleted).select("vec_id"),
    )
    return merged.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cell").cast("int").alias("cell"),
    )


# ---------------------------------------------------------------------------
# CCNet composed pipeline (round 5): lang-ID -> corpus paragraph dedup ->
# LM scoring -> head/middle/tail tercile split (Wenzek et al., LREC 2020
# — the canonical published CommonCrawl curation pipeline, composed from
# the already-graded stages the way curation_pipeline composes the
# Gopher-side stages)
# ---------------------------------------------------------------------------
_CCNET_LANG_CASE = """CASE
  WHEN contains(' ' || lower(text) || ' ', ' de ')
   AND contains(' ' || lower(text) || ' ', ' shi ')
   AND contains(' ' || lower(text) || ' ', ' le ') THEN 'zh'
  WHEN contains(' ' || lower(text) || ' ', ' el ')
   AND contains(' ' || lower(text) || ' ', ' que ')
   AND contains(' ' || lower(text) || ' ', ' los ') THEN 'es'
  WHEN contains(' ' || lower(text) || ' ', ' der ')
   AND contains(' ' || lower(text) || ' ', ' und ')
   AND contains(' ' || lower(text) || ' ', ' nicht ') THEN 'de'
  ELSE 'en' END"""


def _ccnet_oracle_sql() -> str:
    en = f"SELECT doc_id, text FROM documents WHERE ({_CCNET_LANG_CASE}) = 'en'"
    pd_sql = dedup.paragraph_dedup_oracle_sql(en)
    lm_docs = f"(SELECT doc_id, kept_text AS text FROM ({pd_sql}) pd0) pdocs"
    lm_sql = lm.lm_oracle_sql(docs_table=lm_docs)
    return f"""
    WITH scored AS MATERIALIZED (
      {lm_sql}
    ),
    sm AS (SELECT doc_id, n_scored, avg_ll,
                  CAST(round(avg_ll * 1000000) AS BIGINT) AS score_micro
           FROM scored),
    nn AS (SELECT count(*)::BIGINT AS n FROM sm),
    hist AS (SELECT score_micro, count(*)::BIGINT AS c FROM sm
             GROUP BY score_micro),
    off AS (SELECT score_micro,
                   COALESCE(SUM(c) OVER (ORDER BY score_micro DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS cb
            FROM hist)
    SELECT s.doc_id, s.n_scored, s.avg_ll,
           CASE WHEN 3 * o.cb < nn.n THEN 'head'
                WHEN 3 * o.cb < 2 * nn.n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sm s JOIN off o USING (score_micro), nn
    """


@register(
    "ccnet_pipeline",
    _ccnet_oracle_sql(),
    "composed CCNet pipeline (Wenzek et al., LREC 2020): lang-ID gate -> "
    "corpus-wide paragraph dedup -> self-trained bigram-LM scoring -> "
    "head/middle/tail split. The tercile split is scale-safe: bucket is "
    "a pure function of the SCORE (equal score => equal bucket) with "
    "thresholds from a bounded integer micro-resolution histogram "
    "(broadcast join), never a global row window over docs — the "
    "focused_crawl_priority offsets pattern. Oracle nests all three "
    "stage oracles (lang CASE, paragraph-dedup CTE, LM chain) so the "
    "whole pipeline verifies in one graded row",
)
def q_ccnet_pipeline(spark, sf_dir):
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    en = d.filter(ts.lang_id_col(F.col("text")) == "en")
    pd0 = dedup.paragraph_dedup(en)
    docs2 = pd0.select("doc_id", F.col("kept_text").alias("text"))
    scored = lm.score_perplexity(docs2)
    sm = scored.select(
        "doc_id",
        "n_scored",
        "avg_ll",
        F.round(F.col("avg_ll") * 1000000).cast("long").alias("score_micro"),
    ).localCheckpoint(eager=False)
    # ^ three consumers (nn, hist, the final join) — without the pin the
    # whole lang-gate -> paragraph-dedup -> LM chain re-ran per consumer
    nn = sm.agg(F.count("*").cast("long").alias("_n"))
    hist = sm.groupBy("score_micro").agg(F.count("*").cast("long").alias("_c"))
    off = hist.select(
        "score_micro",
        F.coalesce(
            F.sum("_c").over(
                W.orderBy(F.col("score_micro").desc()).rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_cb"),
    )
    return (
        sm.join(F.broadcast(off), "score_micro")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "n_scored",
            "avg_ll",
            F.when(3 * F.col("_cb") < F.col("_n"), F.lit("head"))
            .when(3 * F.col("_cb") < 2 * F.col("_n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# nDCG@10 ranking-quality evaluation (round 5) — the eval harness every
# search engine ships (Järvelin & Kekäläinen, TOIS 2002)
# ---------------------------------------------------------------------------
_NDCG_QUERIES: dict[str, list[str]] = {
    "data join spark": ["data", "join", "spark"],
    "hash join": ["hash", "join"],
    "slow fast table": ["slow", "fast", "table"],
}


def _ndcg_parts_sql() -> tuple[str, str]:
    """(run_cte, qrels_cte): run = per-query top ranks by total matched-
    term tf; qrels = graded relevance = count of distinct query terms
    present (the deterministic label both engines derive identically)."""
    runs, rels = [], []
    for q, terms in sorted(_NDCG_QUERIES.items()):
        tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
        # rel is ORTHOGONAL to the run's tf ranking (derived from the
        # labeled lang/doc-length attributes), so ndcg < 1 generically
        # and the graded hash carries real discrimination
        m = (
            f"(SELECT t.doc_id, COUNT(*)::BIGINT AS total_tf,"
            f" any_value(d.rel) AS rel"
            f" FROM (SELECT doc_id, unnest(list_filter("
            r"string_split_regex(trim(lower(text)), '\s+'), x -> x != ''))"
            f" AS term FROM documents WHERE text IS NOT NULL) t"
            f" JOIN (SELECT doc_id,"
            f" (CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
            f"  + CASE WHEN n_chars % 3 = 0 THEN 2"
            f"         WHEN n_chars % 3 = 1 THEN 1 ELSE 0 END)::BIGINT AS rel"
            f" FROM documents) d ON d.doc_id = t.doc_id"
            f" WHERE t.term IN ({tl}) GROUP BY t.doc_id)"
        )
        runs.append(
            f"SELECT '{q}' AS query, doc_id,"
            f" row_number() OVER (ORDER BY total_tf DESC, doc_id ASC)"
            f" AS rank FROM {m}"
        )
        rels.append(f"SELECT '{q}' AS query, doc_id, rel FROM {m}")
    return " UNION ALL ".join(runs), " UNION ALL ".join(rels)


_NDCG_RUN_CTE, _NDCG_QRELS_CTE = _ndcg_parts_sql()


@register(
    "search_eval_ndcg",
    ranking.ndcg_oracle_sql(_NDCG_RUN_CTE, _NDCG_QRELS_CTE, k=10),
    "nDCG@10 over three term-frequency-ranked runs with graded "
    "relevance = distinct-query-terms-present — the trec_eval-style "
    "quality metric (unjudged docs score 0 via left join, IDCG from the "
    "rel-DESC/doc-ASC total order, IDCG=0 queries score 0). Both DCG "
    "sums fold in rank order on both engines and round to 6, so the "
    "probabilistic-looking metric grades exactly. Run side is per-query "
    "bounded; the only eval-set-sized work is one per-query window rank "
    "over qrels",
)
def q_search_eval_ndcg(spark, sf_dir):
    runs, rels = _ndcg_run_and_qrels(spark, sf_dir)
    return ranking.ndcg_at_k(runs, rels, k=10, doc_col="doc_id")


def _ndcg_run_and_qrels(spark, sf_dir):
    """Shared fixture construction for the eval-metric entries: tf-ranked
    top-10 runs + label-derived graded qrels (orthogonal to the run
    ranking so the metrics discriminate)."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    rel_col = (
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        + F.when(F.col("n_chars") % 3 == 0, F.lit(2))
        .when(F.col("n_chars") % 3 == 1, F.lit(1))
        .otherwise(F.lit(0))
    ).cast("long")
    stream = d.select(
        "doc_id", rel_col.alias("_rel0"), F.explode(toks).alias("term")
    )
    runs, rels = None, None
    for q, terms in sorted(_NDCG_QUERIES.items()):
        m = (
            stream.filter(F.col("term").isin(sorted(set(terms))))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("total_tf"),
                F.first("_rel0").alias("rel"),
            )
        )
        # TakeOrdered bounds the run to k rows BEFORE the rank window, so
        # the only global window runs over 10 rows (the generic
        # ndcg_at_k is per-query-partitioned; this is fixture-run
        # construction, where real runs come from top-k retrieval)
        w = W.orderBy(F.col("total_tf").desc(), F.col("doc_id").asc())
        run_q = (
            m.orderBy(F.col("total_tf").desc(), F.col("doc_id").asc())
            .limit(10)
            .select(
                F.lit(q).alias("query"),
                "doc_id",
                F.row_number().over(w).alias("rank"),
            )
        )
        rel_q = m.select(F.lit(q).alias("query"), "doc_id", "rel")
        runs = run_q if runs is None else runs.unionByName(run_q)
        rels = rel_q if rels is None else rels.unionByName(rel_q)
    return runs, rels


@register(
    "search_eval_map",
    ranking.map_oracle_sql(
        _NDCG_RUN_CTE, _NDCG_QRELS_CTE, k=10, rel_threshold=2
    ),
    "MAP@10 over the same three runs/qrels as search_eval_ndcg with "
    "rel >= 2 binarization (trec_eval map_cut_10: AP = sum of P@i over "
    "relevant retrieved ranks / min(R, 10); R = 0 queries score 0). "
    "Integer hit counts until one final division + round(6) — exact at "
    "any parallelism; run side per-query bounded",
)
def q_search_eval_map(spark, sf_dir):
    runs, rels = _ndcg_run_and_qrels(spark, sf_dir)
    return ranking.map_at_k(runs, rels, k=10, rel_threshold=2)


@register(
    "search_eval_mrr",
    ranking.mrr_oracle_sql(
        _NDCG_RUN_CTE, _NDCG_QRELS_CTE, k=10, rel_threshold=2
    ),
    "MRR@10 over the same three runs/qrels as search_eval_ndcg with "
    "rel >= 2 binarization (trec_eval recip_rank cut at 10: 1/rank of "
    "the first relevant retrieved doc, 0 when none in the top 10). The "
    "only reduction is an integer MIN over ranks, one division + "
    "round(6) at the end — exact at any parallelism",
)
def q_search_eval_mrr(spark, sf_dir):
    runs, rels = _ndcg_run_and_qrels(spark, sf_dir)
    return ranking.mrr_at_k(runs, rels, k=10, rel_threshold=2)


@register(
    "search_eval_pr",
    ranking.pr_oracle_sql(
        _NDCG_RUN_CTE, _NDCG_QRELS_CTE, k=10, rel_threshold=2
    ),
    "P@10 / R@10 over the same three runs/qrels (trec_eval P_10 with "
    "the fixed-k denominator + recall_10 with R = total relevant, 0 "
    "when R = 0). Integer hit counts until the two final divisions + "
    "round(6) — exact at any parallelism; completes the eval family "
    "(nDCG, MAP, MRR, P/R) every search engine's harness reports",
)
def q_search_eval_pr(spark, sf_dir):
    runs, rels = _ndcg_run_and_qrels(spark, sf_dir)
    return ranking.precision_recall_at_k(runs, rels, k=10, rel_threshold=2)


@register(
    "search_eval_err",
    ranking.err_oracle_sql(
        _NDCG_RUN_CTE, _NDCG_QRELS_CTE, k=10, max_grade=3
    ),
    "ERR@10 (Chapelle et al. 2009 cascade model) over the same three "
    "runs/graded qrels: stop probability (2^rel - 1)/2^3 per rank, "
    "ERR = sum (1/i) * R_i * prod_{j<i}(1 - R_j). The fold is "
    "sequential in rank order on both engines (array fold in Spark, "
    "windowed product() in DuckDB) and every stop probability is a "
    "dyadic rational, so the running products are bit-identical "
    "doubles; run side per-query bounded, qrels touched by one join",
)
def q_search_eval_err(spark, sf_dir):
    runs, rels = _ndcg_run_and_qrels(spark, sf_dir)
    return ranking.err_at_k(runs, rels, k=10, max_grade=3)


@register(
    "search_eval_rbp",
    ranking.rbp_oracle_sql(
        _NDCG_RUN_CTE, _NDCG_QRELS_CTE, k=10, max_grade=3
    ),
    "RBP@10 + residual (Moffat & Zobel, TOIS 2008; persistence p = 1/2, "
    "graded gains rel/3) over the same three runs/qrels: the "
    "user-model metric that also REPORTS ITS OWN UNCERTAINTY — the "
    "residual bounds the score mass lost to the unjudged tail, the "
    "number a crawl operator watches when deciding whether judging "
    "deeper would change the ranking verdict. With p = 1/2 every "
    "geometric weight is dyadic, so both engines fold exact INTEGER "
    "sums S = sum(rel<<(k-rank)), P = sum(1<<(k-rank)) and divide once "
    "at the end — bit-identical at any parallelism; completes the "
    "trec_eval family (nDCG/MAP/MRR/P/R/ERR/RBP)",
)
def q_search_eval_rbp(spark, sf_dir):
    runs, rels = _ndcg_run_and_qrels(spark, sf_dir)
    return ranking.rbp_at_k(runs, rels, k=10, max_grade=3)


@register(
    "textrank_keywords",
    ranking.textrank_oracle_sql(k=5, iters=4),
    "TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): "
    "per-doc adjacent-token co-occurrence graph + 4 rounds of integer "
    "PageRank, top-5 tokens per doc — automatic tag generation for the "
    "untagged majority of a crawled corpus (the web-scale analogue of "
    "items.tags / /search/toptags). Same BIGINT mass units and div "
    "truncation as the link-graph PageRank family, so the iterative "
    "ranker grades exactly; every join/groupBy keys on (doc, term) — "
    "co-partitioned, no corpus-sized hot key, one token explode total",
)
def q_textrank_keywords(spark, sf_dir):
    return ranking.textrank_keywords(
        _t(spark, sf_dir, "documents"), k=5, iters=4
    )


_SPELL_QUERY_TERMS = ["join", "hsh", "sparc", "filtr", "colum", "zzzzz"]


@register(
    "search_spell_suggest",
    ranking.spell_suggest_oracle_sql(_SPELL_QUERY_TERMS, k=3),
    "SymSpell-style 'did you mean' over the corpus vocabulary: "
    "candidates via a depth-1 deletion-neighborhood equi-join (complete "
    "for Levenshtein <= 1, never a vocab x query cross join), exact "
    "levenshtein verify, top-3 per query term by (distance, collection "
    "frequency DESC, term). Mix of exact ('join' suggests itself at "
    "distance 0), typo'd ('hsh', 'sparc', 'filtr', 'colum'), and "
    "unmatched ('zzzzz' yields no row) probes. Integer-only output — "
    "exact at any parallelism; the query side broadcasts",
)
def q_search_spell_suggest(spark, sf_dir):
    return ranking.spell_suggest_topk(
        _t(spark, sf_dir, "documents"), _SPELL_QUERY_TERMS, k=3
    )


@register(
    "search_autocomplete",
    ranking.autocomplete_oracle_sql(k=5, min_len=2, max_len=5, min_tf=2),
    "Prefix-autocomplete index: top-5 completions by collection "
    "frequency (tf DESC, term ASC) for every vocabulary prefix of "
    "length 2..5, hapax terms pruned (tf >= 2). Built from the bounded "
    "vocabulary, not the corpus — one map-side-combined groupBy(term) "
    "then <= 4 prefix rows per term into a window top-k; output bounded "
    "by #prefixes x k. The type-ahead point-lookup table a search box "
    "probes per keystroke",
)
def q_search_autocomplete(spark, sf_dir):
    return ranking.autocomplete_topk(
        _t(spark, sf_dir, "documents"), k=5, min_len=2, max_len=5, min_tf=2
    )


@register(
    "search_related_pmi",
    ranking.related_terms_pmi_oracle_sql(
        ["hash", "spark"], k=10, min_cooc=25
    ),
    "Related-searches via document-level PMI (Church & Hanks 1990): "
    "top-10 co-occurring terms per anchor ('hash', 'spark') by "
    "ln(n_at*N/(n_a*n_t)) over DISTINCT (doc, term) postings with a "
    "min-co-occurrence floor of 25 — never positional pairs, so no "
    "O(doc_len^2) explosion; anchor postings filter first and broadcast "
    "into the doc-key equi-join. Integer counts until the final ln + "
    "round(6)",
)
def q_search_related_pmi(spark, sf_dir):
    return ranking.related_terms_pmi(
        _t(spark, sf_dir, "documents"), ["hash", "spark"], k=10, min_cooc=25
    )


_SERVE_RAW_TERMS = ["hsh", "sparc", "jion"]


@register(
    "search_serve_pipeline",
    ranking.serve_search_oracle_sql(_SERVE_RAW_TERMS, k=10, window=5),
    "The composed serve-a-search-request pipeline over a typo'd query "
    "('hsh', 'sparc', 'jion'): SymSpell top-1 correction per term "
    "(terms with no Levenshtein-1 candidate drop out, like 'jion'), "
    "BM25 top-10 over the CORRECTED term set with the tf filter as a "
    "broadcast semi join against the corrected-terms relation (terms "
    "are data, not literals — no driver round-trip between stages), "
    "then clamped +-5-token snippets computed only for the 10 result "
    "docs. The oracle nests all three stage oracles over one shared "
    "corpus CTE; the FP-portable sorted-term fold keeps the composed "
    "result exact",
)
def q_search_serve_pipeline(spark, sf_dir):
    return ranking.serve_search_pipeline(
        _t(spark, sf_dir, "documents"), _SERVE_RAW_TERMS, k=10, window=5
    )


@register(
    "autocomplete_index_delta",
    ranking.autocomplete_oracle_sql(k=5, min_len=2, max_len=5, min_tf=2),
    "O(delta) autocomplete-index maintenance, completing the delta "
    "family (index_delta_merge / ann_index_delta / neardup_incremental): "
    "fold a ~25% document batch into a stored (vocab, index) pair — "
    "rows for prefixes no delta term touches pass through VERBATIM via "
    "a broadcast anti-join, only touched prefixes re-rank over the "
    "merged vocabulary (min_tf re-applied post-merge so base terms can "
    "cross the threshold). Graded as a theorem: the merged index is "
    "row-identical to the full rebuild over base + delta, which is what "
    "the oracle computes",
)
def q_autocomplete_index_delta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    in_delta = dedup.md5_32_col(F.col("doc_id").cast("string")) % 4 == 0
    base_docs, delta_docs = d.filter(~in_delta), d.filter(in_delta)
    # in production vocab + index are stored tables read by the merge;
    # materialize the synthetic base pair so the graded plan has the
    # stored-state shape instead of re-deriving the base per consumer
    base_vocab = ranking.autocomplete_vocab(base_docs).localCheckpoint(
        eager=False
    )
    base_index = ranking._autocomplete_from_vocab(
        base_vocab, k=5, min_len=2, max_len=5, min_tf=2
    ).localCheckpoint(eager=False)
    return ranking.merge_autocomplete_delta(
        base_vocab, base_index, delta_docs, k=5, min_len=2, max_len=5, min_tf=2
    )


@register(
    "webgraph_gap_encoding",
    graph.webgraph_gap_encode_oracle_sql(_PAGERANK_EDGES_CTE),
    "Boldi-Vigna-style adjacency storage over the md5-derived link "
    "graph: per source, successors sorted and delta-encoded (lag window "
    "partitioned by src), byte cost accounted as LEB128 varints vs "
    "8-byte raw ids via integer CASE thresholds (no log2 — libm-safe). "
    "One shuffle on src shared by the window and the groupBy; integer "
    "everything until the final round(6) compression ratio — the "
    "10^10-URL answer to the reference's raw neighbor-list storage "
    "(crawler/db/mysql.go:339-358)",
)
def q_webgraph_gap_encoding(spark, sf_dir):
    return graph.webgraph_gap_encode(_pagerank_edges(spark, sf_dir))


@register(
    "shard_selection_cori",
    ranking.cori_oracle_sql(_BM25_TERMS, n_shards=8),
    "CORI collection selection (Callan et al. SIGIR 1995): rank the 8 "
    "md5-bucketed index shards for the query ('hash','join','spark') by "
    "mean belief 0.4 + 0.6*T*I over the query terms — the broker-side "
    "routing table that lets a sharded deployment fan a query to the "
    "top shards instead of all of them. Shard stats are map-side "
    "combined integers (token sums, distinct-doc term counts); the "
    "belief mean folds in sorted-term order like BM25, so the FP result "
    "grades exactly",
)
def q_shard_selection_cori(spark, sf_dir):
    return ranking.shard_selection_cori(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, n_shards=8
    )


_QPP_QUERIES = [
    ("q1", ["hash", "join", "spark"]),
    ("q2", ["merge", "sort"]),
    ("q3", ["zzzunseen"]),  # out-of-vocabulary: df = cf = 0 path
    ("q4", ["row", "scan", "hash", "sort"]),
]


@register(
    "search_qpp_preretrieval",
    ranking.qpp_oracle_sql(_QPP_QUERIES),
    "pre-retrieval query-performance prediction (He & Ounis SIGIR 2004; "
    "Zhao et al. ECIR 2008 SCQ): per fixture query, avg/max IDF, avg "
    "ICTF, SCQ sum, and query scope from corpus statistics alone — the "
    "difficulty estimates a broker computes BEFORE running a query to "
    "pick fan-out depth or trigger RM3 expansion. One corpus scan "
    "builds the (bounded, broadcast) query-vocabulary stats table with "
    "map-side combine; q3 exercises the df=cf=0 out-of-vocabulary path "
    "identically on both engines. Completes the broker family next to "
    "shard_selection_cori / shard_selection_redde",
)
def q_search_qpp_preretrieval(spark, sf_dir):
    return ranking.qpp_preretrieval(
        _t(spark, sf_dir, "documents"), _QPP_QUERIES
    )


@register(
    "shard_selection_redde",
    ranking.redde_oracle_sql(_BM25_TERMS, n_shards=8, sample_mod=4, topn=40),
    "ReDDE resource selection (Si & Callan SIGIR 2003): estimate each "
    "of the 8 md5-bucketed shards' relevant-doc count for "
    "('hash','join','spark') by running the exact BM25 chain over a "
    "deterministic md5 1-in-4 central sample, taking the sample top-40, "
    "and scaling each shard's hits by n_docs/n_sampled — the "
    "sample-based complement to shard_selection_cori's statistics "
    "table. Per-query cost touches only the central sample regardless "
    "of corpus size; shard sizes are one map-side-combined integer "
    "groupBy built at sample time",
)
def q_shard_selection_redde(spark, sf_dir):
    return ranking.shard_selection_redde(
        _t(spark, sf_dir, "documents"),
        _BM25_TERMS,
        n_shards=8,
        sample_mod=4,
        topn=40,
    )


@register(
    "search_query_likelihood",
    ranking.query_likelihood_oracle_sql(_BM25_TERMS, k=10, mu=2000.0),
    "Dirichlet-smoothed query-likelihood top-10 (Zhai & Lafferty SIGIR "
    "2001) for ('hash','join','spark') with mu=2000 — the language-"
    "modeling counterpart to search_bm25_topk, same candidate rule and "
    "sorted-term FP fold; cf rides a broadcast handful of rows and the "
    "exploded stream filters to the query terms before its one shuffle",
)
def q_search_query_likelihood(spark, sf_dir):
    return ranking.query_likelihood_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=10, mu=2000.0
    )


@register(
    "search_rm3_expansion",
    ranking.rm3_oracle_sql(_BM25_TERMS, fb_docs=5, fb_terms=10, alpha=0.6),
    "RM3 pseudo-relevance-feedback expansion (Lavrenko & Croft SIGIR "
    "2001; Abdul-Jaleel et al. TREC 2004) with uniform feedback weights: "
    "QL top-5 feedback docs -> relevance model P(w|R) -> (1-a)q + a*RM "
    "interpolation, top-10 expansion terms. The oracle nests the full QL "
    "oracle; only |F| docs' token streams are touched after stage 1",
)
def q_search_rm3_expansion(spark, sf_dir):
    return ranking.rm3_expansion_terms(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, fb_docs=5, fb_terms=10,
        alpha=0.6,
    )


@register(
    "search_sdm",
    ranking.sdm_oracle_sql(_BM25_TERMS, k=10),
    "Sequential Dependence Model top-10 (Metzler & Croft SIGIR 2005) "
    "for ('hash','join','spark'): 0.85*unigram-QL + 0.1*ordered-bigram "
    "+ 0.05*unordered-window-8 features, each Dirichlet-smoothed. "
    "Collection stats are ONE aggregate pass to a handful of scalars; "
    "candidate scoring is a single scan-side codegen expression over "
    "the token array (positions via filter(sequence), no explode, no "
    "shuffle, no Python) and the top-k is TakeOrdered — the score has "
    "no data-dependent fold at all, so FP portability is structural",
)
def q_search_sdm(spark, sf_dir):
    return ranking.sdm_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@register(
    "index_quantized_impacts",
    ranking.quantized_impacts_oracle_sql(_BM25_TERMS, b_bits=8),
    "Impact-quantized postings (Anh, de Kretser & Moffat SIGIR 2001) "
    "for the terms ('hash','join','spark'): each posting's query-"
    "independent BM25 weight quantizes per-term to an 8-bit integer in "
    "[1,255] — the compressed, impact-ordered, early-termination index "
    "representation. Output is pure string/integer; the only doubles "
    "(the BM25 component and the one-shape quantization arithmetic) are "
    "bit-identical on both engines so floor() cannot straddle a boundary",
)
def q_index_quantized_impacts(spark, sf_dir):
    return ranking.quantized_impacts(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, b_bits=8
    )


@register(
    "search_quantized_topk",
    ranking.quantized_impacts_oracle_sql(_BM25_TERMS, b_bits=8, topk=10),
    "Query-time half of the impact-quantized index: top-10 docs by "
    "summed 8-bit impacts over ('hash','join','spark') — scoring is a "
    "pure INTEGER map-side-combined sum, no corpus statistics and no FP "
    "at query time at all (the Anh & Moffat early-termination payoff)",
)
def q_search_quantized_topk(spark, sf_dir):
    return ranking.quantized_impact_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=10, b_bits=8
    )


@register(
    "index_champion_lists",
    ranking.champion_oracle_sql(_BM25_TERMS, m=10),
    "champion lists / tier-1 static index pruning (Manning et al. IR "
    "2008 §7.1.3; Persin et al. 1996): per term, only the top-10 "
    "postings by 8-bit quantized impact (impact DESC, doc ASC) — the "
    "first-tier index a high-QPS stack probes before the full postings. "
    "One window per term partition on the same groupBy(term) shuffle "
    "the index build already pays; output bounded by vocab x m. Oracle "
    "nests the exact quantized-impacts chain plus the same window",
)
def q_index_champion_lists(spark, sf_dir):
    return ranking.champion_lists(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, m=10, b_bits=8
    )


@register(
    "search_champion_topk",
    ranking.champion_oracle_sql(_BM25_TERMS, m=10, k=10),
    "tier-1 champion-list retrieval: candidates = union of the query "
    "terms' champion lists (<= |q| x m docs, broadcast), each scored "
    "with its FULL integer impact sum, top-10. Deliberately "
    "approximate (the tiered-index trade) — the oracle replicates the "
    "champion candidate rule exactly; search_quantized_topk is the "
    "exhaustive tier-2 fallback. Query latency scales with |q| x m, "
    "not corpus size",
)
def q_search_champion_topk(spark, sf_dir):
    return ranking.champion_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=10, m=10, b_bits=8
    )


# ---------------------------------------------------------------------------
# round 5 (cont.): link-graph density, LTR serving, click models —
# continuing the exact-oracle discipline of everything above.
# ---------------------------------------------------------------------------


@register(
    "link_clustering_coeff",
    graph.clustering_oracle_sql(_PAGERANK_EDGES_CTE),
    "per-node local clustering coefficient (Watts & Strogatz 1998) over "
    "the undirected md5-derived link graph, in integer micro-units "
    "(2e6*triangles div deg*(deg-1)): the near-clique density signal "
    "separating a link farm (neighbors inter-linked, lcc->1) from a "
    "legitimate hub (lcc->0). Shares the single degree fold + "
    "O(m^1.5) oriented wedge join with link_triangle_counts; the "
    "coefficient is BIGINT integer division, bit-identical at any "
    "parallelism and engine",
)
def q_link_clustering_coeff(spark, sf_dir):
    return graph.clustering_coefficients(_pagerank_edges(spark, sf_dir))


@register(
    "search_ltr_linear",
    ranking.ltr_linear_oracle_sql(
        _BM25_TERMS,
        graph.pagerank_oracle_sql(_PAGERANK_EDGES_CTE, iters=5),
        k=10,
    ),
    "linear learning-to-rank serving (Liu 2009; Richardson et al. "
    "WWW'06's text-features + static-prior split): BM25, query "
    "coverage, ln-length, and ln-PageRank-mass features combined with "
    "a fixed offline-learned weight vector, top-10. The oracle nests "
    "the full BM25 chain AND the 5-iteration unrolled integer-PageRank "
    "CTE; each feature rounds to 6dp and the combination is a "
    "fixed-shape expression, so the composed score grades exactly. "
    "Candidates are O(matching postings); the static prior joins in "
    "candidate-driven",
)
def q_search_ltr_linear(spark, sf_dir):
    return ranking.ltr_linear_topk(
        _t(spark, sf_dir, "documents"),
        graph.pagerank(_pagerank_edges(spark, sf_dir), iters=5),
        _BM25_TERMS,
        k=10,
    )


from ..operators import click_models as _cm  # noqa: E402

# Deterministic md5-derived impression log over events: 8 queries x 40
# docs x 10 positions, click odds decaying with position (1/(p+2)) — the
# DuckDB twin of _click_log (same '0x'||substr(md5(...)) hash pattern as
# _PAGERANK_EDGES_CTE).
_CLICK_LOG_CTE = """
  SELECT imp_id, q, d, p,
         CASE WHEN hc % (p + 2) = 0 THEN 1 ELSE 0 END AS c
  FROM (
    SELECT e.event_id AS imp_id,
           ('0x'||substr(md5(e.event_id::VARCHAR||'#q'),1,6))::BIGINT % 8 AS q,
           ('0x'||substr(md5(e.event_id::VARCHAR||'#d'),1,6))::BIGINT % 40 AS d,
           ('0x'||substr(md5(e.event_id::VARCHAR||'#p'),1,6))::BIGINT % 10 + 1
             AS p,
           ('0x'||substr(md5(e.event_id::VARCHAR||'#c'),1,6))::BIGINT AS hc
    FROM events e
  )
"""


def _click_log(spark, sf_dir):
    """Deterministic md5-derived (imp_id, q, d, p, c) impression log over
    events — the Spark twin of _CLICK_LOG_CTE."""

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit(tag))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_id").alias("imp_id"),
        (h("#q") % 8).alias("q"),
        (h("#d") % 40).alias("d"),
        (h("#p") % 10 + 1).alias("p"),
        h("#c").alias("_hc"),
    )
    return base.select(
        "imp_id",
        "q",
        "d",
        "p",
        F.when(F.col("_hc") % (F.col("p") + 2) == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("c"),
    )


@register(
    "click_model_pbm_ctr",
    _cm.pbm_oracle_sql(_CLICK_LOG_CTE, iters=2, output="alpha"),
    "Position-Based Model attractiveness (Craswell et al. WSDM 2008; "
    "Chuklin et al. 2015 ch.3) after 2 EM rounds over the md5-derived "
    "impression log: alpha_{qd} = the position-debiased CTR, the click "
    "signal LTR consumes as a relevance label. Each EM round is two "
    "map-side-combinable groupBys (one keyed (q,d), one keyed p with "
    "the ~10-row gamma table broadcast); parameters round to 6dp per "
    "M-step and the means fold in impression-id order, so the "
    "iterative latent-variable estimator grades via an exact "
    "unrolled-CTE oracle",
)
def q_click_model_pbm_ctr(spark, sf_dir):
    return _cm.pbm_attractiveness(_click_log(spark, sf_dir), iters=2)


@register(
    "click_model_pbm_exam",
    _cm.pbm_oracle_sql(_CLICK_LOG_CTE, iters=2, output="gamma"),
    "Position-Based Model examination curve gamma_p after the same 2 EM "
    "rounds — the measured position-bias profile (click odds the "
    "synthetic log decays as 1/(p+2), which the EM recovers "
    "monotonically decreasing). Same exact-oracle EM chain as "
    "click_model_pbm_ctr, projected to the position family",
)
def q_click_model_pbm_exam(spark, sf_dir):
    return _cm.pbm_examination(_click_log(spark, sf_dir), iters=2)


# Session-structured twin of _CLICK_LOG_CTE: 10-position ranked sessions
# (s = event_id div 10, p = event_id % 10 + 1), same md5-derived q/d and
# the same position-decaying click rule.
_SESSION_LOG_CTE = """
  SELECT s, q, d, p,
         CASE WHEN hc % (p + 2) = 0 THEN 1 ELSE 0 END AS c
  FROM (
    SELECT e.event_id // 10 AS s,
           e.event_id % 10 + 1 AS p,
           ('0x'||substr(md5((e.event_id // 10)::VARCHAR||'#q'),1,6))::BIGINT
             % 8 AS q,
           ('0x'||substr(md5(e.event_id::VARCHAR||'#d'),1,6))::BIGINT
             % 40 AS d,
           ('0x'||substr(md5(e.event_id::VARCHAR||'#c'),1,6))::BIGINT AS hc
    FROM events e
  )
"""


def _session_log(spark, sf_dir):
    """Spark twin of _SESSION_LOG_CTE — (s, q, d, p, c) ranked sessions."""

    def h(col, tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(tag))), 1, 6
            ),
            16,
            10,
        ).cast("long")

    ev = _t(spark, sf_dir, "events")
    s = F.expr("event_id div 10")
    base = ev.select(
        s.alias("s"),
        (F.col("event_id") % 10 + 1).alias("p"),
        (h(s, "#q") % 8).alias("q"),
        (h(F.col("event_id"), "#d") % 40).alias("d"),
        h(F.col("event_id"), "#c").alias("_hc"),
    )
    return base.select(
        "s",
        "q",
        "d",
        "p",
        F.when(F.col("_hc") % (F.col("p") + 2) == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("c"),
    )


@register(
    "click_model_cascade",
    _cm.cascade_oracle_sql(_SESSION_LOG_CTE),
    "Cascade-model attractiveness MLE (Craswell et al. WSDM 2008) over "
    "md5-derived 10-position ranked sessions: the user scans top-down "
    "and stops at the first click, so alpha_{qd} = first-clicks / "
    "examinations in closed form — pure integer counting plus one "
    "rounded division (no EM; the cascade likelihood factorizes). "
    "First-click position is one map-side-combinable groupBy(s) min "
    "joined back co-partitioned on s. Completes the click-model "
    "family next to the EM-estimated PBM entries",
)
def q_click_model_cascade(spark, sf_dir):
    return _cm.cascade_mle(_session_log(spark, sf_dir))


@register(
    "click_model_dcm_ctr",
    _cm.dcm_oracle_sql(_SESSION_LOG_CTE, output="alpha"),
    "Dependent Click Model attractiveness MLE (Guo, Liu & Wang WSDM "
    "2009) over the same md5-derived ranked sessions — the multi-click "
    "generalization of the cascade: the examined prefix runs to the "
    "session's LAST click (whole list when no click), and every raw "
    "click counts, so alpha_{qd} = clicks / examinations in closed "
    "form. Pure integer counting plus one rounded division; last-click "
    "position is one map-side-combinable groupBy(s) max joined back "
    "co-partitioned on s. Completes the click-model trio "
    "(PBM / cascade / DCM)",
)
def q_click_model_dcm_ctr(spark, sf_dir):
    return _cm.dcm_attractiveness(_session_log(spark, sf_dir))


@register(
    "click_model_dcm_cont",
    _cm.dcm_oracle_sql(_SESSION_LOG_CTE, output="lambda"),
    "Dependent Click Model continuation curve lambda_p (Guo et al. WSDM "
    "2009): the probability a user keeps scanning after a click at "
    "position p, estimated closed-form as 1 - last-clicks(p)/clicks(p) "
    "over the same session log. One groupBy(p) over the clicked rows "
    "joined to the per-session last-click table; positions never "
    "clicked carry no evidence and are dropped",
)
def q_click_model_dcm_cont(spark, sf_dir):
    return _cm.dcm_continuation(_session_log(spark, sf_dir))


@register(
    "click_model_sdbn_sat",
    _cm.sdbn_oracle_sql(_SESSION_LOG_CTE),
    "simplified-DBN satisfaction MLE (Chapelle & Zhang WWW 2009, "
    "gamma=1) over the same ranked sessions: s_{qd} = the probability "
    "a click on d ENDED the search (its click is the session's last) — "
    "the per-(query, doc) dwell-free relevance signal DCM's "
    "per-position lambda cannot express. Closed-form integer counting "
    "(one groupBy(s) max joined back, one groupBy (q,d)); completes "
    "the click-model family: PBM (EM), cascade, DCM, sDBN",
)
def q_click_model_sdbn_sat(spark, sf_dir):
    return _cm.sdbn_satisfaction(_session_log(spark, sf_dir))


@register(
    "click_model_ubm_ctr",
    _cm.ubm_oracle_sql(_SESSION_LOG_CTE, iters=2, output="alpha"),
    "User Browsing Model attractiveness (Dupret & Piwowarski SIGIR "
    "2008) after 2 EM rounds over the md5-derived ranked sessions: "
    "examination is keyed (position, previous-click position) instead "
    "of PBM's bare position, so alpha_{qd} is debiased against the "
    "click-gap effect PBM cannot see. r is one session-partitioned "
    "running-max window; each EM round is the PBM's two map-side-"
    "combinable groupBys with the (p,r) gamma table still broadcast-"
    "sized. Same 6dp-per-M-step / imp_id-ordered-fold discipline, so "
    "the latent-variable estimator grades via an exact unrolled-CTE "
    "oracle",
)
def q_click_model_ubm_ctr(spark, sf_dir):
    return _cm.ubm_attractiveness(_session_log(spark, sf_dir), iters=2)


@register(
    "click_model_ubm_exam",
    _cm.ubm_oracle_sql(_SESSION_LOG_CTE, iters=2, output="gamma"),
    "User Browsing Model examination surface gamma_{p,r} after the "
    "same 2 EM rounds — the (position, previous-click) browsing "
    "profile: examination decays with distance below the last click, "
    "the UBM signature PBM's per-position curve flattens away. Same "
    "exact-oracle EM chain as click_model_ubm_ctr, projected to the "
    "(p, r) family",
)
def q_click_model_ubm_exam(spark, sf_dir):
    return _cm.ubm_examination(_session_log(spark, sf_dir), iters=2)


from ..operators import querylog as _ql  # noqa: E402

# Per-user temporal query log over events: q = md5(event_id#qr) % 32 —
# each event row is one issued query in the user's timeline.
_QUERYLOG_CTE = """
  SELECT user_id, ts, event_id,
         ('0x'||substr(md5(event_id::VARCHAR||'#qr'),1,6))::BIGINT % 32 AS q
  FROM events
"""


def _query_log(spark, sf_dir):
    """Spark twin of _QUERYLOG_CTE — (user_id, ts, event_id, q)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit("#qr")
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 32
        ).alias("q"),
    )


@register(
    "search_query_reformulations",
    _ql.reformulations_oracle_sql(_QUERYLOG_CTE, k=5),
    "query-flow graph top-5 reformulations per source query (Boldi et "
    "al. CIKM 2008): consecutive query pairs inside each user's "
    "timeline (ordered ts, event_id — a total order, so deterministic), "
    "aggregated by frequency — the 'people also searched for' edge "
    "list. One window per user partition (the log's natural bucketing), "
    "one map-side-combined groupBy(pair), one bounded top-k window. "
    "Pure integer counting",
)
def q_search_query_reformulations(spark, sf_dir):
    return _ql.query_reformulations(_query_log(spark, sf_dir), k=5)


@register(
    "search_related_queries_coclick",
    _ql.coclick_oracle_sql(
        f"SELECT q, d FROM ({_CLICK_LOG_CTE}) WHERE c = 1", cap=7
    ),
    "related queries via shared clicked docs (Beeferman & Berger KDD "
    "2000; Craswell & Szummer 2007): for every query pair sharing a "
    "clicked doc, the distinct co-click count and integer "
    "milli-Jaccard over their clicked-doc sets. Docs whose clicked-"
    "query set exceeds the cap (7 — at sf0.01 that keeps the 2 "
    "degree-7 docs and drops the 38 degree-8 ones, exercising both "
    "sides of the cap) drop BEFORE the pair explosion — "
    "the degree-cap discipline of related_pages_cocitation, applied "
    "identically in the oracle. All integers; per-doc pair explosion "
    "bounded by cap^2",
)
def q_search_related_queries_coclick(spark, sf_dir):
    clicks = _click_log(spark, sf_dir).filter(F.col("c") == 1)
    return _ql.related_queries_coclick(clicks, cap=7)


# -------------------------------------------------------- robots eval

# Shared rule book: host index -> serialized rule string ('D:p|A:p' — the
# host_state.robots_rules format of functions/robots.py). Exercises root
# disallow, allow-override of a deeper prefix, the RFC 9309 allow-wins
# tie (D:/p3 vs A:/p3), and rule-free hosts.
_ROBOTS_RULEBOOK = {
    0: "D:/p0|A:/p0/s1|D:/p3|A:/p3|CD:2.0",
    1: "D:/|A:/p2|CD:1.0",
    2: "",
    3: "D:/p0|A:/p0/s1|D:/p3|A:/p3|CD:2.0",
    4: "D:/|A:/p2|CD:1.0",
    5: "",
    6: "D:/p0|A:/p0/s1|D:/p3|A:/p3|CD:2.0",
    7: "D:/|A:/p2|CD:1.0",
}


def _robots_rule_values() -> str:
    """The rule book exploded to SQL VALUES (host, prefix, allow)."""
    rows = []
    for k, rules in _ROBOTS_RULEBOOK.items():
        for part in rules.split("|"):
            if part.startswith(("D:", "A:")):
                rows.append(
                    f"('h{k}.example', '{part[2:]}',"
                    f" {'TRUE' if part.startswith('A:') else 'FALSE'})"
                )
    return ", ".join(rows)


_ROBOTS_EVAL_ORACLE = f"""
WITH base AS (
  SELECT d.doc_id AS url_id,
    'h' || (('0x'||substr(md5(d.doc_id::VARCHAR||'#h'),1,6))::BIGINT % 8)
      || '.example' AS host,
    '/p' || (('0x'||substr(md5(d.doc_id::VARCHAR||'#a'),1,6))::BIGINT % 5)
      || '/s'
      || (('0x'||substr(md5(d.doc_id::VARCHAR||'#b'),1,6))::BIGINT % 7)
      AS path
  FROM documents d
),
rules AS (SELECT * FROM (VALUES {{values}}) t(host, prefix, allow)),
m AS (
  SELECT b.url_id, r.allow,
         row_number() OVER (
           PARTITION BY b.url_id
           ORDER BY len(r.prefix) DESC, r.allow DESC
         ) AS rn
  FROM base b
  JOIN rules r ON r.host = b.host AND starts_with(b.path, r.prefix)
),
best AS (SELECT url_id, allow FROM m WHERE rn = 1)
SELECT b.url_id, b.host, b.path,
       'http://' || b.host || b.path AS url
FROM base b LEFT JOIN best ON best.url_id = b.url_id
WHERE COALESCE(best.allow, TRUE)
""".replace("{values}", _robots_rule_values())


def _robots_url_frontier(spark, sf_dir):
    """Deterministic md5-derived candidate URL frontier over documents —
    the Spark twin of the oracle's `base` CTE."""

    def h(tag, mod):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit(tag))
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % mod
        )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("h"), h("#h", 8), F.lit(".example")).alias("host"),
        F.concat(
            F.lit("/p"), h("#a", 5), F.lit("/s"), h("#b", 7)
        ).alias("path"),
    ).withColumn(
        "url", F.concat(F.lit("http://"), F.col("host"), F.col("path"))
    )


@register(
    "robots_rules_eval",
    _ROBOTS_EVAL_ORACLE,
    "RFC 9309 robots rule evaluation as a set operator: an md5-derived "
    "candidate URL frontier joined to per-host serialized rule sets "
    "(functions/robots.py host_state format), longest-prefix match "
    "with allow-wins ties, rule-free hosts pass. Exercises root "
    "disallow (D:/), allow-override of a deeper prefix (A:/p0/s1 under "
    "D:/p0), and the equal-length A-beats-D tie. JVM-side throughout: "
    "the per-host rule book broadcasts and the match is one "
    "higher-order-array fold per url — at 10^10 urls the frontier "
    "never shuffles for robots, the gate is map-only. The oracle "
    "replays the match as a window rank over the exploded rule rows",
)
def q_robots_rules_eval(spark, sf_dir):
    from ..functions.robots import filter_robots_allowed

    host_state = spark.createDataFrame(
        [(f"h{k}.example", r) for k, r in _ROBOTS_RULEBOOK.items()],
        "host string, robots_rules string",
    )
    urls = _robots_url_frontier(spark, sf_dir)
    return filter_robots_allowed(urls, host_state).select(
        "url_id", "host", "path", "url"
    )


# --------------------------------------------- team-draft interleaving

# Two deterministic duplicate-free rankers per query q in 0..7: ranker A
# = (3*i + md5(q#A)) mod 40, ranker B = (7*i + md5(q#B)) mod 40 for
# i = 0..4 (3 and 7 are coprime with 40, so each 5-list is injective).
_TDI_RANKINGS_CTE = """
  SELECT q,
    list_transform(range(0, 5), i -> (3 * i +
      ('0x'||substr(md5(q::VARCHAR||'#A'),1,6))::BIGINT % 40) % 40) AS a,
    list_transform(range(0, 5), i -> (7 * i +
      ('0x'||substr(md5(q::VARCHAR||'#B'),1,6))::BIGINT % 40) % 40) AS b
  FROM (SELECT range AS q FROM range(8))
"""


def _tdi_rankings(spark, sf_dir):
    """Spark twin of _TDI_RANKINGS_CTE."""

    def h(tag):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("q").cast("string"), F.lit(tag))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 40
        )

    base = spark.range(8).select(F.col("id").alias("q"))
    return base.select(
        "q",
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: (F.lit(3) * i.cast("long") + h("#A")) % 40,
        ).alias("a"),
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: (F.lit(7) * i.cast("long") + h("#B")) % 40,
        ).alias("b"),
    )


@register(
    "search_eval_interleaving",
    ranking.tdi_oracle_sql(_TDI_RANKINGS_CTE, steps=10),
    "team-draft interleaving (Radlinski et al. CIKM 2008) — the ONLINE "
    "ranker A/B evaluator the offline trec_eval family can't replace: "
    "per query, rankers A and B draft alternately into one interleaved "
    "list (fewer-contributions-first, deterministic md5 coin per tie, "
    "a team with no docs left cedes), clicks simulated on the SHARED "
    "interleaved positions with the repo's position-decay rule, and "
    "the team with more clicked contributions wins. All counting is "
    "integer and the draft is a per-row array fold (map-only, no "
    "shuffle, no Python — a billion-query log interleaves without one "
    "exchange), graded by a 10-step unrolled-CTE oracle replaying the "
    "identical draft",
)
def q_search_eval_interleaving(spark, sf_dir):
    return ranking.team_draft_interleave(_tdi_rankings(spark, sf_dir))


@register(
    "click_graph_walk",
    _ql.click_graph_walk_oracle_sql(
        f"SELECT q, d FROM ({_CLICK_LOG_CTE}) WHERE c = 1", steps=3
    ),
    "Markov random walk on the bipartite click graph (Craswell & "
    "Szummer SIGIR 2007), 3 half-steps q→d→q'→d': integer mass splits "
    "evenly over click edges per half-step (mass div degree, the "
    "pagerank fixed-point discipline), so docs co-clicked with q's "
    "neighbors earn walk-smoothed relevance the raw click CTR can't "
    "see. Bit-identical at any parallelism; exact 3-CTE join-agg "
    "oracle. The degree-folded edge list shuffles once and every "
    "half-step reuses it keyed alternately by q and d; a mass floor "
    "(0 here) bounds per-query reachable-set growth at scale",
)
def q_click_graph_walk(spark, sf_dir):
    clicks = _click_log(spark, sf_dir).filter(F.col("c") == 1)
    return _ql.click_graph_walk(clicks, steps=3)


@register(
    "cache_lru_hit_curve",
    _ql.lru_hit_curve_oracle_sql(
        f"SELECT event_id AS t, q FROM ({_QUERYLOG_CTE})",
        capacities=(1, 4, 16, 64),
    ),
    "LRU result-cache hit-rate curve (Markatos IPM 2001; Mattson stack "
    "distances 1970) over the temporal query log: per capacity k in "
    "{1,4,16,64}, the fraction of queries a k-entry LRU front cache "
    "would serve — a repeat hits iff the number of DISTINCT other "
    "queries since its previous occurrence is < k; first occurrences "
    "are compulsory misses. One lag window per query partition + one "
    "strict-between range join; the offline analysis that sizes the "
    "serving tier's cache, run on a day's log or a sample (the "
    "documented O(sum-of-gaps) shape), all-integer + one rounded "
    "division so the curve grades exactly",
)
def q_cache_lru_hit_curve(spark, sf_dir):
    lg = _query_log(spark, sf_dir).select(
        F.col("event_id").alias("t"), "q"
    )
    return _ql.lru_hit_curve(lg, capacities=(1, 4, 16, 64), t_col="t")


# the md5 log spreads clicks evenly (every query reads informational), so
# the intent entry unions a navigational block: queries 100..103 whose
# every click lands on one target doc — both rule branches graded.
_INTENT_CLICKS_CTE = f"""
  SELECT q, d FROM ({_CLICK_LOG_CTE}) WHERE c = 1
  UNION ALL
  SELECT 100 + event_id % 4 AS q, 1000 + event_id % 4 AS d FROM events
"""


@register(
    "query_intent_classes",
    _ql.query_intent_oracle_sql(_INTENT_CLICKS_CTE),
    "navigational-vs-informational intent from click concentration "
    "(Lee, Liu & Cho WWW 2005; Broder taxonomy): per query the click "
    "entropy (doc-id-ordered fold, 6dp), modal-doc share, and the "
    "paper's threshold rule (share >= 0.8 AND <= 2 distinct docs -> "
    "navigational) — the router signal that lets serving skip "
    "expensive ranking for navigational traffic. Two map-side-"
    "combinable groupBys; the per-query fold holds one SERP-bounded "
    "histogram",
)
def q_query_intent_classes(spark, sf_dir):
    clicks = _click_log(spark, sf_dir).filter(F.col("c") == 1).select("q", "d")
    nav = _t(spark, sf_dir, "events").select(
        (F.lit(100) + F.col("event_id") % 4).alias("q"),
        (F.lit(1000) + F.col("event_id") % 4).alias("d"),
    )
    return _ql.query_intent(clicks.unionByName(nav))


# ----------------------------------------------------------- xQuAD

# Dyadic md5 grids (all probabilities on /8 and /16 grids, so every
# xQuAD product/sum is EXACT in doubles — no rounding anywhere):
# candidates d = (5i + h(q)) mod 41 (injective per q), rel on /16;
# aspect importance paq on /8; doc-aspect relevance pda on /16.
_XQUAD_CAND_CTE = """
  SELECT q, d,
    (1 + ('0x'||substr(md5(q::VARCHAR||'-'||d::VARCHAR||'#r'),1,6))::BIGINT
       % 15) / 16.0 AS rel
  FROM (
    SELECT r1.range AS q,
      (5 * r2.range +
       ('0x'||substr(md5(r1.range::VARCHAR||'#c'),1,6))::BIGINT % 41) % 41
        AS d
    FROM range(8) r1, range(8) r2
  )
"""

_XQUAD_ASP_CTE = """
  SELECT r1.range AS q, r2.range AS a,
    (1 + ('0x'||substr(md5(r1.range::VARCHAR||'-'||r2.range::VARCHAR
       ||'#pa'),1,6))::BIGINT % 4) / 8.0 AS paq
  FROM range(8) r1, range(4) r2
"""

_XQUAD_DOCASP_CTE = """
  SELECT r1.range AS d, r2.range AS a,
    (('0x'||substr(md5(r1.range::VARCHAR||'-'||r2.range::VARCHAR
       ||'#da'),1,6))::BIGINT % 8) / 16.0 AS pda
  FROM range(41) r1, range(4) r2
"""


def _xquad_inputs(spark, sf_dir):
    """Spark twins of the three xQuAD CTEs."""

    def h(cols, tag):
        parts = []
        for j, c in enumerate(cols):
            if j:
                parts.append(F.lit("-"))
            parts.append(c.cast("string"))
        parts.append(F.lit(tag))
        return F.conv(
            F.substring(F.md5(F.concat(*parts)), 1, 6), 16, 10
        ).cast("long")

    q8 = spark.range(8).select(F.col("id").alias("q"))
    i8 = spark.range(8).select(F.col("id").alias("i"))
    cand = (
        q8.crossJoin(i8)
        .select(
            "q",
            (
                (F.lit(5) * F.col("i") + h([F.col("q")], "#c") % 41) % 41
            ).alias("d"),
        )
        .select(
            "q",
            "d",
            (
                (1 + h([F.col("q"), F.col("d")], "#r") % 15) / F.lit(16.0)
            ).alias("rel"),
        )
    )
    a4 = spark.range(4).select(F.col("id").alias("a"))
    asp = q8.crossJoin(a4).select(
        "q",
        "a",
        ((1 + h([F.col("q"), F.col("a")], "#pa") % 4) / F.lit(8.0)).alias(
            "paq"
        ),
    )
    d41 = spark.range(41).select(F.col("id").alias("d"))
    docasp = d41.crossJoin(a4).select(
        "d",
        "a",
        ((h([F.col("d"), F.col("a")], "#da") % 8) / F.lit(16.0)).alias(
            "pda"
        ),
    )
    return cand, asp, docasp


@register(
    "search_xquad_rerank",
    ranking.xquad_oracle_sql(
        _XQUAD_CAND_CTE, _XQUAD_ASP_CTE, _XQUAD_DOCASP_CTE, k=5, lam=0.5
    ),
    "xQuAD explicit diversification (Santos et al. WWW 2010): greedy "
    "top-5 per query rewarding docs that cover still-uncovered query "
    "aspects — (1-l)*rel + l*sum_a P(a|q)P(d|a)*prod(1-P(d'|a)) over "
    "the selected set. All probabilities on dyadic /8-/16 md5 grids so "
    "every product is EXACT in doubles (no rounding; ties d ASC), and "
    "the greedy recursion grades via a 5-step unrolled oracle. "
    "Completes the diversification family next to MMR: implicit "
    "pairwise-similarity penalty there, explicit aspect coverage here. "
    "Pool-bounded per-step work, one window rank per q partition",
)
def q_search_xquad_rerank(spark, sf_dir):
    cand, asp, docasp = _xquad_inputs(spark, sf_dir)
    return ranking.xquad_rerank(cand, asp, docasp, k=5, lam=0.5)


_ANDCG_RUN_CTE = f"""
  SELECT q, d, row_number() OVER (
    PARTITION BY q ORDER BY rel DESC, d) AS rank
  FROM ({_XQUAD_CAND_CTE})
"""

# binary aspect coverage over the candidate grid: ~1/3 of (q, a, d)
# triples judged covering
_ANDCG_JUDG_CTE = f"""
  SELECT c.q, r.range AS a, c.d
  FROM ({_XQUAD_CAND_CTE}) c, range(4) r
  WHERE ('0x'||substr(md5(c.q::VARCHAR||'-'||r.range::VARCHAR||'-'
        ||c.d::VARCHAR||'#j'),1,6))::BIGINT % 3 = 0
"""


def _andcg_inputs(spark, sf_dir):
    """Spark twins of _ANDCG_RUN_CTE / _ANDCG_JUDG_CTE."""
    from pyspark.sql import Window

    cand, _, _ = _xquad_inputs(spark, sf_dir)
    w = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("d"))
    run = cand.select(
        "q", "d", F.row_number().over(w).cast("long").alias("rank")
    )
    a4 = spark.range(4).select(F.col("id").alias("a"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("q").cast("string"),
                    F.lit("-"),
                    F.col("a").cast("string"),
                    F.lit("-"),
                    F.col("d").cast("string"),
                    F.lit("#j"),
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    judg = (
        cand.select("q", "d")
        .crossJoin(a4)
        .filter(h % 3 == 0)
        .select("q", "a", "d")
    )
    return run, judg


@register(
    "search_eval_alpha_ndcg",
    ranking.alpha_ndcg_oracle_sql(_ANDCG_RUN_CTE, _ANDCG_JUDG_CTE, k=5),
    "alpha-nDCG@5 diversity evaluation (Clarke et al. SIGIR 2008), the "
    "metric xQuAD optimizes: a doc's gain halves per earlier doc "
    "covering the same aspect (alpha=0.5 -> exact dyadic decay), DCG "
    "discounts by log2, and the ideal is the paper's greedy "
    "approximation (exact ideal is NP-hard) unrolled 5 steps in the "
    "oracle with d-ASC ties. Realized side is one window per (q, "
    "aspect); the greedy ideal runs over the qrels-bounded judged "
    "pool only — the xQuAD loop shape. Completes the evaluator "
    "family with its diversity member next to nDCG/ERR/RBP/MAP/MRR",
)
def q_search_eval_alpha_ndcg(spark, sf_dir):
    run, judg = _andcg_inputs(spark, sf_dir)
    return ranking.alpha_ndcg_at_k(run, judg, k=5)


@register(
    "search_rank_fusion_borda",
    rf"""
    WITH bm AS MATERIALIZED (
      {ranking.bm25_oracle_sql(_BM25_TERMS, k=50)}
    ),
    pr0 AS MATERIALIZED (
      {graph.pagerank_oracle_sql(_PAGERANK_EDGES_CTE, iters=5)}
    ),
    pr AS (SELECT node, rank FROM pr0 ORDER BY rank DESC, node ASC LIMIT 50),
    bmn AS (SELECT COUNT(*) AS n FROM bm),
    prn AS (SELECT COUNT(*) AS n FROM pr),
    bmr AS (SELECT doc_id AS doc,
                   (SELECT n FROM bmn) + 1
                     - row_number() OVER (ORDER BY score DESC, doc_id ASC)
                     AS pts
            FROM bm),
    prr AS (SELECT node AS doc,
                   (SELECT n FROM prn) + 1
                     - row_number() OVER (ORDER BY rank DESC, node ASC)
                     AS pts
            FROM pr),
    u AS (SELECT * FROM bmr UNION ALL SELECT * FROM prr),
    f AS (SELECT doc, SUM(pts)::BIGINT AS borda FROM u GROUP BY doc)
    SELECT doc AS doc_id, borda FROM f ORDER BY borda DESC, doc_id ASC
    LIMIT 10
    """,
    "Borda-count fusion (Aslam & Montague SIGIR 2001) over the same "
    "BM25-top-50 + integer-PageRank-top-50 pair as the RRF entry: each "
    "system awards N+1-rank points, absent docs get 0, totals are pure "
    "BIGINT sums — the linear positional-voting bracket to RRF's "
    "reciprocal damping, exact with no FP discipline at all. The "
    "oracle nests both upstream chains as scoped CTEs like the RRF "
    "entry, so the pair re-verifies text scoring and link ranking "
    "under a second fusion rule",
)
def q_search_rank_fusion_borda(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bm = ranking.bm25_topk(d, _BM25_TERMS, k=50)
    pr = (
        graph.pagerank(_pagerank_edges(spark, sf_dir), iters=5)
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(50)
        .select(F.col("node").alias("doc_id"), F.col("rank").alias("score"))
    )
    return ranking.borda_fuse(
        {"bm25": bm.select("doc_id", "score"), "pagerank": pr},
        k=10,
        id_col="doc_id",
    )


# Per-query paired metric values on a dyadic /16 grid — the bootstrap
# operates on whatever per-query evaluator output is fed in; the grid
# makes every delta and fold step exact.
_BOOT_METRICS_CTE = """
  SELECT range AS q,
    (('0x'||substr(md5(range::VARCHAR||'#ma'),1,6))::BIGINT % 17) / 16.0
      AS m_a,
    (('0x'||substr(md5(range::VARCHAR||'#mb'),1,6))::BIGINT % 17) / 16.0
      AS m_b
  FROM range(40)
"""


def _boot_metrics(spark, sf_dir):
    """Spark twin of _BOOT_METRICS_CTE."""

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col("q").cast("string"), F.lit(tag))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")

    return spark.range(40).select(
        F.col("id").alias("q")
    ).select(
        "q",
        ((h("#ma") % 17) / F.lit(16.0)).alias("m_a"),
        ((h("#mb") % 17) / F.lit(16.0)).alias("m_b"),
    )


@register(
    "search_eval_bootstrap",
    ranking.paired_bootstrap_oracle_sql(_BOOT_METRICS_CTE, n_boot=64),
    "paired bootstrap significance test (Sakai SIGIR 2006; Smucker et "
    "al. CIKM 2007) — the decision layer above the per-query "
    "evaluators: 64 deterministic md5-drawn resamples (with "
    "replacement) of the 40-query paired metric deltas, one-sided "
    "p = fraction of resample means <= 0 (exact dyadic at /64), plus "
    "win/loss/tie counts and the observed mean delta. Deltas on a "
    "dyadic grid and j-ordered 6dp folds make the whole resampling "
    "chain exact-oracle-checkable. The qrels set is bounded by "
    "construction, so the resample grid is a map-only fold over one "
    "broadcast-sized array — no shuffle at any corpus scale",
)
def q_search_eval_bootstrap(spark, sf_dir):
    return ranking.paired_bootstrap_test(_boot_metrics(spark, sf_dir))


# production doc ids are sparse url hashes — scatter the test ids into a
# 32-bit space so the original assignment pays real multi-byte gaps and
# the dense renumbering shows Silvestri's win
_SCATTERED_DOCS = """(
  SELECT ('0x'||substr(md5(doc_id::VARCHAR||'#sid'),1,8))::BIGINT AS doc_id,
         text, lang, source
  FROM documents
)"""


@register(
    "index_docid_assignment",
    ranking.docid_assignment_oracle_sql(docs_table=_SCATTERED_DOCS),
    "document-identifier assignment for index compression (Silvestri "
    "ECIR 2007): re-number docs in (source, lang) lexicographic order "
    "— the sort-by-URL baseline that captures most of the clustering "
    "win at zero cost — and measure every term's postings under both "
    "id spaces with the integer varint cost model "
    "(webgraph_gap_encode's CASE thresholds, no log2). Output: "
    "original-vs-clustered total varint bytes and bytes/posting. One "
    "term-keyed shuffle with per-term lag windows; the renumbering is "
    "one total-order row_number the ingest's URL partitioning already "
    "provides at scale",
)
def q_index_docid_assignment(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#sid"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("doc_id"),
        "text",
        "lang",
        "source",
    )
    return ranking.docid_assignment_benefit(d)


# --------------------------------------- crawl integrity: cloaking

# Dual-fetch log over documents: the bot fetch serves the real text;
# the browser fetch serves the same text except every 17th doc, which
# cloaks to a constant spam payload.
_CLOAK_SPAM = "buy cheap pills now best prices guaranteed click here today"

_CLOAK_FETCHES_CTE = f"""
  SELECT doc_id AS url, 'bot' AS ua, text FROM documents
  UNION ALL
  SELECT doc_id AS url, 'browser' AS ua,
         CASE WHEN doc_id % 17 = 0 THEN '{_CLOAK_SPAM}' ELSE text END
           AS text
  FROM documents
"""


@register(
    "crawl_cloaking_detect",
    mirrors.cloaking_oracle_sql(_CLOAK_FETCHES_CTE),
    "cloaking detection by dual-fetch comparison (Wu & Davison AIRWeb "
    "2005): every URL fetched under a crawler UA and a browser UA, "
    "3-token shingle sets compared by integer milli-Jaccard, flagged "
    "under 500 — the spam signal robots compliance can't see (the "
    "synthetic log cloaks every 17th doc to a constant payload, so "
    "both flag branches grade). Shingling is in-scan JVM expression "
    "work; the compare is one url-keyed join of distinct shingles, "
    "co-partitioned on the dual-fetch log's native key",
)
def q_crawl_cloaking_detect(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bot = d.select(
        F.col("doc_id").alias("url"), F.lit("bot").alias("ua"), "text"
    )
    browser = d.select(
        F.col("doc_id").alias("url"),
        F.lit("browser").alias("ua"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(_CLOAK_SPAM))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return mirrors.cloaking_detect(bot.unionByName(browser))


# ------------------------------------- sitemap coverage audit

# Crawled set: two-thirds of the listed urls (md5 gate) plus orphan
# /extra/ pages for every 13th doc — both coverage and orphan branches
# grade.
_SITEMAP_CRAWLED_CTE = """
  SELECT source AS host, 'https://' || source || '/doc/' || doc_id AS url
  FROM documents
  WHERE ('0x'||substr(md5(doc_id::VARCHAR||'#cr'),1,6))::BIGINT % 3 != 0
  UNION ALL
  SELECT source AS host, 'https://' || source || '/extra/' || doc_id AS url
  FROM documents WHERE doc_id % 13 = 0
"""

_SITEMAP_LISTED_CTE = """
  SELECT source AS host, 'https://' || source || '/doc/' || doc_id AS url
  FROM documents
"""


@register(
    "sitemap_coverage_audit",
    urlmine.sitemap_coverage_oracle_sql(
        _SITEMAP_LISTED_CTE, _SITEMAP_CRAWLED_CTE
    ),
    "sitemap-vs-crawl coverage audit (Schonfeld & Shivakumar WWW 2009) "
    "per host: coverage_pct = integer percent of sitemap-declared urls "
    "actually crawled, plus the orphan count (crawled but never "
    "declared — the discovery-only tail the DUST family mines). The "
    "audit decides per host whether to trust the sitemap channel or "
    "keep link-discovery spending. Two distincts + one "
    "left-semi/left-anti pair keyed (host, url), map-side-combined "
    "rollup",
)
def q_sitemap_coverage_audit(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit("/doc/"),
        F.col("doc_id").cast("string"),
    )
    listed = d.select(F.col("source").alias("host"), url.alias("url"))
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#cr"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 3
        != 0
    )
    crawled = d.filter(gate).select(
        F.col("source").alias("host"), url.alias("url")
    ).unionByName(
        d.filter(F.col("doc_id") % 13 == 0).select(
            F.col("source").alias("host"),
            F.concat(
                F.lit("https://"), F.col("source"), F.lit("/extra/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
        )
    )
    return urlmine.sitemap_coverage_audit(listed, crawled)


# Host fleet plan: n_urls and delay_ms derived per source host from the
# documents table — deterministic both sides.
_MAKESPAN_HOSTS_CTE = """
  SELECT source AS host, COUNT(*)::BIGINT AS n_urls,
         (500 + ('0x'||substr(md5(source||'#cd'),1,6))::BIGINT % 2500)
           ::BIGINT AS delay_ms
  FROM documents GROUP BY source
"""


@register(
    "crawl_makespan_plan",
    scheduling.crawl_makespan_oracle_sql(_MAKESPAN_HOSTS_CTE, n_fetchers=64),
    "politeness-bound crawl makespan planning (Cho & Garcia-Molina "
    "WWW 2000; IRLbot WWW 2008): a host's drain time is n_urls * "
    "crawl_delay no matter the fleet size — the planner reports each "
    "host's serial floor, its integer work share (ppm), and whether "
    "it sits on the critical path (host_ms == max(crit, "
    "ceil(total/64))) and therefore caps the whole round. One "
    "map-side-combined totals aggregate broadcast back via a lazy "
    "cross join; all integers",
)
def q_crawl_makespan_plan(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    hosts = d.groupBy(F.col("source").alias("host")).agg(
        F.count("*").cast("long").alias("n_urls")
    ).select(
        "host",
        "n_urls",
        (
            500
            + F.conv(
                F.substring(
                    F.md5(F.concat(F.col("host"), F.lit("#cd"))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % 2500
        ).cast("long").alias("delay_ms"),
    )
    return scheduling.crawl_makespan_plan(hosts, n_fetchers=64)


@register(
    "link_assortativity",
    graph.assortativity_oracle_sql(_PAGERANK_EDGES_CTE),
    "degree assortativity coefficient (Newman PRL 2002) of the "
    "md5-derived link graph: Pearson correlation of (out-degree(src), "
    "in-degree(dst)) over edges — the one-number structural monitor "
    "separating the web's disassortative hub-to-leaf wiring from "
    "link-farm hub-to-hub growth. Five BIGINT moment sums "
    "(bit-identical at any parallelism) and ONE final rounded FP "
    "expression; two degree folds + one global six-integer aggregate, "
    "no windows",
)
def q_link_assortativity(spark, sf_dir):
    return graph.degree_assortativity(_pagerank_edges(spark, sf_dir))


_CROWDING_RUN_CTE = f"""
  SELECT q, d, 'h' || (('0x'||substr(md5(q::VARCHAR||'-'||d::VARCHAR
           ||'#ch'),1,6))::BIGINT % 4) AS host,
         row_number() OVER (PARTITION BY q ORDER BY rel DESC, d) AS rank
  FROM ({_XQUAD_CAND_CTE})
"""


@register(
    "serp_host_crowding",
    ranking.host_crowding_oracle_sql(_CROWDING_RUN_CTE, max_per_host=2, k=10),
    "SERP host crowding / site collapsing — the classic two-per-host "
    "serving rule between ranking and rendering: within each query's "
    "run (the xQuAD candidate grid ranked by rel, hosts md5-assigned "
    "4-ways so crowding actually bites), keep at most 2 results per "
    "host in order, dense re-rank, cut at 10. Presentation-layer "
    "diversity next to the retrieval-layer xQuAD; two stacked windows "
    "per q partition over SERP-bounded rows, all integers",
)
def q_serp_host_crowding(spark, sf_dir):
    from pyspark.sql import Window

    cand, _, _ = _xquad_inputs(spark, sf_dir)
    w = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("d"))
    run = cand.select(
        "q",
        "d",
        F.concat(
            F.lit("h"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("q").cast("string"),
                            F.lit("-"),
                            F.col("d").cast("string"),
                            F.lit("#ch"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 4,
        ).alias("host"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
    return ranking.serp_host_crowding(run, max_per_host=2, k=10)


_FRONTCODE_URLS_CTE = """
  SELECT 'https://' || source || '/p'
         || (('0x'||substr(md5(doc_id::VARCHAR||'#fa'),1,6))::BIGINT % 5)
         || '/s'
         || (('0x'||substr(md5(doc_id::VARCHAR||'#fb'),1,6))::BIGINT % 7)
         || '/' || doc_id AS url
  FROM documents
"""


@register(
    "url_front_coding",
    urlmine.front_coding_oracle_sql(_FRONTCODE_URLS_CTE, block=8),
    "front coding of the sorted URL list (IIR 5.2 blocked dictionary "
    "compression — the layout seen-set/web-graph stores keep URL keys "
    "in): blocks of 8 over the global sort, first URL verbatim, "
    "followers as (2-byte prefix-len, suffix); per-block raw vs coded "
    "bytes and ratio. The LCP is the monotone prefix-equality count — "
    "verbatim-portable to DuckDB; lexicographic URL neighbors share "
    "host+path prefixes, so blocks code far below 1.0. The sort is the "
    "URL-range partitioning the store already maintains",
)
def q_url_front_coding(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")

    def h(tag, mod):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit(tag))
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % mod
        )

    urls = d.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("/p"),
            h("#fa", 5),
            F.lit("/s"),
            h("#fb", 7),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return urlmine.url_front_coding(urls, block=8)


@register(
    "index_elias_fano_size",
    ranking.elias_fano_oracle_sql(),
    "Elias-Fano postings size vs varint-gap bytes (Vigna WSDM 2013 "
    "quasi-succinct indices): per term, the exact EF bit cost "
    "n*l + n + U/2^l with l = floor(log2(U div n)) next to the varint "
    "cost the docid-assignment operator measures — the codec decision "
    "table for the 10^10-doc index build. floor-log2 is length(bin(x)) "
    "- 1 (pure integer/string, identical in both engines); the only FP "
    "is the final rounded ratio. One distinct-postings pass, per-term "
    "lag window + map-side-combined groupBy, universe on a 1-row "
    "broadcast",
)
def q_index_elias_fano_size(spark, sf_dir):
    return ranking.elias_fano_size(_t(spark, sf_dir, "documents"))


_KENDALL_RUNS_CTE = """
  SELECT q, d,
    row_number() OVER (PARTITION BY q ORDER BY sa DESC, d) AS rank_a,
    row_number() OVER (PARTITION BY q ORDER BY sb DESC, d) AS rank_b
  FROM (
    SELECT r1.range AS q, r2.range AS d,
      ('0x'||substr(md5(r1.range::VARCHAR||'-'||r2.range::VARCHAR
         ||'#ka'),1,6))::BIGINT AS sa,
      ('0x'||substr(md5(r1.range::VARCHAR||'-'||r2.range::VARCHAR
         ||'#ka'),1,6))::BIGINT
      + ('0x'||substr(md5(r1.range::VARCHAR||'-'||r2.range::VARCHAR
         ||'#kb'),1,6))::BIGINT % 2000000 AS sb
    FROM range(8) r1, range(20) r2
  )
"""


@register(
    "search_eval_kendall_tau",
    ranking.kendall_tau_oracle_sql(_KENDALL_RUNS_CTE),
    "Kendall tau ranker agreement (Kendall 1938; Voorhees SIGIR 2001) "
    "— the offline ranker-delta monitor: per query, concordant vs "
    "discordant pair counts between production order A and candidate "
    "order B over the same 20-doc pool (B = A's md5 score plus a "
    "bounded md5 perturbation, so tau sits high like a real ranker "
    "tweak), tau = (C-D)/(n(n-1)/2). Completes the eval family next "
    "to nDCG/ERR/RBP/interleaving: those grade one run against qrels, "
    "this grades two runs against each other. All-integer pair "
    "counting over SERP-bounded per-query self-joins; one final "
    "rounded division",
)
def q_search_eval_kendall_tau(spark, sf_dir):
    from pyspark.sql import Window

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("q").cast("string"),
                        F.lit("-"),
                        F.col("d").cast("string"),
                        F.lit(tag),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")

    q8 = spark.range(8).select(F.col("id").alias("q"))
    d20 = spark.range(20).select(F.col("id").alias("d"))
    scored = (
        q8.crossJoin(d20)
        .withColumn("sa", h("#ka"))
        .withColumn("sb", h("#ka") + h("#kb") % 2000000)
    )
    wa = Window.partitionBy("q").orderBy(F.desc("sa"), F.asc("d"))
    wb = Window.partitionBy("q").orderBy(F.desc("sb"), F.asc("d"))
    runs = scored.select(
        "q",
        "d",
        F.row_number().over(wa).cast("long").alias("rank_a"),
        F.row_number().over(wb).cast("long").alias("rank_b"),
    )
    return ranking.kendall_tau_runs(runs)


@register(
    "corpus_heaps_curve",
    ranking.heaps_oracle_sql(),
    "Heaps-law vocabulary-growth curve (Heaps 1978; IIR ch.5.1): "
    "sweep the corpus in doc-id order and report docs/tokens seen and "
    "dictionary size at 16 even prefixes — the V(T)~kT^b sizing input "
    "for dictionary memory, front-coding blocks and the EF codec "
    "table before a full 10^10-doc scan. All BIGINT (prefix "
    "positions are integer (i*N) div 16); one groupBy(term).min(pos) "
    "vocab fold plus 16-row broadcast range joins",
)
def q_corpus_heaps_curve(spark, sf_dir):
    return ranking.heaps_curve(_t(spark, sf_dir, "documents"))


_QPP_POST_RUN_CTE = """
  SELECT r1.range AS q, r2.range AS d,
    ('0x'||substr(md5(r1.range::VARCHAR||'-'||r2.range::VARCHAR
       ||'#qp'),1,6))::BIGINT % 100000 AS score
  FROM range(8) r1, range(30) r2
"""


@register(
    "search_qpp_postretrieval",
    ranking.qpp_postretrieval_oracle_sql(_QPP_POST_RUN_CTE, k=10),
    "post-retrieval query-performance prediction — WIG (Zhou & Croft "
    "SIGIR 2007) and NQC (Shtok et al. ICTIR 2009) over integer "
    "quantized-impact scores on each query's 30-candidate pool: the "
    "serving-time SERP-quality signal that triggers spell-correct / "
    "expansion / federation fallbacks, completing the QPP family next "
    "to the pre-retrieval predictors. BIGINT sum/sumsq folds; the two "
    "predictors are one final rounded expression each (IEEE "
    "correctly-rounded sqrt/div, same operation order both engines)",
)
def q_search_qpp_postretrieval(spark, sf_dir):
    def h(tag, mod):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("q").cast("string"),
                            F.lit("-"),
                            F.col("d").cast("string"),
                            F.lit(tag),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % mod
        )

    q8 = spark.range(8).select(F.col("id").alias("q"))
    d30 = spark.range(30).select(F.col("id").alias("d"))
    run = q8.crossJoin(d30).select("q", "d", h("#qp", 100000).alias("score"))
    return ranking.qpp_postretrieval(run, k=10)


@register(
    "corpus_zipf_octaves",
    ranking.zipf_octaves_oracle_sql(),
    "Zipf-law frequency-octave histogram (Zipf 1949; IIR 5.1.2): terms "
    "bucketed by floor(log2(total tf)) with per-octave term counts and "
    "token mass — the second corpus law next to corpus_heaps_curve, "
    "feeding stopword-cutoff, champion-list tiering and "
    "impact-quantization decisions. Pure BIGINT (bin()-length "
    "floor-log2); one term fold plus a <=64-key rollup",
)
def q_corpus_zipf_octaves(spark, sf_dir):
    return ranking.zipf_octaves(_t(spark, sf_dir, "documents"))


@register(
    "index_codec_decision",
    ranking.codec_decision_oracle_sql(),
    "per-term postings codec decision table: varint vs Elias gamma vs "
    "Elias delta (Elias 1975; Managing Gigabytes ch.3) vs Elias-Fano "
    "(Vigna WSDM 2013), every cost exact to the bit with the winning "
    "codec per term (ties break cheapest-to-decode first) — at 10^10 "
    "docs the winner differs BY TERM, so the index build reads this "
    "table, not one corpus rule. Same distinct-postings pass + "
    "per-term lag window + 1-row broadcast universe as the EF entry; "
    "pure integer/string throughout",
)
def q_index_codec_decision(spark, sf_dir):
    return ranking.codec_decision(_t(spark, sf_dir, "documents"))


# --------------------------------------- crawl integrity: soft 404s

_S404_TPL_PRE = "page not found error 404 the requested url was not found on "
_S404_TPL_POST = " please try again later"

_S404_PROBES_CTE = f"""
  SELECT DISTINCT source AS host,
         '{_S404_TPL_PRE}' || source || '{_S404_TPL_POST}' AS text
  FROM documents
  WHERE ('0x'||substr(md5(source||'#pb'),1,6))::BIGINT % 5 != 0
"""

_S404_PAGES_CTE = f"""
  SELECT source AS host,
         'https://' || source || '/' || doc_id AS url,
         CASE WHEN doc_id % 11 = 0
              THEN '{_S404_TPL_PRE}' || source || '{_S404_TPL_POST}'
              ELSE text END AS text
  FROM documents
"""


@register(
    "crawl_soft404_detect",
    mirrors.soft404_oracle_sql(_S404_PAGES_CTE, _S404_PROBES_CTE),
    "soft-404 detection by random-URL probing (Bar-Yossef, Broder, "
    "Kumar & Tomkins WWW 2004 'Sic transit gloria telae'): each "
    "host's probe page (a fetch of a URL that cannot exist) compared "
    "to every page by 3-shingle integer milli-Jaccard; pages matching "
    "the error template under HTTP 200 are dropped before they "
    "pollute the index and read as a mega-cluster to MinHash. The "
    "synthetic log serves the probe template on every 11th doc and "
    "leaves one host in five unprobed, so flagged / clean / unprobed "
    "branches all grade. Per-row in-scan shingling, one host-keyed "
    "left join, array_intersect in the projection — no shingle ever "
    "becomes a row",
)
def q_crawl_soft404_detect(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    probe_text = F.concat(
        F.lit(_S404_TPL_PRE), F.col("source"), F.lit(_S404_TPL_POST)
    )
    probes = (
        d.select(F.col("source").alias("host"), probe_text.alias("text"))
        .distinct()
        .filter(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("host"), F.lit("#pb"))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % 5
            != 0
        )
    )
    pages = d.select(
        F.col("source").alias("host"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(F.col("doc_id") % 11 == 0, probe_text)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return mirrors.soft404_detect(pages, probes)
