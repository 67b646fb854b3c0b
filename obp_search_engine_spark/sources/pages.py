"""Deterministic synthetic Common-Crawl-style pages corpus.

Every field of page ``i`` is a pure function of ``(seed, i, n_pages,
n_hosts)`` — no wall clock, no global RNG — so generation is identical
regardless of partitioning (FIXTURES.md §1) and the same rows can be
produced by the distributed generator (``synth_pages_df``, mapInPandas over
``spark.range``) and the pure-Python oracle (``synth_page``).

Host assignment is Zipf-skewed (a few hot hosts) per the north_rule's
hot-host-skew requirement. ``html`` embeds outlinks as ``<a href>`` anchors
so link extraction is testable; the ``text`` column is the golden
byte-identical extraction output (input_hint invariant), computed with the
same ``extract_text`` pure function the crawl UDF uses.

The mock4 fixture ports the reference's only test graph verbatim:
crawler/mock/mockrpc.go:3 — {1:[2,3], 2:[1], 3:[4,1], 4:[3]}, seed node "1"
(crawler/crawling/crawler_test.go:26).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..functions.extract import extract_text
from ..schemas import PAGES_SCHEMA

_EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)
_LANGS = ["en", "de", "es", "pl"]
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set).

    uint64 wraparound is the algorithm; silence numpy's overflow warnings.
    """
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(seed: int, *parts: int) -> np.ndarray:
    """Hash a tuple of integer arrays/scalars into uint64, vectorized."""
    acc = np.asarray(np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    for p in parts:
        arr = np.asarray(p, dtype=np.uint64)
        acc = _splitmix64(acc ^ _splitmix64(arr + np.uint64(0x9E37)))
    return acc


def host_of(i: np.ndarray, seed: int, n_hosts: int) -> np.ndarray:
    """Zipf-skewed host id: P(host 0) ≈ n_hosts^(-1/3) — a genuine hot host."""
    u = _h(seed, i, 1) / np.float64(2**64)
    return np.minimum((n_hosts * u**3).astype(np.int64), n_hosts - 1)


def url_of(i: int | np.ndarray, seed: int, n_hosts: int):
    h = host_of(np.asarray(i), seed, n_hosts)
    if np.isscalar(i) or np.ndim(i) == 0:
        return f"http://host{int(h)}.example/p/{int(i)}"
    return pd.Series([f"http://host{hh}.example/p/{ii}" for hh, ii in zip(h, np.asarray(i))])


def _gen_batch(
    ids: np.ndarray,
    seed: int,
    n_pages: int,
    n_hosts: int,
    body_repeat: int = 1,
    outdeg_max: int = 8,
) -> pd.DataFrame:
    ids = ids.astype(np.uint64)
    hosts = host_of(ids, seed, n_hosts)
    outdeg = (_h(seed, ids, 2) % np.uint64(outdeg_max + 1)).astype(np.int64)
    lang_ix = (_h(seed, ids, 3) % np.uint64(len(_LANGS))).astype(np.int64)
    n_words = ((4 + (_h(seed, ids, 4) % np.uint64(12))) * body_repeat).astype(np.int64)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for k, i in enumerate(ids.astype(np.int64)):
        url = f"http://host{hosts[k]}.example/p/{i}"
        deg = int(outdeg[k])
        tgt = (_h(seed, np.full(deg, i, dtype=np.uint64), np.arange(5, 5 + deg, dtype=np.uint64)) % np.uint64(n_pages)).astype(np.int64) if deg else np.array([], dtype=np.int64)
        anchors = "".join(
            f'<a href="http://host{int(host_of(np.asarray(t), seed, n_hosts))}.example/p/{int(t)}">l{j}</a>'
            for j, t in enumerate(tgt)
        )
        widx = (_h(seed, np.full(int(n_words[k]), i, dtype=np.uint64), np.arange(100, 100 + int(n_words[k]), dtype=np.uint64)) % np.uint64(len(_WORDS))).astype(np.int64)
        body = " ".join(_WORDS[w] for w in widx)
        html = (
            f"<html><head><title>page {i}</title>"
            f"<script>var x={i};</script></head>"
            f"<body>{anchors}<p>{body} &amp; more</p></body></html>"
        ).encode("utf-8")
        urls.append(url)
        tss.append(_EPOCH + dt.timedelta(seconds=int(i)))
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(_LANGS[int(lang_ix[k])])
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def synth_page(i: int, seed: int, n_pages: int, n_hosts: int) -> dict:
    """One page as a dict (pure-Python oracle path)."""
    row = _gen_batch(np.asarray([i], dtype=np.uint64), seed, n_pages, n_hosts).iloc[0]
    return row.to_dict()


# bump when the generator's output changes for the same (n_pages, n_hosts,
# seed) — cache paths derived from synth corpora key on this so a stale
# cached corpus can never masquerade as the current schema (VERDICT r04 #5)
PAGES_SCHEMA_REV = "r4"


def synth_pages_df(
    spark,
    n_pages: int,
    n_hosts: int = 100,
    seed: int = 42,
    body_repeat: int = 1,
    outdeg_max: int = 8,
):
    """Distributed generator: spark.range -> mapInPandas, schema = input_hint.

    body_repeat/outdeg_max scale page size for bench realism (real webtext
    is KBs, not bytes); defaults keep the small test fixtures unchanged.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(
                pdf["id"].to_numpy(np.uint64), seed, n_pages, n_hosts,
                body_repeat, outdeg_max,
            )

    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n_pages // 256 or 1))
    return spark.range(0, n_pages, numPartitions=n_parts).mapInPandas(gen, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# mock4 golden graph (reference crawler/mock/mockrpc.go:3)
# ---------------------------------------------------------------------------
MOCK4_GRAPH = {"1": ["2", "3"], "2": ["1"], "3": ["4", "1"], "4": ["3"]}
MOCK4_SEED_URL = "http://n1.example/"


def mock4_url(node: str) -> str:
    return f"http://n{node}.example/"


def mock4_pages_records() -> list[dict]:
    recs = []
    for node, nbrs in sorted(MOCK4_GRAPH.items()):
        anchors = "".join(f'<a href="{mock4_url(n)}">peer</a>' for n in nbrs)
        html = f"<html><body>{anchors}<p>node {node}</p></body></html>".encode()
        recs.append(
            {
                "url": mock4_url(node),
                "warc_ts": _EPOCH,
                "html": html,
                "text": extract_text(html),
                "lang": "en",
            }
        )
    return recs


def mock4_pages_df(spark):
    return spark.createDataFrame(mock4_pages_records(), PAGES_SCHEMA)


def load_testdata(spark, sf_dir: str, *names: str):
    """Load driver testdata parquet tables (TESTDATA.md)."""
    dfs = tuple(spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names)
    return dfs[0] if len(dfs) == 1 else dfs


def bucketed_pages_table(spark, pages, table_name: str, n_buckets: int = 32):
    """Register/load the pages corpus as a url-bucketed table — the 100 TB
    deployment shape: the fetch join (wave x pages) co-locates on the url
    bucketing, so the huge side never shuffles and the driver never
    broadcasts (BENCH/BASELINE.md 'bucketed co-located fetch join').

    Idempotent across processes: if the warehouse files exist but this
    session's metastore doesn't know the table (fresh derby), it is
    re-registered as an external bucketed table.
    """
    import os

    loc = f"/tmp/spark-warehouse/{table_name}"
    if not spark.catalog.tableExists(table_name) and os.path.exists(loc):
        spark.sql(
            f"CREATE TABLE {table_name} (url STRING, warc_ts TIMESTAMP, "
            f"html BINARY, text STRING, lang STRING) USING parquet "
            f"CLUSTERED BY (url) INTO {n_buckets} BUCKETS LOCATION '{loc}'"
        )
    if not spark.catalog.tableExists(table_name):
        # fixed bucket count — identical input for every cluster size (the
        # scaling criterion is same job, same input). No sortBy: sorting
        # KB-html rows inside bucket writers buffers whole buckets on heap;
        # repartition aligns each task to one bucket file instead.
        (
            pages.repartition(n_buckets, "url")
            .write.bucketBy(n_buckets, "url")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(table_name)
        )
    return spark.table(table_name)
