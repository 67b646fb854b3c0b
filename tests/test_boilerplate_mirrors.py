"""Boilerplate detection/removal and mirror-host pairs: pure-Python
parity on seeded random corpora, the strip round-trip, threshold and
min-docs edges, and the stop-fingerprint skew cap."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators.boilerplate import (
    boilerplate_lines,
    boilerplate_oracle_sql,
    strip_boilerplate,
)
from obp_search_engine_spark.operators.mirrors import (
    mirror_oracle_sql,
    mirror_pairs,
)


def _mk_docs(rng, n_hosts=6, docs_per_host=8):
    """Random docs with per-host headers (always), footers (~70%), and
    unique body lines."""
    rows = []
    for h in range(n_hosts):
        host = f"h{h}.example"
        for i in range(docs_per_host):
            lines = [f"NAV {host}"]
            lines += [
                f"body {rng.random():.9f}" for _ in range(rng.randint(1, 4))
            ]
            if rng.random() < 0.7:
                lines.append(f"(c) {host}")
            rows.append((f"{host}/d{i}", host, "\n".join(lines)))
    return rows


def _py_boilerplate(rows, min_pct=80, min_docs=3):
    per_line, host_docs = defaultdict(set), defaultdict(set)
    for doc, host, text in rows:
        host_docs[host].add(doc)
        for raw in text.split("\n"):
            line = raw.strip()
            if line:
                per_line[(host, line)].add(doc)
    out = set()
    for (host, line), docs in per_line.items():
        hd = len(host_docs[host])
        if hd >= min_docs and len(docs) * 100 >= min_pct * hd:
            out.add((host, line, len(docs), hd))
    return out


@pytest.mark.parametrize("seed", [13, 99])
def test_boilerplate_matches_python_reference(spark, seed):
    rows = _mk_docs(random.Random(seed))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        (r.source, r.line, r.n_docs, r.host_docs)
        for r in boilerplate_lines(df).collect()
    }
    assert got == _py_boilerplate(rows)
    assert any(line.startswith("NAV ") for _, line, _, _ in got)


def test_boilerplate_min_docs_guard(spark):
    # a 2-doc host repeats a line in 100% of docs but is under min_docs
    rows = [
        ("a/1", "tiny.example", "SAME\nx"),
        ("a/2", "tiny.example", "SAME\ny"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    assert boilerplate_lines(df, min_docs=3).count() == 0
    assert boilerplate_lines(df, min_docs=2).count() == 1


def test_strip_boilerplate_roundtrip(spark):
    rows = _mk_docs(random.Random(7))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    bp = boilerplate_lines(df)
    bp_set = {(r.source, r.line) for r in bp.collect()}
    stripped = {r.doc_id: r.text for r in strip_boilerplate(df, bp).collect()}
    for doc, host, text in rows:
        want = [
            s
            for s in text.split("\n")
            if (host, s.strip()) not in bp_set
        ]
        assert stripped[doc] == "\n".join(want)
    # body lines always survive
    assert all("body" in t or t == "" for t in stripped.values())


def test_strip_preserves_blanks_and_indentation(spark):
    rows = [(f"h/d{i}", "h.example", f"NAV h\n  para one {i}\n\n\tpara two {i}")
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    bp = boilerplate_lines(df, min_docs=3)
    assert {(r.line,) for r in bp.collect()} == {("NAV h",)}
    out = {r.doc_id: r.text for r in strip_boilerplate(df, bp).collect()}
    # only the boilerplate line is gone; whitespace and the blank
    # paragraph separator are untouched
    assert out["h/d0"] == "  para one 0\n\n\tpara two 0"


def test_boilerplate_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = _mk_docs(random.Random(31))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = sorted(
        (r.source, r.line, r.n_docs, r.host_docs)
        for r in boilerplate_lines(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    sql = boilerplate_oracle_sql("SELECT * FROM docs")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


# ---------------------------------------------------------------------------
# mirrors
# ---------------------------------------------------------------------------
def _py_mirrors(rows, min_pct=50, max_hosts=64):
    hf = defaultdict(set)
    for _, host, text in rows:
        hf[host].add(hashlib.md5(text.encode()).hexdigest())
    fp_hosts = defaultdict(set)
    for h, fps in hf.items():
        for fp in fps:
            fp_hosts[fp].add(h)
    keep = {fp for fp, hs in fp_hosts.items() if len(hs) <= max_hosts}
    kept = {h: {f for f in fps if f in keep} for h, fps in hf.items()}
    hosts = sorted(hf)
    out = set()
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            inter = len(kept[a] & kept[b])
            if inter == 0:
                continue
            na, nb = len(kept[a]), len(kept[b])
            j = (100 * inter) // (na + nb - inter)
            if j >= min_pct:
                out.add((a, b, inter, na, nb, j))
    return out


def _mirror_rows(rng):
    rows = []
    for h in range(5):
        host = f"h{h}.example"
        for i in range(10):
            rows.append((f"{host}/d{i}", host, f"page {rng.random():.9f}"))
    # full mirror of h0, half mirror of h1
    for d, h, t in list(rows):
        if h == "h0.example":
            rows.append((f"m-{d}", "h0-mirror", t))
    for k, (d, h, t) in enumerate(list(rows)):
        if h == "h1.example" and k % 2 == 0:
            rows.append((f"p-{d}", "h1-partial", t))
    return rows


@pytest.mark.parametrize("seed", [5, 77])
def test_mirror_pairs_match_python_reference(spark, seed):
    rows = _mirror_rows(random.Random(seed))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        tuple(r) for r in mirror_pairs(df, min_jaccard_pct=30).collect()
    }
    want = _py_mirrors(rows, min_pct=30)
    assert got == want
    full = next(p for p in got if "h0-mirror" in (p[0], p[1]))
    assert full[5] == 100  # full mirror reads exactly 100


def test_stop_fingerprint_cap_blocks_universal_pages(spark):
    # every host carries the same empty-page fingerprint; with the cap
    # at 3 hosts it contributes to no pair, so no host pair qualifies
    rows = [(f"h{h}/d0", f"h{h}", "BLANK PAGE") for h in range(6)] + [
        (f"h{h}/d1", f"h{h}", f"unique {h}") for h in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    assert (
        mirror_pairs(df, min_jaccard_pct=10, max_hosts_per_fp=3).count() == 0
    )
    # with a generous cap the shared page links every pair
    assert (
        mirror_pairs(df, min_jaccard_pct=10, max_hosts_per_fp=64).count() == 15
    )


def test_mirror_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = _mirror_rows(random.Random(42))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = sorted(
        tuple(r) for r in mirror_pairs(df, min_jaccard_pct=30).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    sql = mirror_oracle_sql("SELECT * FROM docs", min_jaccard_pct=30)
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


# ------------------------------------------------ cloaking detection


from obp_search_engine_spark.operators.mirrors import cloaking_detect  # noqa: E402


def _fetch_df(spark, rows):
    return spark.createDataFrame(rows, "url long, ua string, text string")


def test_cloaking_identical_texts_not_flagged(spark):
    rows = [
        (1, "bot", "the quick brown fox jumps over the lazy dog"),
        (1, "browser", "the quick brown fox jumps over the lazy dog"),
    ]
    r = cloaking_detect(_fetch_df(spark, rows)).first()
    assert (r.jaccard_milli, bool(r.cloaked)) == (1000, False)


def test_cloaking_divergent_texts_flagged(spark):
    rows = [
        (1, "bot", "serious academic content about information retrieval"),
        (1, "browser", "buy cheap pills now best prices guaranteed here"),
    ]
    r = cloaking_detect(_fetch_df(spark, rows)).first()
    assert r.n_common == 0 and bool(r.cloaked)


def test_cloaking_partial_overlap_jaccard(spark):
    # texts share exactly their first 3-shingle
    rows = [
        (1, "bot", "a b c x y z"),
        (1, "browser", "a b c p q r"),
    ]
    r = cloaking_detect(_fetch_df(spark, rows)).first()
    # 4 shingles each, 1 common -> 1000*1 // 7 = 142
    assert (r.n_a, r.n_b, r.n_common, r.jaccard_milli) == (4, 4, 1, 142)
    assert bool(r.cloaked)


def test_cloaking_short_texts_identical(spark):
    rows = [(1, "bot", "hi there"), (1, "browser", "bye now")]
    r = cloaking_detect(_fetch_df(spark, rows)).first()
    assert (r.n_a, r.n_b, r.jaccard_milli, bool(r.cloaked)) == (
        0,
        0,
        1000,
        False,
    )


def test_cloaking_one_sided_empty_flagged(spark):
    rows = [
        (1, "bot", "one two three four five"),
        (1, "browser", ""),
    ]
    r = cloaking_detect(_fetch_df(spark, rows)).first()
    assert r.n_b == 0 and r.jaccard_milli == 0 and bool(r.cloaked)


def test_cloaking_partitioning_invariant(spark):
    import random

    rng = random.Random(13)
    words = ["w%d" % i for i in range(12)]
    rows = []
    for u in range(20):
        ta = " ".join(rng.choice(words) for _ in range(10))
        tb = " ".join(rng.choice(words) for _ in range(10))
        rows += [(u, "bot", ta), (u, "browser", tb)]
    df = _fetch_df(spark, rows)
    a = sorted(map(tuple, cloaking_detect(df.coalesce(1)).collect()))
    b = sorted(map(tuple, cloaking_detect(df.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------ soft-404 detection


from obp_search_engine_spark.operators.mirrors import (  # noqa: E402
    soft404_detect,
)


def _pages_df(spark, rows):
    return spark.createDataFrame(rows, "host string, url string, text string")


def _probes_df(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_soft404_template_match_flagged(spark):
    err = "page not found the url you requested does not exist here"
    pages = _pages_df(
        spark,
        [
            ("h1", "u1", err),
            ("h1", "u2", "completely different real content about spark jobs"),
        ],
    )
    probes = _probes_df(spark, [("h1", err)])
    got = {r.url: r for r in soft404_detect(pages, probes).collect()}
    assert got["u1"].soft404 and got["u1"].jaccard_milli == 1000
    assert not got["u2"].soft404


def test_soft404_unprobed_host_passes(spark):
    pages = _pages_df(spark, [("h9", "u1", "some page text that is fine ok")])
    probes = _probes_df(spark, [("h1", "error page not found here sorry")])
    r = soft404_detect(pages, probes).first()
    assert not r.soft404 and r.jaccard_milli == 0 and r.n_probe == 0


def test_soft404_degenerate_both_empty(spark):
    # shingle-free page on a shingle-free probe IS the error page
    pages = _pages_df(spark, [("h1", "u1", "a b")])
    probes = _probes_df(spark, [("h1", "x")])
    r = soft404_detect(pages, probes).first()
    assert r.jaccard_milli == 1000 and r.soft404


def test_soft404_partial_overlap(spark):
    # page: tokens a b c d -> shingles {a b c, b c d}; probe: a b c e
    # -> {a b c, b c e}; common 1, union 3 -> 333
    pages = _pages_df(spark, [("h1", "u1", "a b c d")])
    probes = _probes_df(spark, [("h1", "a b c e")])
    r = soft404_detect(pages, probes).first()
    assert (r.n_page, r.n_probe, r.n_common) == (2, 2, 1)
    assert r.jaccard_milli == 333 and not r.soft404
