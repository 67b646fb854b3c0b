"""DSIR importance resampling: Spark vs a pure-python reference of the
same arithmetic, oracle parity, and the distributional-tilt property."""

from __future__ import annotations

import hashlib
import math

import pytest

from obp_search_engine_spark.operators import dsir

B = 16
SALT = "dsir"


@pytest.fixture(scope="module")
def docs(spark):
    """Two dialects: target docs talk about cats, raw pool is mixed."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the cat sat on the mat with the cat", "en"))
        else:
            rows.append((i, "der hund lief schnell durch den park heute", "de"))
    rows.append((40, "", "en"))  # token-less doc: neutral weight
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return df, rows


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _feats(text: str) -> list[int]:
    ts = [t for t in text.strip().lower().split() if t]
    grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
    return [_bucket(g) for g in grams]


def _ref_logweights(rows):
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for i, text, lang in rows:
        fs = _feats(text)
        d: dict[int, int] = {}
        for b in fs:
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
            d[b] = d.get(b, 0) + 1
        per_doc[i] = d
    T, R = sum(ct.values()), sum(cr.values())
    out = {}
    for i, d in per_doc.items():
        core = 0.0
        for b in sorted(d):
            core += d[b] * (math.log(ct.get(b, 0) + 1.0) - math.log(cr[b] + 1.0))
        n = sum(d.values())
        lw = core + n * (math.log(R + float(B)) - math.log(T + float(B)))
        out[i] = (n, round(lw, 6))
    return out


def _gumbel(i: int) -> float:
    h = int(hashlib.md5(f"{i}:{SALT}".encode()).hexdigest()[:8], 16)
    u = (h + 1.0) / 4294967297.0
    return -math.log(-math.log(u))


def test_logweights_match_reference(docs):
    df, rows = docs
    got = {
        r.doc_id: (r.n_feats, r.logw)
        for r in dsir.dsir_logweights(df, "lang = 'en'", n_buckets=B).collect()
    }
    want = _ref_logweights(rows)
    want[40] = (0, 0.0)  # token-less doc
    assert got.keys() == want.keys()
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i


def test_target_docs_outweigh_offtarget(docs):
    """The tilt the method exists for: every cat-dialect (target-like)
    doc must carry a strictly larger importance weight than every
    hund-dialect doc."""
    df, _ = docs
    lw = {r.doc_id: r.logw for r in dsir.dsir_logweights(df, "lang = 'en'", n_buckets=B).collect()}
    cats = [lw[i] for i in range(0, 40, 2)]
    dogs = [lw[i] for i in range(1, 40, 2)]
    assert min(cats) > max(dogs)


def test_resample_topk_matches_reference(docs):
    df, rows = docs
    got = dsir.dsir_resample_topk(
        df, "lang = 'en'", k=10, n_buckets=B, salt=SALT
    ).collect()
    want = _ref_logweights(rows)
    want[40] = (0, 0.0)
    keyed = sorted(
        ((want[i][1] + _gumbel(i), i) for i in want), key=lambda t: (-t[0], t[1])
    )[:10]
    assert [r.doc_id for r in got] == [i for _, i in keyed]
    for r in got:
        assert r.skey == pytest.approx(
            round(want[r.doc_id][1] + _gumbel(r.doc_id), 6), abs=2e-6
        )


def test_oracle_matches_spark(docs):
    df, rows = docs
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    want = con.sql(
        dsir.dsir_oracle_sql("lang = 'en'", k=10, n_buckets=B)
    ).df()
    got = (
        dsir.dsir_resample_topk(df, "lang = 'en'", k=10, n_buckets=B)
        .toPandas()
    )
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.logw) == list(want.logw)
    assert list(got.skey) == list(want.skey)
