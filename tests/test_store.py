"""Documents-store lifecycle (operators/store.py): incremental reads honor
the bookmark, JSONL export round-trips, compaction is content-identical
with fewer files and a reconciled manifest.
"""

from __future__ import annotations

import os

from obp_search_engine_spark.operators.checkpoint import read_manifest, run_crawl
from obp_search_engine_spark.operators.store import (
    compact_documents,
    documents_rounds,
    export_documents_jsonl,
    read_documents,
)
from obp_search_engine_spark.sources.pages import synth_pages_df


def _crawl(spark, tmp_path, rounds=3):
    pages = synth_pages_df(spark, n_pages=400, n_hosts=8, seed=11).cache()
    seed_url = pages.orderBy("url").first().url
    ckpt = str(tmp_path / "ckpt")
    res = run_crawl(
        spark, pages, seeds=[seed_url], rounds=rounds, ckpt_dir=ckpt,
        extract_documents=True,
    )
    return ckpt, res


def test_incremental_read_honors_bookmark(spark, tmp_path):
    ckpt, res = _crawl(spark, tmp_path)
    rounds = documents_rounds(ckpt)
    assert rounds == [r["round"] for r in res["per_round"]]
    full = read_documents(spark, ckpt)
    assert full.count() == res["visited"]
    # bookmark after round 1: exactly the later rounds' docs, rounds stamped
    tail = read_documents(spark, ckpt, since_round=rounds[0])
    want = sum(r["n_documents"] for r in res["per_round"][1:])
    assert tail.count() == want
    assert set(r["round"] for r in tail.select("round").distinct().collect()) == set(
        rounds[1:]
    )
    # empty slice beyond the head
    assert read_documents(spark, ckpt, since_round=rounds[-1]).count() == 0


def test_jsonl_export_roundtrip(spark, tmp_path):
    ckpt, res = _crawl(spark, tmp_path)
    out = str(tmp_path / "export")
    n = export_documents_jsonl(spark, ckpt, out)
    assert n == res["visited"]
    back = spark.read.json(out)
    assert back.count() == n
    a = {(r.url, r.text) for r in back.select("url", "text").collect()}
    b = {
        (r.url, r.text)
        for r in read_documents(spark, ckpt).select("url", "text").collect()
    }
    assert a == b


def test_compaction_content_identical(spark, tmp_path):
    ckpt, res = _crawl(spark, tmp_path)
    k = res["per_round"][-1]["round"]
    path = os.path.join(ckpt, f"round={k}", "harvest")
    def rowset(df):
        return {
            (r.url, r.text, tuple(r._links or []))
            for r in df.select("url", "text", "_links").collect()
        }

    before = rowset(spark.read.parquet(path))
    stats = compact_documents(spark, ckpt, k, target_file_mb=256)
    assert stats["files_after"] <= stats["files_before"]
    assert stats["files_after"] == 1  # tiny store -> single file
    after_df = spark.read.parquet(path)
    after = rowset(after_df)
    assert after == before
    man = read_manifest(path)
    assert man and man["n_rows"] == stats["rows"] == after_df.count()


def test_compaction_crash_recovery(spark, tmp_path):
    """A compaction interrupted between its two renames leaves
    harvest._old and no harvest; documents_rounds must self-heal by
    renaming the old store back, and incremental reads see every round."""
    import shutil

    ckpt, res = _crawl(spark, tmp_path)
    k = res["per_round"][-1]["round"]
    path = os.path.join(ckpt, f"round={k}", "harvest")
    os.rename(path, path + "._old")  # simulate the crash window
    assert documents_rounds(ckpt) == [r["round"] for r in res["per_round"]]
    assert os.path.isdir(path) and not os.path.isdir(path + "._old")
    assert read_documents(spark, ckpt).count() == res["visited"]
