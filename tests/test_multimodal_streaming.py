"""Multimodal plumbing (fake decoder; real one stubbed) + streaming driver."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from obp_search_engine_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media_df(spark, n=30, seed=42).cache()


def test_decode_image_features_fake(media):
    feats = mm.decode_image_features(media, decoder="fake")
    rows = feats.collect()
    assert len(rows) == 10  # 30 rows, every 3rd is an image
    for r in rows:
        assert r.width >= 64 and r.height >= 64 and 1 <= r.channels <= 4
        assert len(r.feature) == 8
    # determinism across runs
    again = {r.media_id: (r.phash, r.feature) for r in mm.decode_image_features(media, decoder="fake").collect()}
    assert {r.media_id: (r.phash, r.feature) for r in rows} == again


def test_decode_real_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        mm.decode_image_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling_shapes(media):
    frames = mm.sample_frames(media, n_frames=4)
    rows = frames.collect()
    vids = {r.media_id for r in rows}
    assert all(k % 3 == 1 for k in vids)  # only 'video' rows fan out
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per.values():
        assert sorted(idxs) == [0, 1, 2, 3]
    # frames are deterministic slices of the payload
    payloads = {r.media_id: bytes(r.payload) for r in media.filter(F.col("kind") == "video").collect()}
    for r in rows:
        b = payloads[r.media_id]
        step = max(1, len(b) // 4)
        assert bytes(r.frame_bytes) == b[r.frame_idx * step : (r.frame_idx + 1) * step]


def test_streaming_rounds_advance_checkpoint(spark):
    from obp_search_engine_spark.operators.checkpoint import latest_round
    from obp_search_engine_spark.sources.pages import synth_pages_df
    from obp_search_engine_spark.streaming.rounds import stream_crawl_rounds

    from obp_search_engine_spark.functions.extract import extract_links_udf

    pages = synth_pages_df(spark, 200, 4, seed=9).cache()
    # a seed page with no outlinks would exhaust the crawl in one round —
    # pick the first url that actually links out
    seed_url = (
        pages.filter(F.size(extract_links_udf("html")) > 0).orderBy("url").first().url
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = stream_crawl_rounds(
            spark, pages, ckpt, seeds=[seed_url], tick_seconds=1, max_rounds=2
        )
        try:
            import time

            deadline = time.monotonic() + 180
            while time.monotonic() < deadline and (latest_round(ckpt) or 0) < 2:
                time.sleep(1)
        finally:
            q.stop()
        assert (latest_round(ckpt) or 0) >= 2
