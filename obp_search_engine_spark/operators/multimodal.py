"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs; all
processing is ``mapInPandas`` over Arrow batches so executors stream
record-batches instead of materializing whole partitions (the right shape
for 100 TB of media bytes: batch size bounds memory, partition count bounds
parallelism, and the binary column never passes through Python row-by-row).

Real codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the decode
kernel is pluggable:
  * decoder="fake"  — deterministic pure-function decoder (hash-derived
    dimensions/features) that keeps every piece of Spark-side plumbing
    (schema, batch iteration, UDF signature) real and testable;
  * decoder="real"  — raises NotImplementedError with the dependency note.

This mirrors how the reference treats media: image *hashes* only, never
pixels (nodes carries 10 image-hash columns, crawler/db/mysql.go:40-47;
thumbnails are 5 comma-joined URL strings, crawler/db/mysql.go:407).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("declared_w", T.IntegerType()),
                    T.StructField("declared_h", T.IntegerType()),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int, list[float]]:
    """Deterministic stand-in for a real image decode: dimensions, a 64-bit
    perceptual-hash surrogate and an 8-dim feature vector, all pure
    functions of the payload bytes."""
    d = hashlib.blake2b(payload, digest_size=32).digest()
    w = 64 + d[0] * 4
    h = 64 + d[1] * 4
    ch = 1 + (d[2] % 4)
    phash = int.from_bytes(d[8:16], "little", signed=True)
    feat = [round(b / 255.0, 6) for b in d[16:24]]
    return w, h, ch, phash, feat


def decode_image_features(df: DataFrame, decoder: str = "real",
                          batch_hint: int | None = None,
                          decode_fn=None) -> DataFrame:
    """media rows -> image feature rows via mapInPandas.

    The iterator shape (yield per incoming Arrow batch) is what bounds
    executor memory: one batch of payloads in flight per task.

    Pluggable codec contract: pass ``decode_fn`` (bytes -> (width, height,
    channels, phash, feature[8])) to plug a real library (PIL/opencv) on a
    cluster image; the callable is serialized with the task closure. With
    no decode_fn, decoder='fake' runs the deterministic stand-in kernel and
    decoder='real' raises NotImplementedError (this container ships no
    codecs) — the Spark plumbing (schema, Arrow batching, partitioning) is
    identical on all three paths."""
    if decoder not in ("real", "fake"):
        raise ValueError(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = decode_fn
        for pdf in batches:
            if fn is None:
                if decoder == "real":
                    raise NotImplementedError(
                        "real image decoding needs PIL/opencv, not present "
                        "in this container — pass decode_fn= with a real "
                        "codec, or decoder='fake' for the plumbing path"
                    )
                fn = _fake_decode
            rows = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "phash": [], "feature": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, ph, feat = fn(bytes(payload or b""))
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["phash"].append(ph)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "image").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, n_frames: int = 4, decoder: str = "fake") -> DataFrame:
    """'video' payload -> n deterministic frame chunks (real impl: ffmpeg
    keyframe sampling; fake: equal byte slices). One output row per frame —
    the UDTF-style fan-out downstream feature extraction needs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("frame sampling needs ffmpeg — fake only here")
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    kinds = ["image", "video", "audio"]
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=64).digest() * (
            1 + i % 3
        )
        rows.append(
            (i, kinds[i % 3], payload, ("application/octet-stream", 640, 480))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
