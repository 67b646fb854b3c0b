"""Multi-format pages ingestion/export with schema enforcement.

The canonical store is the url-bucketed parquet table (input_hint /
sources/pages.py); real corpora arrive in other shapes too — WARC-derived
JSONL dumps, CSV manifests. This module converts any of them to the exact
``PAGES_SCHEMA`` DataFrame the crawl operators expect, failing loudly on
missing columns instead of silently propagating nulls into the fetch join.

Wire format for text-based formats (json/csv): ``html`` travels as base64
(``html_b64``) since raw binary isn't representable; timestamps parse via
the enforced read schema, never by inference (schema inference on a 100 TB
dump is a full extra pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import PAGES_SCHEMA

_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

_FORMATS = ("parquet", "json", "csv")


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a pages corpus from parquet (canonical), jsonl, or csv into the
    exact PAGES_SCHEMA shape. Raises ValueError on unknown format or
    missing columns."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown pages format {fmt!r}; expected one of {_FORMATS}")
    if fmt == "parquet":
        df = spark.read.parquet(path)
        missing = [f.name for f in PAGES_SCHEMA.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"pages parquet at {path} missing columns {missing}")
        return df.select([f.name for f in PAGES_SCHEMA.fields])
    reader = spark.read.schema(_WIRE_SCHEMA)
    raw = reader.json(path) if fmt == "json" else reader.option("header", True).csv(path)
    # enforced-schema readers return all-null columns rather than failing
    # when a field is absent from the file — probe the first row instead
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def export_pages(pages: DataFrame, path: str, fmt: str = "json") -> None:
    """Write a PAGES_SCHEMA DataFrame in the text wire format (html as
    base64). parquet export is just df.write.parquet — use that directly.

    JSONL is the general wire (escapes everything). CSV is manifest-grade:
    correct only while ``text`` carries no newlines — our extractor's
    whitespace collapse guarantees that for crawled corpora, but foreign
    text with embedded newlines needs the JSONL wire (a multiLine CSV read
    would parse whole files single-threaded)."""
    if fmt not in ("json", "csv"):
        raise ValueError(f"export fmt {fmt!r}: json or csv")
    wire = pages.select(
        "url",
        "warc_ts",
        # Spark's base64 emits MIME-chunked output (a newline every 76
        # chars) — strip them so the wire stays LINE-splittable: a
        # multiLine CSV/JSON read parses whole files single-threaded,
        # which at 100 TB destroys scan parallelism. unbase64 accepts the
        # unchunked form.
        F.regexp_replace(F.base64("html"), "[\\r\\n]", "").alias("html_b64"),
        "text",
        "lang",
    )
    w = wire.write.mode("overwrite")
    (w.json(path) if fmt == "json" else w.option("header", True).csv(path))
