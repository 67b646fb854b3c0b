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
    # enforced-schema readers return all-null columns rather than failing
    # when a field is absent from the file — inspect the actual field names
    # of the first data file driver-side (one line, no scan) and fail loudly
    present = _wire_columns(path, fmt)
    wire_names = [f.name for f in _WIRE_SCHEMA.fields]
    if present is not None:
        missing = [n for n in wire_names if n not in present]
        if missing:
            raise ValueError(
                f"pages {fmt} at {path} missing wire columns {missing} "
                f"(found {sorted(present)})"
            )
        # the CSV reader applies the enforced schema POSITIONALLY (all wire
        # fields are strings, so a reordered header would silently mis-map
        # url/text/lang/html_b64) — require the exact wire column order
        if fmt == "csv" and list(present) != wire_names:
            raise ValueError(
                f"pages csv at {path}: header order {list(present)} != wire "
                f"order {wire_names}; the enforced schema maps columns "
                f"positionally, so a reordered header would be mis-mapped"
            )
    reader = spark.read.schema(_WIRE_SCHEMA)
    raw = reader.json(path) if fmt == "json" else reader.option("header", True).csv(path)
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def _wire_columns(path: str, fmt: str) -> list[str] | None:
    """Field names of the first local data file (first JSONL object's keys /
    CSV header), IN FILE ORDER (CSV order is load-bearing: the enforced
    schema maps positionally). Returns None when the path isn't a local
    file/dir (e.g. object store) — validation is then skipped rather than
    guessed."""
    import csv as _csv
    import json as _json
    import os

    if not os.path.exists(path):
        return None
    if os.path.isdir(path):
        suffix = ".json" if fmt == "json" else ".csv"
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(suffix) and not f.startswith(("_", "."))
        )
        if not files:
            return None
        path = files[0]
    with open(path, encoding="utf-8") as fh:
        line = fh.readline().strip()
    if not line:
        return None
    if fmt == "json":
        return list(_json.loads(line).keys())
    return list(next(_csv.reader([line])))


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
    # keep null fields as explicit "key": null — the writer's default OMITS
    # them, so a first row with null html would make read_pages' wire-column
    # validation reject a perfectly valid export
    (
        w.option("ignoreNullFields", "false").json(path)
        if fmt == "json"
        else w.option("header", True).csv(path)
    )
