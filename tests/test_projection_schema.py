"""F13 re-nesting projection + S18 schema-as-code evolution."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from obp_search_engine_spark.plans.search import renest_listing


def test_renest_listing(spark):
    df = spark.createDataFrame(
        [
            (
                "http://a.x/1", "p1", "Shop One", "agent/1",
                "t.png,s.png,m.png,o.png,l.png", 100, "USD", 4.5, "a,b",
            ),
            ("http://b.x/1", "p2", "Shop Two", "agent/2", None, 5, "BTC", None, None),
        ],
        "url string, peer_id string, node_name string, user_agent string, "
        "thumbnail string, price_amount long, price_currency string, "
        "avg_rating double, tags_str string",
    )
    out = {r.url: r for r in renest_listing(df).collect()}
    a = out["http://a.x/1"]
    assert a.vendor.peerID == "p1" and a.vendor.name == "Shop One"
    assert (a.thumbnail.tiny, a.thumbnail.large) == ("t.png", "l.png")
    assert a.price.amount == 100 and a.price.currencyCode == "USD"
    assert a.averageRating == 4.5 and a.tags == ["a", "b"]
    b = out["http://b.x/1"]
    # positional split of empty string -> empty first slot, nulls after
    assert b.thumbnail.tiny == "" and b.thumbnail.small is None
    assert b.averageRating is None
    assert b.tags == []  # safeSplit: null -> [] (apiserver/index.js:180-185)


def test_schema_evolution_add_column(spark):
    """S18: reading an old snapshot under a wider schema-as-code StructType
    null-fills the added columns (Iceberg add-column semantics;
    reference migrations crawler/db/migrate.go:24-78)."""
    v1 = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("depth", T.IntegerType(), True),
        ]
    )
    v2 = T.StructType(
        list(v1.fields)
        + [
            T.StructField("classified_manually", T.BooleanType(), True),  # migration006
            T.StructField("normalized_price", T.DecimalType(38, 18), True),  # migration000
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame([("http://a.x/", 1)], v1).write.parquet(f"{d}/t")
        got = spark.read.schema(v2).parquet(f"{d}/t")
        assert [f.name for f in got.schema.fields] == [f.name for f in v2.fields]
        row = got.first()
        assert row.url == "http://a.x/" and row.depth == 1
        assert row.classified_manually is None and row.normalized_price is None
