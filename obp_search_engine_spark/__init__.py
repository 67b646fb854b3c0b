"""obp_search_engine_spark — a PySpark-native crawl/discover/index engine.

A brand-new implementation (NOT a port) of the capabilities of
``phoreproject/obp-search-engine`` (reference at /root/reference, read-only):
a distributed URL-frontier + fetch scheduler over Iceberg-style tables of
Common-Crawl-style web pages, plus the reference's full search/query surface
re-expressed as DataFrame pipelines, plus the large-scale training-data
operators (dedup, similarity search, text analysis) such a corpus engine
needs at 100 TB.

Layout:
    session.py            SparkSession factory tuned for the target scale
    schemas.py            StructType constants for every engine table
    functions/            scalar/vectorized column functions (urls, extract,
                          textstats, hashing)
    operators/            dataflow operators (crawl rounds, dedup, frontier
                          scheduling, search queries, similarity, classifier)
    sources/              synthetic pages generator + checkpoint I/O
    plans/                declarative query builders (search-request -> plan)
    streaming/            optional foreachBatch wrapper around crawl rounds
"""

__version__ = "0.1.0"
