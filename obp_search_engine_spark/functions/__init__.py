"""Column-level functions: URL canonicalization/hashing, HTML link/text
extraction, text statistics. Everything row-level is either a JVM built-in
(xxhash64, parse_url, regexp) or an Arrow-vectorized pandas UDF — never a
row-at-a-time Python UDF (input_hint: "no per-row Python").
"""
