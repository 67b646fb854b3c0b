"""Deduplication suite for the training-data pipeline.

Exact + four near-dup families, all designed for 100 TB:

  * exact        — fingerprint groupBy (map-side partial agg; one shuffle
                   on a 16-byte key, never on the text itself)
  * n-gram Jaccard — shingle sets with array_intersect/array_union (JVM);
                   brute-force variant for oracle checks, LSH for scale
  * MinHash+LSH  — k minhashes as JVM xxhash64 expressions over the shingle
                   array (NO Python in the signature path), banded into
                   buckets, candidate pairs only within buckets, verified
                   by exact Jaccard. Shuffle is on (band, bucket) — bounded
                   by bucket size, not corpus size.
  * SimHash      — 64-bit vectorized pandas UDF (numpy bit ops), near-dup =
                   small hamming distance within prefix buckets
  * embedding cosine — see operators/similarity.py

The reference's only dedup is PK INSERT IGNORE (crawler/db/mysql.go:293);
everything here is the web-scale generalization the north_rule asks for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textstats import fingerprint_col, tokens_col


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fingerprint -> (keeper id, group size). Groups with n_docs > 1 are
    duplicates; keeper = min id (deterministic)."""
    return (
        df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return df with duplicate texts removed (keeper = min id per fp)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + exact Jaccard (JVM-side set algebra)
# ---------------------------------------------------------------------------
def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles as an array column — pure Catalyst
    expressions (split / sequence / transform / slice), no Python."""
    toks = tokens_col(F.lower(F.col(text_col)))
    sh = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return df.withColumn(out_col, sh)


def jaccard_col(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return (inter / union).cast("double")


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    block_col=None,
) -> DataFrame:
    """All pairs (a < b) with shingle-Jaccard >= threshold.

    Brute-force O(n^2) within blocks; pass block_col (e.g. lang) to bound
    the cross product, or use minhash_lsh_pairs at scale. Output:
    (id_a, id_b, jaccard)."""
    s = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("_id"), F.col("shingles").alias("_sh"),
        *( [block_col.alias("_blk")] if block_col is not None else [] )
    )
    a = s.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"),
        *( [F.col("_blk").alias("_blk")] if block_col is not None else [] )
    )
    b = s.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"),
        *( [F.col("_blk").alias("_blk")] if block_col is not None else [] )
    )
    on = [a["_blk"] == b["_blk"]] if block_col is not None else []
    pairs = a.join(b, on=on + [a.id_a < b.id_b], how="inner")
    return (
        pairs.select(
            "id_a", "id_b", F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def with_minhash(df: DataFrame, k: int = 32, shingle_col: str = "shingles",
                 out_col: str = "minhash") -> DataFrame:
    """k-permutation MinHash signature, entirely as Catalyst expressions:
    sig[i] = min over shingles of xxhash64(i, shingle). One pass, no UDF."""
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col(shingle_col), lambda s, i=i: F.xxhash64(F.lit(i), s)
                )
            )
            for i in range(k)
        ]
    )
    return df.withColumn(out_col, sig)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    k minhashes split into `bands` bands of k/bands rows; docs sharing any
    band bucket become candidates (shuffle keyed on (band, bucket_hash) —
    the only O(corpus) shuffle, with tiny rows: id + 8-byte bucket). Then
    candidates join back their shingle sets and exact Jaccard filters false
    positives, so output == brute-force pairs minus LSH false-negative
    misses (recall tested in tests/test_dedup.py)."""
    rows = k // bands
    base = with_shingles(df.select(id_col, text_col), text_col, n)
    sigs = with_minhash(base, k).persist()

    bucket_rows = sigs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("minhash")[b * rows + r] for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")

    cand = (
        bucket_rows.alias("x")
        .join(
            bucket_rows.alias("y"),
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.bucket") == F.col("y.bucket"),
                F.col("x._id") < F.col("y._id"),
            ],
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )

    sh = sigs.select(F.col(id_col).alias("_id"), F.col("shingles"))
    verified = (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .select("id_a", "id_b", F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
_SIMHASH_SCHEMA = T.LongType()


@F.pandas_udf(_SIMHASH_SCHEMA)
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — vectorized numpy bit-voting.

    Per batch: hash every token (splitmix64 of a stable python hash of the
    token bytes via numpy void view is avoided — we use blake2b 8-byte
    digests for cross-run stability), accumulate +1/-1 votes per bit,
    sign -> bits.
    """
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        if text is None:
            out[row] = 0
            continue
        toks = text.lower().split()
        if not toks:
            out[row] = 0
            continue
        hs = np.frombuffer(
            b"".join(hashlib.blake2b(t.encode(), digest_size=8).digest() for t in set(toks)),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[row] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Scale path: split the 64 bits into (max_hamming + 1) chunks — by
    pigeonhole, any pair within the hamming budget shares at least one
    exact chunk — so candidates join on (chunk_idx, chunk_value) instead of
    a cross product. Bigger budgets mean narrower chunks (more candidates);
    the exact hamming filter keeps precision at 1."""
    n_chunks = max_hamming + 1
    widths = [64 // n_chunks + (1 if i < 64 % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    base = df.select(
        F.col(id_col).alias("_id"), simhash64_udf(F.col(text_col)).alias("sim")
    ).persist()
    chunks = base.select(
        "_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("sim", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("_id", "sim", "c.ci", "c.cv")
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            on=[
                F.col("x.ci") == F.col("y.ci"),
                F.col("x.cv") == F.col("y.cv"),
                F.col("x._id") < F.col("y._id"),
            ],
        )
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
