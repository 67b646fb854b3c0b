"""Partitioned URL-seen membership: bloom shards + cuckoo fallback.

Replaces the reference's storage-level dedup (``INSERT IGNORE`` on the
``nodes`` PK, crawler/db/mysql.go:293) with something that works at 10^10
URLs: per-shard bloom filters keyed by ``pmod(host_hash, n_shards)``
(north_rule: "partitioned bloom-filter URL-seen set sharded by host-hash"),
with cuckoo-filter shards as the deletion-capable fallback (blooms can't
delete; the reference deletes items on re-crawl, crawler/db/mysql.go:359).

Scale math: at 1% FPR a bloom costs ~9.6 bits/key -> ~12 GB for 10^10 keys,
sharded into manageable blobs (10^7 keys -> ~12 MB/shard at 1024 shards).
Probe-side we never broadcast the whole set: candidates cogroup with their
shard's blob (one Arrow batch per shard), so each task touches only its
shard. Bloom "maybe" hits fall back to an exact anti-join against the
frontier — the exact join's input shrinks from |candidates| to
|new-and-false-positive|, which is the whole point.

All bit math is vectorized numpy inside grouped pandas UDFs (no per-row
Python).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SEEN_SET_SCHEMA

_BLOOM_MAGIC = b"BLM1"
_CUCKOO_MAGIC = b"CKF1"


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


# ---------------------------------------------------------------------------
# bloom shard
# ---------------------------------------------------------------------------
class BloomShard:
    """Fixed-size bloom filter over uint64 keys; bytes-serializable."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 7, bits: np.ndarray | None = None,
                 n_items: int = 0):
        assert m_bits % 8 == 0
        self.m = m_bits
        self.k = k
        self.n_items = n_items
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, capacity: int, fpr: float = 0.01) -> "BloomShard":
        m = int(-capacity * np.log(fpr) / (np.log(2) ** 2))
        m = max(1024, (m + 7) // 8 * 8)
        k = max(1, int(round(m / max(capacity, 1) * np.log(2))))
        return cls(m_bits=m, k=min(k, 16))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = _mix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_items += int(len(keys))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def to_bytes(self) -> bytes:
        return _BLOOM_MAGIC + struct.pack("<QIQ", self.m, self.k, self.n_items) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomShard":
        assert b[:4] == _BLOOM_MAGIC, "not a bloom blob"
        m, k, n = struct.unpack("<QIQ", b[4:24])
        bits = np.frombuffer(b[24:], dtype=np.uint8).copy()
        return cls(m_bits=m, k=k, bits=bits, n_items=n)


# ---------------------------------------------------------------------------
# cuckoo shard (deletion-capable fallback)
# ---------------------------------------------------------------------------
class CuckooShard:
    """Cuckoo filter: 4-slot buckets, 16-bit fingerprints, partial-key
    cuckoo hashing. Supports delete() — the bloom can't."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16, table: np.ndarray | None = None,
                 n_items: int = 0):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        self.nb = n_buckets
        self.table = table if table is not None else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.n_items = n_items

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix64(keys.astype(np.uint64)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) & np.uint64(self.nb - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i ^ _mix64(fp.astype(np.uint64)).astype(np.int64)) & (self.nb - 1)

    def add_many(self, keys: np.ndarray) -> int:
        """Insert keys; returns number inserted (raises on overflow)."""
        fps, i1s = self._fp(keys), self._i1(keys)
        for fp, i1 in zip(fps, i1s):
            self._add_one(int(fp), int(i1))
        self.n_items += int(len(keys))
        return len(keys)

    def _add_one(self, fp: int, i1: int) -> None:
        for i in (i1, int(self._alt(np.asarray([i1]), np.asarray([fp], dtype=np.uint16))[0])):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        i = i1
        cur = fp
        rng = np.random.Generator(np.random.PCG64(fp * 2654435761 % (2**32)))
        for _ in range(self.MAX_KICKS):
            s = int(rng.integers(self.SLOTS))
            cur, self.table[i, s] = int(self.table[i, s]), cur
            i = int(self._alt(np.asarray([i]), np.asarray([cur], dtype=np.uint16))[0])
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return
        raise OverflowError("cuckoo shard full — resize required")

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp(keys), self._i1(keys)
        i2 = self._alt(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, keys: np.ndarray) -> int:
        removed = 0
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._alt(i1s, fps)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for i in (i1, i2):
                slots = np.nonzero(self.table[i] == fp)[0]
                if len(slots):
                    self.table[i, slots[0]] = 0
                    removed += 1
                    break
        self.n_items -= removed
        return removed

    def to_bytes(self) -> bytes:
        return _CUCKOO_MAGIC + struct.pack("<QQ", self.nb, self.n_items) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CuckooShard":
        assert b[:4] == _CUCKOO_MAGIC, "not a cuckoo blob"
        nb, n = struct.unpack("<QQ", b[4:20])
        table = np.frombuffer(b[20:], dtype=np.uint16).reshape(nb, cls.SLOTS).copy()
        return cls(n_buckets=nb, table=table, n_items=n)


def shard_from_bytes(b: bytes):
    return BloomShard.from_bytes(b) if b[:4] == _BLOOM_MAGIC else CuckooShard.from_bytes(b)


# ---------------------------------------------------------------------------
# DataFrame-level build / update / probe
# ---------------------------------------------------------------------------
def _shard_col(n_shards: int):
    return F.pmod(F.col("host_hash"), F.lit(n_shards)).cast("int")


def build_seen_set(
    spark,
    urls_df: DataFrame,
    n_shards: int = 32,
    kind: str = "bloom",
    capacity_per_shard: int = 1 << 20,
) -> DataFrame:
    """Build shard blobs from (url_hash, host_hash) rows — one grouped-pandas
    task per shard, each emitting one (shard, kind, blob, n) row."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy(np.int64).astype(np.uint64)
        keys = np.unique(keys)
        if kind == "bloom":
            f = BloomShard.sized_for(capacity_per_shard)
        else:
            f = CuckooShard(n_buckets=max(1 << 10, int(2 ** np.ceil(np.log2(capacity_per_shard / 3)))))
        f.add_many(keys)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "kind": [kind],
                "filter_bytes": [f.to_bytes()],
                "n_items": [len(keys)],
            }
        )

    return (
        urls_df.select("url_hash", _shard_col(n_shards).alias("shard"))
        .groupBy("shard")
        .applyInPandas(build, SEEN_SET_SCHEMA)
    )


def update_seen_set(
    seen: DataFrame, new_urls: DataFrame, n_shards: int = 32,
    kind: str = "bloom",
) -> DataFrame:
    """Insert new url_hashes into their shard blobs (cogrouped update —
    Iceberg-style: emits NEW blob rows; caller snapshots).

    ``kind`` governs the filter created for a shard that has NO existing
    blob (keys hashing to a previously-empty shard) — it must match the
    set's build kind: silently creating a bloom blob inside a cuckoo set
    would strand those keys undeletable."""

    def upd(keys_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if blob_pdf.empty:
            blob_kind = kind
            if blob_kind == "cuckoo":
                f = CuckooShard(n_buckets=1 << 16)
            else:
                f = BloomShard.sized_for(1 << 20)
            shard = int(keys_pdf["shard"].iloc[0])
        else:
            f = shard_from_bytes(bytes(blob_pdf["filter_bytes"].iloc[0]))
            shard = int(blob_pdf["shard"].iloc[0])
            blob_kind = str(blob_pdf["kind"].iloc[0])
        n_new = 0
        if not keys_pdf.empty:
            keys = np.unique(keys_pdf["url_hash"].to_numpy(np.int64).astype(np.uint64))
            f.add_many(keys)
            n_new = len(keys)
        return pd.DataFrame(
            {
                "shard": [shard],
                "kind": [blob_kind],
                "filter_bytes": [f.to_bytes()],
                "n_items": [int(f.n_items) if blob_kind == "cuckoo" else int((blob_pdf["n_items"].iloc[0] if not blob_pdf.empty else 0) + n_new)],
            }
        )

    keys = new_urls.select("url_hash", _shard_col(n_shards).alias("shard"))
    return (
        keys.groupBy("shard")
        .cogroup(seen.groupBy("shard"))
        .applyInPandas(upd, SEEN_SET_SCHEMA)
    )


def remove_from_seen_set(
    seen: DataFrame, removed_urls: DataFrame, n_shards: int = 32
) -> DataFrame:
    """Delete url_hashes from their shards — ONLY cuckoo shards support
    this (the reference deletes items on re-crawl, crawler/db/mysql.go:359;
    blooms can't unset bits, which is why the deletion-capable shard kind
    exists). Raises on bloom shards with deletions pending."""

    def rm(keys_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if blob_pdf.empty:
            # nothing stored for this shard; deletion is a no-op
            return pd.DataFrame(
                {"shard": [], "kind": [], "filter_bytes": [], "n_items": []}
            )
        kind = str(blob_pdf["kind"].iloc[0])
        f = shard_from_bytes(bytes(blob_pdf["filter_bytes"].iloc[0]))
        if not keys_pdf.empty:
            if kind != "cuckoo":
                raise ValueError(
                    "cannot delete from a bloom shard — rebuild it or use "
                    "kind='cuckoo' (build_seen_set(kind='cuckoo'))"
                )
            keys = np.unique(keys_pdf["url_hash"].to_numpy(np.int64).astype(np.uint64))
            f.delete_many(keys)
        return pd.DataFrame(
            {
                "shard": [int(blob_pdf["shard"].iloc[0])],
                "kind": [kind],
                "filter_bytes": [f.to_bytes()],
                "n_items": [int(f.n_items)],
            }
        )

    keys = removed_urls.select("url_hash", _shard_col(n_shards).alias("shard"))
    return (
        keys.groupBy("shard")
        .cogroup(seen.groupBy("shard"))
        .applyInPandas(rm, SEEN_SET_SCHEMA)
    )


def bloom_probe(
    candidates: DataFrame, seen: DataFrame, n_shards: int = 32
) -> DataFrame:
    """candidates (must carry url_hash + host_hash) -> + maybe_seen BOOLEAN.

    maybe_seen=False is definitive (bloom has no false negatives): the url
    is NEW. maybe_seen=True needs the exact check. Cogrouped per shard so a
    task only deserializes its own blob once per Arrow batch group."""
    from pyspark.sql import types as T

    cand = candidates.withColumn("shard", _shard_col(n_shards))
    # copy the fields — StructType.add mutates in place, which would corrupt
    # the DataFrame's cached schema object
    out_schema = T.StructType(
        list(cand.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )
    cols = [f.name for f in cand.schema.fields]

    def probe(cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if blob_pdf.empty:
            return cand_pdf.assign(maybe_seen=False)
        f = shard_from_bytes(bytes(blob_pdf["filter_bytes"].iloc[0]))
        keys = cand_pdf["url_hash"].to_numpy(np.int64).astype(np.uint64)
        return cand_pdf.assign(maybe_seen=f.contains_many(keys))

    return (
        cand.groupBy("shard")
        .cogroup(seen.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )


def seen_probe_factory(get_seen, n_shards: int = 32):
    """Build a seen_probe(candidates, frontier) for crawl_round: bloom
    pre-filter + exact anti-join only on the 'maybe' residue."""
    from ..functions.urls import with_url_keys

    def seen_probe(candidates: DataFrame, frontier: DataFrame) -> DataFrame:
        cand = with_url_keys(candidates)
        probed = bloom_probe(cand, get_seen(), n_shards)
        # ONE anti-join with the bloom verdict folded into the condition:
        # maybe_seen=False rows can never match (condition is false) and
        # survive; maybe_seen=True rows drop iff the exact hash is present.
        # A filter-split + union would execute the Arrow cogroup probe TWICE
        # (once per branch) — this keeps it single-pass, and the join's
        # frontier side only has to beat the maybe-residue, not all
        # candidates.
        out = probed.join(
            # shuffle-hash: build a long-keyed map of the frontier instead
            # of sort-merging both sides each round
            frontier.select(F.col("url_hash").alias("_seen_hash")).hint("shuffle_hash"),
            (probed.url_hash == F.col("_seen_hash")) & probed.maybe_seen,
            "left_anti",
        )
        return out.select([c for c in candidates.columns])

    return seen_probe
