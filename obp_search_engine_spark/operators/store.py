"""Documents-store lifecycle: incremental reads, export sinks, compaction.

The crawl writes one documents store per round (the harvest spill IS the
store — text + stats written once, operators/crawl.py). Downstream
training-data pipelines consume it in three shapes this module provides:

* ``read_documents(since_round=k)`` — Iceberg-style INCREMENTAL read: only
  rounds committed after snapshot k (the consumer's bookmark), pruned to
  the documents schema. At 100 TB nobody re-reads the corpus per batch —
  they read the delta since their last offset.
* ``export_documents_jsonl`` — the training-pipeline handoff format
  (one JSON object per line, url-keyed), written distributed.
* ``compact_documents`` — small-file compaction: a long crawl leaves one
  file set per round per shard; compaction rewrites a round's store into
  size-targeted files (content-identical, manifest-verified). The 100 TB
  failure mode this prevents is millions of KB-files throttling the
  namenode/scan planner.

Reference analogue: the items corpus consumers (apiserver scans,
listingfiltering training reads, crawler/db/mysql.go:339 re-inserts) all
read the one MySQL table; our store is append-per-round, so the delta/
export/compact trio is what replaces "SELECT * FROM items WHERE ...".
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_COLS = ["url", "fetch_ts", "text", "lang", "n_tokens", "fp", "quality"]


def documents_rounds(ckpt_dir: str) -> list[int]:
    """Rounds that committed a documents store (harvest dir), ascending.
    Self-heals a compaction interrupted between its two renames: a round
    with ``harvest._old`` but no ``harvest`` gets the old store renamed
    back (the new one was never swapped in)."""
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"round=(\d+)", name)
        if not m:
            continue
        path = os.path.join(ckpt_dir, name, "harvest")
        if not os.path.isdir(path) and os.path.isdir(path + "._old"):
            os.rename(path + "._old", path)  # crash recovery
        if os.path.isdir(path):
            out.append(int(m.group(1)))
    return sorted(out)


def read_documents(
    spark: SparkSession,
    ckpt_dir: str,
    since_round: int = 0,
    until_round: int | None = None,
) -> DataFrame:
    """Incremental documents read: rounds in (since_round, until_round].

    ``since_round`` is the consumer's bookmark (exclusive) — pass the last
    round it processed; 0 means everything. Each row carries its ``round``
    so the consumer can advance the bookmark transactionally.
    """
    rounds = [
        k for k in documents_rounds(ckpt_dir)
        if k > since_round and (until_round is None or k <= until_round)
    ]
    if not rounds:
        return spark.createDataFrame(
            [], "url string, fetch_ts timestamp, text string, lang string, "
                "n_tokens int, fp string, quality double, round int"
        )
    parts = [
        spark.read.parquet(os.path.join(ckpt_dir, f"round={k}", "harvest"))
        .select(*DOC_COLS)
        .withColumn("round", F.lit(k))
        for k in rounds
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def export_documents_jsonl(
    spark: SparkSession,
    ckpt_dir: str,
    out_dir: str,
    since_round: int = 0,
) -> int:
    """Export the incremental slice as JSONL (one object per line) for
    training-data handoff; returns the exported row count (via a write
    Observation — no second scan)."""
    from pyspark.sql import Observation

    docs = read_documents(spark, ckpt_dir, since_round=since_round)
    obs = Observation("export_docs")
    docs.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).json(out_dir)
    return int(obs.get["n"])


def compact_documents(
    spark: SparkSession,
    ckpt_dir: str,
    round_no: int,
    target_file_mb: int = 256,
) -> dict:
    """Rewrite one round's documents store into ceil(bytes/target)-many
    files. Content-identical (same rows, same schema incl. the harvest
    link columns so downstream re-reads are unaffected). The swap is two
    renames — not atomic: a crash in the microsecond gap leaves
    ``harvest._old`` and no ``harvest``, which ``documents_rounds``
    self-heals by renaming the old store back (the rewrite is then simply
    retried); the old store is deleted only after the new one is in place,
    so no state loses data. Returns {files_before, files_after, rows} —
    the row count rides the rewrite as an Observation, no second scan."""
    import shutil

    from pyspark.sql import Observation

    from .checkpoint import write_manifest

    path = os.path.join(ckpt_dir, f"round={round_no}", "harvest")
    # reclaim debris from a PREVIOUS crashed compaction of this round —
    # done here at the writer site (not in the documents_rounds read path,
    # where it would race an in-flight compaction's live temp dir):
    #  * a stranded multi-GB ._compacting temp (crash during/after write);
    #  * a stranded ._old when the crash hit after the swap completed but
    #    before the old store was deleted (harvest/ is then the valid new
    #    store and ._old is pure dead weight — this host has an ENOSPC
    #    history).
    for debris in (path + "._compacting", path + "._old"):
        if os.path.isdir(debris) and os.path.isdir(path):
            shutil.rmtree(debris, ignore_errors=True)
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total_bytes // (target_file_mb * 2**20)))
    df = spark.read.parquet(path)
    tmp = path + "._compacting"
    obs = Observation(f"compact_r{round_no}")
    df.observe(obs, F.count(F.lit(1)).alias("n")).coalesce(int(n_out)).write.mode(
        "overwrite"
    ).parquet(tmp)
    rows = int(obs.get["n"])
    old = path + "._old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    write_manifest(path)
    files_after = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    return {"files_before": len(files), "files_after": files_after, "rows": rows}
