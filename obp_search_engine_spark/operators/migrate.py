"""S18 — versioned schema migrations over parquet snapshot tables.

The reference runs numbered DDL migrations gated on a stored schema version
(crawler/db/migrate.go:24-78; version lives in ``configuration.schema_version``,
crawler/db/migrations/helpers.go:8-9). Here a migration is a pure
``DataFrame -> DataFrame`` transform; ``migrate_snapshot`` applies every
pending migration to a parquet snapshot and writes a NEW snapshot directory
plus a version stamp (Iceberg-style: immutable files, the manifest pointer
moves last). Re-running is a no-op (idempotent, like the reference's
version gate).

At 100 TB a migration is one full-scan rewrite job — additive migrations
(add column with default) are expressed as projections so Catalyst folds
the default to a constant and the scan stays column-pruned; nothing here
collects to the driver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION_FILE = "SCHEMA_VERSION"


@dataclass(frozen=True)
class Migration:
    version: int
    description: str
    apply: Callable[[DataFrame], DataFrame]


def add_column(name: str, default_expr: str) -> Callable[[DataFrame], DataFrame]:
    """ALTER TABLE ADD COLUMN ... DEFAULT (migrate.go's dominant shape)."""
    return lambda df: df.withColumn(name, F.expr(default_expr))


def rename_column(old: str, new: str) -> Callable[[DataFrame], DataFrame]:
    return lambda df: df.withColumnRenamed(old, new)


def drop_column(name: str) -> Callable[[DataFrame], DataFrame]:
    return lambda df: df.drop(name)


def apply_migrations(
    df: DataFrame, migrations: list[Migration], from_version: int = 0
) -> tuple[DataFrame, int]:
    """Apply every migration with version > from_version, in version order.
    Returns (migrated df, new version). Pure plan — no actions."""
    version = from_version
    for m in sorted(migrations, key=lambda m: m.version):
        if m.version <= from_version:
            continue
        df = m.apply(df)
        version = m.version
    return df, version


def read_version(snapshot_dir: str) -> int:
    p = os.path.join(snapshot_dir, VERSION_FILE)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def migrate_snapshot(
    spark: SparkSession, snapshot_dir: str, migrations: list[Migration]
) -> int:
    """Bring the parquet snapshot at ``snapshot_dir`` up to the latest
    migration version. Data is rewritten into ``data_v{N}/`` and the
    version stamp moves atomically afterwards (crash between write and
    stamp leaves the old version live — same recovery story as the
    checkpoint LATEST pointer). Returns the resulting version."""
    current = read_version(snapshot_dir)
    target = max((m.version for m in migrations), default=current)
    if target <= current:
        return current
    df = spark.read.parquet(_data_dir(snapshot_dir, current))
    migrated, new_version = apply_migrations(df, migrations, from_version=current)
    migrated.write.mode("overwrite").parquet(_data_dir(snapshot_dir, new_version))
    tmp = os.path.join(snapshot_dir, VERSION_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(new_version))
    os.replace(tmp, os.path.join(snapshot_dir, VERSION_FILE))
    return new_version


def init_snapshot(df: DataFrame, snapshot_dir: str, version: int = 0) -> None:
    df.write.mode("overwrite").parquet(_data_dir(snapshot_dir, version))
    with open(os.path.join(snapshot_dir, VERSION_FILE), "w") as f:
        f.write(str(version))


def _data_dir(snapshot_dir: str, version: int) -> str:
    return os.path.join(snapshot_dir, f"data_v{version}")


def load_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    return spark.read.parquet(_data_dir(snapshot_dir, read_version(snapshot_dir)))
