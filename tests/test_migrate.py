"""S18 migration runner: version stamping, pending-only application,
idempotence, crash-safe pointer move (crawler/db/migrate.go:24-78)."""

from __future__ import annotations

import tempfile

from obp_search_engine_spark.operators.migrate import (
    Migration,
    add_column,
    apply_migrations,
    drop_column,
    init_snapshot,
    load_snapshot,
    migrate_snapshot,
    read_version,
    rename_column,
)

MIGS = [
    Migration(1, "add listed", add_column("listed", "true")),
    Migration(2, "rename seg", rename_column("seg", "segment")),
    Migration(3, "drop extra", drop_column("extra")),
]


def test_apply_migrations_pending_only(spark):
    df = spark.createDataFrame([(1, "A", 9)], "id int, seg string, extra int")
    out, v = apply_migrations(df, MIGS, from_version=0)
    assert v == 3
    assert out.columns == ["id", "segment", "listed"]
    assert out.first().listed is True

    # already at v2: only migration 3 applies (no re-add of 'listed')
    df2 = spark.createDataFrame([(1, "A", 9, False)], "id int, segment string, extra int, listed boolean")
    out2, v2 = apply_migrations(df2, MIGS, from_version=2)
    assert v2 == 3
    assert out2.columns == ["id", "segment", "listed"]
    assert out2.first().listed is False  # v1 did NOT re-run


def test_migrate_snapshot_versioned_and_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "A", 9), (2, "B", 8)], "id int, seg string, extra int"
    )
    with tempfile.TemporaryDirectory() as d:
        init_snapshot(df, d, version=0)
        assert read_version(d) == 0

        v = migrate_snapshot(spark, d, MIGS)
        assert v == 3 and read_version(d) == 3
        got = load_snapshot(spark, d)
        assert sorted(got.columns) == ["id", "listed", "segment"]
        assert got.count() == 2

        # idempotent: re-running with no pending migrations is a no-op
        assert migrate_snapshot(spark, d, MIGS) == 3
