"""Snapshot-table semantics: immutability, time travel, copy-on-write
delete with stats pruning, rollback, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    v = snap.create_table(df.repartition(4), path)
    assert v == 1
    return path


def test_create_read_roundtrip(spark, table):
    assert snap.read_table(spark, table).count() == 100
    assert snap.current_version(table) == 1


def test_append_and_time_travel(spark, table):
    snap.append(spark.range(100, 150).select(F.col("id"), F.lit(99).alias("bucket")), table)
    assert snap.current_version(table) == 2
    assert snap.read_table(spark, table).count() == 150
    assert snap.read_table(spark, table, version=1).count() == 100  # time travel


def test_delete_is_copy_on_write_and_isolated(spark, table):
    # pin a reader to v1 BEFORE the delete
    v1 = snap.read_table(spark, table, version=1)
    files_before = set(snap._read_manifest(table, 1)["files"])
    v2 = snap.delete_where(spark, table, F.col("id") < 10)
    assert v2 == 2
    assert snap.read_table(spark, table).count() == 90
    assert snap.read_table(spark, table).filter("id < 10").count() == 0
    # old data files untouched: pinned reader still sees all 100 rows
    assert v1.count() == 100
    for f in files_before:
        assert os.path.exists(os.path.join(table, f))


def test_delete_stats_pruning_skips_files(spark, tmp_path):
    path = str(tmp_path / "sorted")
    df = spark.range(0, 1000).select(F.col("id"))
    # range-partitioned by id -> disjoint per-file min/max stats
    snap.create_table(df.repartitionByRange(4, "id"), path)
    before = snap._read_manifest(path, 1)["files"]
    snap.delete_where(
        spark, path, F.col("id") < 50, prune=("id", 0, 49)
    )
    after = snap._read_manifest(path, 2)["files"]
    # only the one file covering [0,50) was rewritten; the rest carry over
    carried = set(before) & set(after)
    assert len(carried) == len(before) - 1
    assert snap.read_table(spark, path).count() == 950


def test_rollback_restores_old_file_list(spark, table):
    snap.delete_where(spark, table, F.col("id") >= 0)  # delete everything
    # v2 is an empty-but-readable version (schema survives in the empty file)
    assert snap.read_table(spark, table).count() == 0
    v3 = snap.rollback(table, 1)
    assert v3 == 3
    assert snap.read_table(spark, table).count() == 100
    ops = [h["op"] for h in snap.history(table)]
    assert ops == ["create", "delete", "rollback-to-1"]


def test_expire_snapshots_reclaims_unreferenced_files(spark, table):
    snap.delete_where(spark, table, F.col("id") < 50)
    v1_files = snap._read_manifest(table, 1)["files"]
    expired = snap.expire_snapshots(table, keep_last=1)
    assert expired == [1]
    # v1-only files are gone; current version still reads fine
    live = set(snap._read_manifest(table, 2)["files"])
    for f in v1_files:
        assert (f in live) == os.path.exists(os.path.join(table, f))
    assert snap.read_table(spark, table).count() == 50
    with pytest.raises(FileNotFoundError):
        snap._read_manifest(table, 1)


def test_commit_refuses_version_collision(spark, table):
    # simulate a lost-update race: a second writer already published v2
    snap._commit(table, [], "append", parent=1)
    with pytest.raises(RuntimeError, match="concurrent"):
        snap._commit(table, [], "append", parent=1)
