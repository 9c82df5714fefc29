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
    snap.append(
        spark.range(100, 150).select(
            F.col("id"), F.lit(99).cast("long").alias("bucket")
        ),
        table,
    )
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


def test_optimize_clusters_files_for_pruning(spark, tmp_path):
    """Arrival-ordered appends give overlapping per-file ranges (pruning
    is useless); optimize(cluster_by=id) makes them disjoint so a range
    delete rewrites one file instead of all of them."""
    path = str(tmp_path / "opt")
    # 4 interleaved appends: every file spans nearly the full id range
    snap.create_table(
        spark.range(0, 1000, 4).select(F.col("id")).coalesce(1), path
    )
    for start in (1, 2, 3):
        snap.append(
            spark.range(start, 1000, 4).select(F.col("id")).coalesce(1), path
        )
    n0 = len(snap._read_manifest(path, snap.current_version(path))["files"])
    v_before = snap.current_version(path)
    before = snap._read_manifest(path, v_before)["files"]
    # unclustered: a narrow range delete must rewrite EVERY file
    snap.delete_where(spark, path, F.col("id") < 0, prune=("id", 0, 9))
    after_noop = snap._read_manifest(path, snap.current_version(path))["files"]
    assert not (set(before) & set(after_noop)) or len(
        set(before) & set(after_noop)
    ) < len(before), "interleaved files should all be candidates"

    v = snap.optimize_table(spark, path, cluster_by=("id",), target_files=4)
    files = snap._read_manifest(path, v)["files"]
    assert len(files) == 4
    # clustered: the same narrow delete touches exactly one file
    snap.delete_where(spark, path, F.col("id") < 10, prune=("id", 0, 9))
    final = snap._read_manifest(path, snap.current_version(path))["files"]
    assert len(set(files) & set(final)) == 3
    assert snap.read_table(spark, path).count() == 990
    # history preserved: pre-optimize version still time-travels
    assert snap.read_table(spark, path, version=v_before).count() == 1000
    assert n0 == 4


def test_optimize_compacts_small_files(spark, tmp_path):
    path = str(tmp_path / "compact")
    snap.create_table(spark.range(0, 50).repartition(8), path)
    v = snap.optimize_table(spark, path, target_files=1)
    assert len(snap._read_manifest(path, v)["files"]) == 1
    assert snap.read_table(spark, path).count() == 50


def test_append_stream_exactly_once(spark, tmp_path):
    """foreachBatch sink: batches commit with their id; a replayed batch
    (crash between commit and checkpoint) is a no-op."""
    src = str(tmp_path / "src")
    spark.range(0, 40).selectExpr("id", "id % 4 AS k").write.parquet(src)
    table = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("id long, k long").parquet(src)
    snap.append_stream(stream, table, ckpt)
    assert snap.read_table(spark, table).count() == 40
    assert snap.committed_stream_batches(table) == {0}

    v_before = snap.current_version(table)
    # re-drain the same (unchanged) source with the same checkpoint:
    # no new batch, table unchanged
    stream2 = spark.readStream.schema("id long, k long").parquet(src)
    snap.append_stream(stream2, table, ckpt)
    assert snap.current_version(table) == v_before
    assert snap.read_table(spark, table).count() == 40

    # new data arrives -> new batch appends once
    spark.range(100, 120).selectExpr("id", "id % 4 AS k").write.mode(
        "append"
    ).parquet(src)
    stream3 = spark.readStream.schema("id long, k long").parquet(src)
    snap.append_stream(stream3, table, ckpt)
    assert snap.read_table(spark, table).count() == 60
    assert snap.committed_stream_batches(table) == {0, 1}


def test_vacuum_orphans_removes_only_unreferenced(spark, table):
    # manufacture an orphan: write files without committing a manifest
    orphan_df = spark.range(5).select(F.col("id"), (F.col("id")).alias("bucket"))
    orphans, _stats = snap._write_data_files(orphan_df, table)
    assert orphans
    # grace period: young orphans survive
    assert snap.vacuum_orphans(table, min_age_seconds=3600) == []
    removed = snap.vacuum_orphans(table, min_age_seconds=0)
    assert sorted(removed) == sorted(orphans)
    # referenced files untouched, table still reads
    assert snap.read_table(spark, table).count() == 100


def test_append_stream_two_streams_one_table(spark, tmp_path):
    """Idempotence is scoped per stream identity: two different streaming
    queries (different checkpoints) both start at batch 0, and BOTH must
    land — keying the skip on the bare batch id would silently drop the
    second stream's first batches (the Delta (txnAppId, version) lesson)."""
    src_a = str(tmp_path / "src_a")
    src_b = str(tmp_path / "src_b")
    spark.range(0, 30).selectExpr("id", "id % 3 AS k").write.parquet(src_a)
    spark.range(100, 150).selectExpr("id", "id % 3 AS k").write.parquet(src_b)
    table = str(tmp_path / "sink")

    stream_a = spark.readStream.schema("id long, k long").parquet(src_a)
    snap.append_stream(stream_a, table, str(tmp_path / "ckpt_a"))
    assert snap.read_table(spark, table).count() == 30

    # second stream, fresh checkpoint -> its batch 0 must NOT be skipped
    stream_b = spark.readStream.schema("id long, k long").parquet(src_b)
    snap.append_stream(stream_b, table, str(tmp_path / "ckpt_b"))
    assert snap.read_table(spark, table).count() == 80

    # replay of stream A (same checkpoint, unchanged source) stays a no-op
    v = snap.current_version(table)
    stream_a2 = spark.readStream.schema("id long, k long").parquet(src_a)
    snap.append_stream(stream_a2, table, str(tmp_path / "ckpt_a"))
    assert snap.current_version(table) == v

    # explicit app_id overrides the checkpoint digest as the identity
    src_c = str(tmp_path / "src_c")
    spark.range(200, 210).selectExpr("id", "id % 3 AS k").write.parquet(src_c)
    stream_c = spark.readStream.schema("id long, k long").parquet(src_c)
    snap.append_stream(stream_c, table, str(tmp_path / "ckpt_c"), app_id="etl-c")
    assert snap.read_table(spark, table).count() == 90
    assert snap.committed_stream_batches(table, "etl-c") == {0}
    # unscoped view unions every stream's ids — all three streams used
    # batch id 0, which is exactly why the skip check must be scoped
    assert snap.committed_stream_batches(table) == {0}


def test_merge_into_upsert(spark, tmp_path):
    path = str(tmp_path / "m")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    snap.create_table(base.repartition(2), path)

    src = spark.createDataFrame(
        [(2, "B2", 22.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    v = snap.merge_into(spark, path, src, ["id"])
    got = {r.id: (r.name, r.v) for r in snap.read_table(spark, path, v).collect()}
    # matched row replaced, unmatched inserted, untouched rows survive
    assert got == {1: ("a", 10.0), 2: ("B2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # time travel still sees the pre-merge image
    assert {r.id for r in snap.read_table(spark, path, 1).collect()} == {1, 2, 3}


def test_merge_into_delete_mode_and_dup_guard(spark, tmp_path):
    path = str(tmp_path / "md")
    snap.create_table(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
    )
    # delete mode: matched rows removed, nothing inserted
    src = spark.createDataFrame([(3, 0.0), (7, 0.0), (99, 0.0)], "id long, v double")
    v = snap.merge_into(spark, path, src, ["id"], when_matched="delete")
    assert sorted(r.id for r in snap.read_table(spark, path, v).collect()) == [
        0, 1, 2, 4, 5, 6, 8, 9,
    ]
    # duplicate source keys are ambiguous for update -> fail fast
    dup = spark.createDataFrame([(1, 1.0), (1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="duplicate keys"):
        snap.merge_into(spark, path, dup, ["id"])


def test_merge_prunes_untouched_files(spark, tmp_path):
    """A narrow-key merge must leave out-of-range files untouched in the
    new manifest (footer-stats pruning — the 100 TB property)."""
    path = str(tmp_path / "mp")
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") * 2.0).alias("v"))
    snap.create_table(df.repartitionByRange(4, "id").sortWithinPartitions("id"), path)
    files_before = set(snap._read_manifest(path, 1)["files"])
    assert len(files_before) == 4

    src = spark.createDataFrame([(5, -1.0), (17, -2.0)], "id long, v double")
    v = snap.merge_into(spark, path, src, ["id"])
    files_after = set(snap._read_manifest(path, v)["files"])
    # the three files covering id>=250 survive byte-identical
    assert len(files_before & files_after) == 3
    got = {r.id: r.v for r in snap.read_table(spark, path, v).collect()}
    assert got[5] == -1.0 and got[17] == -2.0 and len(got) == 1000


def test_table_changes_reads_only_churned_files(spark, tmp_path):
    path = str(tmp_path / "cdf")
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    snap.create_table(df.repartitionByRange(4, "id").sortWithinPartitions("id"), path)

    src = spark.createDataFrame([(3, 777), (200, 5)], "id long, bucket long")
    v2 = snap.merge_into(spark, path, src, ["id"])
    ch = snap.table_changes(spark, path, 1, v2).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, set()).add((r.id, r.bucket))
    # update = delete of the old image + insert of the new; plus the pure insert
    assert by_type["delete"] == {(3, 3)}
    assert by_type["insert"] == {(3, 777), (200, 5)}

    # a no-churn pair yields an empty feed with the right schema
    empty = snap.table_changes(spark, path, v2, v2)
    assert empty.count() == 0
    assert "_change_type" in empty.columns


def test_optimize_zorder_multi_column_pruning(spark, tmp_path):
    """Z-order gives BOTH columns file locality: after zordering on
    (x, y), a point-range delete on either column prunes files. A
    lexicographic cluster on (x, y) would only prune on x."""
    path = str(tmp_path / "z")
    n = 4096
    df = spark.range(0, n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    snap.create_table(df.repartition(8), path)
    v = snap.optimize_table(spark, path, zorder_by=("x", "y"), target_files=16)
    files = snap._read_manifest(path, v)["files"]
    assert len(files) == 16

    def touched(col, lo, hi):
        return sum(
            1
            for f in files
            if snap._stats_may_match(os.path.join(path, f), col, lo, hi)
        )

    # arrival order (random in x AND y after repartition) -> every file
    # matches everything; z-order must prune a narrow range on EITHER axis
    assert touched("x", 10, 13) < 16
    assert touched("y", 10, 13) < 16
    # content unchanged
    assert snap.read_table(spark, path, v).count() == n
    with pytest.raises(ValueError, match="mutually exclusive"):
        snap.optimize_table(spark, path, cluster_by=("x",), zorder_by=("y",))


def test_append_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "evo")
    snap.create_table(
        spark.createDataFrame([(1, "a")], "id long, name string"), path
    )
    # drifted batch without the flag: fail fast (no silent corruption)
    drifted = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    with pytest.raises(ValueError, match="merge_schema"):
        snap.append(drifted, path)
    # type change is never mergeable
    retyped = spark.createDataFrame([(3, 7)], "id long, name long")
    with pytest.raises(ValueError, match="types"):
        snap.append(retyped, path, merge_schema=True)

    v2 = snap.append(drifted, path, merge_schema=True)
    cur = snap.read_table(spark, path, v2)
    assert [f.name for f in cur.schema.fields] == ["id", "name", "score"]
    got = {r.id: (r.name, r.score) for r in cur.collect()}
    # pre-evolution rows read the new column as NULL
    assert got == {1: ("a", None), 2: ("b", 9.5)}

    # time travel shows each version's own schema
    assert [f.name for f in snap.read_table(spark, path, 1).schema.fields] == [
        "id", "name",
    ]
    # same-schema appends still work, inherit the evolved schema
    v3 = snap.append(
        spark.createDataFrame([(4, "d", 1.0)], "id long, name string, score double"),
        path,
    )
    assert snap.read_table(spark, path, v3).count() == 3
    # rollback past the evolution restores the old schema
    v4 = snap.rollback(path, 1)
    assert [f.name for f in snap.read_table(spark, path, v4).schema.fields] == [
        "id", "name",
    ]


def test_check_constraints(spark, tmp_path):
    path = str(tmp_path / "chk")
    snap.create_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"), path
    )
    # existing data must satisfy the constraint
    with pytest.raises(ValueError, match="existing rows violate"):
        snap.add_constraint(spark, path, "v_big", "v > 15")
    snap.add_constraint(spark, path, "v_pos", "v > 0")
    assert snap.table_constraints(path) == {"v_pos": "v > 0"}

    # appends validate the batch; NULL evaluations violate (Delta rule)
    with pytest.raises(ValueError, match="v_pos"):
        snap.append(spark.createDataFrame([(3, -1.0)], "id long, v double"), path)
    with pytest.raises(ValueError, match="v_pos"):
        snap.append(spark.createDataFrame([(3, None)], "id long, v double"), path)
    snap.append(spark.createDataFrame([(3, 3.0)], "id long, v double"), path)

    # merges validate the source too
    with pytest.raises(ValueError, match="v_pos"):
        snap.merge_into(
            spark, path,
            spark.createDataFrame([(1, -5.0)], "id long, v double"), ["id"],
        )
    v = snap.merge_into(
        spark, path, spark.createDataFrame([(1, 5.0)], "id long, v double"), ["id"]
    )
    # constraints survive data commits (manifest-chain inheritance)
    assert snap.table_constraints(path) == {"v_pos": "v > 0"}
    assert {r.id: r.v for r in snap.read_table(spark, path, v).collect()} == {
        1: 5.0, 2: 20.0, 3: 3.0,
    }

    snap.drop_constraint(path, "v_pos")
    assert snap.table_constraints(path) == {}
    snap.append(spark.createDataFrame([(4, -4.0)], "id long, v double"), path)
    with pytest.raises(ValueError, match="does not exist"):
        snap.drop_constraint(path, "v_pos")


def test_concurrent_appends_both_land_via_retry(spark, table):
    """Appends commute: two racing appenders must BOTH land (one wins
    the CAS, the loser re-links its already-written files onto the new
    version) — the Iceberg fast-append retry."""
    import threading

    errs = []

    def add(lo, hi):
        try:
            snap.append(
                spark.range(lo, hi).select(
                    F.col("id"), (F.col("id") % 10).alias("bucket")
                ),
                table,
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=add, args=(1000, 1050)),
        threading.Thread(target=add, args=(2000, 2080)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert snap.read_table(spark, table).count() == 100 + 50 + 80
    ops = [h["op"] for h in snap.history(table)]
    assert ops.count("append") == 2


def test_non_commuting_ops_surface_commit_conflict(spark, table):
    """Delete/merge/optimize read a snapshot their rewrite depends on, so
    a racing commit must surface as RuntimeError (no auto-retry) — the
    caller re-runs against the new state. Appends auto-retry instead
    (test_concurrent_appends_both_land_via_retry)."""
    parent = snap.current_version(table)
    # a racing writer publishes the next version between our read and commit
    racing = snap._read_manifest(table, parent)["files"]
    snap._commit(table, racing, "append", parent=parent)
    with pytest.raises(RuntimeError, match="concurrent"):
        snap._commit(table, racing, "delete", parent=parent)
    # and the public non-commuting op against the stale parent: delete
    # re-reads current_version itself, so simulate by racing mid-flight
    # is covered above at the commit layer; a fresh delete now succeeds
    v = snap.delete_where(spark, table, F.col("id") < 5)
    assert v == parent + 2


def test_table_changes_across_schema_evolution(spark, tmp_path):
    """A change feed spanning a mergeSchema evolution commit must read
    pre-evolution files with NULL new columns instead of failing on a
    schema mismatch between the added/removed sides."""
    path = str(tmp_path / "cdfevo")
    snap.create_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"), path
    )
    v2 = snap.append(
        spark.createDataFrame([(3, "c", 9.0)], "id long, name string, score double"),
        path,
        merge_schema=True,
    )
    # COW delete rewrites pre-evolution files AFTER the evolution — the
    # pinned rewrite must KEEP the evolved column for surviving rows
    v3 = snap.delete_where(spark, path, F.col("id") == 1)
    cur = {r.id: r.score for r in snap.read_table(spark, path, v3).collect()}
    assert cur == {2: None, 3: 9.0}
    ch = snap.table_changes(spark, path, 1, v3)
    got = {(r._change_type, r.id): r.score for r in ch.collect()}
    # v1->v3: row 3 arrived (score kept through the rewrite), row 1 left;
    # row 2 appears identically on both sides and cancels out
    assert got == {("insert", 3): 9.0, ("delete", 1): None}


def test_pruning_is_metadata_only_no_footer_reads(spark, tmp_path, monkeypatch):
    """Candidate selection must come from manifest stats alone: the
    legacy footer probe is patched to explode, and pq.ParquetFile is
    counted — pruning opens ZERO existing files (write-time stats
    collection on the freshly written rewrite output is the only
    allowed footer access)."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "meta_only")
    df = spark.range(0, 1000).select(F.col("id"))
    snap.create_table(df.repartitionByRange(4, "id"), path)
    existing = {os.path.join(path, f) for f in snap._read_manifest(path, 1)["files"]}

    def _boom(*a, **k):
        raise AssertionError("footer probe used despite manifest stats")

    monkeypatch.setattr(snap, "_stats_may_match", _boom)

    opened: list[str] = []
    real_pf = pq.ParquetFile

    def _counting(p, *a, **k):
        opened.append(str(p))
        return real_pf(p, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", _counting)
    snap.delete_range(spark, path, "id", 0, 49)
    # only the one candidate file is rewritten; pruning itself touched
    # no footers of pre-existing files
    assert not [p for p in opened if p in existing]
    assert snap.read_table(spark, path).count() == 950
    after = snap._read_manifest(path, 2)
    carried = set(snap._read_manifest(path, 1)["files"]) & set(after["files"])
    assert len(carried) == 3
    # every file of the new version carries manifest stats for id
    assert all("id" in after["stats"][f] for f in after["files"])


def test_merge_pruning_metadata_only(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "merge_meta")
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    snap.create_table(df.repartitionByRange(4, "id"), path)
    monkeypatch.setattr(
        snap, "_stats_may_match",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("footer probe")),
    )
    src = spark.range(0, 10).select(F.col("id"), F.lit(-1).cast("long").alias("v"))
    snap.merge_into(spark, path, src, key_cols=["id"])
    got = snap.read_table(spark, path)
    assert got.count() == 1000
    assert got.filter("v = -1").count() == 10


def test_manifest_stats_survive_date_and_string_columns(spark, tmp_path):
    """Stats encoding roundtrip for non-numeric types: date + string
    bounds prune correctly from the manifest."""
    import datetime

    path = str(tmp_path / "typed")
    df = spark.range(0, 365).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 3, "0")).alias("s"),
    )
    snap.create_table(df.repartitionByRange(4, "d"), path)
    m = snap._read_manifest(path, 1)
    assert all("d" in m["stats"][f] and "s" in m["stats"][f] for f in m["files"])
    cands = snap._candidate_files(
        path, m, "d", datetime.date(2024, 1, 1), datetime.date(2024, 1, 10)
    )
    assert 1 <= len(cands) < len(m["files"])
    v2 = snap.delete_range(
        spark, path, "d", datetime.date(2024, 1, 1), datetime.date(2024, 1, 10)
    )
    assert snap.read_table(spark, path, v2).count() == 355


def test_stream_and_merge_bootstrap_record_schema(spark, tmp_path):
    """Tables bootstrapped by append_stream / merge_into carry a manifest
    schema exactly like create_table — drift enforcement and pinned reads
    work on them."""
    # merge bootstrap
    mpath = str(tmp_path / "mb")
    src = spark.range(0, 10).select(F.col("id"), F.lit(1).cast("long").alias("v"))
    snap.merge_into(spark, mpath, src, key_cols=["id"], allow_bootstrap=True)
    assert snap._table_schema(mpath, 1) is not None
    with pytest.raises(ValueError, match="adds columns"):
        snap.append(
            spark.range(10, 12).select(
                F.col("id"), F.lit(1).cast("long").alias("v"), F.lit("x").alias("extra")
            ),
            mpath,
        )

    # stream bootstrap
    spath = str(tmp_path / "sb")
    ck = str(tmp_path / "ck")
    mem = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    stream = mem.select(F.col("value").alias("id"), F.lit(1).cast("long").alias("v"))
    snap.append_stream(stream, spath, checkpoint_dir=ck, app_id="t1")
    assert snap._table_schema(spath, snap.current_version(spath)) is not None


def test_add_constraint_null_semantics_match_enforcement(spark, tmp_path):
    """NULL-evaluating rows violate a CHECK both at add time and at
    append time — add_constraint must reject a table whose existing rows
    it would later refuse to re-append."""
    path = str(tmp_path / "nullcheck")
    df = spark.createDataFrame(
        [(1, 5.0), (2, None)], "id INT, fare DOUBLE"
    )
    snap.create_table(df, path)
    with pytest.raises(ValueError, match="existing rows violate"):
        snap.add_constraint(spark, path, "fare_pos", "fare > 0")
    # after cleaning the NULLs the constraint lands, and the NULL row is
    # rejected on append — consistent in both directions
    snap.delete_where(spark, path, F.col("fare").isNull())
    snap.add_constraint(spark, path, "fare_pos", "fare > 0")
    with pytest.raises(ValueError, match="violates CHECK"):
        snap.append(
            spark.createDataFrame([(3, None)], "id INT, fare DOUBLE"), path
        )


def test_zorder_many_columns_clamps_bits(spark, tmp_path):
    """5+ z-order columns must not overflow the 64-bit interleave (Spark
    masks shift amounts mod 64, which would silently wrap bits): the
    per-column resolution clamps so ordering stays correct."""
    path = str(tmp_path / "z5")
    df = spark.range(0, 500).select(
        F.col("id"),
        *[(F.col("id") * (i + 1) % 97).alias(f"c{i}") for i in range(5)],
    )
    snap.create_table(df, path)
    snap.optimize_table(
        spark, path, zorder_by=[f"c{i}" for i in range(5)], target_files=4
    )
    got = snap.read_table(spark, path)
    assert got.count() == 500
    assert got.select(F.sum("id")).first()[0] == 499 * 500 // 2


def test_read_table_where_opens_only_matching_files(spark, tmp_path, monkeypatch):
    """Scan planning from manifest stats: a range read of a clustered
    table reads only intersecting files (asserted via inputFiles), never
    probes footers, and equals the unplanned filter exactly; a
    pruned-to-empty range opens nothing and keeps the schema."""
    path = str(tmp_path / "scanplan")
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    snap.create_table(df.repartitionByRange(4, "id"), path)
    monkeypatch.setattr(
        snap, "_stats_may_match",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("footer probe")),
    )
    got = snap.read_table_where(spark, path, "id", 100, 120)
    assert len(got.inputFiles()) == 1
    full = snap.read_table(spark, path).filter(F.col("id").between(100, 120))
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in full.collect()
    )
    empty = snap.read_table_where(spark, path, "id", 5000, 6000)
    assert empty.count() == 0
    assert empty.columns == ["id", "v"]
    assert not empty.inputFiles()


def test_update_where_cow_with_pruning_and_constraints(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "upd")
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") * 1.0).alias("fare"))
    snap.create_table(df.repartitionByRange(4, "id"), path)
    snap.add_constraint(spark, path, "fare_nonneg", "fare >= 0")
    before = snap._read_manifest(path, snap.current_version(path))["files"]

    monkeypatch.setattr(
        snap, "_stats_may_match",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("footer probe")),
    )
    v = snap.update_where(
        spark, path,
        F.col("id").between(10, 19),
        {"fare": F.col("fare") + 1000},
        prune=("id", 10, 19),
    )
    after = snap._read_manifest(path, v)["files"]
    # one candidate file rewritten, three carried untouched
    assert len(set(before) & set(after)) == 3
    got = snap.read_table(spark, path)
    assert got.filter("fare >= 1000").count() == 10
    assert got.filter("id = 10").first().fare == 1010.0
    assert got.filter("id = 500").first().fare == 500.0  # untouched row
    assert got.count() == 1000
    # time travel unaffected
    assert snap.read_table(spark, path, version=1).filter("fare >= 1000").count() == 0

    # an UPDATE that would violate a CHECK constraint is rejected
    with pytest.raises(ValueError, match="violates CHECK"):
        snap.update_where(
            spark, path, F.col("id") < 5, {"fare": F.lit(-1.0)},
            prune=("id", 0, 4),
        )
    with pytest.raises(ValueError, match="not in the table"):
        snap.update_where(spark, path, F.col("id") < 5, {"nope": F.lit(1)})


def test_shallow_clone_zero_copy_then_diverges(spark, tmp_path):
    src = str(tmp_path / "clone_src")
    dst = str(tmp_path / "clone_dst")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("k"), (F.col("id") * 2.0).alias("v")
    )
    snap.create_table(df.repartitionByRange(4, "id"), src)
    snap.shallow_clone(src, dst)

    # zero-copy: the clone's own data dir holds nothing yet
    assert not any(
        n.endswith(".parquet")
        for _r, _d, ns in __import__("os").walk(str(tmp_path / "clone_dst" / "data"))
        for n in ns
    )
    a = sorted(tuple(r) for r in snap.read_table(spark, src).collect())
    b = sorted(tuple(r) for r in snap.read_table(spark, dst).collect())
    assert a == b

    # manifest stats carried over: range read on the clone prunes files
    pruned = snap.read_table_where(spark, dst, "id", 10, 20)
    assert pruned.count() == 11

    # clone diverges via COW delete; the source never changes
    snap.delete_range(spark, dst, "id", 0, 49)
    assert snap.read_table(spark, dst).count() == 50
    assert snap.read_table(spark, src).count() == 100

    # appends land in the clone's own dir; source still untouched
    snap.append(
        spark.createDataFrame([(1000, 0, 1.0)], "id long, k long, v double"), dst
    )
    assert snap.read_table(spark, dst).count() == 51
    assert snap.read_table(spark, src).count() == 100

    # vacuum on the clone never deletes source-owned files
    removed = snap.vacuum_orphans(dst, min_age_seconds=0.0)
    assert removed == []
    assert snap.read_table(spark, src).count() == 100


def test_shallow_clone_carries_constraints(spark, tmp_path):
    src = str(tmp_path / "ccs")
    dst = str(tmp_path / "ccd")
    snap.create_table(
        spark.createDataFrame([(1, 5.0)], "id long, v double"), src
    )
    snap.add_constraint(spark, src, "v_pos", "v > 0")
    snap.shallow_clone(src, dst)
    assert "v_pos" in snap.table_constraints(dst)
    import pytest as _pt

    with _pt.raises(ValueError, match="v_pos"):
        snap.append(
            spark.createDataFrame([(2, -1.0)], "id long, v double"), dst
        )


def test_audited_append_write_audit_publish(spark, tmp_path):
    path = str(tmp_path / "wap")
    snap.create_table(
        spark.createDataFrame([(1, 5.0)], "id long, v double"), path
    )
    exp = {"v_nonpositive": F.col("v") <= 0}

    # clean batch: commits, counts returned
    v, counts = snap.audited_append(
        spark.createDataFrame([(2, 7.0), (3, 1.0)], "id long, v double"),
        path,
        exp,
    )
    assert v == 2 and counts == {"v_nonpositive": 0, "_rows_observed": 2}
    assert snap.read_table(spark, path).count() == 3

    # dirty batch: files staged but the manifest is NEVER advanced
    import pytest as _pt

    with _pt.raises(snap.AuditFailed, match="v_nonpositive"):
        snap.audited_append(
            spark.createDataFrame(
                [(4, -1.0), (5, 2.0)], "id long, v double"
            ),
            path,
            exp,
        )
    assert snap.current_version(path) == 2
    assert snap.read_table(spark, path).count() == 3  # readers never saw it

    # the staged orphans are reclaimable
    removed = snap.vacuum_orphans(path, min_age_seconds=0.0)
    assert len(removed) >= 1
    assert snap.read_table(spark, path).count() == 3


# ---------------------------------------------------------------------------
# Deletion vectors (merge-on-read DELETE)
# ---------------------------------------------------------------------------


def test_mor_delete_keeps_files_and_time_travels(spark, table):
    files_v1 = snap._read_manifest(table, 1)["files"]
    v2 = snap.delete_where_mor(spark, table, F.col("id") < 10)
    assert v2 == 2
    m2 = snap._read_manifest(table, 2)
    # merge-on-read: NO data file churn, only tombstones
    assert m2["files"] == files_v1
    assert m2["dv"]
    assert snap.read_table(spark, table).count() == 90
    assert snap.read_table(spark, table).filter("id < 10").count() == 0
    # readers pinned before the delete still see every row
    assert snap.read_table(spark, table, version=1).count() == 100


def test_mor_delete_never_duplicates_tombstones(spark, table):
    snap.delete_where_mor(spark, table, F.col("id") < 10)
    v3 = snap.delete_where_mor(spark, table, F.col("id") < 20)
    dv = snap._read_dv(spark, table, snap._read_manifest(table, v3))
    # the overlapping second delete only tombstones the 10 still-live rows
    assert dv.count() == 20
    assert dv.distinct().count() == 20
    assert snap.read_table(spark, table).count() == 80


def test_mor_delete_with_stats_pruning_metadata_only(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "mor_pruned")
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    snap.create_table(df.repartitionByRange(4, "id"), path)

    import pyarrow.parquet as pq

    calls = {"n": 0}
    real = pq.ParquetFile

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pq, "ParquetFile", counting)
    snap.delete_where_mor(
        spark, path, F.col("id").between(0, 24), prune=("id", 0, 24)
    )
    assert calls["n"] == 0  # candidates from manifest stats, no footers
    assert snap.read_table(spark, path).count() == 75


def test_cow_rewrite_after_mor_never_resurrects(spark, table):
    snap.delete_where_mor(spark, table, F.col("id") < 10)
    # COW ops read candidates through the pinned+DV-filtered path
    snap.delete_where(spark, table, F.col("bucket") == 5)
    got = snap.read_table(spark, table)
    assert got.filter("id < 10").count() == 0
    assert got.filter("bucket = 5").count() == 0
    assert got.count() == 100 - 10 - 9  # ids 15,25,...,95

    snap.update_where(
        spark, table, F.col("id") >= 90, {"bucket": F.lit(77).cast("long")}
    )
    got = snap.read_table(spark, table)
    assert got.filter("id < 10").count() == 0
    # ids 90-99 minus 95 (already COW-deleted with bucket 5)
    assert got.filter("bucket = 77").count() == 9


def test_mor_cdf_emits_deletes_and_nets_out_inside_span(spark, table):
    v2 = snap.delete_where_mor(spark, table, F.col("id") < 5)
    ch = snap.table_changes(spark, table, 1, v2)
    rows = sorted((r._change_type, r.id) for r in ch.collect())
    assert rows == [("delete", i) for i in range(5)]

    # append rows then MOR-delete them inside one span: they never
    # existed for the feed; the surviving append shows as insert
    snap.append(
        spark.range(1000, 1004).select(
            F.col("id"), F.lit(0).cast("long").alias("bucket")
        ),
        table,
    )
    v4 = snap.delete_where_mor(spark, table, F.col("id").isin(1000, 1001))
    ch = snap.table_changes(spark, table, v2, v4)
    rows = sorted((r._change_type, r.id) for r in ch.collect())
    assert rows == [("insert", 1002), ("insert", 1003)]


def test_mor_cdf_no_churn_is_empty_feed(spark, table):
    v2 = snap.delete_where_mor(spark, table, F.col("id") < 5)
    ch = snap.table_changes(spark, table, v2, v2)
    assert ch.count() == 0
    assert "_change_type" in ch.columns


def test_materialize_dvs_rewrites_only_tombstoned_files(spark, tmp_path):
    path = str(tmp_path / "mor_mat")
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    snap.create_table(df.repartitionByRange(4, "id"), path)
    snap.delete_where_mor(
        spark, path, F.col("id").between(0, 24), prune=("id", 0, 24)
    )
    files_before = set(snap._read_manifest(path, 2)["files"])
    v3 = snap.materialize_dvs(spark, path)
    m3 = snap._read_manifest(path, v3)
    assert m3["dv"] == []
    kept = files_before & set(m3["files"])
    # the 3 untombstoned range files carry over untouched
    assert len(kept) == 3
    assert snap.read_table(spark, path).count() == 75
    # spent tombstones: a fresh read opens no DV side at all
    assert snap.read_table(spark, path).filter("id < 25").count() == 0
    # idempotent on a clean table
    assert snap.materialize_dvs(spark, path) == v3


def test_mor_read_table_where_applies_dvs(spark, tmp_path):
    path = str(tmp_path / "mor_rtw")
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    snap.create_table(df.repartitionByRange(4, "id"), path)
    snap.delete_where_mor(spark, path, F.col("id") == 30)
    got = snap.read_table_where(spark, path, "id", 25, 49)
    assert got.count() == 24
    assert got.filter("id = 30").count() == 0


def test_shallow_clone_carries_deletion_vectors(spark, tmp_path):
    src = str(tmp_path / "mor_clone_src")
    dst = str(tmp_path / "mor_clone_dst")
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    snap.create_table(df.repartition(4), src)
    snap.delete_where_mor(spark, src, F.col("id") < 10)
    snap.shallow_clone(src, dst)
    assert snap.read_table(spark, dst).count() == 90
    assert snap.read_table(spark, dst).filter("id < 10").count() == 0
    # clone-side materialization writes into the clone, source untouched
    snap.materialize_dvs(spark, dst)
    assert snap.read_table(spark, dst).count() == 90
    assert snap.read_table(spark, src).count() == 90
    assert snap._read_manifest(src, snap.current_version(src))["dv"]


def test_vacuum_and_expire_manage_dv_files(spark, table):
    snap.delete_where_mor(spark, table, F.col("id") < 10)
    # referenced dv files survive an aggressive vacuum
    assert snap.vacuum_orphans(table, min_age_seconds=0.0) == []
    assert snap.read_table(spark, table).count() == 90

    # orphaned dv batch (simulated crashed writer) is swept
    import pyspark.sql.functions as SF

    orphan = snap._write_dv_files(
        spark.createDataFrame([("zz/zz.parquet", 0)], "file string, pos long"),
        table,
    )
    assert orphan
    removed = snap.vacuum_orphans(table, min_age_seconds=0.0)
    assert sorted(removed) == sorted(orphan)

    # materialize then expire old versions: spent dv files are reclaimed
    snap.materialize_dvs(spark, table)
    dv_files = snap._read_manifest(table, 2)["dv"]
    assert dv_files
    snap.expire_snapshots(table, keep_last=1)
    assert not any(os.path.exists(os.path.join(table, f)) for f in dv_files)
    assert snap.read_table(spark, table).count() == 90


def test_merge_into_on_mor_table_does_not_resurrect(spark, tmp_path):
    path = str(tmp_path / "mor_merge")
    df = spark.range(0, 50).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    snap.create_table(df.repartition(2), path)
    snap.delete_where_mor(spark, path, F.col("id") < 5)
    src = spark.createDataFrame(
        [(3, 99), (60, 99)], "id long, bucket long"
    )
    snap.merge_into(spark, path, src, key_cols=["id"])
    got = snap.read_table(spark, path)
    # id=3 was MOR-deleted -> the merge sees no match and INSERTS it anew
    assert got.filter("id = 3").count() == 1
    assert [r.bucket for r in got.filter("id = 3").collect()] == [99]
    assert got.filter("id < 3").count() == 0
    assert got.count() == 45 + 2


def test_compact_small_files_rewrites_only_small(spark, tmp_path):
    path = str(tmp_path / "compact")
    # one "big" well-formed file + many small append files
    snap.create_table(
        spark.range(0, 5000).select(
            F.col("id"), (F.col("id") % 7).alias("bucket")
        ).coalesce(1),
        path,
    )
    big = set(snap._read_manifest(path, 1)["files"])
    for i in range(4):
        snap.append(
            spark.range(10000 + i * 10, 10010 + i * 10)
            .select(F.col("id"), F.lit(0).cast("long").alias("bucket"))
            .repartition(2),
            path,
        )
    before = snap._read_manifest(path, snap.current_version(path))
    assert len(before["files"]) == 1 + 8
    # sizes rode the manifest — planning must not stat the filesystem
    assert all("::bytes" in before["stats"][f] for f in before["files"])

    # threshold between the small append files and the big base file
    big_size = before["stats"][next(iter(big))]["::bytes"][0]
    v = snap.compact_small_files(spark, path, target_bytes=big_size - 1)
    m = snap._read_manifest(path, v)
    assert big <= set(m["files"])  # the big file was NOT rewritten
    assert len(m["files"]) < len(before["files"])
    assert snap.read_table(spark, path).count() == 5040
    # idempotent once compacted past the threshold
    assert snap.compact_small_files(spark, path, target_bytes=1) == v


def test_compact_respects_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "compact_dv")
    snap.create_table(
        spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 10).alias("bucket")
        ).repartition(4),
        path,
    )
    snap.delete_where_mor(spark, path, F.col("id") < 10)
    v = snap.compact_small_files(spark, path, target_bytes=10**9)
    assert snap.read_table(spark, path).count() == 90
    assert snap.read_table(spark, path).filter("id < 10").count() == 0
    assert snap.current_version(path) == v


def test_merge_into_mor_upsert_without_rewrites(spark, tmp_path):
    path = str(tmp_path / "mor_upsert")
    snap.create_table(
        spark.range(0, 50).select(
            F.col("id"), (F.col("id") % 10).alias("bucket")
        ).repartition(2),
        path,
    )
    files_v1 = set(snap._read_manifest(path, 1)["files"])
    src = spark.createDataFrame(
        [(3, 99), (7, 98), (60, 97)], "id long, bucket long"
    )
    v2 = snap.merge_into_mor(spark, path, src, key_cols=["id"])
    m2 = snap._read_manifest(path, v2)
    # merge-on-read: every original file still referenced, none rewritten
    assert files_v1 <= set(m2["files"])
    assert m2["dv"]
    got = snap.read_table(spark, path)
    assert got.count() == 51
    assert {r.bucket for r in got.filter("id in (3, 7, 60)").collect()} == {
        99, 98, 97
    }
    # old images are gone
    assert got.filter("id = 3 and bucket <> 99").count() == 0

    # CDF of the MOR merge: matched old images out, source rows in
    ch = snap.table_changes(spark, path, 1, v2)
    rows = sorted((r._change_type, r.id, r.bucket) for r in ch.collect())
    assert rows == [
        ("delete", 3, 3), ("delete", 7, 7),
        ("insert", 3, 99), ("insert", 7, 98), ("insert", 60, 97),
    ]


def test_merge_into_mor_delete_mode_and_validation(spark, tmp_path):
    import pytest

    path = str(tmp_path / "mor_retract")
    snap.create_table(
        spark.range(0, 30).select(
            F.col("id"), (F.col("id") % 3).alias("bucket")
        ).repartition(2),
        path,
    )
    dels = spark.createDataFrame([(5,), (6,), (999,)], "id long")
    v2 = snap.merge_into_mor(
        spark, path, dels, key_cols=["id"], when_matched="delete"
    )
    assert snap.read_table(spark, path).count() == 28
    assert snap._read_manifest(path, v2)["files"] == snap._read_manifest(path, 1)["files"]

    with pytest.raises(ValueError, match="duplicate keys"):
        snap.merge_into_mor(
            spark,
            path,
            spark.createDataFrame([(1, 0), (1, 1)], "id long, bucket long"),
            key_cols=["id"],
        )
    with pytest.raises(ValueError, match="exact table columns"):
        snap.merge_into_mor(
            spark,
            path,
            spark.createDataFrame([(1, 0, 0)], "id long, bucket long, extra long"),
            key_cols=["id"],
        )


def test_snapshot_cdf_streams_mor_merge_commits(spark, tmp_path):
    from lakehouse_platform_nyc_taxi_spark.sources.python_datasource import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    path = str(tmp_path / "mor_merge_stream")
    snap.create_table(
        spark.range(0, 10).select(
            F.col("id"), (F.col("id") % 2).alias("bucket")
        ).coalesce(1),
        path,
    )
    src = spark.createDataFrame([(1, 50), (20, 51)], "id long, bucket long")
    snap.merge_into_mor(spark, path, src, key_cols=["id"])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.read.parquet(out)
    # a MOR merge removes no files, so it streams without skipChangeCommits:
    # the old image as a delete, the upserted rows as inserts
    assert r.filter("_change_type = 'delete'").count() == 1
    assert r.filter("_change_type = 'insert' and _commit_version = 2").count() == 2


def test_update_where_mor_tombstones_and_appends_images(spark, tmp_path):
    import pytest

    path = str(tmp_path / "mor_update")
    snap.create_table(
        spark.range(0, 40).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ).repartitionByRange(4, "id"),
        path,
    )
    files_v1 = set(snap._read_manifest(path, 1)["files"])
    v2 = snap.update_where_mor(
        spark,
        path,
        F.col("id").between(10, 19),
        {"bucket": F.col("bucket") + 100},
        prune=("id", 10, 19),
    )
    m2 = snap._read_manifest(path, v2)
    assert files_v1 <= set(m2["files"])  # nothing rewritten
    assert m2["dv"]
    got = snap.read_table(spark, path)
    assert got.count() == 40
    assert got.filter("id between 10 and 19 and bucket < 100").count() == 0
    assert got.filter("bucket >= 100").count() == 10
    # untouched rows keep their images exactly once
    assert got.filter("id = 5").count() == 1

    with pytest.raises(ValueError, match="not in the table"):
        snap.update_where_mor(
            spark, path, F.col("id") < 0, {"nope": F.lit(1)}
        )

    # CDF: old images out, new images in
    ch = snap.table_changes(spark, path, 1, v2)
    assert ch.filter("_change_type = 'delete'").count() == 10
    assert ch.filter("_change_type = 'insert' and bucket >= 100").count() == 10


def test_concurrent_mor_deletes_both_land_via_recompute_retry(spark, table):
    """MOR DML commutes under full-recompute retry: two racing MOR
    deletes must BOTH land (the loser recomputes its tombstones against
    the winner's head, so overlapping predicates never double-delete or
    drop rows)."""
    import threading

    errs = []

    def kill(pred):
        try:
            snap.delete_where_mor(spark, table, pred)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=kill, args=(F.col("id") < 15,)),
        threading.Thread(target=kill, args=(F.col("id").between(10, 29),)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = snap.read_table(spark, table)
    assert got.count() == 70
    assert got.filter("id < 30").count() == 0
    ops = [h["op"] for h in snap.history(table)]
    assert ops.count("delete_mor") == 2
    # overlap rows (10-14) tombstoned exactly once
    dv = snap._read_dv(
        spark, table, snap._read_manifest(table, snap.current_version(table))
    )
    assert dv.count() == dv.distinct().count() == 30


# ---------------------------------------------------------------------------
# Column mapping: zero-rewrite RENAME / DROP COLUMN
# ---------------------------------------------------------------------------


def test_rename_column_zero_rewrite_and_time_travel(spark, table):
    files_v1 = snap._read_manifest(table, 1)["files"]
    v2 = snap.rename_column(table, "bucket", "shard")
    m2 = snap._read_manifest(table, v2)
    assert m2["files"] == files_v1  # manifest-only commit
    got = snap.read_table(spark, table)
    assert got.columns == ["id", "shard"]
    assert got.filter("shard = 3").count() == 10
    # time travel still speaks the old name
    old = snap.read_table(spark, table, version=1)
    assert old.columns == ["id", "bucket"]
    # double rename chains
    snap.rename_column(table, "shard", "cell")
    assert snap.read_table(spark, table).columns == ["id", "cell"]
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        snap.rename_column(table, "id", "cell")
    with pytest.raises(ValueError, match="no column"):
        snap.rename_column(table, "bucket", "x")


def test_dml_speaks_logical_names_after_rename(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "renamed_dml")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    snap.create_table(df.repartitionByRange(4, "id"), path)
    snap.rename_column(path, "id", "row_id")

    import pyarrow.parquet as pq

    existing = {
        os.path.join(path, f)
        for f in snap._read_manifest(path, snap.current_version(path))["files"]
    }
    opened = []
    real = pq.ParquetFile

    def counting(pth, *a, **k):
        opened.append(str(pth))
        return real(pth, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", counting)
    # stats pruning translates the logical prune column to physical:
    # no PRE-EXISTING file's footer is opened (write-time stats on the
    # rewrite output are the only allowed access)
    snap.delete_range(spark, path, "row_id", 0, 24)
    assert not [p for p in opened if p in existing]
    got = snap.read_table(spark, path)
    assert got.columns == ["row_id", "bucket"]
    assert got.count() == 75

    snap.update_where(
        spark, path, F.col("row_id") >= 90, {"bucket": F.lit(77).cast("long")}
    )
    assert snap.read_table(spark, path).filter("bucket = 77").count() == 10

    snap.delete_where_mor(spark, path, F.col("row_id") == 50)
    assert snap.read_table(spark, path).count() == 74

    src = spark.createDataFrame([(30, 99), (500, 99)], "row_id long, bucket long")
    snap.merge_into_mor(spark, path, src, key_cols=["row_id"])
    got = snap.read_table(spark, path)
    assert got.filter("row_id = 30 and bucket = 99").count() == 1
    assert got.count() == 75

    # scan-planned read under the logical name
    pruned = snap.read_table_where(spark, path, "row_id", 25, 30)
    assert pruned.count() == 6


def test_append_after_rename_and_evolution_guard(spark, tmp_path):
    import pytest

    path = str(tmp_path / "renamed_append")
    snap.create_table(
        spark.range(0, 20).select(F.col("id"), (F.col("id") % 2).alias("b")),
        path,
    )
    snap.rename_column(path, "b", "flag")
    snap.append(
        spark.createDataFrame([(100, 1)], "id long, flag long"), path
    )
    got = snap.read_table(spark, path)
    assert got.count() == 21
    assert got.filter("id = 100 and flag = 1").count() == 1
    # physical files all share the original physical name
    with pytest.raises(ValueError, match="type|adds columns"):
        snap.append(spark.createDataFrame([(1, 1)], "id long, b long"), path)
    with pytest.raises(ValueError, match="column-mapped"):
        snap.append(
            spark.createDataFrame([(2, 1, 5)], "id long, flag long, extra long"),
            path,
            merge_schema=True,
        )


def test_drop_column_zero_rewrite(spark, table):
    import pytest

    v2 = snap.drop_column(table, "bucket")
    got = snap.read_table(spark, table)
    assert got.columns == ["id"]
    assert got.count() == 100
    assert snap.read_table(spark, table, version=1).columns == ["id", "bucket"]
    assert snap._read_manifest(table, v2)["files"] == snap._read_manifest(table, 1)["files"]
    # appends now carry only the surviving logical columns
    snap.append(spark.range(1000, 1003).select("id"), table)
    assert snap.read_table(spark, table).count() == 103
    with pytest.raises(ValueError, match="only column"):
        snap.drop_column(table, "id")


def test_rename_blocked_by_referencing_constraint(spark, tmp_path):
    import pytest

    path = str(tmp_path / "renamed_constraint")
    snap.create_table(
        spark.range(0, 10).select(F.col("id"), (F.col("id") % 2).alias("b")),
        path,
    )
    snap.add_constraint(spark, path, "b_valid", "b >= 0")
    with pytest.raises(ValueError, match="referenced by CHECK constraint"):
        snap.rename_column(path, "b", "flag")
    with pytest.raises(ValueError, match="referenced by CHECK constraint"):
        snap.drop_column(path, "b")
    snap.drop_constraint(path, "b_valid")
    snap.rename_column(path, "b", "flag")
    assert snap.read_table(spark, path).columns == ["id", "flag"]


def test_cdf_and_clone_speak_logical_names(spark, tmp_path):
    path = str(tmp_path / "renamed_cdf")
    snap.create_table(
        spark.range(0, 20).select(F.col("id"), (F.col("id") % 2).alias("b")),
        path,
    )
    v_rename = snap.rename_column(path, "b", "flag")
    snap.delete_where_mor(spark, path, F.col("id") < 3)
    ch = snap.table_changes(spark, path, v_rename, snap.current_version(path))
    assert set(ch.columns) == {"id", "flag", "_change_type"}
    assert ch.filter("_change_type = 'delete'").count() == 3

    dst = str(tmp_path / "renamed_clone")
    snap.shallow_clone(path, dst)
    assert snap.read_table(spark, dst).columns == ["id", "flag"]
    assert snap.read_table(spark, dst).count() == 17


def test_rollback_past_mor_delete_restores_hidden_rows(spark, table):
    """Rolling back past a MOR delete must clear the head's deletion
    vectors — the restored version owns the rows the DVs hide."""
    snap.delete_where_mor(spark, table, F.col("id") < 30)
    assert snap.read_table(spark, table).count() == 70
    v3 = snap.rollback(table, 1)
    m3 = snap._read_manifest(table, v3)
    assert not (m3.get("dv") or [])
    assert snap.read_table(spark, table).count() == 100
    # and rolling FORWARD to the MOR version re-applies its own DVs
    v4 = snap.rollback(table, 2)
    assert snap.read_table(spark, table).count() == 70
    assert snap._read_manifest(table, v4).get("dv")


def test_rollback_past_rename_restores_old_column_view(spark, table):
    snap.rename_column(table, "bucket", "shard")
    assert snap.read_table(spark, table).columns == ["id", "shard"]
    v3 = snap.rollback(table, 1)
    assert snap.read_table(spark, table).columns == ["id", "bucket"]
    # mapping cleared, not inherited: a fresh append then reads old names
    snap.append(
        spark.range(100, 110).select(
            F.col("id"), F.lit(1).cast("long").alias("bucket")
        ),
        table,
    )
    got = snap.read_table(spark, table)
    assert got.columns == ["id", "bucket"]
    assert got.count() == 110
    assert v3 == 3


def test_rollback_past_drop_column_restores_it(spark, table):
    snap.drop_column(table, "bucket")
    assert snap.read_table(spark, table).columns == ["id"]
    snap.rollback(table, 1)
    got = snap.read_table(spark, table)
    assert got.columns == ["id", "bucket"]
    assert got.filter("bucket = 3").count() == 10


def test_read_table_where_pruned_empty_uses_logical_names(spark, table):
    """The pruned-to-empty branch must speak the column-mapped LOGICAL
    schema, same as the non-empty path (renames/drops included)."""
    snap.rename_column(table, "bucket", "shard")
    empty = snap.read_table_where(spark, table, "id", 10_000, 20_000)
    assert empty.count() == 0
    assert empty.columns == ["id", "shard"]
    # unions with the non-empty path's frame without schema conflict
    nonempty = snap.read_table_where(spark, table, "id", 0, 4)
    assert empty.unionByName(nonempty).count() == 5
    snap.drop_column(table, "shard")
    empty2 = snap.read_table_where(spark, table, "id", 10_000, 20_000)
    assert empty2.columns == ["id"]


def test_snapshot_cdf_streams_evolved_table_full_history(spark, tmp_path):
    """Streaming full history (startingVersion=0) of a schema-evolved
    table: files written BEFORE the merge_schema evolution lack the new
    column and must null-fill, not raise in pyarrow."""
    from lakehouse_platform_nyc_taxi_spark.sources.python_datasource import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    path = str(tmp_path / "evolved_stream")
    snap.create_table(
        spark.range(0, 5).select(F.col("id")).coalesce(1), path
    )
    snap.append(
        spark.range(5, 8).select(
            F.col("id"), F.lit("x").alias("tag")
        ).coalesce(1),
        path,
        merge_schema=True,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.read.parquet(out)
    assert r.count() == 8
    # pre-evolution rows null-fill the evolved column
    assert r.filter("_commit_version = 1 and tag is null").count() == 5
    assert r.filter("_commit_version = 2 and tag = 'x'").count() == 3


def test_optimize_hilbert_multi_column_pruning(spark, tmp_path):
    """curve='hilbert' must give the same both-columns file locality as
    Morton (and reject non-2-D column lists)."""
    path = str(tmp_path / "hil")
    n = 4096
    df = spark.range(0, n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    snap.create_table(df.repartition(8), path)
    v = snap.optimize_table(
        spark, path, zorder_by=("x", "y"), target_files=16, curve="hilbert"
    )
    files = snap._read_manifest(path, v)["files"]
    assert len(files) == 16

    def touched(col, lo, hi):
        return sum(
            1
            for f in files
            if snap._stats_may_match(os.path.join(path, f), col, lo, hi)
        )

    assert touched("x", 10, 13) < 16
    assert touched("y", 10, 13) < 16
    assert snap.read_table(spark, path, v).count() == n
    with pytest.raises(ValueError, match="exactly two"):
        snap.optimize_table(spark, path, zorder_by=("x",), curve="hilbert")
    with pytest.raises(ValueError, match="unknown curve"):
        snap.optimize_table(spark, path, zorder_by=("x", "y"), curve="peano")
