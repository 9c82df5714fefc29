"""Incremental materialized-view maintenance over snapshot tables:
refresh equals recompute, reads only churned files, idempotent no-op."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.sources import matview as mv
from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap


def _expected(spark, base):
    return {
        r.bucket: (r.n_rows, r.sum_v)
        for r in snap.read_table(spark, base)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }


def _got(spark, view):
    return {
        r.bucket: (r.n_rows, r.sum_v) for r in mv.read_mv(spark, view).collect()
    }


def test_mv_refresh_tracks_base_changes(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "mv")
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), (F.col("id") * 1.0).alias("v")
    )
    snap.create_table(df.repartitionByRange(4, "id"), base)
    mv.create_grouped_mv(spark, base, view, ["bucket"], ["v"])
    assert _got(spark, view) == _expected(spark, base)

    # refresh with no base change: no-op, no new version
    v = snap.current_version(view)
    assert mv.refresh_mv(spark, base, view) == (1, 1)
    assert snap.current_version(view) == v

    # append + COW delete + merge, then one refresh folds all of it
    snap.append(
        spark.range(200, 260).select(
            F.col("id"), (F.col("id") % 7).alias("bucket"), (F.col("id") * 1.0).alias("v")
        ),
        base,
    )
    snap.delete_range(spark, base, "id", 0, 24)
    src = spark.createDataFrame([(30, 3, 999.0), (500, 3, 1.0)], "id long, bucket long, v double")
    snap.merge_into(spark, base, src, ["id"])
    before, after = mv.refresh_mv(spark, base, view)
    assert before == 1 and after == snap.current_version(base)
    assert _got(spark, view) == _expected(spark, base)

    # idempotent: rerun is a no-op at the new base version
    assert mv.refresh_mv(spark, base, view) == (after, after)
    assert _got(spark, view) == _expected(spark, base)


def test_mv_refresh_drops_emptied_groups_and_prunes_files(spark, tmp_path):
    base = str(tmp_path / "b2")
    view = str(tmp_path / "m2")
    # bucket == id: group 5 will be fully deleted
    df = spark.range(0, 100).select(
        F.col("id"), F.col("id").alias("bucket"), F.lit(1.0).alias("v")
    )
    snap.create_table(df.repartitionByRange(4, "id"), base)
    mv.create_grouped_mv(spark, base, view, ["bucket"], ["v"])
    # cluster the view so refresh can prune its files by bucket range
    snap.optimize_table(spark, view, cluster_by=("bucket",), target_files=4)
    files_before = set(snap._read_manifest(view, snap.current_version(view))["files"])

    snap.delete_range(spark, base, "id", 5, 5)
    mv.refresh_mv(spark, base, view)
    got = _got(spark, view)
    assert 5 not in got and len(got) == 99

    # narrow delta -> most clustered view files carried untouched
    files_after = set(
        snap._read_manifest(view, snap.current_version(view))["files"]
    )
    assert len(files_before & files_after) >= 3


@pytest.mark.slow
def test_streaming_cdc_into_mv_pipeline(spark, tmp_path):
    """The full continuous pipeline: stream -> CDC merge into a snapshot
    table -> incremental MV refresh from its change feed. The view ends
    equal to a fresh recompute after every drain."""
    from lakehouse_platform_nyc_taxi_spark.streaming.sinks import (
        stream_merge_snapshot,
    )

    src = str(tmp_path / "src")
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ck")
    schema = "id long, bucket long, v double"

    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], schema
    ).coalesce(1).write.parquet(src)
    stream_merge_snapshot(
        spark.readStream.schema(schema).parquet(src), base, ckpt, ["id"]
    )
    mv.create_grouped_mv(spark, base, view, ["bucket"], ["v"])
    assert _got_bv(spark, view) == _expected_bv(spark, base)

    # second micro-batch: updates + inserts, then refresh
    spark.createDataFrame(
        [(5, 2, 500.0), (100, 0, 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream_merge_snapshot(
        spark.readStream.schema(schema).parquet(src), base, ckpt, ["id"]
    )
    mv.refresh_mv(spark, base, view)
    assert _got_bv(spark, view) == _expected_bv(spark, base)


def _expected_bv(spark, base):
    return {
        r.bucket: (r.n_rows, round(r.sum_v, 6))
        for r in snap.read_table(spark, base)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }


def _got_bv(spark, view):
    return {
        r.bucket: (r.n_rows, round(r.sum_v, 6))
        for r in mv.read_mv(spark, view).collect()
    }


def test_mv_new_group_refresh_keeps_column_types(spark, tmp_path):
    """A refresh whose delta hits ONLY new groups (no candidate files)
    must write sum columns in the view's own type (e.g. bigint for an
    integer base column), not a hardcoded double — otherwise the view's
    parquet files diverge in type and the mixed read errors/coerces."""
    base = str(tmp_path / "base")
    view = str(tmp_path / "mv")
    df = spark.range(0, 100).select(
        (F.col("id") % 4).alias("bucket"), F.col("id").alias("v")
    )
    snap.create_table(df.repartitionByRange(2, "bucket"), base)
    mv.create_grouped_mv(spark, base, view, group_cols=["bucket"], sum_cols=["v"])
    created_type = dict(mv.read_mv(spark, view).dtypes)
    assert created_type["sum_v"] == "bigint"

    # append rows in entirely NEW groups far outside existing bucket range
    snap.append(
        spark.range(100, 120).select(
            (F.col("id") % 4 + 1000).alias("bucket"), F.col("id").alias("v")
        ),
        base,
    )
    mv.refresh_mv(spark, base, view)
    got = mv.read_mv(spark, view)
    assert dict(got.dtypes)["sum_v"] == "bigint"
    assert dict(got.dtypes)["n_rows"] == "bigint"
    assert _got(spark, view) == _expected(spark, base)
    # the view carries a manifest schema, so reads are pinned
    assert snap._table_schema(view, snap.current_version(view)) is not None


def test_mv_hll_sketches_refresh_equals_recompute(spark, tmp_path):
    """HLL approx-distinct sketches: insert-only refreshes fold by
    sketch union; delete-tainted groups recompute from the base — in
    both cases the stored sketch must be bit-equivalent in ESTIMATE to a
    from-scratch sketch over the same rows (HLL registers are max-merged
    from value hashes, so identical multisets give identical sketches
    regardless of fold order)."""
    base = str(tmp_path / "base_hll")
    view = str(tmp_path / "mv_hll")
    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 5).alias("bucket"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 37).cast("string").alias("u"),
    )
    snap.create_table(df.repartitionByRange(4, "id"), base)
    mv.create_grouped_mv(
        spark, base, view, ["bucket"], ["v"], approx_distinct_cols=["u"]
    )

    def expected_estimates():
        return {
            r.bucket: r.nd
            for r in snap.read_table(spark, base)
            .groupBy("bucket")
            .agg(
                F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("nd")
            )
            .collect()
        }

    def got_estimates():
        return {
            r.bucket: r.approx_distinct_u
            for r in mv.read_mv_estimates(spark, view).collect()
        }

    assert got_estimates() == expected_estimates()

    # insert-only churn: pure union fold, no base recompute needed
    snap.append(
        spark.range(300, 400).select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            (F.col("id") * 1.0).alias("v"),
            (F.col("id") % 53).cast("string").alias("u"),
        ),
        base,
    )
    mv.refresh_mv(spark, base, view)
    assert got_estimates() == expected_estimates()

    # deletes taint two buckets -> those recompute, others keep sketches
    snap.delete_range(spark, base, "id", 0, 61)
    mv.refresh_mv(spark, base, view)
    assert got_estimates() == expected_estimates()

    # counts/sums stay correct alongside the sketches
    want = {
        r.bucket: (r.n_rows, r.sum_v)
        for r in snap.read_table(spark, base)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }
    got = {
        r.bucket: (r.n_rows, r.sum_v)
        for r in mv.read_mv(spark, view).collect()
    }
    assert got == want


def test_mv_refresh_folds_mor_dml(spark, tmp_path):
    """The change feed now carries MOR commits (deletion vectors); the
    signed-delta fold must stay equal to a full recompute across a MOR
    delete, a MOR update, and a MOR merge — none of which rewrite any
    base data file."""
    base = str(tmp_path / "mor_base")
    view = str(tmp_path / "mor_mv")
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), (F.col("id") * 1.0).alias("v")
    )
    snap.create_table(df.repartitionByRange(4, "id"), base)
    mv.create_grouped_mv(spark, base, view, ["bucket"], ["v"])

    snap.delete_where_mor(spark, base, F.col("id") < 30)
    before, after = mv.refresh_mv(spark, base, view)
    assert after == snap.current_version(base)
    assert _got(spark, view) == _expected(spark, base)

    snap.update_where_mor(
        spark, base, F.col("id").between(100, 120), {"v": F.col("v") + 1000.0}
    )
    src = spark.createDataFrame(
        [(150, 0, -5.0), (900, 0, 2.0)], "id long, bucket long, v double"
    )
    snap.merge_into_mor(spark, base, src, key_cols=["id"])
    mv.refresh_mv(spark, base, view)
    assert _got(spark, view) == _expected(spark, base)

    # compaction of the vectors must be invisible to the view
    snap.materialize_dvs(spark, base)
    mv.refresh_mv(spark, base, view)
    assert _got(spark, view) == _expected(spark, base)
