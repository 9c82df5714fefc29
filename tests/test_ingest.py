"""Ingest entry point: idempotency matrix, 404-as-skip, audit columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.fixtures import generate_raw_tables
from lakehouse_platform_nyc_taxi_spark.sources.ingest import (
    MonthSpec,
    ingest_bulk,
    ingest_month,
)


def _monthly_file(spark, tmp_path, name, n=50):
    pdf = generate_raw_tables(n)["yellow_trips"].head(50)
    path = str(tmp_path / name)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)
    # a "monthly file" is the single part file
    import glob

    return glob.glob(f"{path}/part-*.parquet")[0]


def test_ingest_idempotency_matrix(spark, tmp_path):
    f = _monthly_file(spark, tmp_path, "m1")
    target = str(tmp_path / "tgt" / "yellow_trips")
    staging = str(tmp_path / "staging")
    spec = MonthSpec("yellow", f, 2023, 2)

    status, n = ingest_month(spark, spec, target, staging)
    assert status == "loaded" and n == 50
    loaded = spark.read.parquet(target)
    assert loaded.count() == 50
    assert {"year", "month", "loaded_at"} <= set(loaded.columns)
    assert loaded.filter((F.col("year") == 2023) & (F.col("month") == 2)).count() == 50

    # re-run without overwrite: partition probe short-circuits
    status, _ = ingest_month(spark, spec, target, staging)
    assert status == "skipped"
    assert spark.read.parquet(target).count() == 50  # no duplicate append

    # overwrite: delete partition then append (still 50, fresh loaded_at)
    status, n = ingest_month(spark, spec, target, staging, overwrite=True)
    assert status == "loaded" and n == 50
    assert spark.read.parquet(target).count() == 50


def test_ingest_bulk_missing_month_is_skip_not_failure(spark, tmp_path):
    f = _monthly_file(spark, tmp_path, "m2")
    report = ingest_bulk(
        spark,
        [
            MonthSpec("yellow", f, 2023, 3),
            MonthSpec("green", str(tmp_path / "nope.parquet"), 2023, 3),
        ],
        str(tmp_path / "tgt2"),
        str(tmp_path / "staging2"),
    )
    assert report.loaded == {"yellow": 50}
    assert report.missing == ["green"]
    assert report.ok
