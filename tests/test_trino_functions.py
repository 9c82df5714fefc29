"""Parity tests for the Trino-compat expression shims (SURVEY.md §2.8)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.functions import (
    date_diff,
    day_name,
    day_of_week_iso,
    surrogate_key,
    time_of_day,
)


def test_surrogate_key_matches_duckdb_md5(spark, duck_smoke):
    """F1 byte-parity: Spark md5(concat_ws) == DuckDB md5(||) including the
    varchar rendering of timestamps and the dbt null sentinel."""
    sdf = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = (
        sdf.select(
            "o_orderkey",
            surrogate_key("o_orderdate", "o_custkey", "o_orderstatus").alias("sk"),
        )
        .orderBy("o_orderkey")
        .limit(50)
        .collect()
    )
    want = duck_smoke.sql(
        """
        SELECT o_orderkey,
               md5(coalesce(CAST(o_orderdate AS VARCHAR), '_dbt_utils_surrogate_key_null_')
                   || '-' || coalesce(CAST(o_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_')
                   || '-' || coalesce(CAST(o_orderstatus AS VARCHAR), '_dbt_utils_surrogate_key_null_')) sk
        FROM orders ORDER BY o_orderkey LIMIT 50
        """
    ).fetchall()
    assert [(r.o_orderkey, r.sk) for r in got] == want


def test_surrogate_key_null_sentinel(spark):
    df = spark.createDataFrame([(None,)], "x string")
    row = df.select(surrogate_key("x").alias("sk")).first()
    import hashlib

    assert row.sk == hashlib.md5(b"_dbt_utils_surrogate_key_null_").hexdigest()


def test_day_of_week_iso(spark):
    # 2024-01-01 is a Monday; 2024-01-07 a Sunday.
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1),), (datetime(2024, 1, 6),), (datetime(2024, 1, 7),)],
        "ts timestamp",
    )
    rows = df.select(day_of_week_iso("ts").alias("d"), day_name("ts").alias("n")).collect()
    assert [(r.d, r.n) for r in rows] == [
        (1, "Monday"),
        (6, "Saturday"),
        (7, "Sunday"),
    ]


def test_time_of_day_buckets(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, h),) for h in (0, 5, 6, 11, 12, 17, 18, 22, 23)],
        "ts timestamp",
    )
    rows = df.select(F.hour("ts").alias("h"), time_of_day("ts").alias("b")).collect()
    assert {r.h: r.b for r in rows} == {
        0: "Night",
        5: "Night",
        6: "Morning",
        11: "Morning",
        12: "Afternoon",
        17: "Afternoon",
        18: "Evening",
        22: "Evening",
        23: "Night",
    }


def test_date_diff_truncates_like_trino(spark):
    df = spark.createDataFrame(
        [
            (datetime(2023, 1, 1, 0, 0, 59), datetime(2023, 1, 1, 0, 2, 1)),
            (datetime(2023, 1, 1, 0, 0, 0), datetime(2023, 1, 1, 1, 0, 0)),
        ],
        "t1 timestamp, t2 timestamp",
    )
    rows = df.select(
        date_diff("second", "t1", "t2").alias("s"),
        date_diff("minute", "t1", "t2").alias("m"),
        date_diff("hour", "t1", "t2").alias("h"),
    ).collect()
    # Trino: whole elapsed units (62s -> 1 minute), NOT boundary crossings.
    assert (rows[0].s, rows[0].m, rows[0].h) == (62, 1, 0)
    assert (rows[1].s, rows[1].m, rows[1].h) == (3600, 60, 1)
