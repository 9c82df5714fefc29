"""Staging models: per-taxi-type standardization (SURVEY.md §2.2 P1-P3).

Each model is a pure ``DataFrame -> DataFrame`` function re-expressing the
reference's dbt staging SQL (dbt/models/staging/stg_nyc_taxi__*.sql):
surrogate key over (pickup ts, PU, DO), explicit cast projection, literal
audit columns, and the conjunctive validity filter. Incremental
materialization (the dbt ``delete+insert`` strategy + max-(year,month)
watermark) lives in :mod:`..pipeline`, so these stay composable views.

Everything is built-in Catalyst expressions — a single whole-stage-codegen
projection+filter over the scan; filters push down to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.trino import surrogate_key


def _validity_filter(df: DataFrame, pickup: str, dropoff: str, extra) -> DataFrame:
    cond = (
        F.col(pickup).isNotNull()
        & F.col(dropoff).isNotNull()
        & (F.col(pickup) < F.col(dropoff))
    )
    for e in extra:
        cond = cond & e
    return df.filter(cond)


def stg_yellow_trips(raw: DataFrame) -> DataFrame:
    """stg_nyc_taxi__yellow_trips.sql:22-47."""
    filtered = _validity_filter(
        raw,
        "tpep_pickup_datetime",
        "tpep_dropoff_datetime",
        [F.col("trip_distance") >= 0, F.col("total_amount") >= 0],
    )
    return filtered.select(
        surrogate_key("tpep_pickup_datetime", "pulocationid", "dolocationid").alias("trip_id"),
        F.col("vendorid").cast("long").alias("vendor_id"),
        F.col("pulocationid").cast("long").alias("pickup_location_id"),
        F.col("dolocationid").cast("long").alias("dropoff_location_id"),
        F.col("tpep_pickup_datetime").cast("timestamp").alias("pickup_datetime"),
        F.col("tpep_dropoff_datetime").cast("timestamp").alias("dropoff_datetime"),
        F.col("passenger_count").cast("double").alias("passenger_count"),
        F.col("trip_distance").cast("double").alias("trip_distance_miles"),
        F.col("fare_amount").cast("double").alias("fare_amount"),
        F.col("total_amount").cast("double").alias("total_amount"),
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
        F.lit("yellow").alias("taxi_type"),
        F.current_timestamp().alias("loaded_at"),
    )


def stg_green_trips(raw: DataFrame) -> DataFrame:
    """stg_nyc_taxi__green_trips.sql — yellow with lpep_* timestamp columns."""
    filtered = _validity_filter(
        raw,
        "lpep_pickup_datetime",
        "lpep_dropoff_datetime",
        [F.col("trip_distance") >= 0, F.col("total_amount") >= 0],
    )
    return filtered.select(
        surrogate_key("lpep_pickup_datetime", "pulocationid", "dolocationid").alias("trip_id"),
        F.col("vendorid").cast("long").alias("vendor_id"),
        F.col("pulocationid").cast("long").alias("pickup_location_id"),
        F.col("dolocationid").cast("long").alias("dropoff_location_id"),
        F.col("lpep_pickup_datetime").cast("timestamp").alias("pickup_datetime"),
        F.col("lpep_dropoff_datetime").cast("timestamp").alias("dropoff_datetime"),
        F.col("passenger_count").cast("double").alias("passenger_count"),
        F.col("trip_distance").cast("double").alias("trip_distance_miles"),
        F.col("fare_amount").cast("double").alias("fare_amount"),
        F.col("total_amount").cast("double").alias("total_amount"),
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
        F.lit("green").alias("taxi_type"),
        F.current_timestamp().alias("loaded_at"),
    )


def stg_fhv_trips(raw: DataFrame) -> DataFrame:
    """stg_nyc_taxi__fhv_trips.sql:22-41 — no distance/fare columns."""
    filtered = _validity_filter(raw, "pickup_datetime", "dropoff_datetime", [])
    return filtered.select(
        surrogate_key("pickup_datetime", "pulocationid", "dolocationid").alias("trip_id"),
        F.col("pulocationid").cast("long").alias("pickup_location_id"),
        F.col("dolocationid").cast("long").alias("dropoff_location_id"),
        F.col("pickup_datetime").cast("timestamp").alias("pickup_datetime"),
        F.col("dropoff_datetime").cast("timestamp").alias("dropoff_datetime"),
        F.col("dispatching_base_num").cast("string").alias("dispatching_base_number"),
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
        F.lit("fhv").alias("taxi_type"),
        F.current_timestamp().alias("loaded_at"),
    )


def stg_fhvhv_trips(raw: DataFrame) -> DataFrame:
    """stg_nyc_taxi__fhvhv_trips.sql:22-45."""
    filtered = _validity_filter(
        raw, "pickup_datetime", "dropoff_datetime", [F.col("trip_miles") >= 0]
    )
    return filtered.select(
        surrogate_key("pickup_datetime", "pulocationid", "dolocationid").alias("trip_id"),
        F.col("pulocationid").cast("long").alias("pickup_location_id"),
        F.col("dolocationid").cast("long").alias("dropoff_location_id"),
        F.col("pickup_datetime").cast("timestamp").alias("pickup_datetime"),
        F.col("dropoff_datetime").cast("timestamp").alias("dropoff_datetime"),
        F.col("trip_miles").cast("double").alias("trip_distance_miles"),
        F.col("base_passenger_fare").cast("double").alias("base_passenger_fare"),
        F.col("hvfhs_license_num").cast("string").alias("hvfhs_license_number"),
        F.col("dispatching_base_num").cast("string").alias("dispatching_base_number"),
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
        F.lit("fhvhv").alias("taxi_type"),
        F.current_timestamp().alias("loaded_at"),
    )


STAGING_MODELS = {
    "stg_nyc_taxi__yellow_trips": ("yellow_trips", stg_yellow_trips),
    "stg_nyc_taxi__green_trips": ("green_trips", stg_green_trips),
    "stg_nyc_taxi__fhv_trips": ("fhv_trips", stg_fhv_trips),
    "stg_nyc_taxi__fhvhv_trips": ("fhvhv_trips", stg_fhvhv_trips),
}


def incremental_watermark_filter(raw: DataFrame, target: DataFrame | None) -> DataFrame:
    """P4: the is_incremental() predicate (stg_nyc_taxi__yellow_trips.sql:13-17).

    Reprocess the target's max (year, month) and anything later. The two
    scalar watermarks are collected driver-side (two tiny aggregates) —
    the same shape as Trino's scalar subqueries; the resulting literal
    predicate partition-prunes the raw scan.
    """
    if target is None:
        return raw
    mx = target.agg(F.max("year").alias("y")).first()
    if mx is None or mx.y is None:
        return raw
    max_year = mx.y
    max_month = (
        target.filter(F.col("year") == max_year).agg(F.max("month").alias("m")).first().m
    )
    return raw.filter(
        (F.col("year") > max_year)
        | ((F.col("year") == max_year) & (F.col("month") >= max_month))
    )
