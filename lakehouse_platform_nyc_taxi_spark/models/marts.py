"""Mart models: fct_trips + daily/monthly aggregates (SURVEY.md §2.4).

Re-expresses dbt/models/marts/{fct_trips,fct_trips_daily,fct_trips_monthly}.sql.
All aggregation is plain hash aggregation with map-side partial combine —
Catalyst plans partial+final automatically; count(distinct) over two
columns triggers Spark's expand+two-phase distinct plan, exactly what a
100 TB run needs (no driver materialization anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.trino import trino_round

#: fct_trips.sql:14-54 — the 26-column (+loaded_at, audit) projection.
FCT_TRIPS_COLUMNS = (
    "trip_id",
    "taxi_type",
    "pickup_location_id",
    "dropoff_location_id",
    "pickup_datetime",
    "dropoff_datetime",
    "year",
    "month",
    "pickup_hour",
    "pickup_day_of_week",
    "pickup_day_name",
    "time_of_day",
    "trip_distance_miles",
    "trip_duration_minutes",
    "trip_duration_hours",
    "avg_speed_mph",
    "fare_amount",
    "total_amount",
    "cost_per_mile",
    "cost_per_minute",
    "base_passenger_fare",
    "passenger_count",
    "vendor_id",
    "hvfhs_license_number",
    "dispatching_base_number",
    "is_valid_duration",
    "is_valid_distance",
    "is_valid_fare",
    "is_high_quality_trip",
    "loaded_at",
)


def fct_trips(cleaned: DataFrame) -> DataFrame:
    """P9 column-subset projection, one row per high-quality trip."""
    return cleaned.select(*FCT_TRIPS_COLUMNS)


def fct_trips_daily(trips: DataFrame, with_created_at: bool = True) -> DataFrame:
    """fct_trips_daily.sql:14-51 — grain (trip_date, taxi_type, year, month).

    ``avg_speed_mph`` is an unweighted mean of per-trip means — kept as-is
    (SURVEY.md §7.4). ``with_created_at=False`` drops the nondeterministic
    audit column for oracle comparison.
    """
    agg = (
        trips.groupBy(
            F.to_date("pickup_datetime").alias("trip_date"),
            "taxi_type",
            "year",
            "month",
        )
        .agg(
            F.count("*").alias("total_trips"),
            F.countDistinct("pickup_location_id").alias("unique_pickup_locations"),
            F.countDistinct("dropoff_location_id").alias("unique_dropoff_locations"),
            trino_round(F.sum("trip_distance_miles"), 2).alias("total_distance_miles"),
            trino_round(F.avg("trip_distance_miles"), 2).alias("avg_distance_miles"),
            trino_round(F.min("trip_distance_miles"), 2).alias("min_distance_miles"),
            trino_round(F.max("trip_distance_miles"), 2).alias("max_distance_miles"),
            trino_round(F.sum("trip_duration_minutes"), 2).alias("total_duration_minutes"),
            trino_round(F.avg("trip_duration_minutes"), 2).alias("avg_duration_minutes"),
            trino_round(F.min("trip_duration_minutes"), 2).alias("min_duration_minutes"),
            trino_round(F.max("trip_duration_minutes"), 2).alias("max_duration_minutes"),
            trino_round(F.avg("avg_speed_mph"), 2).alias("avg_speed_mph"),
            trino_round(F.sum("total_amount"), 2).alias("total_revenue"),
            trino_round(F.avg("total_amount"), 2).alias("avg_fare"),
            trino_round(F.avg("cost_per_mile"), 2).alias("avg_cost_per_mile"),
            trino_round(F.avg("passenger_count"), 2).alias("avg_passengers"),
            trino_round(F.sum("passenger_count"), 0).alias("total_passengers"),
            F.sum(F.when(F.col("time_of_day") == "Morning", 1).otherwise(0)).alias("trips_morning"),
            F.sum(F.when(F.col("time_of_day") == "Afternoon", 1).otherwise(0)).alias("trips_afternoon"),
            F.sum(F.when(F.col("time_of_day") == "Evening", 1).otherwise(0)).alias("trips_evening"),
            F.sum(F.when(F.col("time_of_day") == "Night", 1).otherwise(0)).alias("trips_night"),
        )
    )
    if with_created_at:
        agg = agg.withColumn("created_at", F.current_timestamp())
    return agg


def fct_trips_monthly(trips: DataFrame, with_created_at: bool = True) -> DataFrame:
    """fct_trips_monthly.sql:14-51 — grain (year, month, taxi_type)."""
    pct = lambda cond: trino_round(  # noqa: E731 — avg-of-case ratio, :41-46
        F.avg(F.when(cond, 1.0).otherwise(0.0)) * 100, 1
    )
    agg = (
        trips.groupBy("year", "month", "taxi_type")
        .agg(
            F.count("*").alias("total_trips"),
            F.countDistinct("pickup_location_id").alias("unique_pickup_locations"),
            F.countDistinct("dropoff_location_id").alias("unique_dropoff_locations"),
            F.countDistinct(F.to_date("pickup_datetime")).alias("days_with_trips"),
            trino_round(F.sum("trip_distance_miles"), 2).alias("total_distance_miles"),
            trino_round(F.avg("trip_distance_miles"), 2).alias("avg_distance_miles"),
            trino_round(F.sum("trip_duration_minutes") / 60.0, 2).alias("total_duration_hours"),
            trino_round(F.avg("trip_duration_minutes"), 2).alias("avg_duration_minutes"),
            trino_round(F.avg("avg_speed_mph"), 2).alias("avg_speed_mph"),
            trino_round(F.sum("total_amount"), 2).alias("total_revenue"),
            trino_round(F.avg("total_amount"), 2).alias("avg_fare"),
            trino_round(
                F.sum("total_amount") / F.nullif(F.count("*"), F.lit(0)), 2
            ).alias("revenue_per_trip"),
            trino_round(F.sum("passenger_count"), 0).alias("total_passengers"),
            trino_round(F.avg("passenger_count"), 2).alias("avg_passengers"),
            pct(F.col("time_of_day") == "Morning").alias("pct_morning"),
            pct(F.col("time_of_day") == "Afternoon").alias("pct_afternoon"),
            pct(F.col("time_of_day") == "Evening").alias("pct_evening"),
            pct(F.col("time_of_day") == "Night").alias("pct_night"),
            pct(F.col("pickup_day_of_week").isin(6, 7)).alias("pct_weekend"),
        )
        .withColumn(
            # date(year || '-' || lpad(month,2,'0') || '-01'), :19 —
            # make_date is the equivalent, cleaner Spark form
            "month_start_date",
            F.make_date("year", "month", F.lit(1)),
        )
    )
    # column order parity with the reference select-list
    ordered = [
        "year", "month", "taxi_type", "month_start_date", "total_trips",
        "unique_pickup_locations", "unique_dropoff_locations", "days_with_trips",
        "total_distance_miles", "avg_distance_miles", "total_duration_hours",
        "avg_duration_minutes", "avg_speed_mph", "total_revenue", "avg_fare",
        "revenue_per_trip", "total_passengers", "avg_passengers", "pct_morning",
        "pct_afternoon", "pct_evening", "pct_night", "pct_weekend",
    ]
    agg = agg.select(*ordered)
    if with_created_at:
        agg = agg.withColumn("created_at", F.current_timestamp())
    return agg
