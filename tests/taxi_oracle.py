"""DuckDB oracle for the taxi pipeline — the reference's dbt/Trino SQL
chain re-stated in DuckDB dialect, used to cross-check the Spark models.

Dialect conversions (verified in scratch probes):
- Trino date_diff(unit, t1, t2) = whole elapsed units -> DuckDB epoch_us
  arithmetic with integer division (DuckDB's own date_diff counts
  boundary crossings, which is NOT Trino semantics).
- Trino day_of_week -> DuckDB isodow (both ISO Mon=1..Sun=7).
- dbt_utils.generate_surrogate_key -> md5 over '-'-joined varchar casts
  with the dbt null sentinel.
"""

from __future__ import annotations

SK = (
    "md5(coalesce(CAST({c1} AS VARCHAR), '_dbt_utils_surrogate_key_null_')"
    " || '-' || coalesce(CAST({c2} AS VARCHAR), '_dbt_utils_surrogate_key_null_')"
    " || '-' || coalesce(CAST({c3} AS VARCHAR), '_dbt_utils_surrogate_key_null_'))"
)

DUR_S = "((epoch_us(dropoff_datetime) - epoch_us(pickup_datetime)) // 1000000)"
DUR_M = f"({DUR_S} // 60)"


def staging_sql(raw_path: str, kind: str) -> str:
    if kind in ("yellow", "green"):
        p = "tpep" if kind == "yellow" else "lpep"
        sk = SK.format(c1=f"{p}_pickup_datetime", c2="pulocationid", c3="dolocationid")
        return f"""
        SELECT {sk} AS trip_id,
               CAST(vendorid AS BIGINT) AS vendor_id,
               CAST(pulocationid AS BIGINT) AS pickup_location_id,
               CAST(dolocationid AS BIGINT) AS dropoff_location_id,
               CAST({p}_pickup_datetime AS TIMESTAMP) AS pickup_datetime,
               CAST({p}_dropoff_datetime AS TIMESTAMP) AS dropoff_datetime,
               CAST(passenger_count AS DOUBLE) AS passenger_count,
               CAST(trip_distance AS DOUBLE) AS trip_distance_miles,
               CAST(fare_amount AS DOUBLE) AS fare_amount,
               CAST(total_amount AS DOUBLE) AS total_amount,
               CAST(year AS INTEGER) AS year,
               CAST(month AS INTEGER) AS month,
               '{kind}' AS taxi_type
        FROM read_parquet('{raw_path}')
        WHERE {p}_pickup_datetime IS NOT NULL
          AND {p}_dropoff_datetime IS NOT NULL
          AND {p}_pickup_datetime < {p}_dropoff_datetime
          AND trip_distance >= 0
          AND total_amount >= 0
        """
    if kind == "fhv":
        sk = SK.format(c1="pickup_datetime", c2="pulocationid", c3="dolocationid")
        return f"""
        SELECT {sk} AS trip_id,
               CAST(pulocationid AS BIGINT) AS pickup_location_id,
               CAST(dolocationid AS BIGINT) AS dropoff_location_id,
               CAST(pickup_datetime AS TIMESTAMP) AS pickup_datetime,
               CAST(dropoff_datetime AS TIMESTAMP) AS dropoff_datetime,
               CAST(dispatching_base_num AS VARCHAR) AS dispatching_base_number,
               CAST(year AS INTEGER) AS year,
               CAST(month AS INTEGER) AS month,
               'fhv' AS taxi_type
        FROM read_parquet('{raw_path}')
        WHERE pickup_datetime IS NOT NULL
          AND dropoff_datetime IS NOT NULL
          AND pickup_datetime < dropoff_datetime
        """
    if kind == "fhvhv":
        sk = SK.format(c1="pickup_datetime", c2="pulocationid", c3="dolocationid")
        return f"""
        SELECT {sk} AS trip_id,
               CAST(pulocationid AS BIGINT) AS pickup_location_id,
               CAST(dolocationid AS BIGINT) AS dropoff_location_id,
               CAST(pickup_datetime AS TIMESTAMP) AS pickup_datetime,
               CAST(dropoff_datetime AS TIMESTAMP) AS dropoff_datetime,
               CAST(trip_miles AS DOUBLE) AS trip_distance_miles,
               CAST(base_passenger_fare AS DOUBLE) AS base_passenger_fare,
               CAST(hvfhs_license_num AS VARCHAR) AS hvfhs_license_number,
               CAST(dispatching_base_num AS VARCHAR) AS dispatching_base_number,
               CAST(year AS INTEGER) AS year,
               CAST(month AS INTEGER) AS month,
               'fhvhv' AS taxi_type
        FROM read_parquet('{raw_path}')
        WHERE pickup_datetime IS NOT NULL
          AND dropoff_datetime IS NOT NULL
          AND pickup_datetime < dropoff_datetime
          AND trip_miles >= 0
        """
    raise ValueError(kind)


def unified_sql(raw_paths: dict[str, str]) -> str:
    """int_trips_unified.sql:10-106 — typed-null positional union."""
    y = staging_sql(raw_paths["yellow_trips"], "yellow")
    g = staging_sql(raw_paths["green_trips"], "green")
    f = staging_sql(raw_paths["fhv_trips"], "fhv")
    h = staging_sql(raw_paths["fhvhv_trips"], "fhvhv")
    return f"""
    WITH stg_y AS ({y}), stg_g AS ({g}), stg_f AS ({f}), stg_h AS ({h})
    SELECT trip_id, 'yellow' AS taxi_type, vendor_id, pickup_location_id,
           dropoff_location_id, pickup_datetime, dropoff_datetime, passenger_count,
           trip_distance_miles, fare_amount, total_amount,
           CAST(NULL AS DOUBLE) AS base_passenger_fare,
           CAST(NULL AS VARCHAR) AS hvfhs_license_number,
           CAST(NULL AS VARCHAR) AS dispatching_base_number, year, month
    FROM stg_y
    UNION ALL
    SELECT trip_id, 'green', vendor_id, pickup_location_id, dropoff_location_id,
           pickup_datetime, dropoff_datetime, passenger_count, trip_distance_miles,
           fare_amount, total_amount, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), year, month
    FROM stg_g
    UNION ALL
    SELECT trip_id, 'fhv', CAST(NULL AS BIGINT), pickup_location_id,
           dropoff_location_id, pickup_datetime, dropoff_datetime,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           dispatching_base_number, year, month
    FROM stg_f
    UNION ALL
    SELECT trip_id, 'fhvhv', CAST(NULL AS BIGINT), pickup_location_id,
           dropoff_location_id, pickup_datetime, dropoff_datetime,
           CAST(NULL AS DOUBLE), trip_distance_miles, CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), base_passenger_fare, hvfhs_license_number,
           dispatching_base_number, year, month
    FROM stg_h
    """


def enriched_sql(raw_paths: dict[str, str]) -> str:
    """int_trips_enriched.sql:14-96 in DuckDB dialect."""
    return f"""
    WITH unified AS ({unified_sql(raw_paths)})
    SELECT *,
        {DUR_S} AS trip_duration_seconds,
        {DUR_M} AS trip_duration_minutes,
        round({DUR_S} / 3600.0, 2) AS trip_duration_hours,
        CASE WHEN {DUR_S} > 0 AND trip_distance_miles > 0
             THEN round(trip_distance_miles / ({DUR_S} / 3600.0), 2)
             ELSE NULL END AS avg_speed_mph,
        CASE WHEN trip_distance_miles > 0 AND total_amount IS NOT NULL
             THEN round(total_amount / trip_distance_miles, 2)
             ELSE NULL END AS cost_per_mile,
        CASE WHEN {DUR_M} > 0 AND total_amount IS NOT NULL
             THEN round(total_amount / {DUR_M}, 2)
             ELSE NULL END AS cost_per_minute,
        hour(pickup_datetime) AS pickup_hour,
        isodow(pickup_datetime) AS pickup_day_of_week,
        CASE isodow(pickup_datetime)
            WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday'
            WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday' WHEN 6 THEN 'Saturday'
            WHEN 7 THEN 'Sunday' END AS pickup_day_name,
        CASE WHEN hour(pickup_datetime) BETWEEN 6 AND 11 THEN 'Morning'
             WHEN hour(pickup_datetime) BETWEEN 12 AND 17 THEN 'Afternoon'
             WHEN hour(pickup_datetime) BETWEEN 18 AND 22 THEN 'Evening'
             ELSE 'Night' END AS time_of_day,
        CASE WHEN {DUR_M} BETWEEN 1 AND 180 THEN true ELSE false END AS is_valid_duration,
        CASE WHEN trip_distance_miles BETWEEN 0.1 AND 100 THEN true ELSE false END AS is_valid_distance,
        CASE WHEN total_amount BETWEEN 0 AND 500 OR total_amount IS NULL
             THEN true ELSE false END AS is_valid_fare,
        CASE WHEN {DUR_M} BETWEEN 1 AND 180
              AND (trip_distance_miles BETWEEN 0.1 AND 100 OR trip_distance_miles IS NULL)
              AND (total_amount BETWEEN 0 AND 500 OR total_amount IS NULL)
              AND pickup_location_id IS NOT NULL
              AND dropoff_location_id IS NOT NULL
             THEN true ELSE false END AS is_high_quality_trip
    FROM unified
    """


def fct_trips_sql(raw_paths: dict[str, str]) -> str:
    """fct_trips.sql over the cleaned view (incl. the precedence quirk)."""
    return f"""
    WITH enriched AS ({enriched_sql(raw_paths)}),
    cleaned AS (
        SELECT * FROM enriched
        WHERE is_high_quality_trip = true AND avg_speed_mph < 80
           OR avg_speed_mph IS NULL
    )
    SELECT trip_id, taxi_type, pickup_location_id, dropoff_location_id,
           pickup_datetime, dropoff_datetime, year, month, pickup_hour,
           pickup_day_of_week, pickup_day_name, time_of_day, trip_distance_miles,
           trip_duration_minutes, trip_duration_hours, avg_speed_mph, fare_amount,
           total_amount, cost_per_mile, cost_per_minute, base_passenger_fare,
           passenger_count, vendor_id, hvfhs_license_number,
           dispatching_base_number, is_valid_duration, is_valid_distance,
           is_valid_fare, is_high_quality_trip
    FROM cleaned
    """


def fct_trips_daily_sql(raw_paths: dict[str, str]) -> str:
    return f"""
    WITH trips AS ({fct_trips_sql(raw_paths)})
    SELECT CAST(pickup_datetime AS DATE) AS trip_date, taxi_type, year, month,
        CAST(count(*) AS BIGINT) AS total_trips,
        CAST(count(DISTINCT pickup_location_id) AS BIGINT) AS unique_pickup_locations,
        CAST(count(DISTINCT dropoff_location_id) AS BIGINT) AS unique_dropoff_locations,
        round(sum(trip_distance_miles), 2) AS total_distance_miles,
        round(avg(trip_distance_miles), 2) AS avg_distance_miles,
        round(min(trip_distance_miles), 2) AS min_distance_miles,
        round(max(trip_distance_miles), 2) AS max_distance_miles,
        round(CAST(sum(trip_duration_minutes) AS DOUBLE), 2) AS total_duration_minutes,
        round(avg(trip_duration_minutes), 2) AS avg_duration_minutes,
        round(CAST(min(trip_duration_minutes) AS DOUBLE), 2) AS min_duration_minutes,
        round(CAST(max(trip_duration_minutes) AS DOUBLE), 2) AS max_duration_minutes,
        round(avg(avg_speed_mph), 2) AS avg_speed_mph,
        round(sum(total_amount), 2) AS total_revenue,
        round(avg(total_amount), 2) AS avg_fare,
        round(avg(cost_per_mile), 2) AS avg_cost_per_mile,
        round(avg(passenger_count), 2) AS avg_passengers,
        round(sum(passenger_count), 0) AS total_passengers,
        CAST(sum(CASE WHEN time_of_day = 'Morning' THEN 1 ELSE 0 END) AS BIGINT) AS trips_morning,
        CAST(sum(CASE WHEN time_of_day = 'Afternoon' THEN 1 ELSE 0 END) AS BIGINT) AS trips_afternoon,
        CAST(sum(CASE WHEN time_of_day = 'Evening' THEN 1 ELSE 0 END) AS BIGINT) AS trips_evening,
        CAST(sum(CASE WHEN time_of_day = 'Night' THEN 1 ELSE 0 END) AS BIGINT) AS trips_night
    FROM trips
    GROUP BY 1, 2, 3, 4
    """


def fct_trips_monthly_sql(raw_paths: dict[str, str]) -> str:
    return f"""
    WITH trips AS ({fct_trips_sql(raw_paths)})
    SELECT year, month, taxi_type,
        make_date(year, month, 1) AS month_start_date,
        CAST(count(*) AS BIGINT) AS total_trips,
        CAST(count(DISTINCT pickup_location_id) AS BIGINT) AS unique_pickup_locations,
        CAST(count(DISTINCT dropoff_location_id) AS BIGINT) AS unique_dropoff_locations,
        CAST(count(DISTINCT CAST(pickup_datetime AS DATE)) AS BIGINT) AS days_with_trips,
        round(sum(trip_distance_miles), 2) AS total_distance_miles,
        round(avg(trip_distance_miles), 2) AS avg_distance_miles,
        round(sum(trip_duration_minutes) / 60.0, 2) AS total_duration_hours,
        round(avg(trip_duration_minutes), 2) AS avg_duration_minutes,
        round(avg(avg_speed_mph), 2) AS avg_speed_mph,
        round(sum(total_amount), 2) AS total_revenue,
        round(avg(total_amount), 2) AS avg_fare,
        round(sum(total_amount) / nullif(count(*), 0), 2) AS revenue_per_trip,
        round(sum(passenger_count), 0) AS total_passengers,
        round(avg(passenger_count), 2) AS avg_passengers,
        round(avg(CASE WHEN time_of_day = 'Morning' THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_morning,
        round(avg(CASE WHEN time_of_day = 'Afternoon' THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_afternoon,
        round(avg(CASE WHEN time_of_day = 'Evening' THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_evening,
        round(avg(CASE WHEN time_of_day = 'Night' THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_night,
        round(avg(CASE WHEN pickup_day_of_week IN (6, 7) THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_weekend
    FROM trips
    GROUP BY 1, 2, 3
    """
