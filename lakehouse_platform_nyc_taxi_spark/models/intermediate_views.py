"""Persistent catalog views for the intermediate layer (dbt parity).

The reference materializes intermediate models as catalog *views* with
stored SQL text (dbt/dbt_project.yml:20-23), so a fresh session can
``SELECT ... FROM intermediate.int_trips_cleaned`` with no Python setup.
This engine's intermediate models are deliberately unmaterialized
DataFrame lineage (pipeline.py — Catalyst fuses them into the mart
jobs); this module completes the *access-path* parity by registering
Spark-SQL view text for the same three models in the metastore.

Anti-divergence design: the view SQL is GENERATED, not hand-copied —
the union view is built from the same ``UNIFIED_COLUMNS`` /
``_NULLABLE_TYPES`` specs ``models.intermediate._conform`` consumes
(plus the live staging-table schemas), and the enrichment expressions
are SQL renderings of the exact shim formulas in ``functions.trino``.
``tests/test_catalog.py`` pins exact row equality between each view and
its DataFrame twin, so any future edit that touches only one side fails
the suite.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .intermediate import _NULLABLE_TYPES, UNIFIED_COLUMNS

_SQL_TYPES = {
    "long": "BIGINT",
    "double": "DOUBLE",
    "string": "STRING",
    "timestamp": "TIMESTAMP",
}

#: staging model -> taxi_type literal, same order as int_trips_unified's
#: positional branches.
STAGING_BRANCHES = (
    ("stg_nyc_taxi__yellow_trips", "yellow"),
    ("stg_nyc_taxi__green_trips", "green"),
    ("stg_nyc_taxi__fhv_trips", "fhv"),
    ("stg_nyc_taxi__fhvhv_trips", "fhvhv"),
)


def _sql_round(expr: str, n: int) -> str:
    """SQL text of functions.trino.trino_round — same IEEE op sequence.

    All literals carry the ``D`` (double) suffix: Spark SQL parses a bare
    ``100.0`` as DECIMAL(5,1), which drags the arithmetic through decimal
    coercion and lands 1 ulp off the DataFrame twin's pure-double ops
    (caught by the parity test as 1-cent rounding flips).
    """
    factor = f"{10 ** n}.0D"
    return (
        f"(CAST(FLOOR(ABS({expr}) * {factor} + 0.5D) AS DOUBLE) / {factor})"
        f" * SIGNUM({expr})"
    )


def unified_view_sql(spark: SparkSession, staging_db: str = "staging") -> str:
    """UNION ALL view over the four cataloged staging tables, padded with
    typed NULLs exactly like ``intermediate._conform`` (same spec data)."""
    branches = []
    for model, taxi_type in STAGING_BRANCHES:
        present = set(spark.table(f"{staging_db}.{model}").columns)
        cols = []
        for name in UNIFIED_COLUMNS:
            if name == "taxi_type":
                cols.append(f"'{taxi_type}' AS taxi_type")
            elif name in present:
                cols.append(name)
            else:
                cols.append(
                    f"CAST(NULL AS {_SQL_TYPES[_NULLABLE_TYPES[name]]}) AS {name}"
                )
        branches.append(
            "SELECT " + ", ".join(cols) + f" FROM {staging_db}.{model}"
        )
    return "\nUNION ALL\n".join(branches)


def enriched_view_sql(unified_fq: str = "intermediate.int_trips_unified") -> str:
    """SQL rendering of ``intermediate.int_trips_enriched``: every derived
    expression is the same formula (shim semantics included) in SQL form."""
    dur_s = "timestampdiff(SECOND, pickup_datetime, dropoff_datetime)"
    dur_m = f"CAST({dur_s} / 60 AS BIGINT)"
    miles = "trip_distance_miles"
    total = "total_amount"
    speed = f"{miles} / ({dur_s} / 3600.0D)"
    day_case = " ".join(
        f"WHEN {i} THEN '{n}'"
        for i, n in enumerate(
            ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"),
            start=1,
        )
    )
    derived = f"""
        {dur_s} AS trip_duration_seconds,
        {dur_m} AS trip_duration_minutes,
        {_sql_round(f'{dur_s} / 3600.0D', 2)} AS trip_duration_hours,
        CASE WHEN {dur_s} > 0 AND {miles} > 0
             THEN {_sql_round(speed, 2)}
             ELSE CAST(NULL AS DOUBLE) END AS avg_speed_mph,
        CASE WHEN {miles} > 0 AND {total} IS NOT NULL
             THEN {_sql_round(f'{total} / {miles}', 2)}
             ELSE CAST(NULL AS DOUBLE) END AS cost_per_mile,
        CASE WHEN {dur_m} > 0 AND {total} IS NOT NULL
             THEN {_sql_round(f'{total} / {dur_m}', 2)}
             ELSE CAST(NULL AS DOUBLE) END AS cost_per_minute,
        hour(pickup_datetime) AS pickup_hour,
        weekday(pickup_datetime) + 1 AS pickup_day_of_week,
        CASE weekday(pickup_datetime) + 1 {day_case} END AS pickup_day_name,
        CASE WHEN hour(pickup_datetime) BETWEEN 6 AND 11 THEN 'Morning'
             WHEN hour(pickup_datetime) BETWEEN 12 AND 17 THEN 'Afternoon'
             WHEN hour(pickup_datetime) BETWEEN 18 AND 22 THEN 'Evening'
             ELSE 'Night' END AS time_of_day,
        CASE WHEN {dur_m} BETWEEN 1 AND 180 THEN true ELSE false
            END AS is_valid_duration,
        CASE WHEN {miles} BETWEEN 0.1 AND 100 THEN true ELSE false
            END AS is_valid_distance,
        CASE WHEN ({total} BETWEEN 0 AND 500) OR {total} IS NULL
             THEN true ELSE false END AS is_valid_fare,
        CASE WHEN {dur_m} BETWEEN 1 AND 180
                  AND (({miles} BETWEEN 0.1 AND 100) OR {miles} IS NULL)
                  AND (({total} BETWEEN 0 AND 500) OR {total} IS NULL)
                  AND pickup_location_id IS NOT NULL
                  AND dropoff_location_id IS NOT NULL
             THEN true ELSE false END AS is_high_quality_trip
    """
    return f"SELECT *,{derived}FROM {unified_fq}"


def cleaned_view_sql(enriched_fq: str = "intermediate.int_trips_enriched") -> str:
    """int_trips_cleaned.sql:17-19 — precedence quirk reproduced: NULL
    speed passes regardless of the quality flag."""
    return (
        f"SELECT * FROM {enriched_fq} WHERE "
        "(is_high_quality_trip = true AND avg_speed_mph < 80) "
        "OR avg_speed_mph IS NULL"
    )


def register_intermediate_views(
    spark: SparkSession, staging_db: str = "staging", database: str = "intermediate"
) -> list[str]:
    """``CREATE OR REPLACE VIEW`` the three intermediate models with
    stored SQL text, chained view-on-view like dbt. Metadata-only: reads
    no data, and a fresh session against the same metastore resolves
    ``intermediate.int_trips_cleaned`` down to the staging tables."""
    views = [
        ("int_trips_unified", unified_view_sql(spark, staging_db)),
        ("int_trips_enriched", enriched_view_sql(f"{database}.int_trips_unified")),
        ("int_trips_cleaned", cleaned_view_sql(f"{database}.int_trips_enriched")),
    ]
    registered = []
    for name, sql in views:
        fq = f"{database}.{name}"
        spark.sql(f"CREATE OR REPLACE VIEW {fq} AS {sql}")
        registered.append(fq)
    return registered
