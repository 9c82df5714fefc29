"""End-to-end parity of the taxi pipeline vs a DuckDB oracle of the
reference's SQL chain, plus the 37-assertion quality suite and
incremental semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.fixtures import write_raw_tables
from lakehouse_platform_nyc_taxi_spark.models import (
    fct_trips,
    fct_trips_daily,
    fct_trips_monthly,
    int_trips_cleaned,
    int_trips_enriched,
    int_trips_unified,
)
from lakehouse_platform_nyc_taxi_spark.models.intermediate import UNIFIED_COLUMNS
from lakehouse_platform_nyc_taxi_spark.models.staging import STAGING_MODELS
from lakehouse_platform_nyc_taxi_spark.pipeline import Model, run_pipeline, taxi_models
from lakehouse_platform_nyc_taxi_spark.quality import run_assertions, taxi_assertion_suite
from lakehouse_platform_nyc_taxi_spark.quality.assertions import (
    positive_fare_threshold,
    valid_speed,
)

from . import taxi_oracle
from .oracle_utils import compare_frames


@pytest.fixture(scope="module")
def raw_paths(tmp_path_factory):
    out = tmp_path_factory.mktemp("taxi_raw")
    return write_raw_tables(str(out), n=800)


@pytest.fixture(scope="module")
def spark_marts(spark, raw_paths):
    """The unmaterialized model chain (loaded_at dropped for determinism)."""
    stg = {}
    for name, (raw_table, fn) in STAGING_MODELS.items():
        stg[name] = fn(spark.read.parquet(raw_paths[raw_table])).drop("loaded_at")
    unified = int_trips_unified(
        stg["stg_nyc_taxi__yellow_trips"],
        stg["stg_nyc_taxi__green_trips"],
        stg["stg_nyc_taxi__fhv_trips"],
        stg["stg_nyc_taxi__fhvhv_trips"],
    )
    enriched = int_trips_enriched(unified)
    cleaned = int_trips_cleaned(enriched)
    trips = fct_trips(cleaned.withColumn("loaded_at", F.lit(None).cast("timestamp")))
    return {
        "staging": stg,
        "unified": unified,
        "enriched": enriched,
        "cleaned": cleaned,
        "fct_trips": trips.drop("loaded_at"),
        "fct_trips_daily": fct_trips_daily(trips, with_created_at=False),
        "fct_trips_monthly": fct_trips_monthly(trips, with_created_at=False),
    }


def test_unified_schema_contract(spark_marts):
    df = spark_marts["unified"]
    assert tuple(c for c in df.columns if c != "loaded_at") == tuple(
        c for c in UNIFIED_COLUMNS if c != "loaded_at"
    )


def test_fct_trips_matches_oracle(spark_marts, raw_paths):
    duck = duckdb.connect()
    spark_pdf = spark_marts["fct_trips"].toPandas()
    duck_pdf = duck.sql(taxi_oracle.fct_trips_sql(raw_paths)).df()
    compare_frames(spark_pdf, duck_pdf, name="fct_trips")


def test_fct_trips_daily_matches_oracle(spark_marts, raw_paths):
    duck = duckdb.connect()
    spark_pdf = spark_marts["fct_trips_daily"].toPandas()
    duck_pdf = duck.sql(taxi_oracle.fct_trips_daily_sql(raw_paths)).df()
    compare_frames(spark_pdf, duck_pdf, name="fct_trips_daily")


def test_fct_trips_monthly_matches_oracle(spark_marts, raw_paths):
    duck = duckdb.connect()
    spark_pdf = spark_marts["fct_trips_monthly"].toPandas()
    duck_pdf = duck.sql(taxi_oracle.fct_trips_monthly_sql(raw_paths)).df()
    compare_frames(spark_pdf, duck_pdf, name="fct_trips_monthly")


def test_cleaned_precedence_quirk(spark_marts):
    """NULL-speed rows pass the cleaned filter even when low-quality
    (int_trips_cleaned.sql:17-19) — e.g. fhv rows with NULL locations."""
    cleaned = spark_marts["cleaned"]
    null_speed_low_quality = cleaned.filter(
        F.col("avg_speed_mph").isNull() & (F.col("is_high_quality_trip") == False)  # noqa: E712
    ).count()
    assert null_speed_low_quality > 0, "fixtures must exercise the quirk"
    # and no non-null-speed row >= 80 mph survives
    assert cleaned.filter(F.col("avg_speed_mph") >= 80).count() == 0


def test_assertion_suite_passes(spark_marts):
    suite = taxi_assertion_suite()
    assert len(suite) == 35
    models = {
        "stg_nyc_taxi__yellow_trips": spark_marts["staging"]["stg_nyc_taxi__yellow_trips"],
        "int_trips_unified": spark_marts["unified"],
        "int_trips_enriched": spark_marts["enriched"],
        "int_trips_cleaned": spark_marts["cleaned"],
        "fct_trips": spark_marts["fct_trips"],
        "fct_trips_daily": spark_marts["fct_trips_daily"],
        "fct_trips_monthly": spark_marts["fct_trips_monthly"],
    }
    results = run_assertions(models, suite)
    failed = [r for r in results if not r.passed]
    assert not failed, f"failing assertions: {[(r.name, r.failures) for r in failed]}"
    # singular tests (36 and 37)
    assert positive_fare_threshold(spark_marts["fct_trips"]).passed
    assert valid_speed(spark_marts["fct_trips"]).passed


def test_surrogate_key_duplicates_survive_staging(spark_marts):
    """Key collisions are kept by the models (dedup only happens at the
    incremental delete+insert boundary)."""
    stg = spark_marts["staging"]["stg_nyc_taxi__yellow_trips"]
    dups = stg.groupBy("trip_id").count().filter(F.col("count") > 1).count()
    assert dups > 0


def test_full_pipeline_runner(spark, raw_paths, tmp_path):
    wh = str(tmp_path / "warehouse")
    result = run_pipeline(spark, raw_paths, wh)
    assert result.ok, result.errors
    assert set(result.built) == {m.name for m in taxi_models()}
    total = spark.read.parquet(f"{wh}/fct_trips").count()
    assert total > 0
    # inline expectations rode the fct_trips write (observe-counted,
    # zero extra scans): all three not_null counters clean, row count
    # matches what landed on disk
    dq = result.dq_counts["fct_trips"]
    assert dq["_rows_observed"] == total
    assert dq["trip_id_null"] == 0
    assert dq["pickup_datetime_null"] == 0
    assert dq["taxi_type_null"] == 0
    # idempotent re-run: incremental delete+insert of the max partition
    # must not duplicate rows
    result2 = run_pipeline(spark, raw_paths, wh)
    assert result2.ok, result2.errors
    assert spark.read.parquet(f"{wh}/fct_trips").count() == total
    # ad-hoc SQL over the registered marts (the Trino-endpoint equivalent)
    flagship = spark.sql(
        "SELECT taxi_type, count(*) AS total_trips FROM fct_trips GROUP BY taxi_type"
    )
    assert flagship.count() == 4


@pytest.mark.slow
def test_snapshot_staging_model_constraint_and_schema_drift(spark, raw_paths, tmp_path):
    """One staging model materialized through snapshot tables: the CHECK
    constraint mirrors the validity filter, an idempotent re-run is a
    single ACID merge commit, and a model revision that adds a column
    evolves the table schema in place — dbt
    on_schema_change='append_new_columns' (stg_nyc_taxi__yellow_trips.sql:5)
    enforced by the table, not by convention."""
    from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap

    wh = str(tmp_path / "warehouse")
    models = taxi_models(snapshot_staging=["stg_nyc_taxi__yellow_trips"])
    result = run_pipeline(spark, raw_paths, wh, models=models)
    assert result.ok, result.errors

    path = f"{wh}/stg_nyc_taxi__yellow_trips"
    assert snap.table_constraints(path) == {
        "non_negative_total": "total_amount >= 0"
    }
    n = snap.read_table(spark, path).count()
    assert n > 0
    # pipeline downstream marts agree with the plain-incremental run
    plain_wh = str(tmp_path / "plain")
    plain = run_pipeline(spark, raw_paths, plain_wh)
    assert plain.ok
    assert (
        spark.read.parquet(f"{wh}/fct_trips").count()
        == spark.read.parquet(f"{plain_wh}/fct_trips").count()
    )

    # idempotent re-run: the watermark increment replaces the max
    # partition's keys via ONE merge commit — no duplication
    result2 = run_pipeline(spark, raw_paths, wh, models=models)
    assert result2.ok, result2.errors
    assert snap.read_table(spark, path).count() == n
    assert snap.history(path)[-1]["op"] == "merge-update"

    # model revision adds a column -> schema drift flows through the
    # merge as an in-place evolution; old rows read NULL
    from lakehouse_platform_nyc_taxi_spark.models.staging import (
        STAGING_MODELS,
        stg_yellow_trips,
    )

    def stg_yellow_v2(raw):
        return stg_yellow_trips(raw).withColumn(
            "airport_fee", F.lit(1.25).cast("double")
        )

    drifted = [
        Model(
            name=m.name,
            deps=m.deps,
            fn=stg_yellow_v2 if m.name == "stg_nyc_taxi__yellow_trips" else m.fn,
            materialized=m.materialized,
            unique_key=m.unique_key,
            partition_by=m.partition_by,
            constraints=m.constraints,
        )
        for m in models
        if m.name in STAGING_MODELS
    ]
    result3 = run_pipeline(spark, raw_paths, wh, models=drifted)
    assert result3.ok, result3.errors
    evolved = snap.read_table(spark, path)
    assert "airport_fee" in evolved.columns
    assert evolved.count() == n
    # untouched (pre-drift, non-max-partition) rows read NULL for the
    # new column; re-merged max-partition rows carry the value
    assert evolved.filter(F.col("airport_fee").isNull()).count() > 0
    assert evolved.filter(F.col("airport_fee") == 1.25).count() > 0

    # the constraint still guards the table: a raw writer bypassing the
    # model cannot land violating rows
    bad = evolved.limit(1).withColumn("total_amount", F.lit(-5.0))
    with pytest.raises(ValueError, match="violates CHECK"):
        snap.append(bad, path)


def test_guarded_join_catches_dim_fanout(spark):
    from lakehouse_platform_nyc_taxi_spark.quality.observers import (
        ExpectationError,
        guarded_join,
    )

    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id long, k string")
    good_dim = spark.createDataFrame([("a", 10), ("b", 20)], "k string, v long")
    out, verify = guarded_join(fact, good_dim, "k")
    assert out.count() == 3
    assert verify() == {"left_rows": 3, "out_rows": 3}

    dup_dim = spark.createDataFrame(
        [("a", 10), ("a", 11), ("b", 20)], "k string, v long"
    )
    out, verify = guarded_join(fact, dup_dim, "k")
    assert out.count() == 5  # silent fan-out the guard must surface
    try:
        verify()
        raise AssertionError("fan-out not detected")
    except ExpectationError as e:
        assert e.counts == {"join_fanout_extra_rows": 2}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="left/inner"):
        guarded_join(fact, good_dim, "k", how="full")
