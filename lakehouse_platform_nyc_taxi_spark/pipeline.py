"""Model registry + topological pipeline runner.

The reference's orchestration (Airflow DAG airflow/dags/nyc_taxi_pipeline.py:49-85
sequencing dbt staging -> intermediate -> marts -> test) collapses to a
declarative registry of model functions executed in dependency order, with
per-model materialization (view | table | incremental) and the Airflow
retry policy (2 retries).

A "view" model stays unmaterialized DataFrame lineage — Catalyst fuses the
whole staging->unified->enriched->cleaned chain into the mart jobs, so the
pipeline writes exactly two kinds of files: staging increments and mart
tables. That is the same physical behavior a 100 TB run wants (no
intermediate materialization, one shuffle per mart aggregate).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .models import (
    STAGING_MODELS,
    fct_trips,
    fct_trips_daily,
    fct_trips_monthly,
    int_trips_cleaned,
    int_trips_enriched,
    int_trips_unified,
)
from .sources.writers import _path_exists, incremental_delete_insert, overwrite_table


@dataclass
class Model:
    name: str
    deps: Sequence[str]
    fn: Callable[..., DataFrame]  # (ctx_dataframes...) -> DataFrame
    materialized: str = "view"  # view | table | incremental
    unique_key: Sequence[str] = ()
    partition_by: Sequence[str] = ()


@dataclass
class PipelineResult:
    built: dict[str, DataFrame] = field(default_factory=dict)
    timings: dict[str, float] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.errors


def taxi_models() -> list[Model]:
    """The reference's 10-model DAG (sources -> 4 staging -> 3 intermediate
    -> 3 marts), SURVEY.md §1.1."""
    models: list[Model] = []
    for name, (raw_table, fn) in STAGING_MODELS.items():
        models.append(
            Model(
                name=name,
                deps=[f"raw.{raw_table}"],
                fn=fn,
                materialized="incremental",
                unique_key=("trip_id",),
                partition_by=("year", "month"),
            )
        )
    models += [
        Model(
            "int_trips_unified",
            [
                "stg_nyc_taxi__yellow_trips",
                "stg_nyc_taxi__green_trips",
                "stg_nyc_taxi__fhv_trips",
                "stg_nyc_taxi__fhvhv_trips",
            ],
            int_trips_unified,
        ),
        Model("int_trips_enriched", ["int_trips_unified"], int_trips_enriched),
        Model("int_trips_cleaned", ["int_trips_enriched"], int_trips_cleaned),
        Model("fct_trips", ["int_trips_cleaned"], fct_trips, materialized="table"),
        Model("fct_trips_daily", ["fct_trips"], fct_trips_daily, materialized="table"),
        Model("fct_trips_monthly", ["fct_trips"], fct_trips_monthly, materialized="table"),
    ]
    return models


def run_pipeline(
    spark: SparkSession,
    raw_paths: dict[str, str],
    warehouse_dir: str,
    models: Sequence[Model] | None = None,
    retries: int = 2,
    retry_delay_s: float = 0.0,
    full_refresh: bool = False,
    register_catalog: bool = False,
) -> PipelineResult:
    """Execute the model DAG (registration order is already topological).

    ``raw_paths`` maps raw table name -> parquet path. Materialized models
    land under ``warehouse_dir/<model>``; view models pass their DataFrame
    lineage downstream unmaterialized.

    With ``register_catalog=True`` every materialized output (plus the raw
    sources) is registered as an external table in per-layer databases
    (raw/staging/intermediate/marts — dbt_project.yml:14-27), so a session
    backed by a persistent metastore (see ``catalog.hive_catalog_session``)
    lets a *fresh* session ``SELECT ... FROM marts.fct_trips_daily`` with
    no Python setup, mirroring ingest_spark_bulk.py:220.
    """
    models = list(models) if models is not None else taxi_models()
    result = PipelineResult()
    ctx: dict[str, DataFrame] = {}

    for model in models:
        start = time.monotonic()
        attempt = 0
        while True:
            try:
                inputs = []
                for dep in model.deps:
                    if dep.startswith("raw."):
                        inputs.append(spark.read.parquet(raw_paths[dep[4:]]))
                    else:
                        inputs.append(ctx[dep])
                df = model.fn(*inputs)
                path = f"{warehouse_dir}/{model.name}"
                if model.materialized == "incremental":
                    if full_refresh and _path_exists(spark, path):
                        overwrite_table(df, path, model.partition_by or None)
                    else:
                        from .models.staging import incremental_watermark_filter

                        target = (
                            spark.read.parquet(path)
                            if _path_exists(spark, path)
                            else None
                        )
                        if target is not None:
                            raw_df = inputs[0]
                            filtered_raw = incremental_watermark_filter(raw_df, target)
                            df = model.fn(filtered_raw)
                        incremental_delete_insert(
                            spark, df, path, model.unique_key, model.partition_by
                        )
                    ctx[model.name] = spark.read.parquet(path)
                elif model.materialized == "table":
                    overwrite_table(df, path, model.partition_by or None)
                    ctx[model.name] = spark.read.parquet(path)
                else:  # view
                    ctx[model.name] = df
                ctx[model.name].createOrReplaceTempView(model.name)
                result.built[model.name] = ctx[model.name]
                break
            except Exception as exc:  # retry like the Airflow DAG (retries=2)
                attempt += 1
                if attempt > retries:
                    result.errors[model.name] = f"{type(exc).__name__}: {exc}"
                    return result
                if retry_delay_s:
                    time.sleep(retry_delay_s)
        result.timings[model.name] = time.monotonic() - start

    if register_catalog:
        from .catalog import register_pipeline_outputs
        from .models.intermediate_views import register_intermediate_views

        materialized = {
            m.name: (f"{warehouse_dir}/{m.name}", bool(m.partition_by))
            for m in models
            if m.materialized in ("table", "incremental")
        }
        register_pipeline_outputs(spark, raw_paths, materialized)
        # dbt materializes the intermediate layer as catalog VIEWS with
        # stored SQL (dbt_project.yml:20-23). The in-pipeline models stay
        # unmaterialized DataFrame lineage (fused into the marts); the
        # views give fresh sessions the same access path over the
        # cataloged staging tables. Only for the standard taxi DAG —
        # custom model lists don't have SQL twins.
        if {m.name for m in models} >= {
            "int_trips_unified",
            "int_trips_enriched",
            "int_trips_cleaned",
        }:
            register_intermediate_views(spark)
    return result
