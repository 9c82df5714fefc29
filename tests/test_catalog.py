"""Persistent catalog layer (SURVEY §2.1 S10/S13 full parity).

The reference registers every model in a metastore so a fresh session can
``SELECT ... FROM marts.fct_trips`` with no Python setup
(scripts/nyc_taxi/ingest_spark_bulk.py:220; dbt/dbt_project.yml:14-27).
The cross-session test proves the same here: process A runs the pipeline
and registers the catalog, process B is a *brand-new JVM* that queries
``marts.fct_trips_daily`` via ``spark.sql`` only.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from lakehouse_platform_nyc_taxi_spark.catalog import (
    layer_for_model,
    register_pipeline_outputs,
)
from lakehouse_platform_nyc_taxi_spark.fixtures import write_raw_tables
from lakehouse_platform_nyc_taxi_spark.pipeline import run_pipeline


def test_layer_routing_mirrors_dbt_project():
    assert layer_for_model("stg_nyc_taxi__yellow_trips") == "staging"
    assert layer_for_model("int_trips_cleaned") == "intermediate"
    assert layer_for_model("fct_trips_daily") == "marts"
    assert layer_for_model("dim_zones") == "marts"


@pytest.mark.slow
def test_register_pipeline_outputs_same_session(spark, tmp_path):
    """In-session registration: databases exist, tables queryable by FQN,
    re-registration is idempotent (EXTERNAL: metadata only)."""
    raw = write_raw_tables(str(tmp_path / "raw"), n=120)
    wh = str(tmp_path / "wh")
    res = run_pipeline(spark, raw, wh, register_catalog=True)
    assert res.ok, res.errors

    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert {"raw", "staging", "intermediate", "marts"} <= dbs

    n_mart = spark.sql("SELECT count(*) c FROM marts.fct_trips_daily").first().c
    assert n_mart == res.built["fct_trips_daily"].count()
    n_stg = spark.table("staging.stg_nyc_taxi__yellow_trips").count()
    assert n_stg == res.built["stg_nyc_taxi__yellow_trips"].count()

    # idempotent re-run: DROP+CREATE touches metadata, not files
    res2 = run_pipeline(spark, raw, wh, register_catalog=True)
    assert res2.ok, res2.errors
    assert spark.sql("SELECT count(*) c FROM marts.fct_trips_daily").first().c == n_mart


def test_intermediate_views_match_dataframe_models(spark, tmp_path):
    """The stored-SQL intermediate views (dbt parity) must produce exactly
    the rows of their DataFrame twins — any one-sided edit fails here."""
    raw = write_raw_tables(str(tmp_path / "raw"), n=150)
    wh = str(tmp_path / "wh")
    res = run_pipeline(spark, raw, wh, register_catalog=True)
    assert res.ok, res.errors

    for model in ("int_trips_unified", "int_trips_enriched", "int_trips_cleaned"):
        view_df = spark.table(f"intermediate.{model}")
        twin = res.built[model]
        assert view_df.columns == twin.columns, model
        v = sorted(map(tuple, view_df.collect()))
        t = sorted(map(tuple, twin.collect()))
        assert v == t, f"{model}: view/DataFrame divergence"


_PHASE_A = """
from lakehouse_platform_nyc_taxi_spark.catalog import hive_catalog_session
from lakehouse_platform_nyc_taxi_spark.fixtures import write_raw_tables
from lakehouse_platform_nyc_taxi_spark.pipeline import run_pipeline

spark = hive_catalog_session({wh!r}, master="local[4]", shuffle_partitions=4)
raw = write_raw_tables({raw!r}, n=200)
res = run_pipeline(spark, raw, {wh!r}, register_catalog=True)
assert res.ok, res.errors
print("ROWS", spark.sql("SELECT count(*) c FROM marts.fct_trips_daily").first().c)
spark.stop()
"""

_PHASE_B = """
from lakehouse_platform_nyc_taxi_spark.catalog import hive_catalog_session

spark = hive_catalog_session({wh!r}, master="local[4]", shuffle_partitions=4)
dbs = sorted(d.name for d in spark.catalog.listDatabases())
assert set(dbs) >= set(("raw", "staging", "intermediate", "marts")), dbs
print("ROWS", spark.sql("SELECT count(*) c FROM marts.fct_trips_daily").first().c)
# partitioned staging table survives too (MSCK-synced partitions)
assert spark.sql(
    "SELECT count(*) c FROM staging.stg_nyc_taxi__yellow_trips WHERE year IS NOT NULL"
).first().c > 0
# intermediate layer is stored-SQL views (dbt parity): a fresh session
# resolves the chained views down to the staging tables, data-free
assert spark.sql("SHOW VIEWS IN intermediate").count() >= 3
assert spark.sql(
    "SELECT count(*) c FROM intermediate.int_trips_cleaned"
).first().c > 0
spark.stop()
"""


def _run_phase(script: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(script)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = [ln for ln in proc.stdout.splitlines() if ln.startswith("ROWS ")]
    assert rows, proc.stdout
    return rows[-1]


@pytest.mark.slow
def test_catalog_persists_across_jvm_restarts(tmp_path):
    """A brand-new process (fresh JVM + Derby metastore reopen) queries
    marts.fct_trips_daily with spark.sql alone — the single-node analogue
    of attaching a new cluster session to a shared Hive metastore."""
    wh = str(tmp_path / "warehouse")
    raw = str(tmp_path / "raw")
    rows_a = _run_phase(_PHASE_A.format(wh=wh, raw=raw))
    rows_b = _run_phase(_PHASE_B.format(wh=wh))
    assert rows_a == rows_b
