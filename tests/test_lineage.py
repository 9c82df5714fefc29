"""Lineage/docs artifact (dbt-docs analogue — airflow DAG's dbt_docs task)."""

from __future__ import annotations

import json

from lakehouse_platform_nyc_taxi_spark.fixtures import write_raw_tables
from lakehouse_platform_nyc_taxi_spark.lineage import model_lineage, write_lineage_docs
from lakehouse_platform_nyc_taxi_spark.pipeline import run_pipeline, taxi_models


def test_lineage_edges_match_model_dag():
    man = model_lineage()
    names = {m.name for m in taxi_models()}
    assert names <= set(man["nodes"])
    edges = {(e["parent"], e["child"]) for e in man["edges"]}
    assert ("int_trips_cleaned", "fct_trips") in edges
    assert ("fct_trips", "fct_trips_daily") in edges
    assert ("raw.yellow_trips", "stg_nyc_taxi__yellow_trips") in edges
    # every parent is a known node (no dangling references)
    assert all(e["parent"] in man["nodes"] for e in man["edges"])
    # layer routing present on every node
    assert man["nodes"]["fct_trips_daily"]["layer"] == "marts"
    assert man["nodes"]["raw.yellow_trips"]["materialized"] == "source"


def test_write_lineage_docs_with_schemas(spark, tmp_path):
    raw = write_raw_tables(str(tmp_path / "raw"), n=80)
    res = run_pipeline(spark, raw, str(tmp_path / "wh"))
    assert res.ok, res.errors

    man = write_lineage_docs(str(tmp_path / "docs"), result=res)
    on_disk = json.loads((tmp_path / "docs" / "manifest.json").read_text())
    assert on_disk == json.loads(json.dumps(man))

    md = (tmp_path / "docs" / "lineage.md").read_text()
    assert "graph TD" in md
    assert "## marts.fct_trips_daily" in md
    # schema table rendered from plan metadata (no job run needed)
    assert "| `trip_date` |" in md or "| `pickup_datetime` |" in md
