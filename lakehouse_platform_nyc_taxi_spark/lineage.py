"""Model lineage / docs artifact — the dbt-docs analogue.

Reference parity: the DAG's ``dbt_docs`` task (airflow/dags/
nyc_taxi_pipeline.py:74-77) emits a manifest + static docs site after
every pipeline run. This module derives the same information from the
model registry: a JSON manifest (nodes, edges, materialization, layer)
and a human-readable markdown page with the DAG and per-model schemas.

Schemas come from the built DataFrames' ``.schema`` — plan metadata
only, no job runs — so emitting docs is O(models), independent of data
size (safe to run after a 100 TB pipeline).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from .catalog import layer_for_model
from .pipeline import Model, PipelineResult, taxi_models


def model_lineage(models: Sequence[Model] | None = None) -> dict:
    """Manifest dict: one node per model plus the raw sources it reads.

    Shape mirrors what dbt's manifest exposes for lineage consumers:
    ``nodes`` (name -> metadata) and ``edges`` (parent -> child pairs).
    """
    models = list(models) if models is not None else taxi_models()
    nodes: dict[str, dict] = {}
    edges: list[dict[str, str]] = []
    for m in models:
        nodes[m.name] = {
            "layer": layer_for_model(m.name),
            "materialized": m.materialized,
            "depends_on": list(m.deps),
            "unique_key": list(m.unique_key),
            "partition_by": list(m.partition_by),
        }
        for dep in m.deps:
            if dep.startswith("raw.") and dep not in nodes:
                nodes[dep] = {
                    "layer": "raw",
                    "materialized": "source",
                    "depends_on": [],
                    "unique_key": [],
                    "partition_by": [],
                }
            edges.append({"parent": dep, "child": m.name})
    return {"nodes": nodes, "edges": edges}


def _schema_lines(built, name: str) -> list[str]:
    if not built or name not in built:
        return []
    return [
        f"| `{f.name}` | {f.dataType.simpleString()} | {'yes' if f.nullable else 'no'} |"
        for f in built[name].schema.fields
    ]


def write_lineage_docs(
    out_dir: str,
    models: Sequence[Model] | None = None,
    result: PipelineResult | None = None,
) -> dict:
    """Write ``manifest.json`` + ``lineage.md`` under ``out_dir``.

    ``result`` (a PipelineResult) adds per-model column schemas and run
    timings to the docs. Returns the manifest dict.
    """
    import os

    models = list(models) if models is not None else taxi_models()
    manifest = model_lineage(models)
    built = result.built if result else {}
    timings = result.timings if result else {}

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)

    lines = ["# Pipeline lineage", "", "```mermaid", "graph TD"]
    for e in manifest["edges"]:
        p = e["parent"].replace(".", "_")
        c = e["child"].replace(".", "_")
        lines.append(f"    {p} --> {c}")
    lines += ["```", ""]
    for name, node in manifest["nodes"].items():
        if node["materialized"] == "source":
            continue
        lines += [
            f"## {node['layer']}.{name}",
            "",
            f"- materialized: **{node['materialized']}**",
            f"- depends on: {', '.join(node['depends_on']) or '—'}",
        ]
        if node["unique_key"]:
            lines.append(f"- unique key: {', '.join(node['unique_key'])}")
        if node["partition_by"]:
            lines.append(f"- partitioned by: {', '.join(node['partition_by'])}")
        if name in timings:
            lines.append(f"- last run: {timings[name]:.2f}s")
        schema = _schema_lines(built, name)
        if schema:
            lines += ["", "| column | type | nullable |", "|---|---|---|", *schema]
        lines.append("")
    with open(os.path.join(out_dir, "lineage.md"), "w") as fh:
        fh.write("\n".join(lines))
    return manifest
