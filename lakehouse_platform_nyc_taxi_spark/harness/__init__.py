"""Driver-contract query registry.

Maps every operator family in SURVEY.md §2 (plus the LLM-pipeline
extension operators) to a named query with two faces:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine under test)
- an equivalent ANSI-SQL string for the DuckDB oracle (or ``None`` for
  genuinely non-SQL-expressible operators -> rows-only check)

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    # Import for side effects (registration) on first use.
    from . import analytics, core, llm, streaming  # noqa: F401

    return _REGISTRY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }
