"""Local mirror of the driver's DuckDB-oracle comparison.

The driver compares row count + schema + order-insensitive value hash.
We compare *exactly* (values sorted by all columns, floats bit-equal)
so any drift the hash would catch shows up in pytest first. Queries
whose float aggregates could differ in the last bit between engines
must round explicitly on BOTH sides — if a test here needs a tolerance,
the query itself is wrong for the gate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Sort columns by name (driver sorts columns before hashing), then
    # rows by every column for an order-insensitive compare. The DRIVER's
    # canonicalizer cannot sort/hash array cells (TypeError: unhashable
    # numpy.ndarray) — so this mirror must REJECT them, not tuple-ize
    # them: a query that passes locally but crashes the driver is the
    # exact failure mode this module exists to prevent.
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if df[col].dtype == object:
            bad = df[col].map(
                lambda v: isinstance(v, (list, tuple, dict))
                or hasattr(v, "tolist")
            )
            if bad.any():
                raise AssertionError(
                    f"column {col!r} contains array/struct cells the "
                    "driver's canonicalizer cannot hash — oracle-paired "
                    "queries must emit scalar columns only (serialize "
                    "with array_join / array_to_string)"
                )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), (
        f"{name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}"
    )
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not _cell_equal(_coerce(a), _coerce(b))
        ]
        assert not bad, f"{name}: column {col!r} differs, first: {bad[:5]}"


def _coerce(v):
    # pandas may hand back numpy scalars / Timestamps; normalize to python.
    # DATE columns come back as datetime.date from Spark but midnight
    # Timestamps from DuckDB's .df() — normalize both to datetime.
    import datetime

    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return datetime.datetime(v.year, v.month, v.day)
    if hasattr(v, "item"):
        return v.item()
    return v


def assert_driver_canonicalizable(spark_df: DataFrame, name: str = "") -> None:
    """Every oracle-paired query must emit ONLY scalar top-level columns.

    The driver's pandas-based canonicalizer crashes on array/map/struct
    cells (``TypeError: unhashable type: 'numpy.ndarray'``); this pins
    the schema contract so the failure is caught locally, pre-collect.
    """
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: driver-uncanonicalizable top-level column(s) {bad} — "
        "serialize arrays with F.array_join (Spark) / array_to_string "
        "(DuckDB) or explode to long form"
    )


def assert_matches_oracle(
    spark_df: DataFrame,
    duck: duckdb.DuckDBPyConnection,
    oracle_sql: str,
    name: str = "",
) -> None:
    assert_driver_canonicalizable(spark_df, name=name)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck.sql(oracle_sql).df()
    compare_frames(spark_pdf, duck_pdf, name=name)
