"""Python UDF/UDAF/UDTF surface (SURVEY §2.10): vectorized edges only."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.functions.python_udfs import (
    geometric_mean,
    register_python_functions,
    winsorized_mean,
)


@pytest.fixture(scope="module")
def values(spark):
    rows = [("a", float(v)) for v in (1, 10, 100)] + [("b", 5.0), ("b", 20.0)]
    return spark.createDataFrame(rows, "grp string, v double")


def test_geometric_mean_grouped(values):
    got = {
        r.grp: r.gm
        for r in values.groupBy("grp").agg(geometric_mean("v").alias("gm")).collect()
    }
    assert got["a"] == pytest.approx(10.0)
    assert got["b"] == pytest.approx(math.sqrt(100.0))


def test_winsorized_mean_robust_to_outliers(spark):
    rows = [("a", float(v)) for v in range(100)] + [("a", 1e9)]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = df.groupBy("grp").agg(winsorized_mean("v").alias("wm")).first().wm
    assert got < 1e6  # the outlier is clipped to ~p95, not averaged in


def test_split_sentences_udtf(spark):
    register_python_functions(spark)
    spark.createDataFrame(
        [(1, "First one. Second two! Third?"), (2, None)], "doc_id long, text string"
    ).createOrReplaceTempView("t")
    rows = spark.sql(
        "SELECT t.doc_id, s.sentence, s.sentence_idx "
        "FROM t, LATERAL split_sentences(text) s ORDER BY doc_id, sentence_idx"
    ).collect()
    assert [(r.doc_id, r.sentence_idx) for r in rows] == [(1, 0), (1, 1), (1, 2)]
    assert rows[1].sentence == "Second two!"


def test_sql_registration(spark, values):
    register_python_functions(spark)
    values.createOrReplaceTempView("vals")
    got = spark.sql(
        "SELECT grp, geometric_mean(v) AS gm FROM vals GROUP BY grp ORDER BY grp"
    ).collect()
    assert got[0].gm == pytest.approx(10.0)
