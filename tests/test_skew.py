"""Salted aggregation/join equal their unsalted counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.operators.skew import salted_agg, salted_join
from lakehouse_platform_nyc_taxi_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


def test_salted_agg_matches_plain_groupby(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = {
        (r.event_type,): (r.n, r.total)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,8)")).alias("total"),
        )
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, r.total)
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": (F.count("*"), F.sum("n")),
                "total": (
                    F.sum(F.col("value").cast("decimal(28,8)")),
                    F.sum("total"),
                ),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    users = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_total"))
    )
    plain = ev.join(users, ["user_id"]).select("event_id", "user_total")
    salted = salted_join(ev, users, ["user_id"], n_salts=4).select(
        "event_id", "user_total"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_outer_and_semi(spark):
    import pytest

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    users = ev.select("user_id").distinct()
    for how in ("right", "full_outer", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(ev, users, ["user_id"], n_salts=4, how=how)
