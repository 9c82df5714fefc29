"""SCD2 operators: history backfill determinism + incremental apply."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.operators.scd2 import scd2_apply, scd2_history

T = dt.datetime


def _hist(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    return {
        (r.user_id, r.valid_from): (r.event_type, r.valid_to, r.is_current, r.n_events)
        for r in scd2_history(df).collect()
    }


def test_scd2_history_collapses_runs(spark):
    t = lambda m: T(2024, 1, 1, 0, m)
    got = _hist(
        spark,
        [
            (1, "a", t(0), 1),
            (1, "a", t(5), 2),
            (1, "b", t(10), 3),
            (1, "a", t(20), 4),  # a returns -> NEW version, not merged
            (2, "x", t(0), 5),
        ],
    )
    assert got == {
        (1, t(0)): ("a", t(10), False, 2),
        (1, t(10)): ("b", t(20), False, 1),
        (1, t(20)): ("a", None, True, 1),
        (2, t(0)): ("x", None, True, 1),
    }


def test_scd2_history_tiebreak_on_equal_ts(spark):
    """Two events at the SAME timestamp: event_id orders them, and the
    version sequence stays deterministic."""
    t0 = T(2024, 1, 1)
    got = _hist(spark, [(1, "b", t0, 2), (1, "a", t0, 1)])
    # a (event_id 1) first, then b opens at the same instant and is current
    assert got[(1, t0)] == ("a", t0, False, 1) or len(got) == 1
    rows = [(k, v) for k, v in got.items()]
    assert sum(1 for _, v in rows if v[2]) == 1  # exactly one current


def test_scd2_apply_close_insert_noop(spark):
    dim = spark.createDataFrame(
        [
            (1, "gold", T(2024, 1, 1), None, True),
            (2, "silver", T(2024, 1, 1), None, True),
            (3, "bronze", T(2023, 1, 1), T(2024, 1, 1), False),
            (3, "gold", T(2024, 1, 1), None, True),
        ],
        "user_id long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "platinum"), (2, "silver"), (4, "new")], "user_id long, tier string"
    )
    eff = T(2024, 6, 1)
    out = scd2_apply(dim, updates, "user_id", ["tier"], eff)
    got = sorted(
        (r.user_id, r.tier, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )
    assert got == sorted(
        [
            (1, "gold", T(2024, 1, 1), eff, False),  # closed
            (1, "platinum", eff, None, True),  # reopened
            (2, "silver", T(2024, 1, 1), None, True),  # no-op update
            (3, "bronze", T(2023, 1, 1), T(2024, 1, 1), False),  # history kept
            (3, "gold", T(2024, 1, 1), None, True),  # untouched
            (4, "new", eff, None, True),  # brand-new key
        ]
    )
    # idempotence: re-applying the same batch changes nothing
    again = scd2_apply(out, updates, "user_id", ["tier"], T(2024, 7, 1))
    assert sorted(
        (r.user_id, r.tier, r.valid_from, r.valid_to, r.is_current)
        for r in again.collect()
    ) == got
