"""Gap filling + forward fill semantics."""

from __future__ import annotations

import datetime as dt

from lakehouse_platform_nyc_taxi_spark.operators.timeseries import gapfill_forward

T = dt.datetime


def test_gapfill_forward_fills_and_marks_gaps(spark):
    rows = [
        # user 1: events in hours 0 and 3; hour 1-2 are gaps carrying 10.0
        (1, 1, T(2024, 1, 1, 0, 15), 10.0),
        (2, 1, T(2024, 1, 1, 3, 5), 40.0),
        # two events in one slot: the later event_id wins
        (3, 1, T(2024, 1, 1, 3, 50), 41.0),
        # user 2: single event -> single slot, no gaps
        (4, 2, T(2024, 1, 2, 7, 0), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.slot): (r.value, r.is_gap)
        for r in gapfill_forward(df).collect()
    }
    assert got == {
        (1, T(2024, 1, 1, 0)): (10.0, False),
        (1, T(2024, 1, 1, 1)): (10.0, True),
        (1, T(2024, 1, 1, 2)): (10.0, True),
        (1, T(2024, 1, 1, 3)): (41.0, False),
        (2, T(2024, 1, 2, 7)): (7.0, False),
    }
    # bounded exchange budget: (user,slot) slot-reduce + lead window on
    # OCCUPIED slots only — the generated dense rows are never shuffled
    plan = gapfill_forward(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2


def test_gapfill_15min_step(spark):
    rows = [
        # user 1: 00:07 then 00:52 — slots 00:00..00:45, gaps between
        (1, 1, T(2024, 1, 1, 0, 7), 10.0),
        (2, 1, T(2024, 1, 1, 0, 52), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.slot: (r.value, r.is_gap)
        for r in gapfill_forward(df, step="15 minute").collect()
    }
    assert got == {
        T(2024, 1, 1, 0, 0): (10.0, False),
        T(2024, 1, 1, 0, 15): (10.0, True),
        T(2024, 1, 1, 0, 30): (10.0, True),
        T(2024, 1, 1, 0, 45): (40.0, False),
    }


def test_gapfill_runs_rollup_matches_dense_fill(spark):
    """The run-length form (r19: one row per observation with its
    inclusive fill range) must agree with explode-then-aggregate: per
    user, k slots / k-1 gaps per run, and the decimal-fenced sum of the
    dense fill equals the sum of exact k x value decimal products."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        gapfill_runs,
    )

    rows = [
        (1, 1, T(2024, 1, 1, 0, 7), 10.25),
        (2, 1, T(2024, 1, 1, 1, 52), 40.125),
        (3, 1, T(2024, 1, 1, 1, 58), 41.0625),  # same slot, later id wins
        (4, 2, T(2024, 1, 2, 7, 0), 7.5),
        (5, 3, T(2024, 1, 3, 5, 1), -2.125),
        (6, 3, T(2024, 1, 3, 9, 44), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    dense = (
        gapfill_forward(df, step="15 minute")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.sum(F.when(F.col("is_gap"), 1).otherwise(0)).alias("n_gaps"),
            F.sum(F.col("value").cast("decimal(28,8)"))
            .cast("double")
            .alias("total"),
        )
    )
    k = (
        F.timestamp_diff("MINUTE", F.col("slot"), F.col("_end")) / 15 + 1
    ).cast("long")
    runs = (
        gapfill_runs(df, step="15 minute")
        .select(
            "user_id",
            k.alias("_k"),
            (F.col("_obs").cast("decimal(28,8)") * k.cast("decimal(9,0)"))
            .alias("_ksum"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("_k").alias("n_slots"),
            F.sum(F.col("_k") - 1).alias("n_gaps"),
            F.sum("_ksum").cast("double").alias("total"),
        )
    )
    as_map = lambda frame: {r.user_id: (r.n_slots, r.n_gaps, r.total) for r in frame.collect()}
    dm, rm = as_map(dense), as_map(runs)
    assert dm == rm
    assert dm[1][0] >= 8 and dm[1][1] == dm[1][0] - 2  # 2 runs for user 1


def test_gapfill_day_step(spark):
    rows = [
        (1, 1, T(2024, 1, 1, 5), 1.0),
        (2, 1, T(2024, 1, 3, 9), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.slot.date().isoformat(): (r.value, r.is_gap)
        for r in gapfill_forward(df, step="1 day").collect()
    }
    assert got == {
        "2024-01-01": (1.0, False),
        "2024-01-02": (1.0, True),
        "2024-01-03": (3.0, False),
    }


def test_gapfill_rejects_unaligned_or_unknown_steps(spark):
    import pytest

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import slot_of
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 1, T(2024, 1, 1), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="does not divide"):
        gapfill_forward(df, step="7 minute")
    with pytest.raises(ValueError, match="multi-unit"):
        gapfill_forward(df, step="2 day")
    with pytest.raises(ValueError, match="step unit"):
        gapfill_forward(df, step="3 fortnight")
    with pytest.raises(ValueError, match="step must look like"):
        slot_of(F.col("ts"), "hourly")


def test_slot_of_grid_properties(spark):
    """Property check over adversarial timestamps and every supported
    step: the slot floors its timestamp (slot <= ts < slot + step) and
    slots tile a fixed grid (distance from the parent truncation is a
    multiple of the step). One batched Spark job per step."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import slot_of

    rows = [
        (i, T(2024, m, d, h, mi, s, us))
        for i, (m, d, h, mi, s, us) in enumerate(
            [
                (1, 1, 0, 0, 0, 0),
                (2, 29, 23, 59, 59, 999999),  # leap day, end of day
                (12, 31, 23, 59, 59, 0),
                (6, 15, 11, 44, 59, 1),
                (6, 15, 11, 45, 0, 0),  # exact boundary
                (6, 15, 12, 0, 0, 0),
                (3, 10, 2, 30, 0, 500000),
                (7, 4, 17, 59, 59, 999999),
            ]
        )
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    for step, unit_seconds in [
        ("1 minute", 60),
        ("15 minute", 900),
        ("30 minute", 1800),
        ("1 hour", 3600),
        ("2 hour", 7200),
        ("6 hour", 21600),
        ("1 day", 86400),
    ]:
        got = df.select(
            "ts",
            slot_of(F.col("ts"), step).alias("slot"),
            F.date_trunc("day", "ts").alias("day0"),
        ).collect()
        for r in got:
            delta = (r.ts - r.slot).total_seconds()
            assert 0 <= delta < unit_seconds, (step, r.ts, r.slot)
            # grid alignment: offset from midnight is a step multiple
            off = (r.slot - r.day0).total_seconds()
            assert off % unit_seconds == 0, (step, r.slot)


def test_rolling_zscore_flags_planted_spike(spark):
    import datetime as dt

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        rolling_zscore,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 48 steady hourly slots of ~10.0, one 30x spike at hour 40
    for h in range(48):
        v = 300.0 if h == 40 else 10.0 + (h % 3) * 0.5
        rows.append((h, t0 + dt.timedelta(hours=h, minutes=5), 1, "a", v, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = rolling_zscore(df, "event_type", "ts", "value").collect()
    assert [r["slot"].hour for r in out] == [16]  # hour 40 = day2 16:00
    assert out[0]["zscore"] > 4
    assert out[0]["slot_value"] == 300.0


def test_ohlc_ordering_key_sign_safe_before_2024_epoch(spark, tmp_path):
    """The micros-offset ordering key is biased non-negative: events
    BEFORE the 2024-01-01 epoch must still time-order open/close (an
    unbiased negative offset zero-pads into a string that sorts after
    positives, silently swapping open and close)."""
    import datetime as dt

    from lakehouse_platform_nyc_taxi_spark.harness.analytics import (
        timeseries_ohlc,
    )

    rows = [
        # one hour bucket in 2023: open should be the 10:05 value,
        # close the 10:55 value
        (1, dt.datetime(2023, 6, 1, 10, 5), 100, "tick", 5.0, "{}"),
        (2, dt.datetime(2023, 6, 1, 10, 30), 100, "tick", 9.0, "{}"),
        (3, dt.datetime(2023, 6, 1, 10, 55), 100, "tick", 2.0, "{}"),
        # a straddling bucket: one event in 2023, one in 2024 would be
        # different hours; instead straddle INSIDE one hour across the
        # epoch to force mixed-sign unbiased offsets
        (4, dt.datetime(2023, 12, 31, 23, 10), 100, "mix", 7.0, "{}"),
        (5, dt.datetime(2023, 12, 31, 23, 50), 100, "mix", 3.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    got = {
        (r.event_type): (r.open, r.close)
        for r in timeseries_ohlc(spark, sf).collect()
    }
    assert got["tick"] == (5.0, 2.0)
    assert got["mix"] == (7.0, 3.0)


def test_winsorize_clips_tails_exactly(spark):
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        winsorize_stats,
    )

    # values 1..100 in one group: p1 (lo=0.01) elects the value at
    # running-count ceil(0.01*100)=1 -> 1.0; hi=0.90 -> 90.0
    rows = [("g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = winsorize_stats(
        df, value_col="value", group_col="grp", lo=0.01, hi=0.90
    ).collect()[0].asDict()
    assert out["p_lo"] == 1.0 and out["p_hi"] == 90.0
    assert out["n_clipped_lo"] == 0 and out["n_clipped_hi"] == 10
    assert out["mean_raw"] == 50.5
    # clipped: 1..90 plus ten 90s -> (sum(1..90) + 900) / 100
    assert out["mean_winsorized"] == (sum(range(1, 91)) + 900) / 100
    assert out["n_rows"] == 100


def test_two_phase_running_sum_equals_single_window(spark):
    """The skew-safe two-phase cumulative sum must be value-identical to
    the plain whole-group window it replaces — keyed and unkeyed, with
    duplicate order values landing inside one bucket."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        two_phase_running_sum,
    )

    rows = [
        (kk, float(((i * 37 + ki * 11) % 100) % 13), ki * 1000 + i,
         float((i * 37 + ki * 11) % 7))
        for ki, kk in enumerate(("a", "b", "c"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, v double, tb long, wt double")
    got = {
        (r.k, r.tb): (r.running, r.running_total)
        for r in two_phase_running_sum(
            df, value="wt", order=("v", "tb"), keys=("k",), bucket_on="v",
            n_buckets=7, small_rows=0,
        ).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("v", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("k")
    want = {
        (r.k, r.tb): (r.c, r.t)
        for r in df.select(
            "k", "tb", F.sum("wt").over(w).alias("c"), F.sum("wt").over(wt).alias("t")
        ).collect()
    }
    assert got == want
    # unkeyed: global cumulative ordering, buckets carry the parallelism
    gu = {
        r.tb: r.running
        for r in two_phase_running_sum(
            df, value="wt", order=("v", "tb"), keys=(), bucket_on="v",
            small_rows=0,
        ).collect()
    }
    wu = Window.orderBy("v", "tb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wantu = {r.tb: r.c for r in df.select("tb", F.sum("wt").over(wu).alias("c")).collect()}
    assert gu == wantu
    # small-input fast path (default guard): same values, single window
    fast = {
        (r.k, r.tb): (r.running, r.running_total)
        for r in two_phase_running_sum(
            df, value="wt", order=("v", "tb"), keys=("k",), bucket_on="v"
        ).collect()
    }
    assert fast == want


def test_two_phase_running_sum_guards(spark):
    """The skew-safe form enforces its correctness precondition
    (bucket_on must lead the sort order — ADVICE r12) and selects the
    single-window fast path strictly by the probed row count."""
    import pytest

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        two_phase_running_sum,
    )

    df = spark.createDataFrame(
        [(float(i % 5), i, 1.0) for i in range(20)], "v double, tb long, wt double"
    )
    with pytest.raises(ValueError, match="leading sort column"):
        two_phase_running_sum(df, value="wt", order=("tb", "v"), bucket_on="v")
    # above the guard -> bucketed plan (detail window partitions by _bucket)
    bucketed = two_phase_running_sum(
        df, value="wt", order=("v", "tb"), small_rows=10
    )
    plan = bucketed._jdf.queryExecution().optimizedPlan().toString()
    assert "_bucket" in plan
    # at/below the guard -> single-window plan, no bucket machinery
    single = two_phase_running_sum(
        df, value="wt", order=("v", "tb"), small_rows=20
    )
    plan = single._jdf.queryExecution().optimizedPlan().toString()
    assert "_bucket" not in plan
    # both paths agree on values
    kb = {r.tb: (r.running, r.running_total) for r in bucketed.collect()}
    ks = {r.tb: (r.running, r.running_total) for r in single.collect()}
    assert kb == ks


def test_holt_smoothing_hand_fold(spark):
    """holt_smoothing vs a hand-stepped fold on a 3-point series
    (alpha=0.5, beta=0.25): y = 10, 20, 30.
      t=2: pred=10, l=0.5*20+0.5*10=15, b=0.25*5=1.25, sse=100
      t=3: pred=16.25, l=0.5*30+0.5*16.25=23.125, b=0.25*8.125+0.75*1.25
           =2.96875, sse=100+189.0625=289.0625
    """
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        holt_smoothing,
    )

    rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)]
    df = spark.createDataFrame(rows, "user_id long, t long, y double")
    got = holt_smoothing(df, "user_id", "t", "y").collect()[0]
    assert got.n_obs == 3
    assert got.level == 23.125
    assert got.trend == 2.96875
    assert got.forecast_next == 26.09375
    assert got.sse == 289.0625


def test_holt_smoothing_single_point(spark):
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        holt_smoothing,
    )

    df = spark.createDataFrame([(7, 1, 42.5)], "user_id long, t long, y double")
    got = holt_smoothing(df, "user_id", "t", "y").collect()[0]
    assert (got.n_obs, got.level, got.trend, got.sse) == (1, 42.5, 0.0, 0.0)
    assert got.forecast_next == 42.5


def test_holt_winters_hand_fold(spark):
    """holt_winters_smoothing vs a hand-stepped fold, period=2
    (alpha=0.5, beta=0.25, gamma=0.5): y = 10, 20, 30, 40.
      seed: l=15, s=[-5, 5], b=0
      t=3: pred=10,   sse=400,    l=25,    b=2.5,    s=[5, 0]
      t=4: pred=32.5, sse=456.25, l=31.25, b=3.4375, s=[0, 6.875]
    A second user with only 2 points (n <= m) must be dropped."""
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        holt_winters_smoothing,
    )

    rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (1, 4, 40.0),
            (2, 1, 5.0), (2, 2, 6.0)]
    df = spark.createDataFrame(rows, "user_id long, t long, y double")
    out = holt_winters_smoothing(df, "user_id", "t", "y", period=2).collect()
    assert len(out) == 1 and out[0].user_id == 1
    got = out[0]
    assert got.n_obs == 4
    assert got.level == 31.25
    assert got.trend == 3.4375
    assert got.season_next == 0.0
    assert got.forecast_next == 34.6875
    assert got.sse == 456.25


def test_ewma_control_chart_hand_fold(spark):
    """Two-point series, hand-stepped (lam=.5, L=3): mu=15, sigma=5;
    z1=12.5 (width 7.5), z2=16.25 — no alarms. A level-shift series
    (ten 0s then ten 10s, mu=5 sigma=5) at L=1 alarms on BOTH flats:
    z dips to 1.25 at t=2 (width 5*sqrt(f*(1-.25^2))=2.795 < 3.75)
    and stays out of band as it climbs toward 10 — 17 of 20 points."""
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        ewma_control_chart,
    )

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0)], "user_id long, t long, y double"
    )
    got = ewma_control_chart(df, "user_id", "t", "y").collect()[0]
    assert (got.n_obs, got.mean, got.sigma) == (2, 15.0, 5.0)
    assert got.ewma_final == 16.25
    assert got.n_alarms == 0 and got.first_alarm == 0

    shift = [(2, t, 0.0) for t in range(1, 11)] + [
        (2, t, 10.0) for t in range(11, 21)
    ]
    df2 = spark.createDataFrame(shift, "user_id long, t long, y double")
    got2 = ewma_control_chart(df2, "user_id", "t", "y", L=1.0).collect()[0]
    assert got2.mean == 5.0 and got2.sigma == 5.0
    assert got2.n_alarms == 17
    assert got2.first_alarm == 2


def test_holt_winters_property_matches_python_fold(spark):
    """Property check: the bucketed applyInPandas fold must equal a
    pure-Python replay of the documented recurrence for arbitrary
    series (values on a 0.25 grid so seed sums stay exact-comparable),
    any period, any bucket count — bucketing and Arrow batching must
    never change per-series math. One batched Spark job for a corpus
    of adversarial series shapes."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        holt_winters_smoothing,
    )

    def r8(x):
        return (math.floor(abs(x) * 1e8 + 0.5) / 1e8) * (1.0 if x >= 0 else -1.0)

    def py_fold(y, m):
        if len(y) <= m:
            return None
        acc = y[0]
        for t in range(1, m):
            acc = r8(acc + y[t])
        l = r8(acc / m)
        s = [r8(y[i] - l) for i in range(m)]
        b, sse = 0.0, 0.0
        for t in range(m, len(y)):
            yt, sm = y[t], s[0]
            pred = r8(l + b + sm)
            sse = r8(sse + r8((yt - pred) * (yt - pred)))
            l_new = r8(0.5 * (yt - sm) + 0.5 * (l + b))
            b = r8(0.25 * (l_new - l) + 0.75 * b)
            s = s[1:] + [r8(0.5 * (yt - l_new) + 0.5 * sm)]
            l = l_new
        return (len(y), l, b, s[0], r8(l + b + s[0]), sse)

    grid = st.integers(-400, 400).map(lambda i: i * 0.25)
    series = st.lists(grid, min_size=1, max_size=15)

    @given(st.lists(series, min_size=1, max_size=6), st.integers(2, 4))
    @settings(max_examples=8, deadline=None)
    def run(corpus, m):
        rows = [
            (k, t, v) for k, ys in enumerate(corpus) for t, v in enumerate(ys)
        ]
        df = spark.createDataFrame(rows, "k long, t long, y double")
        got = {
            r.k: (r.n_obs, r.level, r.trend, r.season_next,
                  r.forecast_next, r.sse)
            for r in holt_winters_smoothing(
                df, "k", "t", "y", period=m, n_buckets=3
            ).collect()
        }
        def r6(x):
            return (math.floor(abs(x) * 1e6 + 0.5) / 1e6) * (1.0 if x >= 0 else -1.0)
        want = {}
        for k, ys in enumerate(corpus):
            ref = py_fold([float(v) for v in ys], m)
            if ref is not None:
                n, l, b, sn, fc, sse = ref
                want[k] = (n, r6(l), r6(b), r6(sn), r6(fc), r6(sse))
        assert got == want

    run()


def test_sequential_folds_handle_empty_and_short_input(spark):
    """Empty input -> empty output with the declared schema; series at
    exactly the period length drop from Holt-Winters; a single point
    is a valid EWMA series (one in-band observation, no alarm)."""
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        ewma_control_chart,
        holt_smoothing,
        holt_winters_smoothing,
    )

    empty = spark.createDataFrame([], "user_id long, t long, y double")
    assert holt_smoothing(empty, "user_id", "t", "y").count() == 0
    assert holt_winters_smoothing(empty, "user_id", "t", "y", period=2).count() == 0
    assert ewma_control_chart(empty, "user_id", "t", "y").count() == 0

    exact_period = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, 6.0)], "user_id long, t long, y double"
    )
    assert (
        holt_winters_smoothing(exact_period, "user_id", "t", "y", period=2).count()
        == 0
    )

    single = spark.createDataFrame([(1, 1, 5.0)], "user_id long, t long, y double")
    got = ewma_control_chart(single, "user_id", "t", "y").collect()[0]
    # z_1 = mean = 5, sigma = 0, width = 0: |z - mu| = 0 is NOT > 0
    assert (got.n_obs, got.n_alarms, got.first_alarm) == (1, 0, 0)


def test_holt_backtest_hand_computed(spark):
    """y=[10,12,14], alpha=.5 beta=.25: step2 pred=10 (ae 2), step3
    pred=11.25 (ae 2.75) -> mae 2.375, mase 4.75/4; mape/smape from the
    round8-fenced per-step terms."""
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        holt_backtest,
    )

    rows = [(1, t, y) for t, y in enumerate([10.0, 12.0, 14.0])]
    df = spark.createDataFrame(rows, "user_id long, t int, y double")
    got = holt_backtest(df, "user_id", "t", "y").collect()[0]
    assert got.n_obs == 3
    assert got.mae == 2.375
    assert got.mase == 1.1875
    assert got.mape == 0.181548  # r6((r8(2/12) + r8(2.75/14)) / 2)
    assert got.smape == 0.19982  # r6((r8(4/22) + r8(5.5/25.25)) / 2)

    # constant series: perfect naive -> mase NULL, mae 0
    const = spark.createDataFrame(
        [(2, t, 5.0) for t in range(4)], "user_id long, t int, y double"
    )
    g2 = holt_backtest(const, "user_id", "t", "y").collect()[0]
    assert g2.mae == 0.0 and g2.mase is None and g2.mape == 0.0

    # all-zero series: mape/smape NULL; single-obs series dropped
    zero = spark.createDataFrame(
        [(3, t, 0.0) for t in range(3)] + [(4, 0, 1.0)],
        "user_id long, t int, y double",
    )
    out = {r.user_id: r for r in holt_backtest(zero, "user_id", "t", "y").collect()}
    assert set(out) == {3}
    assert out[3].mape is None and out[3].smape is None and out[3].mase is None


def test_acf_hand_computed(spark):
    """Alternating series [1,-1,1,-1,...] (mean 0): acf(1) = -1 up to
    the unshared-endpoint bias (num has n-1 terms, den n), acf(2) > 0;
    constant series -> NULL acf."""
    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import acf

    rows = [("a", t, 1.0 if t % 2 == 0 else -1.0) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = {r.lag: r for r in acf(df, "g", "t", "y", max_lag=3).collect()}
    assert out[1].n_pairs == 9 and out[2].n_pairs == 8
    assert out[1].acf_value == -0.9  # -(n-1)/n with mean exactly 0
    assert out[2].acf_value == 0.8
    assert out[3].acf_value == -0.7
    const = spark.createDataFrame(
        [("c", t, 5.0) for t in range(6)], "g string, t int, y double"
    )
    got = acf(const, "g", "t", "y", max_lag=2).collect()
    assert all(r.acf_value is None for r in got)


def test_holt_backtest_property_matches_python_fold(spark):
    """Property check: the backtest fold equals a pure-Python replay of
    the documented error recurrences for arbitrary series — bucketing
    and Arrow batching never change per-series accounting, including
    the zero-y MAPE skip and the constant-series MASE NULL."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lakehouse_platform_nyc_taxi_spark.operators.timeseries import (
        holt_backtest,
    )

    def r8(x):
        return (math.floor(abs(x) * 1e8 + 0.5) / 1e8) * (1.0 if x >= 0 else -1.0)

    def r6(x):
        return (math.floor(abs(x) * 1e6 + 0.5) / 1e6) * (1.0 if x >= 0 else -1.0)

    def py_backtest(y):
        n = len(y)
        if n < 2:
            return None
        l, b = y[0], 0.0
        sum_ae = sum_ape = sum_sm = sum_nv = 0.0
        n_ape = n_sm = 0
        for t in range(1, n):
            yt, yp = y[t], y[t - 1]
            pred = r8(l + b)
            ae = r8(abs(yt - pred))
            sum_ae = r8(sum_ae + ae)
            if yt != 0.0:
                sum_ape = r8(sum_ape + r8(ae / abs(yt)))
                n_ape += 1
            den = abs(yt) + abs(pred)
            if den != 0.0:
                sum_sm = r8(sum_sm + r8(2.0 * ae / den))
                n_sm += 1
            sum_nv = r8(sum_nv + r8(abs(yt - yp)))
            l_new = r8(0.5 * yt + 0.5 * (l + b))
            b = r8(0.25 * (l_new - l) + 0.75 * b)
            l = l_new
        return (
            n,
            r6(sum_ae / (n - 1)),
            r6(sum_ape / n_ape) if n_ape else None,
            r6(sum_sm / n_sm) if n_sm else None,
            r6(sum_ae / sum_nv) if sum_nv > 0.0 else None,
        )

    grid = st.integers(-400, 400).map(lambda i: i * 0.25)
    series = st.lists(grid, min_size=1, max_size=14)

    @given(st.lists(series, min_size=1, max_size=6))
    @settings(max_examples=8, deadline=None)
    def run(corpus):
        rows = [
            (k, t, v) for k, ys in enumerate(corpus) for t, v in enumerate(ys)
        ]
        df = spark.createDataFrame(rows, "k long, t long, y double")
        got = {
            r.k: (r.n_obs, r.mae, r.mape, r.smape, r.mase)
            for r in holt_backtest(df, "k", "t", "y", n_buckets=3).collect()
        }
        want = {}
        for k, ys in enumerate(corpus):
            ref = py_backtest([float(v) for v in ys])
            if ref is not None:
                want[k] = ref
        assert got == want

    run()


def test_ljung_box_short_series_recovers_true_n(spark, tmp_path):
    """Regression (ADVICE r16): for a series shorter than max_lag+1 days,
    zero-pair lags must not inflate n — q_stat/reject_05 then diverge
    from the oracle's count(*) OVER (PARTITION BY g). Builds a fixture
    with 1-, 3-, and 10-day series and runs the registered query against
    its own DuckDB oracle on that fixture."""
    import duckdb
    import pandas as pd

    from lakehouse_platform_nyc_taxi_spark import harness

    from .oracle_utils import assert_matches_oracle

    rows = []
    for i, (etype, ndays) in enumerate([("s1", 1), ("s3", 3), ("s10", 10)]):
        for d in range(ndays):
            rows.append(
                {
                    "event_id": i * 100 + d,
                    "ts": T(2024, 1, 1 + d, 12, 0, 0),
                    "user_id": 1,
                    "event_type": etype,
                    "value": float((d * 7) % 5) + 0.25 * (d % 3),
                    "props": "",
                }
            )
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    spec = harness.registry()["timeseries_ljung_box"]
    df = spec.fn(spark, str(tmp_path))
    ns = {r.event_type: r.n for r in df.collect()}
    assert ns == {"s1": 1, "s3": 3, "s10": 10}
    assert_matches_oracle(df, duck, spec.oracle, name="ljung_box_short")
