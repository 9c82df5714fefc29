"""Streaming module: transform logic on crafted data + end-to-end drain.

The oracle harness (test_harness_oracle) already value-checks the three
append-mode queries against DuckDB at sf0.01; these tests pin the
fine-grained semantics on micro-data where the expected values are
hand-computable.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark import streaming as S

from .conftest import SF_SMOKE

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), u, "click", v, None)
            for i, (m, u, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_session_window_gap_semantics(spark):
    # user 1: events at +0, +29, +59 -> ONE session (each gap <= 30 min);
    # user 2: events at +0, +31 -> TWO sessions (gap boundary is inclusive,
    # so a 30-min gap would merge; 31 min splits)
    ev = _events(
        spark,
        [(0, 1, 1.0), (29, 1, 1.0), (59, 1, 1.0), (0, 2, 1.0), (31, 2, 1.0)],
    )
    # batch frame: session_window works identically without a stream
    out = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", "s.start", "s.end", "n")
        .collect()
    )
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0].n == 3
    assert len(by_user[2]) == 2
    # session end = last event + gap
    assert by_user[1][0].end == T0 + dt.timedelta(minutes=59 + 30)


def test_stateful_user_stats_matches_batch_agg(spark):
    ev_stream = S.read_events_stream(spark, SF_SMOKE)
    got = {
        r.user_id: r
        for r in S.run_available_now(S.stateful_user_stats(ev_stream), "update").collect()
    }
    from lakehouse_platform_nyc_taxi_spark.sources.testdata import load_table

    exp = {
        r.user_id: r
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for uid, e in exp.items():
        assert got[uid].n_events == e.n_events
        assert got[uid].max_value == pytest.approx(e.max_value)
        # fixed-point accumulation: the running total is EXACTLY the batch
        # sum of per-event hundredths (no float drift, no approx needed)
        assert got[uid].total_value == e.total_cents / 100.0


def test_windowed_rollup_append_drops_unfinalized_tail(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    out = S.run_available_now(
        S.windowed_rollup(ev, window="1 day", watermark="1 hour"), "append"
    )
    from lakehouse_platform_nyc_taxi_spark.sources.testdata import load_table

    batch = load_table(spark, SF_SMOKE, "events")
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=1)
    ends = [r.window_end for r in out.select("window_end").distinct().collect()]
    assert ends, "append mode emitted no finalized windows"
    assert all(e.replace(tzinfo=None) <= cutoff for e in ends)


def test_grouping_sets_rollup_levels_consistent(spark):
    """Every finalized window's grand total must equal the sum of its
    per-type rows (the grouping-sets invariant), and both levels must
    share the same finalized window set."""
    ev = S.read_events_stream(spark, SF_SMOKE)
    out = S.run_available_now(
        S.grouping_sets_rollup(ev, window="1 day", watermark="1 hour"), "append"
    ).collect()
    assert out, "append mode emitted no finalized windows"
    by_window: dict = {}
    for r in out:
        lv = by_window.setdefault(r.window_start, {"type": 0, "total": 0, "tv": 0.0, "ttv": 0.0})
        if r.gset == "type":
            lv["type"] += r.n_events
            lv["tv"] += r.total_value
        else:
            assert (r.gset, r.key) == ("total", "ALL")
            lv["total"] += r.n_events
            lv["ttv"] += r.total_value
    for w, lv in by_window.items():
        assert lv["type"] == lv["total"] > 0, w
        assert abs(lv["tv"] - lv["ttv"]) < 1e-6, w


def test_chained_window_rollup_matches_flat_daily(spark):
    """The two-level (hour -> day) chained aggregation must produce the
    same daily totals as a single flat daily aggregation, with
    n_fine_windows counting the distinct occupied hours."""
    ev = S.read_events_stream(spark, SF_SMOKE)
    out = {
        (r.window_start, r.event_type): (r.n_events, r.n_fine_windows, r.total_value)
        for r in S.run_available_now(
            S.chained_window_rollup(ev, watermark="1 hour"), "append"
        ).collect()
    }
    assert out, "append mode emitted no finalized windows"
    flat = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in S.run_available_now(
            S.windowed_rollup(
                S.read_events_stream(spark, SF_SMOKE),
                window="1 day",
                watermark="1 hour",
            ),
            "append",
        ).collect()
    }
    assert set(out) == set(flat)
    for k, (n, n_hours, tv) in out.items():
        assert (n, tv) == flat[k], k
        assert 1 <= n_hours <= 24, k


def test_stream_upsert_foreachbatch(spark, tmp_path):
    """foreachBatch + incremental delete+insert: re-delivered keys update
    in place instead of duplicating."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.streaming.sinks import stream_upsert_parquet

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    target = str(tmp_path / "table")
    schema = "id long, v double, year int, month int"

    def write_src(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src_dir / name))

    write_src("f1", [(1, 1.0, 2024, 1), (2, 2.0, 2024, 1)])
    stream = spark.readStream.schema(schema).parquet(str(src_dir) + "/*")
    q = stream_upsert_parquet(
        stream, target, str(tmp_path / "ckpt"), unique_key=["id"]
    )
    q.awaitTermination()
    assert {(r.id, r.v) for r in spark.read.parquet(target).collect()} == {
        (1, 1.0),
        (2, 2.0),
    }

    # second delivery: id=2 updated, id=3 new — same key replaced, no dupes
    write_src("f2", [(2, 20.0, 2024, 1), (3, 3.0, 2024, 1)])
    q = stream_upsert_parquet(
        stream, target, str(tmp_path / "ckpt"), unique_key=["id"]
    )
    q.awaitTermination()
    got = {(r.id, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 1.0), (2, 20.0), (3, 3.0)}
    assert spark.read.parquet(target).groupBy("id").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_stream_static_enrich_batch_equivalence(spark):
    """The transform gives identical results on a batch frame (stream-static
    joins are stateless, so batch equivalence is exact), inner-join drops
    events with no dim row."""
    ev = _events(spark, [(0, 1, 1.0), (10, 1, 2.0), (20, 2, 4.0), (30, 99, 8.0)])
    dim = spark.createDataFrame(
        [(1, 10), (2, 20)], "c_custkey long, c_nationkey int"
    )
    out = S.stream_static_enrich(ev, dim, window="1 hour", watermark="10 minutes")
    rows = {(r.c_nationkey): (r.n_events, r.total_value) for r in out.collect()}
    assert rows == {10: (2, 3.0), 20: (1, 4.0)}  # user 99 dropped (no dim)


def test_stream_merge_snapshot_upsert_exactly_once(spark, tmp_path):
    """foreachBatch MERGE into a snapshot table: re-delivered keys update
    in place, replays are no-ops, history time-travels."""
    from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap
    from lakehouse_platform_nyc_taxi_spark.streaming.sinks import (
        stream_merge_snapshot,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    schema = "id long, v double"

    spark.createDataFrame([(1, 1.0), (2, 2.0), (2, 2.0)], schema).coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_merge_snapshot(stream, table, ckpt, ["id"])
    got = {r.id: r.v for r in snap.read_table(spark, table).collect()}
    assert got == {1: 1.0, 2: 2.0}  # in-batch dup collapsed

    # second drain: key 2 updated, key 3 inserted
    spark.createDataFrame([(2, 20.0), (3, 3.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    stream_merge_snapshot(stream2, table, ckpt, ["id"])
    got = {r.id: r.v for r in snap.read_table(spark, table).collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}

    # replay with same checkpoint and unchanged source: no new version
    v = snap.current_version(table)
    stream3 = spark.readStream.schema(schema).parquet(src)
    stream_merge_snapshot(stream3, table, ckpt, ["id"])
    assert snap.current_version(table) == v

    # pre-merge image still time-travels
    assert {r.id for r in snap.read_table(spark, table, 1).collect()} == {1, 2}
    assert [h["op"] for h in snap.history(table)] == [
        "merge-update",
        "merge-update",
    ]


def test_stream_stream_attribution_interval_semantics(spark):
    rows = [
        # (event_id, minutes, user, type, value)
        (0, 0, 1, "view", 1.0),
        (1, 30, 1, "purchase", 5.0),   # within 2h of view 0 -> match
        (2, 130, 1, "purchase", 7.0),  # 10 min past horizon -> no match
        (3, 0, 2, "purchase", 9.0),    # same instant as nothing; no view
        (4, 10, 2, "view", 1.0),       # view AFTER purchase -> no match
        (5, 40, 2, "purchase", 3.0),   # 30 min after view 4 -> match
    ]
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), u, t, v, None)
            for i, m, u, t, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["view_id"], r["purchase_id"]): r
        for r in S.stream_stream_attribution(df).collect()
    }
    assert set(got) == {(0, 1), (4, 5)}
    assert got[(0, 1)]["secs_to_purchase"] == 1800
    assert got[(4, 5)]["purchase_value"] == 3.0


def test_stream_stream_attribution_streaming_drain_matches_batch(spark):
    ev_stream = S.read_events_stream(spark, SF_SMOKE)
    from lakehouse_platform_nyc_taxi_spark.sources.testdata import load_table

    ev_batch = load_table(spark, SF_SMOKE, "events")
    streamed = S.run_available_now(
        S.stream_stream_attribution(ev_stream), "append", state_partitions=4
    )
    batch = S.stream_stream_attribution(ev_batch)
    s_rows = sorted(tuple(r) for r in streamed.collect())
    b_rows = sorted(tuple(r) for r in batch.collect())
    assert s_rows == b_rows and len(s_rows) > 0


def test_observed_write_counts_violations_in_one_job(spark, tmp_path):
    from lakehouse_platform_nyc_taxi_spark.quality.observers import (
        ExpectationError,
        observed_write,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)], "id long, v double"
    )
    exp = {
        "v_negative": F.col("v") < 0,
        "v_null": F.col("v").isNull(),
    }
    out = str(tmp_path / "obs_out")
    counts = observed_write(df, out, exp)
    assert counts == {"v_negative": 1, "v_null": 1, "_rows_observed": 4}
    assert spark.read.parquet(out).count() == 4  # track mode keeps all rows

    import pytest as _pt

    with _pt.raises(ExpectationError, match="v_negative"):
        observed_write(df, str(tmp_path / "obs_out2"), exp, on_violation="fail")
    # fail policy raises AFTER the write (write-audit-publish caveat)
    assert spark.read.parquet(str(tmp_path / "obs_out2")).count() == 4


def test_streaming_drain_with_expectations(spark):
    from lakehouse_platform_nyc_taxi_spark.quality.observers import (
        drain_with_expectations,
    )

    ev = S.read_events_stream(spark, SF_SMOKE)
    sink, totals = drain_with_expectations(
        ev.select("event_id", "value"),
        {"value_null": F.col("value").isNull(),
         "value_huge": F.col("value") > 1e12},
    )
    n = sink.count()
    assert n == totals["_rows_observed"] > 0
    assert totals["value_huge"] == 0


@pytest.mark.slow
def test_checkpoint_restart_resumes_from_offsets(spark, tmp_path):
    """A NEW streaming query on the same checkpoint must resume from the
    recorded source offsets: files already processed before the restart
    are never re-read, new files are — no duplicates, no loss."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, value double"

    spark.createDataFrame([(1, 1.0), (2, 2.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q1 = S.stream_append_parquet(stream, out, ckpt)
    q1.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    # second batch of source files arrives while "down"
    spark.createDataFrame([(3, 3.0), (4, 4.0), (5, 5.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    # restart: a fresh query object, same checkpoint
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = S.stream_append_parquet(stream2, out, ckpt)
    q2.awaitTermination()
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]  # exactly once across the restart


@pytest.mark.slow
def test_stream_merge_snapshot_mor_mode(spark, tmp_path):
    """mode='mor': batches after bootstrap apply as merge-on-read —
    no data-file rewrites, exactly-once on replay, and the commits
    stream onward through snapshot_cdf without skipChangeCommits."""
    from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap
    from lakehouse_platform_nyc_taxi_spark.sources.python_datasource import (
        SnapshotCdfDataSource,
    )
    from lakehouse_platform_nyc_taxi_spark.streaming.sinks import (
        stream_merge_snapshot,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    src = str(tmp_path / "src")
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    schema = "id long, v double"

    spark.createDataFrame([(1, 1.0), (2, 2.0)], schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_merge_snapshot(stream, table, ckpt, ["id"], mode="mor")
    files_v1 = set(snap._read_manifest(table, 1)["files"])

    spark.createDataFrame([(2, 20.0), (3, 3.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    stream_merge_snapshot(stream2, table, ckpt, ["id"], mode="mor")
    got = {r.id: r.v for r in snap.read_table(spark, table).collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}
    m = snap._read_manifest(table, snap.current_version(table))
    assert files_v1 <= set(m["files"])  # bootstrap files never rewritten
    assert m["dv"]  # key 2's old image tombstoned
    assert [h["op"] for h in snap.history(table)] == [
        "merge-update",
        "merge_mor-update",
    ]

    # replay: no new version (exactly-once tag honored by the MOR commit)
    v = snap.current_version(table)
    stream3 = spark.readStream.schema(schema).parquet(src)
    stream_merge_snapshot(stream3, table, ckpt, ["id"], mode="mor")
    assert snap.current_version(table) == v

    # downstream CDC: the MOR merge streams as delete+insert rows
    out, ck2 = str(tmp_path / "cdf_out"), str(tmp_path / "cdf_ck")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.read.parquet(out)
    assert r.filter("_change_type = 'delete' and id = 2 and v = 2.0").count() == 1
    assert r.filter("_change_type = 'insert'").count() == 4  # 2 bootstrap + 2 merged


@pytest.mark.slow
def test_stateful_user_stats_event_time_ttl_evicts_idle_keys(spark, tmp_path):
    """Event-time TTL: a key idle longer than the TTL (by watermark) is
    evicted, so its next event starts a fresh lifetime — deterministic
    because eviction rides the watermark, not the wall clock. Three
    single-file micro-batches: user 1 active in batch 1 only; by batch
    3 the watermark has passed (last_seen + ttl), so user 1's final
    count restarts at 1 instead of accumulating to 2."""
    import datetime as dt

    src = str(tmp_path / "ttl_src")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, user):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, "click", 1.0, "{}")

    write_file("f1", [ev(1, 0, 1), ev(2, 0, 2)])
    write_file("f2", [ev(3, 300, 2)])  # watermark after this batch: 290m
    # user 1 absent while the watermark (290m) passes its 0m+60m timeout
    # -> evicted here (timeouts only fire for keys with no data in the
    # batch, so the eviction batch must not contain user 1)
    write_file("f3", [ev(4, 600, 2)])
    write_file("f4", [ev(5, 900, 1)])  # user 1 returns -> fresh state

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = S.run_available_now(
        S.stateful_user_stats(stream, state_ttl_minutes=60, watermark="10 minutes"),
        "update",
        state_partitions=4,
    )
    rows = out.collect()
    # last emitted row per user wins (update mode accumulates emissions)
    last = {}
    for r in rows:
        last[r.user_id] = r.n_events
    assert last[1] == 1  # fresh lifetime after eviction
    # sanity: without TTL user 1 accumulates both events
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ev2 = stream2.withColumn("ts", F.col("ts").cast("timestamp"))
    base = S.run_available_now(S.stateful_user_stats(ev2), "update")
    last2 = {}
    for r in base.collect():
        last2[r.user_id] = r.n_events
    assert last2[1] == 2


def test_stateful_ttl_clamps_timeout_above_watermark(spark, tmp_path):
    """A LATE event (arbitrary stateful ops don't auto-drop late rows)
    whose ts + ttl is already at or below the current watermark must not
    crash the query: Spark rejects timeout timestamps <= watermark with
    IllegalArgumentException, so the op clamps to watermark + 1 and the
    key simply times out at the next trigger."""
    import datetime as dt

    src = str(tmp_path / "late_ttl_src")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, user):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, "click", 1.0, "{}")

    # batch 1 pushes the watermark to ~1990m; batch 2's user-1 event at
    # 0m then computes timeout 0m+60m << watermark -> must clamp
    write_file([ev(1, 2000, 2)])
    write_file([ev(2, 0, 1)])
    write_file([ev(3, 2010, 2)])  # user 1 absent -> clamped timeout fires

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = S.run_available_now(
        S.stateful_user_stats(
            stream, state_ttl_minutes=60, watermark="10 minutes"
        ),
        "update",
        state_partitions=4,
    )
    last = {}
    for r in out.collect():
        last[r.user_id] = r.n_events
    assert last[1] == 1  # processed (not crashed), then evicted
    assert last[2] == 2


def test_stream_dedup_gate_flags_stored_duplicate(spark, tmp_path):
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark import streaming as S

    text_dup = "the exact same long sentence repeated for shingling " * 3
    corpus = spark.createDataFrame(
        [
            (0, text_dup),
            (2, "an unrelated stored document about catalyst plans " * 3),
            (1, text_dup),  # arriving doc: duplicate of stored doc 0
            (3, "a fresh arriving document with novel content only " * 3),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    corpus.coalesce(1).write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema).parquet(path)
        .filter(F.col("doc_id") % 2 == 1)
    )
    stored = spark.read.parquet(path).filter(F.col("doc_id") % 2 == 0)
    out = S.run_available_now(
        S.stream_dedup_gate(stream, stored, min_est=0.5), "append",
        state_partitions=4,
    ).collect()
    got = {(r.doc_id, r.matched_id): r.jaccard_est for r in out}
    assert (1, 0) in got and got[(1, 0)] == 1.0  # exact dup flagged
    assert all(d == 1 for d, _ in got)           # only arriving docs emit
    assert (3, 0) not in got and (3, 2) not in got  # novel doc passes


def test_decontamination_gate_watermarked_dedup_state_bounded(spark, tmp_path):
    """ADVICE r13: with event_time set, the gate must plan
    dropDuplicatesWithinWatermark (evictable dedup state for a
    continuous deployment) and still emit each flagged (doc, gram)
    once within the horizon."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark import streaming as S

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, words, T0),
            (2, "completely different vocabulary " * 4, T0),
        ],
        "doc_id long, text string, ts timestamp",
    )
    path = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    eval_grams = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(8)),)], "gram string"
    )
    gated = S.stream_decontamination_gate(
        stream, eval_grams, event_time="ts", watermark="10 minutes"
    )
    # the stateful operator must be the watermark-scoped dedup variant
    assert gated.isStreaming
    out = S.run_available_now(gated, "append", state_partitions=4).collect()
    assert {(r.doc_id, r.gram) for r in out} == {
        (1, " ".join(f"w{i}" for i in range(8)))
    }


def test_conformal_gate_flags_only_exceedances(spark, tmp_path):
    """Gate vs a hand-built threshold table: group 'a' pred=10, thr=2 —
    values 11 (score 1, pass) and 15 (score 5, flag); stateless plan
    (no state store operator in the drained query)."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark import streaming as S

    ev = spark.createDataFrame(
        [(1, "a", 11.0), (2, "a", 15.0), (3, "b", 100.0)],
        "event_id long, event_type string, value double",
    )
    path = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    thr = spark.createDataFrame(
        [("a", 10.0, 2.0), ("b", 99.0, 2.0)],
        "event_type string, _pred double, _thr double",
    )
    out = S.run_available_now(
        S.stream_conformal_gate(stream, thr), "append", state_partitions=4
    ).collect()
    got = {(r.event_id): (r.score, r.threshold) for r in out}
    assert got == {2: (5.0, 2.0)}


def test_attributed_rollup_chains_join_into_windowed_agg(spark, tmp_path):
    """Hand-built stream: user 1 views at 10:00, purchases at 11:00
    (in-horizon) and at 13:30 (outside 2h); watermark cutoff =
    min(max view, max purchase) - 1h finalizes day 1 only when a
    late sentinel day exists. The drained result equals the batch
    interval join + daily rollup with that cutoff."""
    import datetime as dt

    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark import streaming as S

    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "view", d.replace(hour=10), 0.0),
        (2, 1, "purchase", d.replace(hour=11), 50.0),   # attributed
        (3, 1, "purchase", d.replace(hour=13, minute=30), 70.0),  # outside 2h
        (4, 2, "view", d.replace(hour=12), 0.0),
        # next-day sentinels advance both sides' watermarks past day 1
        (5, 9, "view", d + dt.timedelta(days=1, hours=6), 0.0),
        (6, 9, "purchase", d + dt.timedelta(days=1, hours=6), 1.0),
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    out = S.run_available_now(
        S.stream_attributed_rollup(stream), "append", state_partitions=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.window_start == d
    assert r.n_attributed == 1
    assert r.attributed_value == 50.0


def test_stream_phash_gate_watermark_bounds_state(spark, tmp_path):
    """Continuous-stream mode (ADVICE r16): with watermark=(col, delay)
    the gate carries the event-time column through the decode, declares
    a watermark on it, and pair-dedups via dropDuplicatesWithinWatermark
    so state is evicted past the watermark. availableNow drain still
    yields the exact pair set, now with the event-time column attached."""
    import datetime as dtm

    from lakehouse_platform_nyc_taxi_spark.operators.multimodal import (
        phash_bands,
    )
    from lakehouse_platform_nyc_taxi_spark.streaming import (
        run_available_now,
        stream_phash_gate,
    )

    def payload(txt: str) -> bytes:
        body = txt.encode()[:192].ljust(192, b"\x00")
        return b"P5 16 12 255\n" + body

    stored_rows = [
        (0, payload("the quick brown fox jumps over the lazy dog " * 5)),
        (2, payload("zzzz completely different corpus payload %$#@ " * 5)),
    ]
    stored = spark.createDataFrame(
        stored_rows, "asset_id long, content binary"
    )
    index = phash_bands(stored)

    t0 = dtm.datetime(2024, 1, 1, 12, 0, 0)
    new_rows = [
        # exact copy of stored 0 -> hamming 0 match, via several bands
        # (the dedup must collapse the multi-band collisions to one row)
        (1, payload("the quick brown fox jumps over the lazy dog " * 5), t0),
        (3, payload("no relation to anything stored 0123456789ab " * 5), t0),
    ]
    src = tmp_path / "assets"
    spark.createDataFrame(
        new_rows, "asset_id long, content binary, ingest_ts timestamp"
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "asset_id long, content binary, ingest_ts timestamp"
    ).parquet(str(src))

    out = stream_phash_gate(
        stream, index, max_hamming=3, watermark=("ingest_ts", "10 minutes")
    )
    got = run_available_now(out, "append", state_partitions=4)
    assert "ingest_ts" in got.columns
    rows = got.collect()
    pairs = {(r.asset_id, r.matched_id): r.hamming for r in rows}
    assert pairs.get((1, 0)) == 0
    assert len(rows) == len(pairs), "multi-band collisions must dedup"
    assert all(r.ingest_ts == t0 for r in rows)


def _audio_payload(seed: int, n: int = 512) -> bytes:
    # deterministic pseudo-PCM, distinct energy envelopes per seed
    return bytes(((i * (seed * 2 + 3) + seed * 7) % 256) for i in range(n))


def test_stream_audio_gate_matches_batch_band_join(spark, tmp_path):
    """availableNow drain of the audio gate equals the batch band-index
    join computed from the same operator — and multi-band collisions
    collapse to one row per pair."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.operators.multimodal import (
        audio_energy_bands,
    )
    from lakehouse_platform_nyc_taxi_spark.streaming import (
        run_available_now,
        stream_audio_gate,
    )

    stored_rows = [(0, bytearray(_audio_payload(1))), (2, bytearray(_audio_payload(5)))]
    new_rows = [(1, bytearray(_audio_payload(1))), (3, bytearray(_audio_payload(9)))]
    schema = "asset_id long, content binary"
    stored = spark.createDataFrame(stored_rows, schema)
    index = audio_energy_bands(stored)

    src = tmp_path / "audio_assets"
    spark.createDataFrame(new_rows, schema).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    got = run_available_now(
        stream_audio_gate(stream, index, max_hamming=3),
        "append",
        state_partitions=4,
    )
    rows = got.collect()
    pairs = {(r.asset_id, r.matched_id): r.hamming for r in rows}
    assert len(rows) == len(pairs), "multi-band collisions must dedup"

    # batch expectation from the same operator: full hamming over all
    # (new, stored) band rows, thresholded
    nb = {r.asset_id: (r.b0, r.b1, r.b2, r.b3)
          for r in audio_energy_bands(spark.createDataFrame(new_rows, schema)).collect()}
    sb = {r.asset_id: (r.b0, r.b1, r.b2, r.b3) for r in index.collect()}
    expected = {
        (n, s): sum(bin(a ^ b).count("1") for a, b in zip(nb[n], sb[s]))
        for n in nb
        for s in sb
        if sum(bin(a ^ b).count("1") for a, b in zip(nb[n], sb[s])) <= 3
    }
    assert pairs == expected
    assert pairs.get((1, 0)) == 0, "identical payload must match at distance 0"


def test_stream_audio_gate_watermark_bounds_state(spark, tmp_path):
    """Continuous-stream mode: watermark=(col, delay) carries the
    event-time column through the energy decode (audio_energy_bands
    passthrough), declares the watermark, and switches pair dedup to
    dropDuplicatesWithinWatermark — availableNow drain still yields the
    exact pair set, now with the event-time column attached."""
    import datetime as dtm

    from lakehouse_platform_nyc_taxi_spark.operators.multimodal import (
        audio_energy_bands,
    )
    from lakehouse_platform_nyc_taxi_spark.streaming import (
        run_available_now,
        stream_audio_gate,
    )

    stored = spark.createDataFrame(
        [(0, bytearray(_audio_payload(1)))], "asset_id long, content binary"
    )
    index = audio_energy_bands(stored)
    t0 = dtm.datetime(2024, 1, 1, 12, 0, 0)
    src = tmp_path / "audio_assets_wm"
    spark.createDataFrame(
        [(1, bytearray(_audio_payload(1)), t0), (3, bytearray(_audio_payload(9)), t0)],
        "asset_id long, content binary, ingest_ts timestamp",
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "asset_id long, content binary, ingest_ts timestamp"
    ).parquet(str(src))

    got = run_available_now(
        stream_audio_gate(
            stream, index, max_hamming=3, watermark=("ingest_ts", "10 minutes")
        ),
        "append",
        state_partitions=4,
    )
    assert "ingest_ts" in got.columns
    rows = got.collect()
    pairs = {(r.asset_id, r.matched_id): r.hamming for r in rows}
    assert pairs.get((1, 0)) == 0
    assert len(rows) == len(pairs)
    assert all(r.ingest_ts == t0 for r in rows)


def test_stream_gate_watermark_column_collision_raises(spark, tmp_path):
    """Gate-level guard: a watermark column named after the gates'
    internal join/explode aliases must fail descriptively at call time,
    not as an ambiguous-reference AnalysisException mid-plan."""
    import pytest

    from lakehouse_platform_nyc_taxi_spark.operators.multimodal import (
        audio_energy_bands,
        phash_bands,
    )
    from lakehouse_platform_nyc_taxi_spark.streaming import (
        stream_audio_gate,
        stream_phash_gate,
    )

    stored = spark.createDataFrame(
        [(0, bytearray(_audio_payload(1)))], "asset_id long, content binary"
    )
    src = tmp_path / "gate_collide"
    spark.createDataFrame(
        [(1, bytearray(_audio_payload(1)), 5)],
        "asset_id long, content binary, band int",
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "asset_id long, content binary, band int"
    ).parquet(str(src))
    with pytest.raises(ValueError, match="internal columns"):
        stream_audio_gate(
            stream, audio_energy_bands(stored), watermark=("band", "1 minute")
        )
    with pytest.raises(ValueError, match="internal columns"):
        stream_phash_gate(
            stream, phash_bands(stored), watermark=("band", "1 minute")
        )


def test_stream_gates_plan_banded_equi_joins_never_cartesian(spark, tmp_path):
    """Both multimodal ingest gates must plan the stream-static match as
    an equi-join on (band, band_val) — the banded-LSH shape whose cost
    is bounded by band-bucket sizes. A condition-less or non-equi join
    here would be an all-pairs comparison against the whole stored
    corpus for every arriving asset."""
    from lakehouse_platform_nyc_taxi_spark.operators.multimodal import (
        audio_energy_bands,
        phash_bands,
    )
    from lakehouse_platform_nyc_taxi_spark.streaming import (
        stream_audio_gate,
        stream_phash_gate,
    )

    stored = spark.createDataFrame(
        [(0, bytearray(b"P5 4 4 255\n" + bytes(range(16))))],
        "asset_id long, content binary",
    )
    src = tmp_path / "plan_src"
    spark.createDataFrame(
        [(1, bytearray(b"P5 4 4 255\n" + bytes(range(16))))],
        "asset_id long, content binary",
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema("asset_id long, content binary").parquet(
        str(src)
    )
    for gate, index in (
        (stream_audio_gate, audio_energy_bands(stored)),
        (stream_phash_gate, phash_bands(stored)),
    ):
        plan = gate(stream, index)._jdf.queryExecution().analyzed().toString()
        join_lines = [l for l in plan.splitlines() if "Join" in l]
        assert join_lines, f"{gate.__name__}: no join in plan"
        for line in join_lines:
            stripped = line.strip()
            assert stripped.startswith(("+- ~Join Inner, ((band", "~Join Inner, ((band")) and (
                "band_val" in stripped
            ), f"{gate.__name__}: unexpected join shape: {stripped[:200]}"
            assert "Cross" not in stripped, f"{gate.__name__}: cartesian join"
