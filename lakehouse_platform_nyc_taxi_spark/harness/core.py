"""Core relational operator queries (SURVEY.md §2) over the driver testdata.

Determinism rules for oracle hash-parity (see tests/oracle_utils.py):
- Order-dependent double sums go through ``decimal(28,8)`` and back to
  double — bit-identical regardless of partition/summation order, in both
  engines. (Spark's parallel agg order is nondeterministic; a raw double
  sum would flap in the last bits.)
- Averages are expressed as decimal-sum / count for the same reason.
- ``trino_round`` (floor-based) matches DuckDB's double rounding exactly;
  Spark's ``F.round`` does NOT (binary HALF_UP).
- Every computed column is aliased identically in both faces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.trino import day_name, day_of_week_iso, surrogate_key, time_of_day, trino_round
from ..sources.testdata import load_table, load_table_parallel
from . import register


def dsum(col: Column | str) -> Column:
    """Order-independent double sum: exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(28,8)")).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean (decimal sum / non-null count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(28,8)")).cast("double") / F.count(c)


def DSUM(x: str) -> str:
    return f"CAST(sum(CAST({x} AS DECIMAL(28,8))) AS DOUBLE)"


def DAVG(x: str) -> str:
    return f"(CAST(sum(CAST({x} AS DECIMAL(28,8))) AS DOUBLE) / count({x}))"


def DSUM_WIDE(x: str) -> str:
    """DSUM whose decimal->double conversion stays correctly rounded
    past |sum| = 2^53 / 1e8 ~ 9.0e7. DuckDB's direct DECIMAL(28,8)->
    DOUBLE cast double-rounds (scaled int -> double, then / 1e8) and
    lands 1 ulp off the correctly-rounded value Spark/Java emit once
    the scaled integer no longer fits 53 bits (found by the r18 sf0.1
    window sweep: sum_disc_price 2706323975.3560996 vs ...61); routing
    the conversion through VARCHAR is correctly rounded at any
    magnitude. Only needed where a raw decimal sum can exceed ~9e7 at
    the compared scale — below that the direct cast is exact."""
    return f"CAST(CAST(sum(CAST({x} AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE)"


def DAVG_WIDE(x: str) -> str:
    """DAVG with the DSUM_WIDE conversion fence on its sum."""
    return (
        f"(CAST(CAST(sum(CAST({x} AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE)"
        f" / count({x}))"
    )


# --------------------------------------------------------------------------
# Scans / projections / filters (S3, P1-P3, P6-P9)
# --------------------------------------------------------------------------


@register(
    "scan_projection_filter",
    """
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount > 0.02
    """,
    doc="S3+P9: pruned parquet scan — filter and 3-column projection push down "
    "to the reader (reference: ingest_spark_bulk.py:137 schema-on-read scan).",
)
def scan_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") > 0.02)
    ).select("l_orderkey", "l_quantity", "l_extendedprice")


@register(
    "cast_rename_projection",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS order_id,
           CAST(o_custkey AS BIGINT) AS customer_id,
           CAST(o_totalprice AS DOUBLE) AS total_price,
           CAST(o_orderdate AS TIMESTAMP) AS order_ts,
           CAST(o_orderstatus AS VARCHAR) AS status,
           'orders' AS source_table,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(month(o_orderdate) AS INTEGER) AS month
    FROM orders
    """,
    doc="P1+P2/F2: rename+cast standardization projection with literal audit "
    "columns (reference: stg_nyc_taxi__yellow_trips.sql:28-40).",
)
def cast_rename_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("long").alias("order_id"),
        F.col("o_custkey").cast("long").alias("customer_id"),
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.col("o_orderdate").cast("timestamp").alias("order_ts"),
        F.col("o_orderstatus").cast("string").alias("status"),
        F.lit("orders").alias("source_table"),
        F.year("o_orderdate").cast("int").alias("year"),
        F.month("o_orderdate").cast("int").alias("month"),
    )


@register(
    "validity_filter",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0
    """,
    doc="P3: conjunctive validity filter "
    "(reference: stg_nyc_taxi__yellow_trips.sql:43-47).",
)
def validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull() & (F.col("value") >= 0)
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "incremental_watermark",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE date_trunc('month', ts) = (SELECT max(date_trunc('month', ts)) FROM events)
    GROUP BY event_type
    """,
    doc="P4: incremental watermark — reprocess only the max period, the "
    "scalar-subquery predicate of stg_nyc_taxi__yellow_trips.sql:13-17. "
    "Spark form keeps it distributed: 1-row max aggregate broadcast-joined "
    "back (no driver collect).",
)
def incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.date_trunc("month", "ts")).alias("_max_month"))
    return (
        ev.join(F.broadcast(mx), F.date_trunc("month", "ts") == F.col("_max_month"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "filter_precedence_quirk",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_tax
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 25 OR l_tax > 0.07
    """,
    doc="P5: the cleaned-filter AND/OR precedence shape — parses as "
    "(flag AND qty) OR tax (reference: int_trips_cleaned.sql:17-19).",
)
def filter_precedence_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 25))
        | (F.col("l_tax") > 0.07)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_tax")


@register(
    "in_list_between",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_discount BETWEEN 0.02 AND 0.08
    """,
    doc="P6+P7: IN-list and BETWEEN predicates "
    "(reference: fct_trips_monthly.sql:46; int_trips_enriched.sql:62-88).",
)
def in_list_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_discount").between(0.02, 0.08)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount")


@register(
    "star_extend_projection",
    """
    SELECT *, value * 1.1 AS value_with_fee,
           CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS value_band
    FROM events
    """,
    doc="P8: star + extend projection (reference: int_trips_enriched.sql:15-16).",
)
def star_extend_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumns(
        {
            "value_with_fee": F.col("value") * 1.1,
            "value_band": F.when(F.col("value") >= 50, "high").otherwise("low"),
        }
    )


# --------------------------------------------------------------------------
# Joins (J1-J2 + the ad-hoc join surface, SURVEY.md §2.3)
# --------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           {DSUM('o.o_totalprice')} AS total_order_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Star-schema inner joins with broadcast dimension tables — the plan "
    "stays shuffle-free on the dim side (one fact-side hash agg).",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_order_value"),
        )
    )


@register(
    "join_left_outer",
    f"""
    SELECT c.c_custkey AS customer_id, c.c_mktsegment AS segment,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           {DSUM('o.o_totalprice')} AS lifetime_value
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    doc="Left outer join keeping customers with zero orders (count over the "
    "nullable side counts matches only).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("customer_id"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("lifetime_value"),
        )
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="Left-semi join (EXISTS): customers having a large order — the "
    "delete-semijoin shape of the incremental strategy (SURVEY.md J2).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
    doc="Left-anti join (NOT EXISTS): customers without any quarter-million "
    "order (thresholded so the result is non-trivial at every sf).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_null_safe",
    """
    WITH l AS (
        SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_key
        FROM orders
    ),
    r AS (
        SELECT nullif(o_orderstatus, 'O') AS status_key,
               CAST(count(*) AS BIGINT) AS n_side
        FROM orders GROUP BY 1
    )
    SELECT l.o_orderkey, l.status_key, r.n_side
    FROM l JOIN r ON l.status_key IS NOT DISTINCT FROM r.status_key
    """,
    doc="Null-safe equi-join (IS NOT DISTINCT FROM / eqNullSafe): NULL "
    "keys MATCH each other instead of silently dropping — the semantics "
    "a plain equi-join gets wrong for nullable business keys. Still a "
    "hash join in both engines (null-safe equality is hashable).",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    left = o.select("o_orderkey", key.alias("status_key"))
    right = o.select(key.alias("status_key")).groupBy("status_key").agg(
        F.count(F.lit(1)).alias("n_side")
    ).withColumnRenamed("status_key", "r_key")
    return left.join(
        right, left.status_key.eqNullSafe(F.col("r_key")), "inner"
    ).select("o_orderkey", "status_key", "n_side")


@register(
    "unpivot_charges",
    """
    SELECT l_orderkey, l_linenumber, measure, amount
    FROM lineitem
    UNPIVOT (amount FOR measure IN (
        l_extendedprice AS 'extendedprice',
        l_discount AS 'discount',
        l_tax AS 'tax'))
    """,
    doc="UNPIVOT (melt): wide charge columns to (measure, amount) rows — "
    "the inverse of the pivot query, a zero-shuffle Expand projection "
    "(3 output rows per input row, no exchange).",
)
def unpivot_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    ).withColumn(
        "measure", F.expr("substring(measure, 3)")
    )


@register(
    "join_cross_ratio",
    """
    WITH problematic AS (
        SELECT count(*) AS problem_count FROM orders WHERE o_totalprice < 5000
    ),
    total AS (
        SELECT count(*) AS total_count FROM orders
    )
    SELECT CAST(p.problem_count AS BIGINT) AS problem_count,
           CAST(t.total_count AS BIGINT) AS total_count,
           p.problem_count * 100.0 / t.total_count AS problem_pct
    FROM problematic p, total t
    """,
    doc="J1: implicit 1x1 cross join of two aggregate CTEs computing a "
    "threshold ratio (reference: dbt/tests/marts/assert_positive_fare.sql:15-20).",
)
def join_cross_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    problematic = o.filter(F.col("o_totalprice") < 5000).agg(
        F.count("*").alias("problem_count")
    )
    total = o.agg(F.count("*").alias("total_count"))
    return problematic.crossJoin(total).select(
        "problem_count",
        "total_count",
        (F.col("problem_count") * 100.0 / F.col("total_count")).alias("problem_pct"),
    )


# --------------------------------------------------------------------------
# Aggregations (A1-A12)
# --------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS count_order,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS unique_parts,
           {DSUM_WIDE('l_quantity')} AS sum_qty,
           {DSUM_WIDE('l_extendedprice')} AS sum_base_price,
           {DSUM_WIDE('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DAVG_WIDE('l_quantity')} AS avg_qty,
           {DAVG_WIDE('l_extendedprice')} AS avg_price,
           {DAVG_WIDE('l_discount')} AS avg_disc,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty,
           CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS bulk_lines
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1-A8/A10: the TPC-H Q1 shape — grouped sums/avgs/min/max/counts, "
    "distinct count, conditional count (reference: fct_trips_daily.sql:20-46).",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallel loader: decimal-fenced sums over the single-row-group
    # testdata are CPU-bound (see load_table_parallel scale note)
    li = load_table_parallel(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.countDistinct("l_partkey").alias("unique_parts"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            trino_round(F.min("l_quantity"), 2).alias("min_qty"),
            trino_round(F.max("l_quantity"), 2).alias("max_qty"),
            F.sum(F.when(F.col("l_quantity") > 40, 1).otherwise(0)).alias("bulk_lines"),
        )
    )


@register(
    "agg_daily_rollup",
    f"""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           CAST(count(*) AS BIGINT) AS total_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users,
           {DSUM('value')} AS total_value,
           round({DAVG('value')}, 2) AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           CAST(sum(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END) AS BIGINT) AS events_morning,
           CAST(sum(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1 ELSE 0 END) AS BIGINT) AS events_afternoon,
           CAST(sum(CASE WHEN hour(ts) BETWEEN 18 AND 22 THEN 1 ELSE 0 END) AS BIGINT) AS events_evening,
           CAST(sum(CASE WHEN hour(ts) < 6 OR hour(ts) = 23 THEN 1 ELSE 0 END) AS BIGINT) AS events_night
    FROM events
    GROUP BY 1, 2
    """,
    doc="A1-A8: the fct_trips_daily shape over the events table — grain "
    "(event_date, event_type) with time-of-day conditional counts "
    "(reference: fct_trips_daily.sql:14-51).",
)
def agg_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(
            F.count("*").alias("total_events"),
            F.countDistinct("user_id").alias("unique_users"),
            dsum("value").alias("total_value"),
            trino_round(davg("value"), 2).alias("avg_value"),
            trino_round(F.min("value"), 2).alias("min_value"),
            trino_round(F.max("value"), 2).alias("max_value"),
            F.sum(F.when(h.between(6, 11), 1).otherwise(0)).alias("events_morning"),
            F.sum(F.when(h.between(12, 17), 1).otherwise(0)).alias("events_afternoon"),
            F.sum(F.when(h.between(18, 22), 1).otherwise(0)).alias("events_evening"),
            F.sum(F.when((h < 6) | (h == 23), 1).otherwise(0)).alias("events_night"),
        )
    )


@register(
    "agg_monthly_rollup",
    f"""
    SELECT year(ts) AS year, month(ts) AS month, event_type,
           make_date(year(ts), month(ts), 1) AS month_start_date,
           CAST(count(*) AS BIGINT) AS total_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_with_events,
           {DSUM('value')} AS total_value,
           round({DAVG('value')}, 2) AS avg_value,
           round({DSUM('value')} / nullif(count(*), 0), 2) AS value_per_event,
           round(avg(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_morning,
           round(avg(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_afternoon,
           round(avg(CASE WHEN hour(ts) BETWEEN 18 AND 22 THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_evening,
           round(avg(CASE WHEN hour(ts) < 6 OR hour(ts) = 23 THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_night,
           round(avg(CASE WHEN isodow(ts) IN (6, 7) THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_weekend
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="A1/A4/A9/A11 + F6/F9: the fct_trips_monthly shape — month grain, "
    "distinct-over-expression, avg-of-case percentage buckets, ISO weekend "
    "ratio, nullif-guarded division, month-start date "
    "(reference: fct_trips_monthly.sql:14-51).",
)
def agg_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    pct = lambda cond: trino_round(F.avg(F.when(cond, 1.0).otherwise(0.0)) * 100, 1)  # noqa: E731
    return (
        ev.groupBy(
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            "event_type",
        )
        .agg(
            F.count("*").alias("total_events"),
            F.countDistinct("user_id").alias("unique_users"),
            F.countDistinct(F.to_date("ts")).alias("days_with_events"),
            dsum("value").alias("total_value"),
            trino_round(davg("value"), 2).alias("avg_value"),
            trino_round(
                dsum("value") / F.nullif(F.count("*"), F.lit(0)), 2
            ).alias("value_per_event"),
            pct(h.between(6, 11)).alias("pct_morning"),
            pct(h.between(12, 17)).alias("pct_afternoon"),
            pct(h.between(18, 22)).alias("pct_evening"),
            pct((h < 6) | (h == 23)).alias("pct_night"),
            pct(day_of_week_iso("ts").isin(6, 7)).alias("pct_weekend"),
        )
        .withColumn("month_start_date", F.make_date("year", "month", F.lit(1)))
    )


@register(
    "agg_no_keys",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           {DSUM('l_extendedprice')} AS total_price,
           round({DAVG('l_discount')}, 4) AS avg_discount,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
    doc="A12: keyless single-row aggregate (reference: assert_positive_fare.sql:5-13).",
)
def agg_no_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallel loader: count-distinct expansion + decimal sums are the
    # CPU cost; a single-task scan serializes the partial aggregate
    li = load_table_parallel(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("total_price"),
        trino_round(davg("l_discount"), 4).alias("avg_discount"),
        trino_round(F.min("l_extendedprice"), 2).alias("min_price"),
        trino_round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# --------------------------------------------------------------------------
# Windows / sorts / set ops (SURVEY.md §2.5-§2.7)
# --------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    """
    SELECT nation_key, c_custkey, c_name, c_acctbal, rank_in_nation
    FROM (
        SELECT c_nationkey AS nation_key, c_custkey, c_name, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rank_in_nation
        FROM customer
    ) t
    WHERE rank_in_nation <= 3
    """,
    doc="Window ranking: top-3 customers per nation by account balance "
    "(deterministic tiebreak on custkey). Spark plans a single shuffle on "
    "the partition key.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select(
            F.col("c_nationkey").alias("nation_key"),
            "c_custkey",
            "c_name",
            "c_acctbal",
            "rank_in_nation",
        )
    )


@register(
    "agg_arg_extremes",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           arg_min(event_type, event_id) AS first_type,
           arg_max(event_type, event_id) AS last_type,
           arg_max(value, event_id) AS last_value
    FROM events
    GROUP BY user_id
    """,
    doc="arg-extreme aggregates (max_by/min_by): first/last event "
    "attributes per user WITHOUT a sort or window — one partial-agg "
    "shuffle carrying a single (value, ordering-key) pair per group, "
    "where the row_number formulation would sort every group. The "
    "ordering key (event_id) is a unique sequence, so results are "
    "deterministic with no float-tie hazard.",
)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
    )


@register(
    "agg_collect_sorted",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
               AS statuses,
           array_to_string(list_sort(list(DISTINCT year(o_orderdate))), ',')
               AS active_years
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Nested-type aggregation: per-group DISTINCT value lists, sorted "
    "so the collected order (nondeterministic across partitions in any "
    "engine) never leaks into results — the deterministic form of "
    "collect_set/list_agg. Serialized to a CSV scalar (array_join) "
    "because comparison harnesses canonicalize scalar cells only; the "
    "sort happens before the join so the string is itself canonical.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.array_join(
            F.array_sort(F.collect_set(F.year("o_orderdate"))).cast(
                "array<string>"
            ),
            ",",
        ).alias("active_years"),
    )


@register(
    "window_ntile_cume",
    """
    SELECT o_orderpriority, o_orderkey,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (
        PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
    )
    """,
    doc="Distribution window functions: percent_rank / cume_dist / "
    "ntile(4) per order priority. The orderBy carries a unique tiebreak "
    "(o_orderkey) because ntile assigns tied rows by position — without "
    "it the quartile of equal-priced rows is nondeterministic. One "
    "Exchange on the partition key serves all three functions.",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(28,8))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq
    FROM orders
    """,
    doc="Analytic window: per-customer running spend (cumulative frame) + "
    "sequence number; decimal accumulation for cross-engine determinism.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,8)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "orderby_limit_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="O1: order-by + limit — Spark plans TakeOrderedAndProject (true "
    "top-k, no global sort) (reference: README.md:166).",
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


@register(
    "union_all_typed_nulls",
    f"""
    WITH unified AS (
        SELECT o_orderkey AS entity_key, 'order' AS entity_kind,
               o_totalprice AS amount, CAST(NULL AS DOUBLE) AS quantity,
               o_orderstatus AS flag
        FROM orders
        UNION ALL
        SELECT l_orderkey, 'lineitem', CAST(NULL AS DOUBLE), l_quantity,
               l_returnflag
        FROM lineitem
    )
    SELECT entity_kind, flag,
           CAST(count(*) AS BIGINT) AS n_rows,
           {DSUM_WIDE('amount')} AS total_amount,
           {DSUM_WIDE('quantity')} AS total_quantity
    FROM unified
    GROUP BY entity_kind, flag
    """,
    doc="U1: positional UNION ALL with typed-NULL padding per branch, then "
    "an aggregate over the unified schema "
    "(reference: int_trips_unified.sql:10-106).",
)
def union_all_typed_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders_branch = o.select(
        F.col("o_orderkey").alias("entity_key"),
        F.lit("order").alias("entity_kind"),
        F.col("o_totalprice").alias("amount"),
        F.lit(None).cast("double").alias("quantity"),
        F.col("o_orderstatus").alias("flag"),
    )
    line_branch = li.select(
        F.col("l_orderkey").alias("entity_key"),
        F.lit("lineitem").alias("entity_kind"),
        F.lit(None).cast("double").alias("amount"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_returnflag").alias("flag"),
    )
    return (
        orders_branch.unionByName(line_branch)
        .groupBy("entity_kind", "flag")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("amount").alias("total_amount"),
            dsum("quantity").alias("total_quantity"),
        )
    )


@register(
    "set_intersect",
    """
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT (distinct): customers with both open and finished orders.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("customer_id")
    )
    done = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("customer_id")
    )
    return open_.intersect(done)


@register(
    "set_except",
    """
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="EXCEPT (distinct): customers with open orders but no pending ones — "
    "a set difference with a non-trivial result at every sf.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("customer_id")
    )
    pending = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("customer_id")
    )
    # subtract == EXCEPT DISTINCT (exceptAll keeps surplus duplicates and
    # would leak keys that also appear on the right)
    return open_.subtract(pending)


# --------------------------------------------------------------------------
# Scalar functions (F1-F13)
# --------------------------------------------------------------------------


@register(
    "surrogate_keys_md5",
    """
    SELECT o_orderkey,
           md5(coalesce(CAST(o_orderdate AS VARCHAR), '_dbt_utils_surrogate_key_null_')
               || '-' || coalesce(CAST(o_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_')
               || '-' || coalesce(CAST(nullif(o_orderstatus, 'P') AS VARCHAR), '_dbt_utils_surrogate_key_null_')
           ) AS surrogate_key
    FROM orders
    """,
    doc="F1: dbt_utils.generate_surrogate_key — md5 over '-'-joined varchar "
    "casts with the null sentinel (exercised via nullif) "
    "(reference: stg_nyc_taxi__yellow_trips.sql:22-26).",
)
def surrogate_keys_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        surrogate_key(
            F.col("o_orderdate"),
            F.col("o_custkey"),
            F.nullif(F.col("o_orderstatus"), F.lit("P")),
        ).alias("surrogate_key"),
    )


@register(
    "datetime_features",
    """
    SELECT event_id,
           hour(ts) AS event_hour,
           isodow(ts) AS event_dow,
           CASE isodow(ts)
               WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday'
               WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday' WHEN 6 THEN 'Saturday'
               WHEN 7 THEN 'Sunday' END AS event_day_name,
           CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'Morning'
                WHEN hour(ts) BETWEEN 12 AND 17 THEN 'Afternoon'
                WHEN hour(ts) BETWEEN 18 AND 22 THEN 'Evening'
                ELSE 'Night' END AS time_of_day,
           CAST(ts AS DATE) AS event_date,
           make_date(year(ts), month(ts), 1) AS month_start,
           (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 1000000 AS seconds_since_y2024,
           ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 1000000) // 60 AS minutes_since_y2024
    FROM events
    """,
    doc="F3/F5/F6/F7/F8/F9: temporal feature extraction with Trino semantics "
    "— ISO day-of-week, day-name CASE, time-of-day buckets, whole-unit "
    "date_diff (reference: int_trips_enriched.sql:19-66).",
)
def datetime_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.trino import date_diff

    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    secs = date_diff("second", epoch, F.col("ts"))
    return ev.select(
        "event_id",
        F.hour("ts").alias("event_hour"),
        day_of_week_iso("ts").alias("event_dow"),
        day_name("ts").alias("event_day_name"),
        time_of_day("ts").alias("time_of_day"),
        F.to_date("ts").alias("event_date"),
        F.make_date(F.year("ts"), F.month("ts"), F.lit(1)).alias("month_start"),
        secs.alias("seconds_since_y2024"),
        date_diff("minute", epoch, F.col("ts")).alias("minutes_since_y2024"),
    )


@register(
    "conditional_case_nullif",
    """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           round(CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END), 0), 4)
               AS large_to_small_ratio
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="F7+F10+A8: searched CASE buckets with a nullif-guarded division "
    "(reference: fct_trips_monthly.sql:36; int_trips_enriched.sql:69-93).",
)
def conditional_case_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    large = F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
    small = F.sum(F.when(F.col("o_totalprice") <= 200000, 1).otherwise(0))
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        large.alias("n_large"),
        trino_round(large.cast("double") / F.nullif(small, F.lit(0)), 4).alias(
            "large_to_small_ratio"
        ),
    )


# --------------------------------------------------------------------------
# Data-quality assertion queries (T1-T5, SURVEY.md §2.11)
# --------------------------------------------------------------------------


@register(
    "dq_violation_counts",
    """
    SELECT
        CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkeys,
        CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
            AS bad_returnflags,
        CAST(sum(CASE WHEN l_discount IS NOT NULL
                       AND NOT (l_discount >= 0 AND l_discount <= 0.1) THEN 1 ELSE 0 END) AS BIGINT)
            AS out_of_range_discounts,
        CAST(sum(CASE WHEN l_quantity IS NOT NULL
                       AND NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) AS BIGINT)
            AS out_of_range_quantities
    FROM lineitem
    """,
    doc="T1-T3: the dbt generic tests (not_null / accepted_values / "
    "accepted_range with NULL-pass) batched into one aggregate pass — the "
    "same execution shape quality.run_assertions uses "
    "(reference: dbt/models/*/schema.yml).",
)
def dq_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def violations(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return li.agg(
        violations(F.col("l_orderkey").isNull()).alias("null_orderkeys"),
        violations(
            F.col("l_returnflag").isNotNull() & ~F.col("l_returnflag").isin("A", "N", "R")
        ).alias("bad_returnflags"),
        violations(
            F.col("l_discount").isNotNull() & ~F.col("l_discount").between(0, 0.1)
        ).alias("out_of_range_discounts"),
        violations(
            F.col("l_quantity").isNotNull() & ~F.col("l_quantity").between(1, 50)
        ).alias("out_of_range_quantities"),
    )


# --------------------------------------------------------------------------
# S9: incremental delete+insert, attested through the REAL sink
# --------------------------------------------------------------------------


@register(
    "incremental_delete_insert",
    """
    WITH b1 AS (
        SELECT o_orderkey, o_totalprice,
               CAST(year(o_orderdate) AS INTEGER) AS year,
               CAST(month(o_orderdate) AS INTEGER) AS month
        FROM orders WHERE o_orderkey % 10 < 8
    ),
    b2base AS (
        SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
               CAST(year(o_orderdate) AS INTEGER) AS year,
               CAST(month(o_orderdate) AS INTEGER) AS month
        FROM orders WHERE o_orderkey % 10 BETWEEN 6 AND 8
    ),
    b2 AS (
        SELECT * FROM b2base
        UNION ALL
        SELECT * FROM b2base WHERE o_orderkey % 97 = 0
    ),
    final AS (
        SELECT * FROM b1
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
        UNION ALL
        SELECT * FROM b2
    )
    SELECT year, month,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           CAST(sum(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE) AS sum_price
    FROM final
    GROUP BY year, month
    """,
    doc="S9: dbt incremental_strategy='delete+insert' replayed through the "
    "REAL partitioned-parquet sink (sources/writers.py:94): batch 1 (keys "
    "%10<8) lands as CTAS, batch 2 (keys 6-8, corrected price, keys %97==0 "
    "re-delivered TWICE) delete+inserts into the touched (year, month) "
    "partitions via dynamic partition overwrite. The faithful quirk under "
    "test: within-batch duplicates SURVIVE (dbt deletes by key against the "
    "target, never dedupes the incoming batch — "
    "stg_nyc_taxi__yellow_trips.sql:2-8), so n_rows > n_keys exactly where "
    "%97 keys land. Oracle replays delete+insert relationally "
    "(anti-join UNION ALL batch). Returned state is the per-partition "
    "rollup of the files actually written and re-read.",
)
def incremental_delete_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..sources import writers

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("year"),
        F.month("o_orderdate").cast("int").alias("month"),
    )
    batch1 = base.filter(F.col("o_orderkey") % 10 < 8)
    b2base = base.filter((F.col("o_orderkey") % 10).between(6, 8)).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    batch2 = b2base.unionByName(b2base.filter(F.col("o_orderkey") % 97 == 0))

    # Per-application staging dir: two concurrent harness runs against the
    # same sf_dir must not race on delete-vs-write (ADVICE r16). The
    # returned DataFrame is collected lazily by the caller, so the files
    # must outlive this function — uniqueness, not eager cleanup, is the
    # isolation mechanism; /tmp lifecycle reclaims old app dirs.
    app_id = spark.sparkContext.applicationId
    path = (
        f"/tmp/spark_graft_s9/{app_id}/"
        f"{os.path.basename(sf_dir.rstrip('/'))}/orders"
    )
    shutil.rmtree(path, ignore_errors=True)
    writers.incremental_delete_insert(spark, batch1, path, unique_key=["o_orderkey"])
    writers.incremental_delete_insert(spark, batch2, path, unique_key=["o_orderkey"])

    state = spark.read.parquet(path)
    return state.groupBy(
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
    ).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        dsum("o_totalprice").alias("sum_price"),
    )
