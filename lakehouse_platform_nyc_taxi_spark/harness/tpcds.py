"""Round-13 query wave: TPC-DS-shaped decorrelation benchmarks.

TPC-H (22/22, ``tpch.py``) covers the correlated-subquery space; the
classic shapes the registry still lacked are TPC-DS-style (VERDICT r12
#6): the multi-channel UNION + ROLLUP with GROUPING()-driven labels
(Q5), the EXISTS-chain period intersection (Q38), and the windowed
year-over-year deviation self-comparison (Q47). The testdata has no
store/catalog/web channel split, so each query adapts to the tables
that exist the way Q2/Q20 adapted partsupp — the *plan shape* (the
thing worth benchmarking) is preserved: Q5's union of
differently-shaped fact scans under one rollup, Q38's three-branch
INTERSECT feeding a join + aggregate, Q47's per-entity monthly series
windowed by lag/lead and compared to its own yearly mean.

Determinism fence (repo-wide convention): sums aggregate in
DECIMAL(38,12) (exact, associative, partition-order-free); means are a
single correctly-rounded IEEE division of two exact values, never an
engine-ordered double accumulation; doubles appear only at emit,
rounded via ``trino_round`` on both engine sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.trino import trino_round
from ..sources.testdata import load_table, load_table_parallel
from . import register

_DS_Q5_SQL = """
WITH ch AS (
    SELECT 'orders' AS channel, o_orderstatus AS id,
           CAST(o_totalprice AS DECIMAL(38,12)) AS sales,
           CAST(0 AS DECIMAL(38,12)) AS returns
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    UNION ALL
    SELECT 'lineitem' AS channel, l_linestatus AS id,
           CAST(CASE WHEN l_returnflag <> 'R'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0 END AS DECIMAL(38,12)) AS sales,
           CAST(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice
                     ELSE 0 END AS DECIMAL(38,12)) AS returns
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
)
SELECT CASE WHEN GROUPING(channel) = 1 THEN 'ALL' ELSE channel END AS channel,
       CASE WHEN GROUPING(id) = 1 THEN 'ALL' ELSE id END AS id,
       CAST(GROUPING(channel) * 2 + GROUPING(id) AS INTEGER) AS lvl,
       round(CAST(sum(sales) AS DOUBLE), 6) AS sales,
       round(CAST(sum(returns) AS DOUBLE), 6) AS returns,
       round(CAST(sum(sales) - sum(returns) AS DOUBLE), 6) AS profit
FROM ch
GROUP BY ROLLUP(channel, id)
ORDER BY channel, id
"""


@register(
    "tpcds_q5_channel_rollup",
    _DS_Q5_SQL,
    doc="TPC-DS Q5 shape (multi-channel sales/returns rollup): two "
    "differently-shaped fact scans (orders as the sales-only channel, "
    "lineitem splitting sales vs returned value on l_returnflag) "
    "UNION ALL'd into one (channel, id, sales, returns) stream, then "
    "GROUP BY ROLLUP(channel, id) with GROUPING()-driven 'ALL' labels "
    "and a grouping-level column — the union+rollup plan the DS "
    "catalog/store/web split exercises, adapted to this schema "
    "(reference has no DS queries; shape per the published spec). "
    "Date fences push to both parquet scans; the rollup is one "
    "expand+aggregate, no join.",
)
def tpcds_q5_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(38,12)"
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    orders_ch = o.select(
        F.lit("orders").alias("channel"),
        F.col("o_orderstatus").alias("id"),
        F.col("o_totalprice").cast(dec).alias("sales"),
        F.lit(0).cast(dec).alias("returns"),
    )
    # plain load (r19 A/B: 0.73 vs 0.81 s — same shape as the r18
    # TPC-H fact-scan switches: the rollup's own exchange redistributes)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    line_ch = li.select(
        F.lit("lineitem").alias("channel"),
        F.col("l_linestatus").alias("id"),
        F.when(
            F.col("l_returnflag") != "R",
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
        )
        .otherwise(F.lit(0))
        .cast(dec)
        .alias("sales"),
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
        .otherwise(F.lit(0))
        .cast(dec)
        .alias("returns"),
    )
    ch = orders_ch.unionAll(line_ch)
    agg = ch.rollup("channel", "id").agg(
        F.grouping("channel").alias("_gc"),
        F.grouping("id").alias("_gi"),
        F.sum("sales").alias("_s"),
        F.sum("returns").alias("_r"),
    )
    return agg.select(
        F.when(F.col("_gc") == 1, F.lit("ALL"))
        .otherwise(F.col("channel"))
        .alias("channel"),
        F.when(F.col("_gi") == 1, F.lit("ALL")).otherwise(F.col("id")).alias("id"),
        (F.col("_gc") * 2 + F.col("_gi")).cast("int").alias("lvl"),
        trino_round(F.col("_s").cast("double"), 6).alias("sales"),
        trino_round(F.col("_r").cast("double"), 6).alias("returns"),
        trino_round((F.col("_s") - F.col("_r")).cast("double"), 6).alias("profit"),
    ).orderBy("channel", "id")


_DS_Q38_SQL = """
WITH loyal AS (
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
)
SELECT c.c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_loyal
FROM loyal l JOIN customer c ON c.c_custkey = l.o_custkey
GROUP BY 1
ORDER BY 1
"""


@register(
    "tpcds_q38_period_intersect",
    _DS_Q38_SQL,
    doc="TPC-DS Q38 shape (multi-branch INTERSECT): customers active in "
    "EACH of three consecutive years — three distinct-key branches of "
    "the same fact scan chained through INTERSECT (DS intersects "
    "store/catalog/web; this schema's repeated dimension is the year), "
    "then joined to the customer dimension and counted per segment. "
    "Spark plans each INTERSECT as a left-semi aggregate join; all "
    "three branches prune to (custkey, orderdate) at the scan.",
)
def tpcds_q38_period_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def year_keys(y: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == y)
            .select(F.col("o_custkey"))
            .distinct()
        )

    loyal = year_keys(1995).intersect(year_keys(1996)).intersect(year_keys(1997))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        loyal.join(cust, loyal["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_loyal"))
        .orderBy("mktsegment")
    )


_DS_Q47_SQL = """
WITH m AS (
    SELECT o_orderpriority AS priority,
           year(o_orderdate) AS y, month(o_orderdate) AS mo,
           sum(CAST(o_totalprice AS DECIMAL(38,12))) AS sales
    FROM orders
    GROUP BY 1, 2, 3
),
v AS (
    SELECT priority, y, mo, sales,
           CAST(sum(sales) OVER (PARTITION BY priority, y) AS DOUBLE)
               / CAST(count(*) OVER (PARTITION BY priority, y) AS DOUBLE)
               AS avg_monthly,
           lag(sales) OVER (PARTITION BY priority ORDER BY y, mo) AS psales,
           lead(sales) OVER (PARTITION BY priority ORDER BY y, mo) AS nsales
    FROM m
)
SELECT priority, CAST(y AS INTEGER) AS y, CAST(mo AS INTEGER) AS mo,
       round(CAST(sales AS DOUBLE), 6) AS sales,
       round(avg_monthly, 6) AS avg_monthly,
       round(CAST(psales AS DOUBLE), 6) AS prev_sales,
       round(CAST(nsales AS DOUBLE), 6) AS next_sales
FROM v
WHERE y = 1997 AND avg_monthly > 0
  AND abs(CAST(sales AS DOUBLE) - avg_monthly) / avg_monthly > 0.05
ORDER BY priority, y, mo
"""


@register(
    "tpcds_q47_yoy_ratio",
    _DS_Q47_SQL,
    doc="TPC-DS Q47 shape (windowed deviation-from-yearly-mean with "
    "lag/lead neighbors): monthly revenue per order priority, each "
    "month compared to its (priority, year) mean, months deviating "
    ">5% emitted with their previous/next month riding along via "
    "lag/lead over the same series. Monthly sums are DECIMAL-exact; "
    "the mean is one IEEE division of exact values (sum/count), never "
    "an engine-ordered double avg, so the >5% threshold decides "
    "identically on both engines. Windows run over the AGGREGATED "
    "(priority, month) table — bounded at ~priorities x months rows "
    "regardless of fact size, so no skew at any scale.",
)
def tpcds_q47_yoy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias("sales"))
    wy = Window.partitionBy("priority", "y")
    ws = Window.partitionBy("priority").orderBy("y", "mo")
    v = m.select(
        "priority",
        "y",
        "mo",
        "sales",
        (
            F.sum("sales").over(wy).cast("double")
            / F.count(F.lit(1)).over(wy).cast("double")
        ).alias("avg_monthly"),
        F.lag("sales").over(ws).alias("psales"),
        F.lead("sales").over(ws).alias("nsales"),
    )
    return (
        v.filter(
            (F.col("y") == 1997)
            & (F.col("avg_monthly") > 0)
            & (
                F.abs(F.col("sales").cast("double") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.05
            )
        )
        .select(
            "priority",
            F.col("y").cast("int").alias("y"),
            F.col("mo").cast("int").alias("mo"),
            trino_round(F.col("sales").cast("double"), 6).alias("sales"),
            trino_round(F.col("avg_monthly"), 6).alias("avg_monthly"),
            trino_round(F.col("psales").cast("double"), 6).alias("prev_sales"),
            trino_round(F.col("nsales").cast("double"), 6).alias("next_sales"),
        )
        .orderBy("priority", "y", "mo")
    )


_DS_Q51_SQL = """
WITH f AS (
    SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
           sum(CAST(o_totalprice AS DECIMAL(38,12))) AS rev
    FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
),
fc AS (
    SELECT ym, sum(rev) OVER (
        ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum FROM f
),
o AS (
    SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
           sum(CAST(o_totalprice AS DECIMAL(38,12))) AS rev
    FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
),
oc AS (
    SELECT ym, sum(rev) OVER (
        ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum FROM o
),
j AS (
    SELECT COALESCE(fc.ym, oc.ym) AS ym, fc.cum AS fcum, oc.cum AS ocum
    FROM fc FULL OUTER JOIN oc ON fc.ym = oc.ym
),
filled AS (
    SELECT ym,
           max(fcum) OVER (
               ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_f,
           max(ocum) OVER (
               ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_o
    FROM j
)
SELECT CAST(ym // 12 AS INTEGER) AS y, CAST(ym % 12 + 1 AS INTEGER) AS mo,
       round(CAST(cum_f AS DOUBLE), 6) AS cum_f,
       round(CAST(cum_o AS DOUBLE), 6) AS cum_o
FROM filled
WHERE cum_f IS NOT NULL AND cum_o IS NOT NULL AND cum_f > cum_o
ORDER BY y, mo
"""


@register(
    "tpcds_q51_cumulative_join",
    _DS_Q51_SQL,
    doc="TPC-DS Q51 shape (dual cumulative series, FULL OUTER join, "
    "window-over-join forward fill): monthly revenue of the 'F' and "
    "'O' order-status channels each prefix-sum independently, the two "
    "series FULL OUTER join on month, and a max() window over the "
    "JOINED series forward-fills months one channel skipped (max of a "
    "nondecreasing cumulative == last seen value — the DS trick "
    "verbatim); emit months where the F channel leads. All windows "
    "run over month-aggregated tables (bounded at |months| rows "
    "regardless of fact size); cumulative sums stay DECIMAL through "
    "the fill, so the > comparison decides identically on both "
    "engines (reference has no DS queries; shape per the published "
    "spec).",
)
def tpcds_q51_cumulative_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ym = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).alias("ym")

    def cum_channel(status: str, out: str) -> DataFrame:
        w = Window.orderBy("ym").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )  # |months|-bounded: one tiny task by construction
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy(ym)
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias(
                    "_rev"
                )
            )
            .select("ym", F.sum("_rev").over(w).alias(out))
        )

    fc = cum_channel("F", "fcum")
    oc = cum_channel("O", "ocum")
    j = fc.join(oc, "ym", "full_outer")
    wf = Window.orderBy("ym").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = j.select(
        "ym",
        F.max("fcum").over(wf).alias("cum_f"),
        F.max("ocum").over(wf).alias("cum_o"),
    )
    return (
        filled.filter(
            F.col("cum_f").isNotNull()
            & F.col("cum_o").isNotNull()
            & (F.col("cum_f") > F.col("cum_o"))
        )
        .select(
            F.floor(F.col("ym") / 12).cast("int").alias("y"),
            (F.col("ym") % 12 + 1).cast("int").alias("mo"),
            trino_round(F.col("cum_f").cast("double"), 6).alias("cum_f"),
            trino_round(F.col("cum_o").cast("double"), 6).alias("cum_o"),
        )
        .orderBy("y", "mo")
    )


_DS_Q67_SQL = """
WITH cells AS (
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CASE WHEN GROUPING(yy) = 1 THEN 0 ELSE yy END AS y,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(yy) AS INTEGER)
               AS lvl,
           sum(rev) AS drev
    FROM (
        SELECT o_orderpriority, year(o_orderdate) AS yy,
               CAST(o_totalprice AS DECIMAL(38,12)) AS rev
        FROM orders
    )
    GROUP BY ROLLUP(o_orderpriority, yy)
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY lvl ORDER BY drev DESC, priority, y
    ) AS rk
    FROM cells
)
SELECT lvl, priority, CAST(y AS INTEGER) AS y,
       round(CAST(drev AS DOUBLE), 6) AS revenue,
       CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
ORDER BY lvl, rk
"""


@register(
    "tpcds_q67_rollup_topk",
    _DS_Q67_SQL,
    doc="TPC-DS Q67 shape (rank over rollup output): revenue rolls up "
    "the (priority, year) hierarchy, then a row_number window "
    "PARTITIONED BY GROUPING LEVEL ranks cells within each level and "
    "keeps the top 3 — the compose-windows-onto-grouping-sets plan DS "
    "uses to page hierarchical reports. The window input is the "
    "rollup OUTPUT (bounded at ~|priorities| x |years| cells), never "
    "the fact table; DECIMAL cell sums + (revenue DESC, priority, y) "
    "unique ordering make every rank engine-exact (reference has no "
    "DS queries; shape per the published spec).",
)
def tpcds_q67_rollup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("yy"),
        F.col("o_totalprice").cast("decimal(38,12)").alias("rev"),
    )
    cells = o.rollup("o_orderpriority", "yy").agg(
        F.grouping("o_orderpriority").alias("_gp"),
        F.grouping("yy").alias("_gy"),
        F.sum("rev").alias("drev"),
    ).select(
        F.when(F.col("_gp") == 1, F.lit("ALL"))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
        F.when(F.col("_gy") == 1, F.lit(0)).otherwise(F.col("yy")).alias("y"),
        (F.col("_gp") * 2 + F.col("_gy")).cast("int").alias("lvl"),
        F.col("drev"),
    )
    wk = Window.partitionBy("lvl").orderBy(
        F.desc("drev"), F.col("priority"), F.col("y")
    )
    return (
        cells.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 3)
        .select(
            "lvl",
            "priority",
            F.col("y").cast("int").alias("y"),
            trino_round(F.col("drev").cast("double"), 6).alias("revenue"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("lvl", "rk")
    )


_DS_Q69_SQL = """
SELECT c.c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_acctbal
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND year(o.o_orderdate) = 1997
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND year(o.o_orderdate) = 1998
      )
  AND NOT EXISTS (
        SELECT 1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey = c.c_custkey
          AND year(o.o_orderdate) = 1997
          AND l.l_returnflag = 'R'
      )
GROUP BY 1
ORDER BY 1
"""


@register(
    "tpcds_q69_exists_gate",
    _DS_Q69_SQL,
    doc="TPC-DS Q35/Q69 shape (correlated EXISTS chained with NOT "
    "EXISTS feeding a grouped rollup): customers who ordered in 1997 "
    "(EXISTS), did NOT order in 1998 (NOT EXISTS on the same fact), "
    "and had NO 1997 order with a returned line (NOT EXISTS through a "
    "two-table correlated join) — counted per market segment with "
    "mean account balance. Spark decorrelates each gate to a "
    "LeftSemi / LeftAnti hash join on the customer key (the year "
    "fences push to the orders scans; the return gate pre-joins "
    "orders->lineitem then anti-joins its distinct custkeys), so the "
    "chain is three key-partitioned joins, never a per-customer "
    "subquery loop.",
)
def tpcds_q69_exists_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders")
    o97 = o.filter(F.year("o_orderdate") == 1997).select(
        "o_custkey", "o_orderkey"
    )
    o98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    li_r = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    returned97 = o97.join(
        li_r, o97["o_orderkey"] == li_r["l_orderkey"]
    ).select("o_custkey")
    gated = (
        cust.join(o97, cust["c_custkey"] == o97["o_custkey"], "left_semi")
        .join(o98, cust["c_custkey"] == o98["o_custkey"], "left_anti")
        .join(
            returned97,
            cust["c_custkey"] == returned97["o_custkey"],
            "left_anti",
        )
    )
    return (
        gated.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            trino_round(
                F.sum(F.col("c_acctbal").cast("decimal(38,12)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_acctbal"),
        )
        .orderBy("mktsegment")
    )


_DS_Q88_SQL = """
SELECT
    CAST(count(CASE WHEN h = 8  AND value >= 100 THEN 1 END) AS BIGINT) AS h8,
    CAST(count(CASE WHEN h = 9  AND value >= 100 THEN 1 END) AS BIGINT) AS h9,
    CAST(count(CASE WHEN h = 10 AND value >= 100 THEN 1 END) AS BIGINT) AS h10,
    CAST(count(CASE WHEN h = 11 AND value >= 100 THEN 1 END) AS BIGINT) AS h11,
    CAST(count(CASE WHEN h = 12 AND value >= 100 THEN 1 END) AS BIGINT) AS h12,
    CAST(count(CASE WHEN h = 13 AND value >= 100 THEN 1 END) AS BIGINT) AS h13,
    CAST(count(CASE WHEN h = 14 AND value >= 100 THEN 1 END) AS BIGINT) AS h14,
    CAST(count(CASE WHEN h = 15 AND value >= 100 THEN 1 END) AS BIGINT) AS h15
FROM (SELECT hour(ts) AS h, value FROM events WHERE value IS NOT NULL) t
"""


@register(
    "tpcds_q88_time_bands",
    _DS_Q88_SQL,
    doc="TPC-DS Q88 shape (multi-band single-scan counts): eight "
    "hour-of-day band counts over qualifying events, emitted as one "
    "wide row. DS's published form is eight scalar subqueries — eight "
    "full fact scans — cross-joined 1x1; the Spark-first plan folds "
    "all eight bands into ONE scan with conditional aggregates "
    "(map-side partials, a single 1-row reduce, no join at all), the "
    "rewrite a 100 TB fact table forces. Value/hour predicates are "
    "integer-exact so counts are engine-identical.",
)
def tpcds_q88_time_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    h = F.hour("ts")
    qual = F.col("value") >= 100

    def band(hr: int):
        return F.count(
            F.when((h == hr) & qual, F.lit(1))
        ).cast("bigint").alias(f"h{hr}")

    return ev.agg(*[band(hr) for hr in range(8, 16)])


_DS_Q97_SQL = """
WITH a AS (
    SELECT DISTINCT o_custkey AS k FROM orders
    WHERE year(o_orderdate) = 1995
),
b AS (
    SELECT DISTINCT o_custkey AS k FROM orders
    WHERE year(o_orderdate) = 1996
)
SELECT CAST(count(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                       THEN 1 END) AS BIGINT) AS both_years,
       CAST(count(CASE WHEN b.k IS NULL THEN 1 END) AS BIGINT)
           AS only_1995,
       CAST(count(CASE WHEN a.k IS NULL THEN 1 END) AS BIGINT)
           AS only_1996
FROM a FULL OUTER JOIN b ON a.k = b.k
"""


@register(
    "tpcds_q97_overlap",
    _DS_Q97_SQL,
    doc="TPC-DS Q97 shape (channel-overlap counts): two distinct-key "
    "extracts of the same fact (1995 vs 1996 buyers standing in for "
    "store vs catalog), FULL OUTER joined on the key, three "
    "conditional counts in one pass — the both/left-only/right-only "
    "audience split. Each branch is a pruned scan + distinct "
    "aggregate; the join carries only distinct keys, and the final "
    "aggregate is a 1-row reduce with map-side partials.",
)
def tpcds_q97_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def year_keys(y: int, alias: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == y)
            .select(F.col("o_custkey").alias(alias))
            .distinct()
        )

    a = year_keys(1995, "ka")
    b = year_keys(1996, "kb")
    j = a.join(b, a["ka"] == b["kb"], "full_outer")
    return j.agg(
        F.count(
            F.when(F.col("ka").isNotNull() & F.col("kb").isNotNull(), 1)
        )
        .cast("bigint")
        .alias("both_years"),
        F.count(F.when(F.col("kb").isNull(), 1)).cast("bigint").alias(
            "only_1995"
        ),
        F.count(F.when(F.col("ka").isNull(), 1)).cast("bigint").alias(
            "only_1996"
        ),
    )


# ---------------------------------------------------------------------------
# Round-15: Q36 lochierarchy shape — rank() WITHIN each rollup parent,
# the one composition (window over GROUPING()-labeled rollup) the other
# eight DS shapes don't exercise.
# ---------------------------------------------------------------------------

_DS_Q36_SQL = """
WITH base AS (
    SELECT n.n_name AS nat,
           CAST(EXTRACT(month FROM CAST(o.o_orderdate AS DATE)) AS INTEGER)
               AS mon,
           CAST(o.o_totalprice AS DECIMAL(38,12)) AS price,
           CAST(CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice
                     ELSE 0 END AS DECIMAL(38,12)) AS price_f
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
),
agg AS (
    SELECT CASE WHEN GROUPING(nat) = 1 THEN 'ALL' ELSE nat END AS nation,
           CASE WHEN GROUPING(mon) = 1 THEN 'ALL'
                ELSE lpad(CAST(mon AS VARCHAR), 2, '0') END AS month,
           CAST(GROUPING(nat) + GROUPING(mon) AS INTEGER) AS lochierarchy,
           round(CAST(sum(price_f) AS DOUBLE)
                 / CAST(sum(price) AS DOUBLE), 6) AS fulfilled_share,
           CASE WHEN GROUPING(mon) = 0 THEN nat END AS parent
    FROM base GROUP BY ROLLUP(nat, mon)
)
SELECT nation, month, lochierarchy, fulfilled_share,
       CAST(rank() OVER (PARTITION BY lochierarchy, parent
                         ORDER BY fulfilled_share ASC)
            AS BIGINT) AS rank_within_parent
FROM agg
ORDER BY lochierarchy DESC, nation, month
"""


@register(
    "tpcds_q36_lochierarchy",
    _DS_Q36_SQL,
    doc="TPC-DS Q36 shape (gross-margin lochierarchy ranking): fact "
    "joined to its dimension chain (orders -> customer -> nation, the "
    "store_sales -> item/store adaptation), ROLLUP over the "
    "(nation, order-month) hierarchy with GROUPING()-driven labels, "
    "then rank() WITHIN EACH ROLLUP PARENT — partition by "
    "(grouping-level, parent nation) over the ratio metric, the "
    "window-over-rollup composition the registry's other DS shapes "
    "lack (reference has no DS queries; shape per the published "
    "spec). The ratio is one IEEE division of two DECIMAL(38,12) "
    "sums rounded at emit, so ranks tie identically on both engines; "
    "the window runs over the dims-sized rollup output "
    "(|nations|x12 + |nations| + 1 rows), never the fact table.",
)
def tpcds_q36_lochierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(38,12)"
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.month(F.col("o_orderdate").cast("date")).cast("int").alias("mon"),
        F.col("o_totalprice").cast(dec).alias("price"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(F.lit(0))
        .cast(dec)
        .alias("price_f"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nat"), "mon", "price", "price_f")
    )
    rolled = base.rollup("nat", "mon").agg(
        F.sum("price_f").alias("_sf"),
        F.sum("price").alias("_sp"),
        F.grouping("nat").alias("_gn"),
        F.grouping("mon").alias("_gm"),
    )
    agg = rolled.select(
        F.when(F.col("_gn") == 1, F.lit("ALL"))
        .otherwise(F.col("nat"))
        .alias("nation"),
        F.when(F.col("_gm") == 1, F.lit("ALL"))
        .otherwise(F.lpad(F.col("mon").cast("string"), 2, "0"))
        .alias("month"),
        (F.col("_gn") + F.col("_gm")).cast("int").alias("lochierarchy"),
        trino_round(
            F.col("_sf").cast("double") / F.col("_sp").cast("double"), 6
        ).alias("fulfilled_share"),
        F.when(F.col("_gm") == 0, F.col("nat")).alias("parent"),
    )
    # the window input is the rollup OUTPUT (|nations|x12 + |nations| + 1
    # rows) — dims-sized by construction, never the fact table
    w = Window.partitionBy("lochierarchy", "parent").orderBy(
        F.asc("fulfilled_share")
    )
    return (
        agg.withColumn(
            "rank_within_parent", F.rank().over(w).cast("bigint")
        )
        .drop("parent")
        .orderBy(F.desc("lochierarchy"), "nation", "month")
    )


_DS_Q73_SQL = """
WITH cnt AS (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1995 AND 1996
    GROUP BY 1
    HAVING count(*) BETWEEN 4 AND 6
)
SELECT c.c_custkey AS custkey, c.c_name AS name,
       c.c_mktsegment AS mktsegment, cnt.n_orders
FROM cnt JOIN customer c ON c.c_custkey = cnt.o_custkey
ORDER BY n_orders DESC, custkey
LIMIT 50
"""


@register(
    "tpcds_q73_frequent_buyers",
    _DS_Q73_SQL,
    doc="TPC-DS Q34/Q73 shape (HAVING-banded frequent buyers joined "
    "back to the dimension): count orders per customer inside a date "
    "window, keep customers in a target frequency band, decorate from "
    "the customer dim. One fact groupBy with the year fence pushed to "
    "the scan, the HAVING band applied to the aggregate (customer-key "
    "cardinality, not fact cardinality), then a broadcast dim join and "
    "TakeOrdered top-50 with unique custkey tiebreak.",
)
def tpcds_q73_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1995, 1996)
    )
    cnt = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .filter(F.col("n_orders").between(4, 6))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return (
        cnt.join(cust, cnt["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_orders",
        )
        .orderBy(F.desc("n_orders"), "custkey")
        .limit(50)
    )


_DS_Q93_SQL = """
WITH net AS (
    SELECT l_orderkey,
           CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN 0.0
                              ELSE l_extendedprice * (1 - l_discount) END
                         AS DECIMAL(38,12))) AS DOUBLE) AS net_revenue
    FROM lineitem GROUP BY 1
),
per_cust AS (
    SELECT o.o_custkey,
           CAST(sum(CAST(net.net_revenue AS DECIMAL(38,12))) AS DOUBLE)
               AS total_net
    FROM net JOIN orders o ON o.o_orderkey = net.l_orderkey
    GROUP BY 1
)
SELECT c.c_custkey AS custkey, c.c_name AS name,
       round(p.total_net, 2) AS total_net
FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
ORDER BY round(p.total_net, 2) DESC, custkey
LIMIT 20
"""


@register(
    "tpcds_q93_returns_adjusted",
    _DS_Q93_SQL,
    doc="TPC-DS Q93 shape (returns-adjusted customer revenue): net out "
    "returned lines (returnflag='R' contributes zero) at the line "
    "level, roll up to orders then customers, top-20 by adjusted "
    "spend. Two key-partitioned aggregations with map-side partials + "
    "one fact-to-fact equi-join on the order key; decimal-fenced money "
    "sums, round2 display with the unique custkey tiebreak pinning the "
    "TakeOrdered cut.",
)
def tpcds_q93_returns_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net_line = F.when(F.col("l_returnflag") == "R", F.lit(0.0)).otherwise(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    net = li.groupBy("l_orderkey").agg(
        F.sum(net_line.cast("decimal(38,12)")).cast("double").alias("net_revenue")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        net.join(o, net["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("net_revenue").cast("decimal(38,12)"))
            .cast("double")
            .alias("total_net")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        per_cust.join(cust, per_cust["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            trino_round(F.col("total_net"), 2).alias("total_net"),
        )
        .orderBy(F.desc("total_net"), "custkey")
        .limit(20)
    )
