"""Calibration / model-quality query wave (split from harness/scale.py,
r15): the quality-classifier readout suite — ECE reliability, split
conformal coverage, exact ROC-AUC, KS and Cramér-von Mises two-sample
tests, Brier decomposition, lift/gain deciles, PSI drift — plus
entropy l-diversity, Pareto share, MAD outliers, time-decay
attribution, CUPED, Mann-Whitney, streaks, Poisson bootstrap CI, and
MMR re-ranking.

Every query pairs a Spark-first implementation (operators/*) with a
DuckDB-runnable oracle twin; column names and rounding are aligned on
both sides per the driver's hash-compare contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.trino import trino_round
from ..sources.testdata import load_table, load_table_parallel
from . import register
from .llm import MD5L, _IVF_DOT, _VEC_CTE
from .scale_behavior import _AB_HASH

# ---------------------------------------------------------------------------
# Round-12 wave: entropy l-diversity, Pareto revenue concentration,
# MAD-robust outliers.
# ---------------------------------------------------------------------------


@register(
    "privacy_l_diversity",
    """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    grp AS (SELECT lang, CAST(sum(c) AS BIGINT) AS group_size
            FROM cells GROUP BY 1),
    agg AS (
        SELECT cells.lang, grp.group_size,
               CAST(sum(CAST(round(
                   (CAST(c AS DOUBLE) / CAST(group_size AS DOUBLE))
                   * ln(1.0 / (CAST(c AS DOUBLE)
                               / CAST(group_size AS DOUBLE))), 8)
                   AS DECIMAL(28,8))) AS DOUBLE) AS h
        FROM cells JOIN grp USING (lang)
        GROUP BY 1, 2
    )
    SELECT lang, group_size, round(h, 6) AS entropy,
           round(h, 6) >= 0.693147 AS entropy_l_diverse
    FROM agg ORDER BY lang
    """,
    doc="Entropy l-diversity audit (Machanavajjhala et al. 2007): per "
    "language group, Shannon entropy of the source distribution must "
    "reach ln(2) — the gate a 99%%-one-source group passes on "
    "distinct-count l-diversity but fails here. Completes the privacy "
    "trio (k-anonymity r6, t-closeness r11). One groupBy to the "
    "(QI, sensitive) cube, group sizes broadcast back, per-cell "
    "p*ln(1/p) terms round8 decimal-summed so float-log last-ulp "
    "engine differences can't move the sum "
    "(operators/privacy.py::entropy_l_diversity).",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import entropy_l_diversity

    # plain load (r19 A/B: 0.49 vs 0.74 s — the fenced count cube does
    # the collapsing; the scan-side exchange was pure overhead)
    docs = load_table(spark, sf_dir, "documents")
    return entropy_l_diversity(docs, ["lang"], "source", l=2)


@register(
    "orders_pareto_share",
    """
    WITH cust AS (
        SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,12))) AS rev
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT rev,
               sum(rev) OVER (ORDER BY rev DESC, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(rev) OVER () AS tot
        FROM cust
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN CAST(cum - rev AS DOUBLE)
                              < 0.5 * CAST(tot AS DOUBLE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS top50_customers,
           CAST(sum(CASE WHEN CAST(cum - rev AS DOUBLE)
                              < 0.8 * CAST(tot AS DOUBLE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS top80_customers,
           round(CAST(max(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
               AS top1_share
    FROM w
    """,
    doc="Revenue concentration (Pareto/Lorenz): how many customers, "
    "taken from the top by lifetime revenue, cover 50%% and 80%% of "
    "total revenue, plus the single largest customer's share. The "
    "global running sum is the skew-safe two_phase_running_sum with "
    "keys=() — above its 4M-row guard, revenue-range buckets carry the "
    "parallelism, so even this GLOBAL cumulative ordering never "
    "funnels one task (the classic Lorenz-curve scaling trap); under "
    "the guard the single-window form runs. Per-customer revenue and all "
    "cumulative sums are DECIMAL(38,12)-exact; threshold tests compare "
    "their double casts identically on both engines; a (revenue DESC, "
    "custkey) unique order pins the curve.",
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import two_phase_running_sum

    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias("rev")
        )
        .withColumn("rev_neg", -F.col("rev").cast("double"))
    )
    w = two_phase_running_sum(
        cust,
        value="rev",
        order=("rev_neg", "o_custkey"),
        keys=(),
        bucket_on="rev_neg",
        out="cum",
    )
    before = (F.col("cum") - F.col("rev")).cast("double")
    tot = F.col("cum_total").cast("double")
    return w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(before < F.lit(0.5) * tot, 1).otherwise(0))
        .cast("bigint")
        .alias("top50_customers"),
        F.sum(F.when(before < F.lit(0.8) * tot, 1).otherwise(0))
        .cast("bigint")
        .alias("top80_customers"),
        trino_round(
            F.max("rev").cast("double") / F.max("cum_total").cast("double"), 6
        ).alias("top1_share"),
    )


@register(
    "events_anomaly_mad",
    """
    WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 9) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, round(quantile_cont(adev, 0.5), 9) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           max(d.med) AS median_value,
           max(m.mad) AS mad,
           CAST(sum(CASE WHEN abs(d.value - d.med)
                              > 3 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
    doc="Robust outlier detection: per event type, median + median "
    "absolute deviation (both exact interpolated 0.5-quantiles, "
    "round9-fenced like agg_mode_median), outliers = values beyond "
    "3 sigma-equivalents (1.4826*MAD) — the robust twin of the "
    "z-score/winsorize family, immune to the outliers it hunts. "
    "Exact MAD is inherently two order statistics deep, so the plan "
    "is two grouped-percentile passes with the tiny per-type medians "
    "broadcast between them — no window, no sort of a whole type.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 9).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5D)"), 9).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "events_attribution_time_decay",
    """
    WITH conv AS (
        SELECT user_id AS u, event_id AS cid, ts AS ct, value AS v
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id AS tu, event_type AS ch, ts AS tt
        FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
        SELECT c.cid, c.v, t.ch,
               round(exp(-0.6931471805599453
                         * date_diff('microsecond', t.tt, c.ct)
                         / 302400000000.0), 8) AS w
        FROM conv c LEFT JOIN touch t
          ON t.tu = c.u AND t.tt < c.ct
         AND date_diff('microsecond', t.tt, c.ct) <= 604800000000
    ),
    sw AS (
        SELECT cid, v, ch, w,
               CAST(sum(CAST(w AS DECIMAL(28,8)))
                    OVER (PARTITION BY cid) AS DOUBLE) AS s
        FROM j
    ),
    credits AS (
        SELECT COALESCE(ch, 'direct') AS channel,
               CASE WHEN ch IS NULL THEN round(v, 8)
                    ELSE round(v * w / s, 8) END AS credit
        FROM sw
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
           round(CAST(sum(CAST(credit AS DECIMAL(28,8))) AS DOUBLE), 6)
               AS attributed_value
    FROM credits GROUP BY 1 ORDER BY 1
    """,
    doc="Time-decay multi-touch attribution: every touch in the 7-day "
    "window before a purchase shares its value, weighted "
    "exp(-ln2 * age / 3.5d) and normalized per conversion; "
    "no-touch purchases credit 'direct'. Multi-touch complement of "
    "events_attribution_last_touch: per-user range join (keyed on "
    "user, window residual — never cartesian), per-conversion "
    "normalization over the high-cardinality conversion id, "
    "|channels|-bounded rollup. exp() last-ulp differences are fenced "
    "by round8 before BOTH decimal-exact sums "
    "(operators/sessionize.py::attribution_time_decay).",
)
def events_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize.attribution_time_decay(
        ev, "user_id", "event_type", "ts", "event_id"
    )


@register(
    "stats_cuped_adjustment",
    f"""
    WITH per_user AS (
        SELECT user_id,
               COALESCE(CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN CAST(value AS DECIMAL(38,12)) END) AS DOUBLE),
                        0.0) AS x,
               COALESCE(CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                        THEN CAST(value AS DECIMAL(38,12)) END) AS DOUBLE),
                        0.0) AS y
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        FROM per_user
    ),
    adj AS (
        SELECT CAST(({_AB_HASH}) % 2 AS INTEGER) AS arm,
               y,
               (m.n * m.sxy - m.sx * m.sy)
                   / (m.n * m.sxx - m.sx * m.sx) AS theta,
               y - ((m.n * m.sxy - m.sx * m.sy)
                    / (m.n * m.sxx - m.sx * m.sx))
                   * (x - m.sx / m.n) AS ya
        FROM per_user CROSS JOIN m
    )
    SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_post,
           round(CAST(sum(CAST(ya AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_post_adjusted,
           round((CAST(count(*) AS DOUBLE)
                  * CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE)
                  - CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                    * CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6)
               AS var_post,
           round((CAST(count(*) AS DOUBLE)
                  * CAST(sum(CAST(ya * ya AS DECIMAL(38,12))) AS DOUBLE)
                  - CAST(sum(CAST(ya AS DECIMAL(38,12))) AS DOUBLE)
                    * CAST(sum(CAST(ya AS DECIMAL(38,12))) AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6)
               AS var_post_adjusted,
           round(max(theta), 6) AS theta
    FROM adj GROUP BY 1 ORDER BY 1
    """,
    doc="CUPED variance reduction (Deng et al. 2013): each user's "
    "post-period value sum adjusted by their pre-period sum as a "
    "control variate (theta = pooled cov/var), reported per md5-parity "
    "experiment arm with before/after variances so the sensitivity "
    "gain is visible. Pre/post split at 2024-01-16 (the testdata's "
    "event-range midpoint). Two shuffles: the per-user rollup and the "
    "2-row arm rollup; the five pooled moments ride ONE broadcast row; "
    "all sums decimal-fenced, closed forms in IEEE doubles over "
    "bit-identical moments (operators/stats.py::cuped_adjustment).",
)
def stats_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.cuped_adjustment(
        ev, "user_id", "ts", "value", split_ts="2024-01-16"
    )


@register(
    "stats_mann_whitney",
    f"""
    WITH per_user AS (
        SELECT user_id,
               COALESCE(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE),
                        0.0) AS y
        FROM events GROUP BY 1
    ),
    a AS (
        SELECT y, CAST(({_AB_HASH}) % 2 AS INTEGER) AS arm FROM per_user
    ),
    v AS (
        SELECT y, count(*) AS n_v, sum(arm) AS n1_v FROM a GROUP BY 1
    ),
    r AS (
        SELECT *, sum(n_v) OVER (
            ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum FROM v
    ),
    m AS (
        SELECT sum(n_v - n1_v) AS n0, sum(n1_v) AS n1,
               sum(CAST(n1_v * (2 * cum - n_v + 1) AS DECIMAL(38,0)))
                   AS r1x2,
               sum(CAST(n_v * n_v * n_v - n_v AS DECIMAL(38,0))) AS tie
        FROM r
    ),
    s AS (
        SELECT CAST(n0 AS DOUBLE) AS dn0, CAST(n1 AS DOUBLE) AS dn1,
               CAST(n0 + n1 AS DOUBLE) AS dn,
               CAST(r1x2 AS DOUBLE) / 2 AS r1,
               CAST(tie AS DOUBLE) AS dt, n0, n1, tie
        FROM m
    )
    SELECT CAST(n0 AS BIGINT) AS n_ctrl,
           CAST(n1 AS BIGINT) AS n_treat,
           round(r1, 6) AS rank_sum_treat,
           round(r1 - dn1 * (dn1 + 1) / 2, 6) AS u_treat,
           CAST(tie AS BIGINT) AS tie_term,
           round(CASE WHEN dn0 * dn1 / 12
                           * ((dn + 1) - dt / (dn * (dn - 1))) > 0
                      THEN (r1 - dn1 * (dn1 + 1) / 2 - dn0 * dn1 / 2)
                           / sqrt(dn0 * dn1 / 12
                                  * ((dn + 1) - dt / (dn * (dn - 1))))
                      ELSE 0.0 END, 6) AS z_score
    FROM s
    """,
    doc="Mann-Whitney U rank-sum test between the md5-parity hash-split "
    "arms on per-user value sums — the non-parametric complement of "
    "stats_ab_ztest/CUPED for heavy-tailed metrics. Never a global "
    "row rank: the N-user table collapses to |distinct value| counts, "
    "midranks come from a running count over THAT table "
    "(two_phase_running_sum: bucket-parallel above its guard, one "
    "tiny window under it), and rank sums / the tie term Σ(t³-t) are "
    "exact integer aggregates — midranks carried DOUBLED in "
    "DECIMAL(38,0), halved at emit, so z is closed-form IEEE over "
    "bit-identical integers. Tie-corrected variance, no continuity "
    "correction (operators/stats.py::mann_whitney_u).",
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.mann_whitney_u(ev, "user_id", "value")


@register(
    "events_longest_streak",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '2024-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS di
        FROM events
    ),
    islands AS (
        SELECT user_id,
               di - row_number() OVER (PARTITION BY user_id ORDER BY di)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
        FROM islands GROUP BY 1, 2
    ),
    best AS (
        SELECT user_id, max(len) AS longest FROM streaks GROUP BY 1
    )
    SELECT longest AS streak_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM best GROUP BY 1 ORDER BY 1
    """,
    doc="Gaps-and-islands: each user's longest run of consecutive active "
    "days, rolled up into a streak-length histogram. The classic "
    "row_number-difference idiom — consecutive day indexes minus their "
    "rank collapse to one island key, so runs become plain groups with "
    "NO self-join and no per-day window chain. Day indexes are exact "
    "integers (whole-day date_diff from a fixed epoch, identical on "
    "both engines); the only windows partition by the high-cardinality "
    "user key; output is |distinct streak lengths|-bounded.",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("di"),
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("di"))
    streaks = (
        days.withColumn("island", F.col("di") - rn)
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).cast("bigint").alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("longest"))
    )
    return (
        streaks.groupBy(F.col("longest").alias("streak_days"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("streak_days")
    )


# ---------------------------------------------------------------------------
# Round-13 wave 3: Poisson bootstrap CI
# ---------------------------------------------------------------------------

def _bootstrap_oracle(b: int = 64) -> str:
    """Oracle twin of operators/stats.py::bootstrap_mean_ci — the CASE
    chain is generated from the SAME ``POISSON1_CDF`` constants the
    Spark side compiles, so the inverse-CDF weights match bit-for-bit."""
    from ..operators.stats import POISSON1_CDF

    h = MD5L.format(x="CAST(u AS VARCHAR) || '|boot#' || CAST(b AS VARCHAR)")
    u01 = f"CAST({h} AS DOUBLE) / 1152921504606846976.0"
    chain = " ".join(
        f"WHEN {u01} < {t!r} THEN {k}" for k, t in enumerate(POISSON1_CDF)
    )
    lo_rk = max(1, int(0.025 * b))
    hi_rk = min(b, int(0.975 * b) + 1)
    return f"""
    WITH per_user AS (
        SELECT user_id AS u,
               COALESCE(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE),
                        0.0) AS y
        FROM events GROUP BY 1
    ),
    rep AS (
        SELECT b, y, CASE {chain} ELSE 8 END AS w
        FROM per_user CROSS JOIN (
            SELECT unnest(generate_series(0, {b - 1})) AS b
        )
    ),
    mm AS (
        SELECT b, round(CAST(sum(CAST(w * y AS DECIMAL(38,12))) AS DOUBLE)
                        / CAST(sum(w) AS DOUBLE), 8) AS m
        FROM rep GROUP BY 1
    ),
    r AS (
        SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM mm
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS nb,
               CAST(sum(CAST(m AS DECIMAL(38,12))) AS DOUBLE) AS sm,
               CAST(sum(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE) AS smm,
               min(CASE WHEN rk = {lo_rk} THEN m END) AS lo,
               min(CASE WHEN rk = {hi_rk} THEN m END) AS hi
        FROM r
    ),
    f AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy
        FROM per_user
    )
    SELECT f.n AS n_users,
           CAST(s.nb AS BIGINT) AS b_replicates,
           round(f.sy / CAST(f.n AS DOUBLE), 6) AS mean_full,
           round(sqrt((s.nb * s.smm - s.sm * s.sm) / (s.nb * (s.nb - 1))), 6)
               AS se_boot,
           round(s.lo, 6) AS ci_lo,
           round(s.hi, 6) AS ci_hi
    FROM f CROSS JOIN s
    """


@register(
    "stats_bootstrap_ci",
    _bootstrap_oracle(64),
    doc="Poisson bootstrap CI for the mean per-user value sum (Chamandy "
    "et al. 2012 — the distributed bootstrap): each user enters "
    "replicate b with weight ~ Poisson(1) via a deterministic "
    "inverse-CDF lookup on md5(user|boot#b), so no global resampling "
    "coordination. 64 replicates explode MAP-SIDE and partial "
    "aggregation collapses them before the shuffle (the wire carries "
    "~B rows per task, B*N rows never move); per-replicate means are "
    "round8-fenced before the second-level moments; CI bounds are "
    "order statistics (row_number picks) over the 64-row mean table — "
    "no percentile interpolation to diverge between engines "
    "(operators/stats.py::bootstrap_mean_ci).",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.bootstrap_mean_ci(ev, "user_id", "value", b_replicates=64)


# ---------------------------------------------------------------------------
# Round-13 wave 5: MMR diversified re-ranking
# ---------------------------------------------------------------------------

def _mmr_oracle(k: int = 5, pool: int = 20, lam: float = 0.7) -> str:
    """Unrolled MMR selection as DuckDB CTEs (the kmeans/PQ unrolled-
    iteration precedent): stage i picks argmax(lam*rel - (1-lam)*pen)
    over candidates not yet selected, with pen = max pairwise sim to
    the running selection. Ordering uses the UNROUNDED mmr of round6-
    fenced rel/sim values with literal lambda — bit-identical to the
    Spark side's window ordering."""
    dot_nq = _IVF_DOT.format(a="n.e", b="q.qe")
    dot_ab = _IVF_DOT.format(a="a.e", b="b.e")
    inv = round(1.0 - lam, 10)
    stages = [
        f"""
    s1 AS (
        SELECT 1 AS "rank", vec_id, rel AS relevance,
               0.0 AS max_sim_selected,
               round({lam} * rel, 6) AS mmr_score
        FROM cand
        QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) = 1
    ),
    sel1 AS (SELECT vec_id FROM s1)"""
    ]
    for i in range(2, k + 1):
        stages.append(f"""
    s{i} AS (
        SELECT {i} AS "rank", c.vec_id, c.rel AS relevance,
               m.pen AS max_sim_selected,
               round({lam} * c.rel - {inv} * m.pen, 6) AS mmr_score
        FROM cand c JOIN (
            SELECT ida, max(sim) AS pen
            FROM p JOIN sel{i - 1} s ON p.idb = s.vec_id GROUP BY 1
        ) m ON m.ida = c.vec_id
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        QUALIFY row_number() OVER (
            ORDER BY {lam} * c.rel - {inv} * m.pen DESC, c.vec_id) = 1
    ),
    sel{i} AS (SELECT vec_id FROM sel{i - 1}
               UNION ALL SELECT vec_id FROM s{i})""")
    union = "\n    UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    return (
        _VEC_CTE
        + f"""
    , q AS (SELECT e AS qe, nrm AS qn FROM n WHERE vec_id = 0),
    cand AS (
        SELECT vec_id,
               round({dot_nq} / (sqrt(n.nrm) * sqrt(q.qn)), 6) AS rel,
               e, nrm
        FROM n CROSS JOIN q WHERE vec_id <> 0
        QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= {pool}
    ),
    p AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               round({dot_ab} / (sqrt(a.nrm) * sqrt(b.nrm)), 6) AS sim
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),"""
        + ",".join(stages)
        + f"""
    {union}
    ORDER BY "rank"
    """
    )


@register(
    "similarity_mmr_rerank",
    _mmr_oracle(5, 20, 0.7),
    doc="Maximal Marginal Relevance re-ranking (Carbonell & Goldstein "
    "1998): pick 5 of the 20 most-relevant candidates iteratively, "
    "each step maximizing lam*rel - (1-lam)*max-sim-to-selected — the "
    "relevance/diversity stage between ANN retrieval and the context "
    "window. Sequential in k, so the 5 steps unroll (kmeans/PQ "
    "precedent) over POOL-BOUNDED tables only: the one input-sized "
    "step is the TakeOrdered candidate scan (localCheckpoint-fenced); "
    "the pool^2 sim table, <=5-row selection, and each limit(1) "
    "argmax are all pool-bounded, nothing collects. round6-fenced "
    "rel/sims + literal lambda + id tiebreaks make the selected "
    "sequence engine-exact "
    "(operators/similarity.py::mmr_rerank).",
)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_rerank

    emb = load_table_parallel(spark, sf_dir, "embeddings")
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
    )
    return mmr_rerank(
        emb.filter(F.col("vec_id") != 0), q, k=5, pool=20, lam=0.7
    )


@register(
    "stats_ece_calibration",
    """
    WITH scored AS (
        SELECT round(least(1.0, CAST(o_totalprice AS DOUBLE) / 500000.0), 8)
                   AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    binned AS (
        SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin, s, y
        FROM scored
    ),
    bins AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS conf,
               CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS acc
        FROM binned GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS n_total FROM bins),
    contrib AS (
        SELECT bin, n_rows, conf, acc,
               round(abs(acc - conf) * CAST(n_rows AS DOUBLE) / n_total, 8)
                   AS c
        FROM bins, tot
    ),
    e AS (
        SELECT round(CAST(sum(CAST(c AS DECIMAL(38,12))) AS DOUBLE), 6)
                   AS ece
        FROM contrib
    )
    SELECT bin, n_rows, round(conf, 6) AS avg_conf, round(acc, 6) AS avg_acc,
           round(abs(acc - conf), 6) AS abs_gap, e.ece
    FROM contrib, e
    ORDER BY bin
    """,
    doc="Expected-calibration-error reliability bins over a "
    "deterministic (score, outcome) pair — score = clamped "
    "totalprice/500k as the 'model confidence', outcome = order "
    "fully shipped ('F'). Ten fixed-width bins from one grouped "
    "aggregate (map-side partials), a 1-row broadcast combiner for "
    "N and the n-weighted |acc - conf| sum; round8 fences + decimal "
    "sums make the table integer-exact across engines "
    "(operators/stats.py::ece_reliability).",
)
def stats_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.trino import trino_round
    from ..operators.stats import ece_reliability

    o = load_table(spark, sf_dir, "orders").select(
        trino_round(
            F.least(
                F.lit(1.0), F.col("o_totalprice").cast("double") / 500000.0
            ),
            8,
        ).alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("outcome"),
    )
    return ece_reliability(o, "score", "outcome", n_bins=10)


_CONF_HASH = MD5L.format(x="CAST(event_id AS VARCHAR) || '|conf'")


@register(
    "stats_conformal_coverage",
    f"""
    WITH base AS (
        SELECT event_type AS g, CAST(value AS DOUBLE) AS v,
               ({_CONF_HASH}) % 5 = 0 AS is_test
        FROM events WHERE value IS NOT NULL
    ),
    pred AS (
        SELECT g,
               CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS p,
               CAST(count(*) AS BIGINT) AS n_cal
        FROM base WHERE NOT is_test GROUP BY 1
    ),
    scored AS (
        SELECT b.g, b.is_test, round(abs(b.v - pred.p), 8) AS s,
               pred.n_cal
        FROM base b JOIN pred ON pred.g = b.g
    ),
    cal AS (
        SELECT g, s, n_cal,
               row_number() OVER (PARTITION BY g ORDER BY s) AS rn
        FROM scored WHERE NOT is_test
    ),
    thr AS (
        SELECT g, min(s) AS t
        FROM cal
        WHERE rn >= least(CAST(ceil(CAST(n_cal + 1 AS DOUBLE) * 0.9)
                                AS BIGINT), n_cal)
        GROUP BY 1
    )
    SELECT sc.g AS event_type,
           min(sc.n_cal) AS n_cal,
           round(min(thr.t), 6) AS threshold,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN sc.s <= thr.t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           round(CAST(sum(CASE WHEN sc.s <= thr.t THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS coverage
    FROM scored sc JOIN thr ON thr.g = sc.g
    WHERE sc.is_test
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Split-conformal calibration over per-event values: md5 hash "
    "split (80/20 cal/test), trivial per-type mean predictor fit on "
    "the calibration split, conformal threshold = the "
    "ceil((n_cal+1)*0.9)-th smallest |value - pred| nonconformity "
    "score, empirical coverage reported on the held-out split (>= 90% "
    "in expectation by the conformal guarantee). The rank-k election "
    "runs through two_phase_running_sum — (group, range-bucket) "
    "partitioned running counts, never a whole group sorted in one "
    "task (operators/stats.py::conformal_split_calibrate).",
)
def stats_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import conformal_split_calibrate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return conformal_split_calibrate(
        ev, "event_type", "event_id", "value", alpha=0.1
    )


@register(
    "stats_roc_auc",
    """
    WITH per AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    b AS (SELECT v, count(*) AS n_v, sum(y) AS n_pos_v FROM per GROUP BY 1),
    r AS (
        SELECT n_v, n_pos_v, sum(n_v) OVER (ORDER BY v) AS cum FROM b
    ),
    m AS (
        SELECT sum(n_v - n_pos_v) AS n0, sum(n_pos_v) AS n1,
               sum(CAST(n_pos_v AS DECIMAL(19,0))
                   * CAST(2 * cum - n_v + 1 AS DECIMAL(19,0)))
                   AS rx2
        FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           round(CAST(rx2 AS DOUBLE) / 2.0, 6) AS rank_sum_pos,
           round((CAST(rx2 AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0)
                 / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS auc,
           round(2.0 * ((CAST(rx2 AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0)
                 / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))) - 1.0, 6)
               AS gini
    FROM m
    """,
    doc="Exact ROC-AUC (Hanley-McNeil rank identity, midranks on "
    "ties) of order totalprice as a predictor of fully-shipped "
    "status: value-grouped counts + two-phase running counts — the "
    "Mann-Whitney single-task dodge — with the positive rank sum "
    "carried doubled in DECIMAL(38,0); AUC and Gini are IEEE "
    "divisions of exact integers (operators/stats.py::roc_auc).",
)
def stats_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import roc_auc

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    return roc_auc(o, "score", "label")


@register(
    "stats_ks_two_sample",
    """
    WITH base AS (
        SELECT CAST(value AS DOUBLE) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s1
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ),
    b AS (SELECT v, sum(s1) AS n1_v, sum(1 - s1) AS n2_v FROM base GROUP BY 1),
    c AS (
        SELECT v, sum(n1_v) OVER (ORDER BY v) AS cum1,
               sum(n2_v) OVER (ORDER BY v) AS cum2
        FROM b
    ),
    t AS (SELECT sum(n1_v) AS n1, sum(n2_v) AS n2 FROM b),
    s AS (
        SELECT v, abs(CAST(cum1 AS DECIMAL(19,0)) * CAST(t.n2 AS DECIMAL(19,0))
                      - CAST(cum2 AS DECIMAL(19,0)) * CAST(t.n1 AS DECIMAL(19,0)))
                   AS ds
        FROM c, t
    ),
    m AS (SELECT max(ds) AS md FROM s)
    SELECT CAST(t.n1 AS BIGINT) AS n_1, CAST(t.n2 AS BIGINT) AS n_2,
           round(CAST(m.md AS DOUBLE)
                 / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)), 6)
               AS ks_stat,
           min(s.v) AS ks_at
    FROM s, m, t WHERE s.ds = m.md GROUP BY 1, 2, 3
    """,
    doc="Exact two-sample Kolmogorov-Smirnov drift test between the "
    "click and purchase value distributions: value-grouped counts, "
    "ONE bounds probe shared by two two-phase running-count passes, "
    "supremum taken over the INTEGER cross-product |cum1*n2 - "
    "cum2*n1| (no float comparison anywhere; smallest achieving "
    "value on ties), divided by n1*n2 only at emit "
    "(operators/stats.py::ks_two_sample).",
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import ks_two_sample

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    return ks_two_sample(ev, "value", F.col("event_type") == "click")


@register(
    "stats_brier_decomposition",
    """
    WITH scored AS (
        SELECT round(least(1.0, CAST(o_totalprice AS DOUBLE) / 500000.0), 8)
                   AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    binned AS (
        SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin, s, y
        FROM scored
    ),
    bins AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS conf,
               CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS acc,
               CAST(sum(y) AS BIGINT) AS npos,
               sum(CAST(round((s - CAST(y AS DOUBLE)) * (s - CAST(y AS DOUBLE)),
                              8) AS DECIMAL(38,12))) AS sqsum
        FROM binned GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n) AS DOUBLE) AS nt, CAST(sum(npos) AS DOUBLE) AS pt,
               CAST(sum(sqsum) AS DOUBLE) AS sq
        FROM bins
    ),
    contrib AS (
        SELECT round(CAST(n AS DOUBLE) / nt * (conf - acc) * (conf - acc), 8)
                   AS rel,
               round(CAST(n AS DOUBLE) / nt * (acc - pt / nt)
                     * (acc - pt / nt), 8) AS res,
               nt, pt, sq
        FROM bins, tot
    ),
    agg AS (
        SELECT CAST(sum(CAST(rel AS DECIMAL(38,12))) AS DOUBLE)
                   AS reliability,
               CAST(sum(CAST(res AS DECIMAL(38,12))) AS DOUBLE)
                   AS resolution,
               max(nt) AS n, max(pt) AS p, max(sq) AS s2
        FROM contrib
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(s2 / n, 6) AS brier,
           round(reliability - resolution + (p / n) * (1.0 - p / n), 6)
               AS brier_binned,
           round(reliability, 6) AS reliability,
           round(resolution, 6) AS resolution,
           round((p / n) * (1.0 - p / n), 6) AS uncertainty
    FROM agg
    """,
    doc="Murphy decomposition of the Brier score over the same ten "
    "fixed-width bins as the ECE query (reliability - resolution + "
    "uncertainty = binned Brier, raw Brier alongside): one grouped "
    "aggregate to <=10 rows + a 1-row broadcast combiner; round8 "
    "fences on per-row squares and per-bin contributions make every "
    "term engine-identical "
    "(operators/stats.py::brier_decomposition).",
)
def stats_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.trino import trino_round
    from ..operators.stats import brier_decomposition

    o = load_table(spark, sf_dir, "orders").select(
        trino_round(
            F.least(
                F.lit(1.0), F.col("o_totalprice").cast("double") / 500000.0
            ),
            8,
        ).alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("outcome"),
    )
    return brier_decomposition(o, "score", "outcome", n_bins=10)


@register(
    "stats_lift_gain",
    """
    WITH per AS (
        SELECT -CAST(o_totalprice AS DOUBLE) AS nv,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    b AS (SELECT nv, count(*) AS n_v, sum(y) AS np_v FROM per GROUP BY 1),
    c AS (
        SELECT nv, n_v, np_v, sum(n_v) OVER (ORDER BY nv) AS c FROM b
    ),
    tot AS (SELECT sum(n_v) AS n, sum(np_v) AS p FROM b),
    cuts AS (
        SELECT t, t * (n // 10) + least(t, n % 10) AS p
        FROM generate_series(1, 9) AS g(t), tot
    ),
    bnd AS (
        SELECT c.nv AS v FROM c JOIN cuts
        ON c.c >= cuts.p AND c.c - c.n_v < cuts.p
    ),
    asg AS (
        SELECT b.nv, b.n_v, b.np_v,
               1 + (SELECT count(*) FROM bnd WHERE b.nv > bnd.v) AS bucket
        FROM b
    ),
    per_bucket AS (
        SELECT bucket, CAST(sum(n_v) AS BIGINT) AS n_rows,
               CAST(sum(np_v) AS BIGINT) AS n_pos
        FROM asg GROUP BY 1
    ),
    o AS (
        SELECT bucket, n_rows, n_pos,
               CAST(sum(n_pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos,
               sum(n_rows) OVER (ORDER BY bucket) AS cum_n
        FROM per_bucket
    )
    SELECT CAST(bucket AS INTEGER) AS bucket, n_rows, n_pos, cum_pos,
           round(CAST(cum_pos AS DOUBLE) / CAST(t.p AS DOUBLE), 6) AS gain,
           round((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
                 / (CAST(t.p AS DOUBLE) / CAST(t.n AS DOUBLE)), 6) AS lift
    FROM o, tot t ORDER BY bucket
    """,
    doc="Cumulative gains / lift table at population deciles of order "
    "totalprice (descending) against fully-shipped status — the "
    "model-targeting report for a volume-budgeted quality gate. The "
    "RFM boundary machinery end-to-end: value-grouped counts, "
    "two-phase running-count boundary election at ntile's exact cut "
    "positions, broadcast boundary array, row-local fold assignment "
    "on the VALUE-grouped table (raw rows never touched after the "
    "first groupBy); gains cumulate over the 10-row output "
    "(operators/stats.py::lift_gain_table).",
)
def stats_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import lift_gain_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    return lift_gain_table(o, "score", "label", n_buckets=10)


@register(
    "stats_psi_drift",
    """
    WITH base AS (
        SELECT CAST(value AS DOUBLE) AS v,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS r
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
    ),
    b AS (
        SELECT v, sum(r) AS nr_v, sum(1 - r) AS nc_v FROM base GROUP BY 1
    ),
    c AS (SELECT v, nr_v, nc_v, sum(nr_v) OVER (ORDER BY v) AS c FROM b),
    tot AS (SELECT sum(nr_v) AS nr, sum(nc_v) AS nc FROM b),
    cuts AS (
        SELECT t, t * (nr // 10) + least(t, nr % 10) AS p
        FROM generate_series(1, 9) AS g(t), tot
    ),
    bnd AS (
        SELECT c.v AS bv FROM c JOIN cuts
        ON c.c >= cuts.p AND c.c - c.nr_v < cuts.p
    ),
    asg AS (
        SELECT b.v, b.nr_v, b.nc_v,
               1 + (SELECT count(*) FROM bnd WHERE b.v > bnd.bv) AS bin
        FROM b
    ),
    per AS (
        SELECT bin, CAST(sum(nr_v) AS BIGINT) AS n_ref,
               CAST(sum(nc_v) AS BIGINT) AS n_cmp
        FROM asg GROUP BY 1
    ),
    wide AS (
        SELECT bin, n_ref, n_cmp,
               (CAST(n_ref AS DOUBLE) + 0.5)
                   / (CAST(t.nr AS DOUBLE) + 5.0) AS p,
               (CAST(n_cmp AS DOUBLE) + 0.5)
                   / (CAST(t.nc AS DOUBLE) + 5.0) AS q
        FROM per, tot t
    ),
    scored AS (
        SELECT bin, n_ref, n_cmp, p, q,
               round((p - q) * ln(p / q), 8) AS ct
        FROM wide
    ),
    e AS (
        SELECT round(CAST(sum(CAST(ct AS DECIMAL(38,12))) AS DOUBLE), 6)
                   AS psi
        FROM scored
    )
    SELECT CAST(bin AS INTEGER) AS bin, n_ref, n_cmp,
           round(p, 6) AS p_ref, round(q, 6) AS p_cmp,
           round(ct, 6) AS contrib, e.psi
    FROM scored, e
    ORDER BY bin
    """,
    doc="Population Stability Index of the purchase-value distribution "
    "against view-value as the reference: reference-decile bins from "
    "the two-phase boundary election, one value-grouped pass carrying "
    "both slices, Laplace-smoothed proportions (+0.5 per bin), "
    "round8-fenced (p-q)ln(p/q) terms decimal-summed — the standard "
    "drift monitor between corpus slices "
    "(operators/stats.py::psi_drift).",
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import psi_drift

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    return psi_drift(ev, "value", F.col("event_type") == "view", n_bins=10)


@register(
    "stats_cvm_two_sample",
    """
    WITH base AS (
        SELECT CAST(value AS DOUBLE) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s1
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ),
    b AS (SELECT v, sum(s1) AS n1_v, sum(1 - s1) AS n2_v FROM base GROUP BY 1),
    c AS (
        SELECT v, n1_v, n2_v, sum(n1_v) OVER (ORDER BY v) AS cum1,
               sum(n2_v) OVER (ORDER BY v) AS cum2
        FROM b
    ),
    t AS (SELECT sum(n1_v) AS n1, sum(n2_v) AS n2 FROM b),
    s AS (
        SELECT round(CAST(n1_v + n2_v AS DOUBLE)
                     * (CAST(cum1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
                        - CAST(cum2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))
                     * (CAST(cum1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
                        - CAST(cum2 AS DOUBLE) / CAST(t.n2 AS DOUBLE)), 8)
                   AS ct,
               t.n1, t.n2
        FROM c, t
    )
    SELECT CAST(max(n1) AS BIGINT) AS n_1, CAST(max(n2) AS BIGINT) AS n_2,
           round(CAST(sum(CAST(ct AS DECIMAL(38,12))) AS DOUBLE)
                 * CAST(max(n1) AS DOUBLE)
                 / (CAST(max(n1) AS DOUBLE) + CAST(max(n2) AS DOUBLE))
                 * CAST(max(n2) AS DOUBLE)
                 / (CAST(max(n1) AS DOUBLE) + CAST(max(n2) AS DOUBLE)), 6)
               AS cvm_stat
    FROM s
    """,
    doc="Two-sample Cramér-von Mises statistic between the click and "
    "purchase value distributions — the integral companion to the KS "
    "supremum, same value-grouped collapse and shared bounds probe; "
    "per-value m_v*(F1-F2)^2 contributions round8-fenced and "
    "decimal-summed, fixed-order double scaling at emit "
    "(operators/stats.py::cvm_two_sample).",
)
def stats_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import cvm_two_sample

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    return cvm_two_sample(ev, "value", F.col("event_type") == "click")


# ---------------------------------------------------------------------------
# Round-15 wave: exact precision-recall curve (the missing calibration
# readout next to ROC/ECE/Brier/lift/KS/CvM/PSI).
# ---------------------------------------------------------------------------


@register(
    "stats_pr_curve",
    """
    WITH per AS (
        SELECT round(CAST(o_totalprice AS DOUBLE) / 1000.0, 0) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    b AS (SELECT s, count(*) AS n_v, sum(y) AS np_v FROM per GROUP BY 1),
    c AS (
        SELECT s, sum(n_v) OVER (ORDER BY s DESC) AS cum_n,
               sum(np_v) OVER (ORDER BY s DESC) AS cum_p
        FROM b
    ),
    t AS (SELECT sum(np_v) AS p FROM b),
    pr AS (
        SELECT s AS threshold,
               CAST(cum_n AS BIGINT) AS n_pred,
               CAST(cum_p AS BIGINT) AS tp,
               round(CAST(cum_p AS DOUBLE) / CAST(cum_n AS DOUBLE), 6)
                   AS precision,
               CASE WHEN t.p > 0 THEN
                   round(CAST(cum_p AS DOUBLE) / CAST(t.p AS DOUBLE), 6)
               END AS recall
        FROM c, t
    )
    SELECT threshold, n_pred, tp, precision, recall,
           CASE WHEN precision + recall > 0 THEN
               round(2.0 * precision * recall / (precision + recall), 6)
           END AS f1
    FROM pr ORDER BY threshold DESC
    """,
    doc="Exact precision-recall curve of (totalprice/1000 rounded) as "
    "a predictor of fully-shipped status: one operating point per "
    "distinct threshold, descending. Value-grouped collapse + two "
    "shared-bounds two-phase running-count passes over the negated "
    "score — raw rows are never sorted; counts are exact integers, "
    "precision/recall/F1 are IEEE divisions at emit with F1 derived "
    "from the round6 operands on both engines "
    "(operators/stats.py::pr_curve).",
)
def stats_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.trino import trino_round
    from ..operators.stats import pr_curve

    o = load_table(spark, sf_dir, "orders").select(
        trino_round(F.col("o_totalprice").cast("double") / 1000.0, 0).alias(
            "score"
        ),
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    return pr_curve(o, "score", "label")


@register(
    "stats_spearman_corr",
    """
    WITH per AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x,
               CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem
    ),
    bx AS (SELECT x, count(*) AS n FROM per GROUP BY 1),
    rx AS (SELECT x, 2 * sum(n) OVER (ORDER BY x) - n + 1 AS dx FROM bx),
    byv AS (SELECT y, count(*) AS n FROM per GROUP BY 1),
    ry AS (SELECT y, 2 * sum(n) OVER (ORDER BY y) - n + 1 AS dy FROM byv),
    j AS (SELECT dx, dy FROM per JOIN rx USING (x) JOIN ry USING (y)),
    m AS (
        SELECT count(*) AS nn,
               sum(CAST(dx AS DECIMAL(19,0))) AS sx,
               sum(CAST(dy AS DECIMAL(19,0))) AS sy,
               sum(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))
                   AS sxx,
               sum(CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
                   AS syy,
               sum(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
                   AS sxy
        FROM j
    )
    SELECT CAST(nn AS BIGINT) AS n,
           round((CAST(nn AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(nn AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS rho
    FROM m
    """,
    doc="Exact tie-correct Spearman rank correlation between lineitem "
    "quantity and extended price: midranks from value-grouped counts "
    "+ two-phase running sums (carried doubled, never a global row "
    "rank), ranks joined back by value, five Pearson moments as "
    "DECIMAL(38,0)-exact sums of decimal(19,0) operand products, one "
    "fixed-order IEEE combination at emit "
    "(operators/stats.py::spearman_corr).",
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import spearman_corr

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_quantity", "l_extendedprice")


@register(
    "stats_isotonic_calibration",
    """
    WITH per AS (
        SELECT o_orderpriority AS g,
               round(least(CAST(o_totalprice AS DOUBLE) / 500000.0, 1.0), 2)
                   AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    b AS (
        SELECT g, s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS p,
               row_number() OVER (PARTITION BY g ORDER BY s) AS rn
        FROM per GROUP BY 1, 2
    ),
    pre AS (
        SELECT g, s, n, p, rn,
               sum(n) OVER (PARTITION BY g ORDER BY rn) AS pn,
               sum(p) OVER (PARTITION BY g ORDER BY rn) AS pp
        FROM b
    ),
    iv AS (
        SELECT j.g, j.rn AS j, k.rn AS k,
               CAST(k.pp - j.pp + j.p AS DOUBLE)
               / CAST(k.pn - j.pn + j.n AS DOUBLE) AS a
        FROM pre j JOIN pre k ON k.g = j.g AND k.rn >= j.rn
    ),
    mn AS (
        SELECT iv.g, pos.rn AS i, iv.j, min(iv.a) AS m
        FROM iv JOIN b pos ON pos.g = iv.g
             AND iv.j <= pos.rn AND iv.k >= pos.rn
        GROUP BY 1, 2, 3
    ),
    fit AS (SELECT g, i, max(m) AS yhat FROM mn GROUP BY 1, 2)
    SELECT b.g AS priority, b.s AS score, b.n, b.p AS n_pos,
           round(CAST(b.p AS DOUBLE) / CAST(b.n AS DOUBLE), 6) AS pos_rate,
           round(fit.yhat, 6) AS calibrated
    FROM b JOIN fit ON fit.g = b.g AND fit.i = b.rn
    ORDER BY priority, score
    """,
    doc="Isotonic (PAV) score->probability calibration of the round2 "
    "totalprice ratio against fully-shipped status, fitted per order "
    "priority: rows collapse to distinct-score (n, positives) counts, "
    "the PAV merge runs ALL-INTEGER (violation test is the "
    "s_prev*n_new > s_new*n_prev cross-product — no float anywhere in "
    "the fit) on the bucketed applyInPandas seam, calibrated values "
    "are IEEE divisions of exact integers at emit. The oracle "
    "evaluates the closed-form minimax identity max_j<=i min_k>=i "
    "avg(j..k) over the same collapsed table, which IEEE-monotone "
    "rounding makes bit-equal to the PAV block means "
    "(operators/stats.py::isotonic_calibration).",
)
def stats_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import isotonic_calibration

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        trino_round(
            F.least(
                F.col("o_totalprice").cast("double") / 500000.0, F.lit(1.0)
            ),
            2,
        ).alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    return isotonic_calibration(o, "priority", "score", "label").orderBy(
        "priority", "score"
    )


@register(
    "stats_ols_two_features",
    """
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x1 AS DECIMAL(28,8))) AS DOUBLE) AS sx1,
             CAST(sum(CAST(x2 AS DECIMAL(28,8))) AS DOUBLE) AS sx2,
             CAST(sum(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x1 * x1 AS DECIMAL(28,8))) AS DOUBLE) AS s11,
             CAST(sum(CAST(x2 * x2 AS DECIMAL(28,8))) AS DOUBLE) AS s22,
             CAST(sum(CAST(x1 * x2 AS DECIMAL(28,8))) AS DOUBLE) AS s12,
             CAST(sum(CAST(x1 * y AS DECIMAL(28,8))) AS DOUBLE) AS s1y,
             CAST(sum(CAST(x2 * y AS DECIMAL(28,8))) AS DOUBLE) AS s2y,
             CAST(sum(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy
      FROM (
        SELECT CAST(l_quantity AS DOUBLE) AS x1,
               CAST(l_discount AS DOUBLE) AS x2,
               CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL
      )
    ),
    solved AS (
      SELECT n,
             (n * (s11 * s22 - s12 * s12)
              - sx1 * (sx1 * s22 - sx2 * s12)
              + sx2 * (sx1 * s12 - sx2 * s11)) AS det,
             (sy * (s11 * s22 - s12 * s12)
              - s1y * (sx1 * s22 - sx2 * s12)
              + s2y * (sx1 * s12 - sx2 * s11)) AS det0,
             (n * (s1y * s22 - s12 * s2y)
              - sx1 * (sy * s22 - sx2 * s2y)
              + sx2 * (sy * s12 - sx2 * s1y)) AS det1,
             (n * (s11 * s2y - s1y * s12)
              - sx1 * (sx1 * s2y - s1y * sx2)
              + sy * (sx1 * s12 - s11 * sx2)) AS det2,
             sy, s1y, s2y, syy
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(det0 / det, 6) AS intercept,
           round(det1 / det, 6) AS beta1,
           round(det2 / det, 6) AS beta2,
           round(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                        - (det2 / det) * s2y)
                       / (syy - sy * sy / n), 6) AS r2
    FROM solved
    """,
    doc="Two-feature OLS (extended price ~ quantity + discount) in "
    "closed form: nine decimal-fenced moment sums from ONE "
    "partial-aggregated scan, then Cramer's-rule 3x3 solve and "
    "normal-equation R-squared as fixed-order IEEE arithmetic on the "
    "bit-identical moments — the mergeable regression shape (no "
    "iterative solver, nothing collected) "
    "(operators/stats.py::ols_two_features).",
)
def stats_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import ols_two_features

    li = load_table_parallel(spark, sf_dir, "lineitem")
    return ols_two_features(li, "l_extendedprice", "l_quantity", "l_discount")


@register(
    "orders_gini",
    """
    WITH cust AS (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
            AS v
        FROM orders GROUP BY o_custkey
    ),
    b AS (SELECT v, count(*) AS n FROM cust GROUP BY 1),
    c AS (
        SELECT v, n, 2 * sum(n) OVER (ORDER BY v) - n + 1 AS d FROM b
    ),
    m AS (
        SELECT CAST(sum(n) AS DOUBLE) AS nn,
               CAST(sum(CAST((CAST(d AS DOUBLE) * CAST(n AS DOUBLE)) * v
                             AS DECIMAL(38,8))) AS DOUBLE) AS sdx,
               CAST(sum(CAST(v * CAST(n AS DOUBLE)
                             AS DECIMAL(38,8))) AS DOUBLE) AS sx
        FROM c
    )
    SELECT CAST(nn AS BIGINT) AS n, round(sx, 6) AS total,
           round((sdx - (nn + 1.0) * sx) / (nn * sx), 6) AS gini
    FROM m
    """,
    doc="Exact tie-correct Gini coefficient of per-customer lifetime "
    "revenue — the single-number Lorenz summary next to "
    "orders_pareto_share's top-k cut points. Customer revenues "
    "collapse to distinct-value counts, doubled midranks ride the "
    "two-phase running count (never a global row sort), both weighted "
    "sums are decimal(38,8)-fenced fixed-order double terms "
    "(operators/stats.py::gini_coefficient).",
)
def orders_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import gini_coefficient

    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
            .cast("double")
            .alias("rev")
        )
    )
    return gini_coefficient(cust, "rev")


@register(
    "events_ips_offpolicy",
    """
    WITH base AS (
        SELECT CAST(dayofweek(ts) AS INTEGER) AS x, event_type AS a,
               CAST(value AS DOUBLE) AS r
        FROM events WHERE value IS NOT NULL
    ),
    per_xa AS (
        SELECT x, a, CAST(count(*) AS BIGINT) AS nxa,
               round(CAST(sum(CAST(r AS DECIMAL(38,12))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 8) AS mu
        FROM base GROUP BY 1, 2
    ),
    per_x AS (SELECT x, CAST(sum(nxa) AS BIGINT) AS nx
              FROM per_xa GROUP BY 1),
    pol AS (
        SELECT x, a AS pi FROM (
            SELECT x, a, row_number() OVER (PARTITION BY x
                         ORDER BY mu DESC, a ASC) AS rk
            FROM per_xa
        ) WHERE rk = 1
    ),
    scored AS (
        SELECT b.r, CASE WHEN b.a = pol.pi THEN 1 ELSE 0 END AS hit,
               CAST(per_x.nx AS DOUBLE) / CAST(per_xa.nxa AS DOUBLE) AS invp
        FROM base b
        JOIN per_xa ON per_xa.x = b.x AND per_xa.a = b.a
        JOIN per_x ON per_x.x = b.x
        JOIN pol ON pol.x = b.x
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(hit) AS BIGINT) AS n_matched,
               CAST(sum(CAST(CASE WHEN hit = 1
                             THEN r * invp ELSE 0.0 END
                             AS DECIMAL(38,8))) AS DOUBLE) AS sw,
               CAST(sum(CAST(CASE WHEN hit = 1
                             THEN invp ELSE 0.0 END
                             AS DECIMAL(38,8))) AS DOUBLE) AS sp
        FROM scored
    )
    SELECT n, n_matched,
           round(CAST(n_matched AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS match_rate,
           round(sw / CAST(n AS DOUBLE), 6) AS ips_value,
           round(sw / sp, 6) AS snips_value
    FROM m
    """,
    doc="Off-policy bandit replay over the event log: contexts are "
    "days-of-week, actions are event types, rewards are values; the "
    "greedy (argmax round8 mean-reward) target policy is scored by "
    "inverse-propensity IPS and self-normalized SNIPS against the "
    "empirical logging propensities. One contexts-x-actions grouped "
    "aggregate, bounded propensity/policy tables broadcast back, "
    "decimal-fenced fixed-order weight terms — both estimators "
    "engine-identical (operators/stats.py::ips_offpolicy).",
)
def events_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import ips_offpolicy

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.col("event_type"),
            F.col("value"),
        )
    )
    return ips_offpolicy(ev, "dow", "event_type", "value")


@register(
    "stats_wilson_intervals",
    """
    WITH per AS (
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_success
        FROM orders GROUP BY 1
    )
    SELECT priority, n, n_success,
           round(CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
           round(greatest(
               ((CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
                + 3.841458820694126 / (2.0 * CAST(n AS DOUBLE)))
               / (1.0 + 3.841458820694126 / CAST(n AS DOUBLE))
               - 1.959963984540054
                 * sqrt((CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(n_success AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + 3.841458820694126
                          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (1.0 + 3.841458820694126 / CAST(n AS DOUBLE)),
               0.0), 6) AS ci_low,
           round(least(
               ((CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
                + 3.841458820694126 / (2.0 * CAST(n AS DOUBLE)))
               / (1.0 + 3.841458820694126 / CAST(n AS DOUBLE))
               + 1.959963984540054
                 * sqrt((CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(n_success AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + 3.841458820694126
                          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (1.0 + 3.841458820694126 / CAST(n AS DOUBLE)),
               1.0), 6) AS ci_high
    FROM per ORDER BY priority
    """,
    doc="Wilson score 95%% confidence intervals for the fully-shipped "
    "share per order priority — the proportion interval that stays in "
    "[0,1] at small n / extreme rates where Wald collapses. One "
    "grouped count pass; the interval is a fixed-order IEEE chain "
    "with the z and z^2 constants embedded as identical literals on "
    "both engines (operators/stats.py::wilson_intervals).",
)
def stats_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import wilson_intervals

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_orderstatus") == "F").alias("_s"),
    )
    return wilson_intervals(o, "priority", F.col("_s"))


@register(
    "stats_skew_kurtosis",
    """
    WITH pre AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    sc AS (
        SELECT g, round(greatest(
                   CAST(sum(CAST(abs(v) AS DECIMAL(38,8))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 1.0), 8) AS s
        FROM pre GROUP BY 1
    ),
    m AS (
        SELECT pre.g, CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(v / s AS DECIMAL(38,8))) AS DOUBLE) AS s1,
               CAST(sum(CAST((v / s) * (v / s) AS DECIMAL(38,8)))
                    AS DOUBLE) AS s2,
               CAST(sum(CAST((v / s) * (v / s) * (v / s) AS DECIMAL(38,8)))
                    AS DOUBLE) AS s3,
               CAST(sum(CAST((v / s) * (v / s) * (v / s) * (v / s)
                             AS DECIMAL(38,8))) AS DOUBLE) AS s4
        FROM pre JOIN sc ON sc.g = pre.g GROUP BY 1
    )
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           round((s3 / n - 3.0 * (s1 / n) * s2 / n
                  + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
                 / (sqrt(s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness,
           round((s4 / n - 4.0 * (s1 / n) * s3 / n
                  + 6.0 * (s1 / n) * (s1 / n) * s2 / n
                  - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 6)
               AS kurtosis
    FROM m ORDER BY l_returnflag
    """,
    doc="Per-returnflag skewness and excess kurtosis of extended price "
    "from the first four decimal-fenced raw moments (mergeable shape; "
    "values pre-scaled by the round8 mean magnitude so x^4 stays "
    "inside the decimal fence at any price scale), combined in one "
    "fixed-order IEEE chain — the distribution-shape profile next to "
    "mean/variance in a drift audit "
    "(operators/stats.py::skew_kurtosis).",
)
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import skew_kurtosis

    li = load_table_parallel(spark, sf_dir, "lineitem")
    return skew_kurtosis(li, "l_returnflag", "l_extendedprice")


@register(
    "stats_tost_equivalence",
    f"""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 180
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ),
    armed AS (
        SELECT CAST(({_AB_HASH}) % 2 AS INTEGER) AS arm, conv FROM per_user
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
               max(CASE WHEN arm = 0 THEN c END) AS conv_a,
               max(CASE WHEN arm = 1 THEN n END) AS n_b,
               max(CASE WHEN arm = 1 THEN c END) AS conv_b
        FROM (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(conv) AS BIGINT) AS c
              FROM armed GROUP BY 1)
    )
    SELECT n_a, n_b,
           round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                 - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS diff,
           round(sqrt((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                      * (1.0 - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                      / CAST(n_a AS DOUBLE)
                      + (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        * (1.0 - CAST(conv_b AS DOUBLE)
                                 / CAST(n_b AS DOUBLE))
                        / CAST(n_b AS DOUBLE)), 6) AS se,
           round(((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                   - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) + 0.02)
                 / sqrt((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * (1.0 - CAST(conv_a AS DOUBLE)
                                 / CAST(n_a AS DOUBLE))
                        / CAST(n_a AS DOUBLE)
                        + (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                          * (1.0 - CAST(conv_b AS DOUBLE)
                                   / CAST(n_b AS DOUBLE))
                          / CAST(n_b AS DOUBLE)), 6) AS z_lower,
           round((0.02 - (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                          - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
                 / sqrt((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * (1.0 - CAST(conv_a AS DOUBLE)
                                 / CAST(n_a AS DOUBLE))
                        / CAST(n_a AS DOUBLE)
                        + (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                          * (1.0 - CAST(conv_b AS DOUBLE)
                                   / CAST(n_b AS DOUBLE))
                          / CAST(n_b AS DOUBLE)), 6) AS z_upper,
           least(((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                   - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) + 0.02)
                 / sqrt((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * (1.0 - CAST(conv_a AS DOUBLE)
                                 / CAST(n_a AS DOUBLE))
                        / CAST(n_a AS DOUBLE)
                        + (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                          * (1.0 - CAST(conv_b AS DOUBLE)
                                   / CAST(n_b AS DOUBLE))
                          / CAST(n_b AS DOUBLE)),
                 (0.02 - (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                          - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
                 / sqrt((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * (1.0 - CAST(conv_a AS DOUBLE)
                                 / CAST(n_a AS DOUBLE))
                        / CAST(n_a AS DOUBLE)
                        + (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                          * (1.0 - CAST(conv_b AS DOUBLE)
                                   / CAST(n_b AS DOUBLE))
                          / CAST(n_b AS DOUBLE)))
               > 1.6448536269514722 AS equivalent
    FROM wide
    """,
    doc="Schuirmann TOST equivalence gate between the md5 hash-split "
    "arms on purchase conversion: both one-sided z's against a "
    "+-0.02 margin must clear z_0.05 — the non-inferiority readout a "
    "migration ships on, complementing stats_ab_lift's difference "
    "test. Same arm machinery and unpooled SE; margin and z_alpha "
    "embedded as identical literals on both engines "
    "(operators/stats.py::tost_equivalence).",
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import tost_equivalence

    ev = load_table(spark, sf_dir, "events")
    # high-value purchases: a conversion rate strictly inside (0, 1) so
    # the SE is positive at every SF (every user has SOME purchase)
    return tost_equivalence(
        ev,
        "user_id",
        (F.col("event_type") == "purchase") & (F.col("value") > 180),
        margin=0.02,
    )


# --------------------------------------------------------------------------
# Round-16: Brown-Forsythe variance-homogeneity test
# --------------------------------------------------------------------------


@register(
    "stats_brown_forsythe",
    """
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 9) AS med9
        FROM v GROUP BY 1
    ),
    z AS (
        SELECT v.event_type, abs(v.value - med.med9) AS z
        FROM v JOIN med USING (event_type)
    ),
    zg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_g,
               round(CAST(sum(CAST(z AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 8) AS zbar_g
        FROM z GROUP BY 1
    ),
    grand AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS k,
               round(CAST(sum(CAST(z AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 8) AS zbar
        FROM z
    ),
    den AS (
        SELECT CAST(sum(CAST((z.z - zg.zbar_g) * (z.z - zg.zbar_g)
                             AS DECIMAL(38,12))) AS DOUBLE) AS ss_within
        FROM z JOIN zg USING (event_type)
    ),
    num AS (
        SELECT CAST(sum(CAST(zg.n_g * (zg.zbar_g - grand.zbar)
                             * (zg.zbar_g - grand.zbar)
                             AS DECIMAL(38,12))) AS DOUBLE) AS ss_between
        FROM zg CROSS JOIN grand
    )
    SELECT grand.n, grand.k,
           round((CAST(grand.n - grand.k AS DOUBLE) / (grand.k - 1))
                 * num.ss_between / den.ss_within, 6) AS f_stat,
           ((CAST(grand.n - grand.k AS DOUBLE) / (grand.k - 1))
                 * num.ss_between / den.ss_within > 2.3719) AS reject_05
    FROM grand CROSS JOIN num CROSS JOIN den
    """,
    doc="Brown-Forsythe variance-homogeneity test across event types "
    "(Levene's test with the median center — robust to non-normality): "
    "z = |x - group median9|, F = ((N-k)/(k-1)) * between-SS / within-SS "
    "over the z's, gated at the F(4, inf) 5% critical value. The "
    "pre-ANOVA check before pooled-variance A/B math. Two passes "
    "(median, then centered sums), decimal-fenced squares, k-row "
    "broadcast joins; grand/num/den are 1-row combiner cross joins.",
)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = v.groupBy("event_type").agg(
        trino_round(F.expr("percentile(value, 0.5)"), 9).alias("med9")
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med9")).alias("z")
    )
    zdec = F.sum(F.col("z").cast("decimal(38,12)")).cast("double")
    zg = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        trino_round(zdec / F.count(F.lit(1)), 8).alias("zbar_g"),
    )
    grand = z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
        trino_round(zdec / F.count(F.lit(1)), 8).alias("zbar"),
    )
    dz = F.col("z") - F.col("zbar_g")
    den = (
        z.join(F.broadcast(zg), "event_type")
        .agg(F.sum((dz * dz).cast("decimal(38,12)")).cast("double").alias("ss_within"))
    )
    db = F.col("zbar_g") - F.col("zbar")
    num = (
        zg.crossJoin(F.broadcast(grand.select("zbar")))
        .agg(
            F.sum((F.col("n_g") * db * db).cast("decimal(38,12)"))
            .cast("double")
            .alias("ss_between")
        )
    )
    f_stat = (
        (F.col("n") - F.col("k")).cast("double")
        / (F.col("k") - 1)
        * F.col("ss_between")
        / F.col("ss_within")
    )
    return (
        grand.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            "n",
            "k",
            trino_round(f_stat, 6).alias("f_stat"),
            (f_stat > F.lit(2.3719)).alias("reject_05"),
        )
    )


@register(
    "stats_cochran_armitage",
    """
    WITH ret AS (
        SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    o AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS dose,
               CASE WHEN ret.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS y
        FROM orders LEFT JOIN ret ON ret.l_orderkey = orders.o_orderkey
    ),
    g AS (
        SELECT dose,
               CAST(count(*) AS BIGINT) AS n_i,
               CAST(sum(y) AS BIGINT) AS r_i
        FROM o GROUP BY 1
    ),
    t AS (
        SELECT CAST(sum(n_i) AS BIGINT) AS n,
               CAST(sum(r_i) AS BIGINT) AS r,
               CAST(sum(dose * r_i) AS BIGINT) AS sxr,
               CAST(sum(dose * n_i) AS BIGINT) AS sxn,
               CAST(sum(dose * dose * n_i) AS BIGINT) AS sxxn
        FROM g
    )
    SELECT n, r,
           round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxr - CAST(r AS DOUBLE) * sxn)
                 * (CAST(n AS DOUBLE) * sxr - CAST(r AS DOUBLE) * sxn)
                 / (CAST(r AS DOUBLE) * (n - r)
                    * (CAST(n AS DOUBLE) * sxxn - CAST(sxn AS DOUBLE) * sxn)), 6)
               AS ca_chi2,
           (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxr - CAST(r AS DOUBLE) * sxn)
                 * (CAST(n AS DOUBLE) * sxr - CAST(r AS DOUBLE) * sxn)
                 / (CAST(r AS DOUBLE) * (n - r)
                    * (CAST(n AS DOUBLE) * sxxn - CAST(sxn AS DOUBLE) * sxn)) > 3.8415)
               AS reject_05
    FROM t
    """,
    doc="Cochran-Armitage trend test: does return probability trend "
    "monotonically across the ordered order-priority doses (1-URGENT .. "
    "5-LOW)? chi2_trend = N[N*Sxr - R*Sxn]^2 / (R(N-R)[N*Sxxn - Sxn^2]) "
    "against the chi-square(1) 5% critical value. Every sum is an exact "
    "integer (dose scores, group sizes, success counts), so the "
    "statistic is one deterministic double expression — no fences "
    "needed. One fact semi-side distinct + one left join + a 5-row "
    "collapse.",
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    o = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("dose"),
        "o_orderkey",
    )
    flagged = o.join(
        ret.withColumn("_ret", F.lit(1)),
        o["o_orderkey"] == ret["l_orderkey"],
        "left",
    ).select("dose", F.coalesce(F.col("_ret"), F.lit(0)).alias("y"))
    g = flagged.groupBy("dose").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("y").cast("bigint").alias("r_i"),
    )
    t = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("dose") * F.col("r_i")).cast("bigint").alias("sxr"),
        F.sum(F.col("dose") * F.col("n_i")).cast("bigint").alias("sxn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_i")).cast("bigint").alias("sxxn"),
    )
    nd, rd = F.col("n").cast("double"), F.col("r").cast("double")
    num = nd * F.col("sxr") - rd * F.col("sxn")
    chi2 = (
        nd * num * num
        / (rd * (F.col("n") - F.col("r"))
           * (nd * F.col("sxxn") - F.col("sxn").cast("double") * F.col("sxn")))
    )
    return t.select(
        "n",
        "r",
        trino_round(chi2, 6).alias("ca_chi2"),
        (chi2 > F.lit(3.8415)).alias("reject_05"),
    )


@register(
    "orders_herfindahl",
    """
    WITH spend AS (
        SELECT c.c_mktsegment AS mktsegment, o.o_custkey,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
                   AS cust_spend
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    seg AS (
        SELECT mktsegment,
               CAST(sum(CAST(cust_spend AS DECIMAL(38,12))) AS DOUBLE)
                   AS seg_spend,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM spend GROUP BY 1
    ),
    sh AS (
        SELECT s.mktsegment, seg.n_customers,
               round((s.cust_spend / seg.seg_spend)
                     * (s.cust_spend / seg.seg_spend), 10) AS sq
        FROM spend s JOIN seg USING (mktsegment)
    )
    SELECT mktsegment, CAST(max(n_customers) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(sq AS DECIMAL(28,10))) AS DOUBLE), 6) AS hhi,
           round(CAST(sum(CAST(sq AS DECIMAL(28,10))) AS DOUBLE)
                 * max(n_customers), 6) AS hhi_normalized
    FROM sh GROUP BY 1
    """,
    doc="Herfindahl-Hirschman concentration of customer spend within "
    "each market segment: HHI = sum of squared revenue shares (1/n = "
    "perfectly even, 1 = monopsony; hhi_normalized = HHI * n for "
    "cross-segment comparison) — the concentration twin of orders_gini. "
    "Two key-partitioned aggregations + a segment-keyed share join "
    "(segment totals are 5 rows, AQE broadcasts); share-squared terms "
    "round10 then decimal-fenced.",
)
def orders_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("mktsegment"), "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
            .cast("double")
            .alias("cust_spend")
        )
    )
    seg = spend.groupBy("mktsegment").agg(
        F.sum(F.col("cust_spend").cast("decimal(38,12)")).cast("double").alias("seg_spend"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
    )
    share = F.col("cust_spend") / F.col("seg_spend")
    sh = spend.join(F.broadcast(seg), "mktsegment").select(
        "mktsegment", "n_customers", trino_round(share * share, 10).alias("sq")
    )
    hhi = F.sum(F.col("sq").cast("decimal(28,10)")).cast("double")
    return sh.groupBy("mktsegment").agg(
        F.max("n_customers").cast("bigint").alias("n_customers"),
        trino_round(hhi, 6).alias("hhi"),
        trino_round(hhi * F.max("n_customers"), 6).alias("hhi_normalized"),
    )


@register(
    "stats_anova_oneway",
    """
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    xg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_g,
               round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 8) AS xbar_g
        FROM v GROUP BY 1
    ),
    grand AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS k,
               round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 8) AS xbar
        FROM v
    ),
    den AS (
        SELECT CAST(sum(CAST((v.value - xg.xbar_g) * (v.value - xg.xbar_g)
                             AS DECIMAL(38,12))) AS DOUBLE) AS ss_within
        FROM v JOIN xg USING (event_type)
    ),
    num AS (
        SELECT CAST(sum(CAST(xg.n_g * (xg.xbar_g - grand.xbar)
                             * (xg.xbar_g - grand.xbar)
                             AS DECIMAL(38,12))) AS DOUBLE) AS ss_between
        FROM xg CROSS JOIN grand
    )
    SELECT grand.n, grand.k,
           round((CAST(grand.n - grand.k AS DOUBLE) / (grand.k - 1))
                 * num.ss_between / den.ss_within, 6) AS f_stat,
           ((CAST(grand.n - grand.k AS DOUBLE) / (grand.k - 1))
                 * num.ss_between / den.ss_within > 2.3719) AS reject_05
    FROM grand CROSS JOIN num CROSS JOIN den
    """,
    doc="One-way ANOVA F across event types (equal-means test on the "
    "raw values — the location twin of stats_brown_forsythe's scale "
    "test; run the pair together: BF validates ANOVA's homogeneity "
    "assumption). Same two-pass decimal-fenced sums-of-squares shape: "
    "k-row broadcast mean join, 1-row combiner cross joins, F(4, inf) "
    "5% gate.",
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    vdec = F.sum(F.col("value").cast("decimal(38,12)")).cast("double")
    xg = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        trino_round(vdec / F.count(F.lit(1)), 8).alias("xbar_g"),
    )
    grand = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
        trino_round(vdec / F.count(F.lit(1)), 8).alias("xbar"),
    )
    dx = F.col("value") - F.col("xbar_g")
    den = v.join(F.broadcast(xg), "event_type").agg(
        F.sum((dx * dx).cast("decimal(38,12)")).cast("double").alias("ss_within")
    )
    db = F.col("xbar_g") - F.col("xbar")
    num = xg.crossJoin(F.broadcast(grand.select("xbar"))).agg(
        F.sum((F.col("n_g") * db * db).cast("decimal(38,12)"))
        .cast("double")
        .alias("ss_between")
    )
    f_stat = (
        (F.col("n") - F.col("k")).cast("double")
        / (F.col("k") - 1)
        * F.col("ss_between")
        / F.col("ss_within")
    )
    return (
        grand.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            "n",
            "k",
            trino_round(f_stat, 6).alias("f_stat"),
            (f_stat > F.lit(2.3719)).alias("reject_05"),
        )
    )


@register(
    "stats_kruskal_wallis",
    """
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    dv AS (
        SELECT value, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1
    ),
    rk AS (
        SELECT value, c,
               COALESCE(sum(c) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS avg_rank
        FROM dv
    ),
    gv AS (
        SELECT event_type, value, CAST(count(*) AS BIGINT) AS c_g
        FROM v GROUP BY 1, 2
    ),
    rg AS (
        SELECT gv.event_type,
               CAST(sum(gv.c_g) AS BIGINT) AS n_g,
               CAST(sum(CAST(gv.c_g * rk.avg_rank AS DECIMAL(38,6)))
                    AS DOUBLE) AS r_g
        FROM gv JOIN rk USING (value)
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(r_g * r_g / n_g AS DECIMAL(38,4))) AS DOUBLE)
                   AS sum_r2n
        FROM rg
    ),
    ties AS (
        SELECT CAST(sum(CAST((CAST(c AS DOUBLE) * c * c - c)
                             AS DECIMAL(38,4))) AS DOUBLE) AS t
        FROM dv
    )
    SELECT n, k,
           round(12.0 * sum_r2n / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1), 6)
               AS h_stat,
           round((12.0 * sum_r2n / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                 / (1.0 - ties.t / (CAST(n AS DOUBLE) * n * n - n)), 6)
               AS h_corrected,
           ((12.0 * sum_r2n / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                 / (1.0 - ties.t / (CAST(n AS DOUBLE) * n * n - n)) > 9.4877)
               AS reject_05
    FROM tot CROSS JOIN ties
    """,
    doc="Kruskal-Wallis rank ANOVA across event types (the "
    "distribution-free twin of stats_anova_oneway, with the tie "
    "correction): average ranks come from the DISTINCT-VALUE count "
    "table — an exclusive running count plus (c+1)/2 — so no "
    "row-level global sort ever happens; rank sums are exact "
    "multiples of 0.5 decimal-fenced, per-group R^2/n terms "
    "decimal-fenced, N^3 computed in doubles (never bigint — "
    "overflow past 2^63). Gate at chi-square(4) 5%. The Spark side "
    "runs the distinct-value running count through the skew-safe "
    "two_phase_running_sum.",
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import two_phase_running_sum

    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    dv = v.groupBy("value").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    dv = dv.localCheckpoint()  # rank probe + two uses; cut the re-scan
    w = two_phase_running_sum(
        dv, value="c", order=("value",), bucket_on="value", out="cum"
    )
    rk = w.select(
        "value",
        (
            (F.col("cum") - F.col("c")).cast("double")
            + (F.col("c") + 1) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    gv = v.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_g")
    )
    rg = (
        gv.join(rk, "value")
        .groupBy("event_type")
        .agg(
            F.sum("c_g").cast("bigint").alias("n_g"),
            F.sum((F.col("c_g") * F.col("avg_rank")).cast("decimal(38,6)"))
            .cast("double")
            .alias("r_g"),
        )
    )
    tot = rg.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum((F.col("r_g") * F.col("r_g") / F.col("n_g")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sum_r2n"),
    )
    cd = F.col("c").cast("double")
    ties = dv.agg(
        F.sum((cd * F.col("c") * F.col("c") - F.col("c")).cast("decimal(38,4)"))
        .cast("double")
        .alias("t")
    )
    nd = F.col("n").cast("double")
    h = 12.0 * F.col("sum_r2n") / (nd * (F.col("n") + 1)) - 3.0 * (F.col("n") + 1)
    corr = 1.0 - F.col("t") / (nd * F.col("n") * F.col("n") - F.col("n"))
    return tot.crossJoin(F.broadcast(ties)).select(
        "n",
        "k",
        trino_round(h, 6).alias("h_stat"),
        trino_round(h / corr, 6).alias("h_corrected"),
        (h / corr > F.lit(9.4877)).alias("reject_05"),
    )
