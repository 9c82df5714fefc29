"""Distributed statistical tests / segmentation over event streams.

Cross-engine determinism contract (same as the rest of the repo): every
float reduction is decimal-fenced or built from per-cell round8 values
summed associatively; the only transcendental is sqrt, which IEEE 754
requires to be correctly rounded — so identical inputs give identical
bits on any engine. No collects: margins and totals are bounded
aggregates joined back by broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.trino import trino_round
from .hashing import md5_long


def _fenced_sum(col: Column) -> Column:
    return F.sum(col.cast("decimal(38,12)")).cast("double")


def chi_squared(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Chi-squared test of independence between two categorical columns,
    plus Cramér's V effect size.

    Shape: ONE groupBy builds the contingency table (r*c rows — bounded
    by category cardinalities, the usual chi-squared regime); row/column
    margins are aggregates OF that table (never a second scan) joined
    back by broadcast; per-cell contributions ``(o-e)^2/e`` are round8
    then decimal-summed, so the statistic is partition-order-free.

    Output (1 row): ``chi2, dof, cramers_v, n`` (round6).
    """
    cells = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_o")
    )
    rows = cells.groupBy(row_col).agg(F.sum("_o").alias("_rt"))
    cols = cells.groupBy(col_col).agg(F.sum("_o").alias("_ct"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.count_distinct(F.col(row_col)).alias("_r"),
        F.count_distinct(F.col(col_col)).alias("_c"),
    )
    e = (
        F.col("_rt").cast("double")
        * F.col("_ct").cast("double")
        / F.col("_n").cast("double")
    )
    contrib = F.round(
        (F.col("_o").cast("double") - e) * (F.col("_o").cast("double") - e) / e, 8
    )
    # The statistic sums over the FULL r*c grid: a category pair that
    # never co-occurs still contributes e (o=0), so build the grid from
    # the margin domains and left-join the observed cells onto it.
    grid = rows.crossJoin(F.broadcast(cols))
    joined = (
        grid.join(F.broadcast(cells), [row_col, col_col], "left")
        .withColumn("_o", F.coalesce(F.col("_o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    agg = joined.agg(
        F.sum(contrib.cast("decimal(28,8)")).cast("double").alias("_chi2"),
        F.first("_n").alias("_n1"),
        F.first("_r").alias("_r1"),
        F.first("_c").alias("_c1"),
    )
    dof = (F.col("_r1") - 1) * (F.col("_c1") - 1)
    v = F.sqrt(
        F.try_divide(
            F.col("_chi2"),
            F.col("_n1").cast("double")
            * F.least(F.col("_r1") - 1, F.col("_c1") - 1).cast("double"),
        )
    )
    return agg.select(
        trino_round(F.col("_chi2"), 6).alias("chi2"),
        dof.cast("bigint").alias("dof"),
        trino_round(v, 6).alias("cramers_v"),
        F.col("_n1").cast("bigint").alias("n"),
    )


def ab_lift(
    df: DataFrame,
    user_col: str,
    convert: Column,
    salt: str = "ab",
) -> DataFrame:
    """Two-proportion z-test between deterministic hash-split A/B arms:
    per-user conversion flags (``convert`` is a row-level predicate;
    a user converts if ANY row matches), arms assigned by md5 parity of
    the user key — reproducible on any engine, no RNG.

    One user-level aggregate then one 2-row arm aggregate; the z-score
    uses the unpooled standard error. sqrt is correctly rounded by
    IEEE 754, so the output is bit-stable.

    Output (1 row): ``n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift,
    z_score`` (rates/lift/z round6).
    """
    per_user = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(convert.cast("int")).alias("_conv")
    )
    armed = per_user.select(
        (md5_long(F.concat(F.col("_u").cast("string"), F.lit(f"|{salt}"))) % 2)
        .cast("int")
        .alias("_arm"),
        "_conv",
    )
    arms = armed.groupBy("_arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_conv").cast("bigint").alias("_c"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("_arm") == 0, F.col("_n"))).alias("n_a"),
        F.max(F.when(F.col("_arm") == 0, F.col("_c"))).alias("conv_a"),
        F.max(F.when(F.col("_arm") == 1, F.col("_n"))).alias("n_b"),
        F.max(F.when(F.col("_arm") == 1, F.col("_c"))).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    se = F.sqrt(
        pa * (F.lit(1.0) - pa) / F.col("n_a").cast("double")
        + pb * (F.lit(1.0) - pb) / F.col("n_b").cast("double")
    )
    return wide.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        trino_round(pa, 6).alias("rate_a"),
        trino_round(pb, 6).alias("rate_b"),
        trino_round(pb - pa, 6).alias("lift"),
        trino_round(F.try_divide(pb - pa, se), 6).alias("z_score"),
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM segmentation: quartile-score every user on Recency (days
    since last event, vs the corpus max timestamp), Frequency (event
    count) and Monetary (fenced value sum), then count users per
    R-F-M segment.

    The corpus max timestamp is a 1-row broadcast (no collect); each
    ntile is a window over the user-level aggregate (cardinality =
    users, not events) with a deterministic ``user_col`` tiebreak —
    ntile's SQL bucket arithmetic is integer-exact, so segments are
    engine-identical.

    Output: ``segment, n_users, avg_monetary`` (round6), ordered by
    segment.
    """
    from pyspark.sql import Window

    per_user = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("_freq"),
        _fenced_sum(F.col(value_col)).alias("_mon"),
    )
    mx = df.agg(F.max(ts_col).alias("_gmax"))
    scored = per_user.crossJoin(F.broadcast(mx)).select(
        "_u",
        F.datediff(F.col("_gmax").cast("date"), F.col("_last").cast("date")).alias(
            "_rec"
        ),
        "_freq",
        "_mon",
    )
    # lower recency = better (tile 1), higher freq/monetary = better
    r = F.ntile(n_tiles).over(Window.orderBy(F.col("_rec"), F.col("_u")))
    f_ = F.ntile(n_tiles).over(Window.orderBy(F.desc("_freq"), F.col("_u")))
    m = F.ntile(n_tiles).over(Window.orderBy(F.desc("_mon"), F.col("_u")))
    seg = scored.select(
        "_u",
        "_mon",
        F.concat(
            r.cast("string"), F.lit("-"), f_.cast("string"), F.lit("-"), m.cast("string")
        ).alias("segment"),
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            trino_round(
                _fenced_sum(F.col("_mon")) / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


def cuped_adjustment(
    df: DataFrame,
    user: str,
    ts: str,
    value: str,
    split_ts: str,
    salt: str = "ab",
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, public): adjust each
    user's post-period metric with their pre-period metric as a control
    variate — y* = y - theta * (x - mean(x)), theta = cov(x, y)/var(x)
    — then report per-arm means and variances so the experimenter sees
    the sensitivity gain (var(y*) < var(y) whenever pre and post
    correlate).

    Arms are the deterministic md5-parity hash split (same convention
    as ``ab_lift``); theta comes from POOLED moments (both arms — the
    standard unbiased-under-SUTVA choice). Everything reduces to
    decimal-fenced moment sums: per-user (x, y) in one grouped pass,
    five pooled moments broadcast back as one row, adjusted values are
    closed-form doubles over bit-identical moments, per-arm output
    moments fenced again. Two shuffles total (user rollup, 2-row arm
    rollup); nothing driver-side.

    Output per arm: ``arm, n_users, mean_post, mean_post_adjusted,
    var_post, var_post_adjusted, theta`` (round6; population variance).
    """
    from ..functions.trino import trino_round
    from .hashing import md5_long

    def dsum(col):
        return F.sum(col.cast("decimal(38,12)")).cast("double")

    per_user = (
        df.groupBy(F.col(user).alias("_u"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(ts) < F.lit(split_ts).cast("timestamp_ntz"),
                        F.col(value).cast("decimal(38,12)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(ts) >= F.lit(split_ts).cast("timestamp_ntz"),
                        F.col(value).cast("decimal(38,12)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("y"),
        )
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        dsum(F.col("x")).alias("_sx"),
        dsum(F.col("y")).alias("_sy"),
        dsum(F.col("x") * F.col("x")).alias("_sxx"),
        dsum(F.col("x") * F.col("y")).alias("_sxy"),
    )
    # theta = cov(x,y)/var(x), guarded: a degenerate pre-period (all
    # x equal, e.g. split_ts before any data) has var(x) == 0 — fall
    # back to theta = 0 (no adjustment) instead of propagating NaN
    # into the adjusted means/variances (ADVICE r12)
    _den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    theta = F.when(
        _den != F.lit(0.0),
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / _den,
    ).otherwise(F.lit(0.0))
    arm = (
        md5_long(F.concat(F.col("_u").cast("string"), F.lit(f"|{salt}"))) % 2
    ).cast("int")
    adj = (
        per_user.crossJoin(F.broadcast(m))
        .withColumn("_theta", theta)
        .withColumn(
            "ya",
            F.col("y")
            - F.col("_theta") * (F.col("x") - F.col("_sx") / F.col("_n")),
        )
        .select(arm.alias("arm"), "y", "ya", "_theta")
    )
    an = F.count(F.lit(1)).cast("double")
    asy, asyy = dsum(F.col("y")), dsum(F.col("y") * F.col("y"))
    asa, asaa = dsum(F.col("ya")), dsum(F.col("ya") * F.col("ya"))
    out = adj.groupBy("arm").agg(
        an.alias("_an"),
        asy.alias("_asy"),
        asyy.alias("_asyy"),
        asa.alias("_asa"),
        asaa.alias("_asaa"),
        F.max("_theta").alias("_t"),
    )
    n_ = F.col("_an")
    return out.select(
        "arm",
        n_.cast("bigint").alias("n_users"),
        trino_round(F.col("_asy") / n_, 6).alias("mean_post"),
        trino_round(F.col("_asa") / n_, 6).alias("mean_post_adjusted"),
        trino_round(
            (n_ * F.col("_asyy") - F.col("_asy") * F.col("_asy")) / (n_ * n_), 6
        ).alias("var_post"),
        trino_round(
            (n_ * F.col("_asaa") - F.col("_asa") * F.col("_asa")) / (n_ * n_), 6
        ).alias("var_post_adjusted"),
        trino_round(F.col("_t"), 6).alias("theta"),
    ).orderBy("arm")
