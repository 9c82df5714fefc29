"""Distributed statistical tests / segmentation over event streams.

Cross-engine determinism contract (same as the rest of the repo): every
float reduction is decimal-fenced or built from per-cell round8 values
summed associatively; the only transcendental is sqrt, which IEEE 754
requires to be correctly rounded — so identical inputs give identical
bits on any engine. No collects: margins and totals are bounded
aggregates joined back by broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.trino import trino_round
from .hashing import md5_long


def _fenced_sum(col: Column) -> Column:
    return F.sum(col.cast("decimal(38,12)")).cast("double")


def _round8_unit_sum(y) -> int:
    """Exact Σ round-half-up(y_i, 8) over a float64 array, in integer
    1e-8 units — bit-for-bit the value ``sum(CAST(y AS DECIMAL(38,8)))``
    accumulates (Spark's double→decimal cast is HALF_UP on the exact
    binary value; decimal addition is exact).

    Vectorized fast path: ``floor(|y|*1e8 + 0.5)`` is correct except
    where the float64 product's rounding error can cross the .5
    boundary, so elements within a magnitude-scaled tolerance of a
    boundary — and all |y| > 1e7, where unit counts approach 2^53 —
    take a ``decimal.Decimal`` slow path. The slow path rounds the
    SHORTEST-REPR decimal value (``Decimal(repr(v))``), because that is
    what the JVM cast rounds: Spark's double→decimal goes through
    ``BigDecimal.valueOf`` = ``Double.toString``, NOT the exact binary
    expansion — measured on 934k adversarial near-tie doubles, the
    repr path matches the JVM cast 100% while the exact-binary path
    diverges on 28% of constructed ties (a double just below an
    ``x.xxxxxxxx5`` shortest repr rounds UP through the string, DOWN
    through its binary value). The fast path is agnostic: any value
    where the two semantics could disagree lies inside the flagged
    tolerance band.
    """
    import decimal

    import numpy as np

    ay = np.abs(y)
    # NaN/Inf and overflowing magnitudes (>= 1e30) contribute 0. The
    # JVM fence under ANSI (this repo's sessions) would THROW on such
    # inputs instead — no declared query can produce them (values are
    # pre-scaled/finite), so on every input the old path accepted, the
    # two are bit-equal, and on inputs it would have crashed this path
    # degrades to "skip" (the non-ANSI cast-to-NULL semantics)
    dropped = ~np.isfinite(y) | (ay >= 1e30)
    frac = np.where(dropped, 0.0, ay) * 1e8
    r = np.floor(frac + 0.5)
    fp = frac - np.floor(frac)
    tol = np.maximum(frac * 4e-16, 1e-6)
    flagged = ~dropped & ((ay > 1e7) | (np.abs(fp - 0.5) < tol))
    fast = np.where(flagged | dropped, 0.0, r * np.sign(y)).astype(np.int64)
    total = 0
    # chunked: |units| <= 1e15 on the fast path, 4096 * 1e15 < 2^63
    for i in range(0, len(fast), 4096):
        total += int(fast[i : i + 4096].sum())
    if flagged.any():
        # prec=80 local context: a float64's exact decimal expansion can
        # run ~767 significant digits only below 1e-300 (irrelevant at
        # scale 8); 80 digits covers any unit count quantize can emit
        # without tripping the default 28-digit context
        with decimal.localcontext() as ctx:
            ctx.prec = 80
            for v in y[flagged]:
                total += int(
                    decimal.Decimal(repr(float(v)))
                    .scaleb(8)
                    .to_integral_value(rounding=decimal.ROUND_HALF_UP)
                )
    return total


def _arrow_fenced_moment_pass(df, group_col, names, terms):
    """Arrow-vectorized exact moment partials (guide §4, r19): one
    ``mapInPandas`` pass emitting, per (batch, group), a count and one
    exact decimal(38,8) sum per term — each bit-equal to
    ``sum(CAST(term AS DECIMAL(p,8)))`` over that slice (see
    :func:`_round8_unit_sum`), so a final tiny decimal aggregate over
    the ≤1-row-per-(batch,group) partials reproduces the JVM decimal
    fence exactly while the per-row double→BigDecimal casts (which
    dominate moment queries) never run.

    ``terms(sub) -> sequence of float64 arrays`` builds every term for
    one pandas sub-frame; ``names`` labels them in the output. Pass
    ``group_col=None`` for a global (ungrouped) pass.
    """
    import decimal

    import pandas as pd
    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StructField,
        StructType,
    )

    unit = decimal.Decimal(1).scaleb(-8)
    g_fields = (
        [StructField(group_col, df.schema[group_col].dataType)]
        if group_col
        else []
    )
    out_schema = StructType(
        g_fields
        + [StructField("n", LongType())]
        + [StructField(nm, DecimalType(38, 8)) for nm in names]
    )

    def _partials(batches):
        for pdf in batches:
            outs = []
            subs = (
                pdf.groupby(group_col, sort=False)
                if group_col
                else [(None, pdf)]
            )
            for g, sub in subs:
                if not len(sub):
                    continue
                sums = tuple(
                    decimal.Decimal(_round8_unit_sum(t)) * unit
                    for t in terms(sub)
                )
                key = (g,) if group_col else ()
                outs.append(key + (len(sub),) + sums)
            if outs:
                yield pd.DataFrame(
                    outs, columns=[f.name for f in out_schema.fields]
                )

    parts = df.mapInPandas(_partials, out_schema)
    gb = parts.groupBy(group_col) if group_col else parts.groupBy()
    return gb.agg(
        # coalesce: an EMPTY ungrouped input yields no partials, but the
        # global aggregate still emits one row — count semantics say 0
        # there, like the JVM count(1) this replaces
        F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("n"),
        *[F.sum(nm).cast("double").alias(nm) for nm in names],
    )


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
    small_users: int = 4_000_000,
) -> DataFrame:
    """RFM segmentation: quartile-score every user on Recency (days
    since last event, vs the corpus max timestamp), Frequency (event
    count) and Monetary (fenced value sum), then count users per
    R-F-M segment.

    The corpus max timestamp is a 1-row broadcast (no collect). Tile
    assignment is scale-guarded (VERDICT r13 #2 — the union-find /
    two_phase_running_sum precedent), because for a training-data
    pipeline "users" is document/author cardinality (10⁸–10⁹ at
    100 TB), not vocab-bounded:

    - **At or under ``small_users``** (probed with one count action on
      the localCheckpointed user table): three ``ntile`` windows over
      the user-level aggregate with a deterministic ``user_col``
      tiebreak — ntile's SQL bucket arithmetic is integer-exact, so
      segments are engine-identical bit-for-bit.
    - **Above the guard** (the 100 TB path; ``small_users=0`` forces
      it): NO global window. Per dimension, the n_tiles−1 tile
      BOUNDARY VALUES come from a count-grouped running sum
      (:func:`~..operators.timeseries.two_phase_running_sum` over the
      |distinct values|-sized count table — skew/scale-safe by its own
      internal guard), picking the value at ntile's exact cut
      positions p_t = t·⌊N/n⌋ + min(t, N mod n). The three ≤(n_tiles−1)-
      row boundary tables collapse to one broadcast row of sorted
      arrays, and every user's tile is ``1 + #{boundaries < value}``
      — a row-local array fold, no shuffle. Ties that straddle a cut
      position land in the lower tile as a block (ntile splits them by
      the ``user_col`` tiebreak), which is the standard quantile-
      segmentation semantics; on boundary-tie-free data the two forms
      are value-identical (property-tested).

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
    ).localCheckpoint(eager=True)
    n_users = scored.count()
    # lower recency = better (tile 1), higher freq/monetary = better
    if n_users <= small_users and small_users:
        r = F.ntile(n_tiles).over(Window.orderBy(F.col("_rec"), F.col("_u")))
        f_ = F.ntile(n_tiles).over(Window.orderBy(F.desc("_freq"), F.col("_u")))
        m = F.ntile(n_tiles).over(Window.orderBy(F.desc("_mon"), F.col("_u")))
        seg = scored.select(
            "_u",
            "_mon",
            F.concat(
                r.cast("string"),
                F.lit("-"),
                f_.cast("string"),
                F.lit("-"),
                m.cast("string"),
            ).alias("segment"),
        )
    else:
        seg = _rfm_boundary_tiles(scored, n_users, n_tiles)
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


def _rfm_boundary_tiles(scored: DataFrame, n_users: int, n_tiles: int) -> DataFrame:
    """Scale path for :func:`rfm_segments`: per-dimension boundary
    values at ntile's cut positions from count-grouped running sums,
    broadcast as one row of sorted arrays, tiles assigned by a
    row-local array fold. Descending dimensions (freq, monetary) are
    negated so one ascending rule covers all three."""
    from .timeseries import two_phase_running_sum

    spark = scored.sparkSession
    q, r_ = divmod(n_users, n_tiles)
    cuts = [t * q + min(t, r_) for t in range(1, n_tiles)]
    pos = F.broadcast(
        spark.createDataFrame([(p,) for p in cuts], "p long")
    )
    dims = [
        ("_rec", F.col("_rec").cast("double")),
        ("_negf", (-F.col("_freq")).cast("double")),
        ("_negm", (-F.col("_mon")).cast("double")),
    ]
    with_keys = scored.select(
        "_u", "_mon", "_rec", *[expr.alias(name) for name, expr in dims[1:]]
    )
    bnd_arrays = None
    for name, _ in dims:
        grp = (
            with_keys.select(F.col(name).cast("double").alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cum = two_phase_running_sum(grp, "n", order=["v"], out="c")
        # boundary value for cut p: the unique v whose cumulative count
        # first reaches p (c >= p and c - n < p)
        b = (
            cum.join(pos, (F.col("c") >= F.col("p")) & (F.col("c") - F.col("n") < F.col("p")))
            .groupBy()
            .agg(F.array_sort(F.collect_list("v")).alias(f"_b{name}"))
        )
        bnd_arrays = b if bnd_arrays is None else bnd_arrays.crossJoin(b)
    withb = with_keys.crossJoin(F.broadcast(bnd_arrays))

    def tile(val: str, arr: str):
        return (
            F.lit(1)
            + F.aggregate(
                F.col(arr),
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col(val).cast("double") > b, 1).otherwise(0),
            )
        ).cast("int")

    return withb.select(
        "_u",
        "_mon",
        F.concat(
            tile("_rec", "_b_rec").cast("string"),
            F.lit("-"),
            tile("_negf", "_b_negf").cast("string"),
            F.lit("-"),
            tile("_negm", "_b_negm").cast("string"),
        ).alias("segment"),
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


def mann_whitney_u(
    df: DataFrame,
    user: str,
    value: str,
    salt: str = "ab",
) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947, public)
    between the two md5-parity hash-split arms (same convention as
    ``ab_lift``/``cuped_adjustment``), on the per-user sum of
    ``value`` — the non-parametric complement of the z-test for
    heavy-tailed per-user metrics where means mislead.

    Rank computation is VALUE-GROUPED, never row-ranked: ranking N
    users directly is a global sort (the single-task trap), but the
    midrank of every user with metric v is determined by the counts
    alone — avg_rank(v) = (#values < v) + (n_v + 1)/2. So the N-row
    user table collapses to a |distinct v| table first, the running
    count comes from ``two_phase_running_sum`` (bucket-parallel above
    its guard, single tiny window under it), and every moment the
    statistic needs (rank sum, tie term Σ(t³-t)) is an exact integer
    aggregate of that table. Midranks live in halves, so the rank sum
    is carried DOUBLED in DECIMAL(38,0) (exact) and halved only at
    emit; z is then closed-form IEEE arithmetic over bit-identical
    integers (sqrt is correctly rounded by IEEE 754) — identical on
    every engine, no ordering sensitivity anywhere.

    Ties use midranks with the standard tie-corrected variance
    var = n1·n2/12 · ((N+1) − Σ(t³−t)/(N(N−1))); no continuity
    correction (documented choice, matching the large-sample form).

    Output (one row): ``n_ctrl, n_treat, rank_sum_treat, u_treat,
    tie_term, z_score`` (round6).
    """
    from .timeseries import two_phase_running_sum

    per_user = df.groupBy(F.col(user).alias("_u")).agg(
        F.coalesce(_fenced_sum(F.col(value)), F.lit(0.0)).alias("y")
    )
    arm = (
        md5_long(F.concat(F.col("_u").cast("string"), F.lit(f"|{salt}"))) % 2
    ).cast("int")
    by_value = per_user.select("y", arm.alias("_arm")).groupBy("y").agg(
        F.count(F.lit(1)).alias("n_v"),
        F.sum(F.col("_arm")).alias("n1_v"),  # arm 1 = treat
    )
    ranked = two_phase_running_sum(
        by_value, F.col("n_v"), order=["y"], out="cum"
    )
    # midrank(v) doubled: 2*avg_rank = 2*(cum - n_v) + n_v + 1
    ar2 = 2 * F.col("cum") - F.col("n_v") + 1
    d0 = "decimal(38,0)"
    m = ranked.agg(
        F.sum(F.col("n_v") - F.col("n1_v")).alias("_n0"),
        F.sum("n1_v").alias("_n1"),
        F.sum((F.col("n1_v") * ar2).cast(d0)).alias("_r1x2"),
        F.sum(
            (F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")).cast(d0)
        ).alias("_tie"),
    )
    n0, n1 = F.col("_n0").cast("double"), F.col("_n1").cast("double")
    ntot = n0 + n1
    r1 = F.col("_r1x2").cast("double") / F.lit(2.0)
    u1 = r1 - n1 * (n1 + 1) / F.lit(2.0)
    var = (
        n0
        * n1
        / F.lit(12.0)
        * ((ntot + 1) - F.col("_tie").cast("double") / (ntot * (ntot - 1)))
    )
    z = F.when(var > 0, (u1 - n0 * n1 / F.lit(2.0)) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return m.select(
        F.col("_n0").cast("bigint").alias("n_ctrl"),
        F.col("_n1").cast("bigint").alias("n_treat"),
        trino_round(r1, 6).alias("rank_sum_treat"),
        trino_round(u1, 6).alias("u_treat"),
        F.col("_tie").cast("bigint").alias("tie_term"),
        trino_round(z, 6).alias("z_score"),
    )


#: Poisson(1) CDF, terms 0..7 (clamped at 8): repr'd doubles emitted as
#: identical literals into both the Spark CASE chain and the oracle SQL,
#: so the inverse-CDF lookup is bit-equal on every engine.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


def bootstrap_mean_ci(
    df: DataFrame,
    user: str,
    value: str,
    b_replicates: int = 64,
    salt: str = "boot",
) -> DataFrame:
    """Poisson bootstrap CI for the mean per-user metric (Chamandy et
    al. 2012, "Estimating uncertainty for massive data streams",
    public): the distributed bootstrap — instead of resampling N users
    with replacement (which needs global coordination), each user
    enters replicate b with weight ~ Poisson(1), drawn independently
    per (user, replicate). For large N the replicate totals are
    distributionally indistinguishable from the classic bootstrap.

    Deterministic: the Poisson draw is an inverse-CDF lookup (a CASE
    chain over ``POISSON1_CDF``, clamped at 8 — tail mass ~1e-6) on
    u = md5(user|salt#b)/2^60, the repo's standard hash-uniform; both
    engines evaluate the identical literal thresholds, so every weight
    matches bit-for-bit. Replicates explode map-side and partial
    aggregation collapses them before the shuffle, which therefore
    carries only ~B rows per task — B·N rows exist only inside the
    scan stage, never on the wire. Per-replicate means are one IEEE
    division of decimal-fenced sums, round8-fenced before the
    second-level moments; the CI bounds are ORDER STATISTICS of the
    B means (row_number picks ~2.5%/97.5%, exact, no interpolation —
    engine-proof), computed by a window over the B-row table.

    Output (one row): ``n_users, b_replicates, mean_full, se_boot,
    ci_lo, ci_hi`` (round6).
    """
    per_user = df.groupBy(F.col(user).alias("_u")).agg(
        F.coalesce(_fenced_sum(F.col(value)), F.lit(0.0)).alias("y")
    )
    b = F.col("_b")
    u01 = (
        md5_long(
            F.concat(F.col("_u").cast("string"), F.lit(f"|{salt}#"), b)
        ).cast("double")
        / F.lit(float(2**60))
    )
    w = F.lit(8)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u01 < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    rep = (
        per_user.select(
            "_u",
            "y",
            F.explode(F.sequence(F.lit(0), F.lit(b_replicates - 1))).alias("_b"),
        )
        .select(b, w.alias("_w"), F.col("y"))
        .groupBy("_b")
        .agg(
            _fenced_sum(F.col("_w") * F.col("y")).alias("_sy"),
            F.sum("_w").alias("_sw"),
        )
        .select(
            "_b",
            trino_round(F.col("_sy") / F.col("_sw").cast("double"), 8).alias(
                "_m"
            ),
        )
    )
    wk = Window.orderBy("_m", "_b")  # B rows: one tiny task
    lo_rk = max(1, int(0.025 * b_replicates))
    hi_rk = min(b_replicates, int(0.975 * b_replicates) + 1)
    ranked = rep.withColumn("_rk", F.row_number().over(wk))
    stats = ranked.agg(
        F.count(F.lit(1)).alias("_nb"),
        _fenced_sum(F.col("_m")).alias("_sm"),
        _fenced_sum(F.col("_m") * F.col("_m")).alias("_smm"),
        F.min(F.when(F.col("_rk") == lo_rk, F.col("_m"))).alias("_lo"),
        F.min(F.when(F.col("_rk") == hi_rk, F.col("_m"))).alias("_hi"),
    )
    full = per_user.agg(
        F.count(F.lit(1)).alias("_n"), _fenced_sum(F.col("y")).alias("_s")
    )
    nb = F.col("_nb").cast("double")
    return full.crossJoin(F.broadcast(stats)).select(
        F.col("_n").cast("bigint").alias("n_users"),
        F.col("_nb").cast("bigint").alias("b_replicates"),
        trino_round(F.col("_s") / F.col("_n").cast("double"), 6).alias(
            "mean_full"
        ),
        trino_round(
            F.sqrt(
                (nb * F.col("_smm") - F.col("_sm") * F.col("_sm"))
                / (nb * (nb - 1))
            ),
            6,
        ).alias("se_boot"),
        trino_round(F.col("_lo"), 6).alias("ci_lo"),
        trino_round(F.col("_hi"), 6).alias("ci_hi"),
    )


def ece_reliability(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected-calibration-error reliability table (Naeini et al. 2015
    / Guo et al. 2017, public): bucket predicted scores in [0, 1] into
    ``n_bins`` fixed-width bins, compare each bin's mean confidence to
    its empirical accuracy, and report the n-weighted absolute gap sum
    — the standard quality-classifier calibration audit before a score
    threshold goes into a data-filtering pipeline.

    One grouped aggregate to the ≤ n_bins-row bin table (map-side
    partials; integer-exact bin ids via floor(score*n), top bin closed),
    then a 1-row broadcast combiner for N and the ECE — the raw data is
    scanned once, nothing user-sized shuffles. Determinism: scores are
    round8-fenced before the decimal sum, every mean is a single IEEE
    division of exact values, and each bin's ECE contribution is
    round8(|acc − conf| · n_b / N) summed in exact decimal.

    Output per non-empty bin: ``bin, n_rows, avg_conf, avg_acc,
    abs_gap, ece`` (round6; ``ece`` is the same corpus-level value on
    every row), ordered by bin.
    """
    s = F.col(score_col).cast("double")
    y = F.col(outcome_col).cast("int")
    binned = df.select(
        F.least(
            F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        trino_round(s, 8).alias("_s"),
        y.alias("_y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            F.sum(F.col("_s").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_conf"),
        (
            F.sum(F.col("_y")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_acc"),
    )
    tot = bins.agg(F.sum("n_rows").cast("double").alias("_n_total"))
    withgap = bins.crossJoin(F.broadcast(tot)).withColumn(
        "_contrib",
        trino_round(
            F.abs(F.col("_acc") - F.col("_conf"))
            * F.col("n_rows").cast("double")
            / F.col("_n_total"),
            8,
        ),
    )
    ece = withgap.agg(
        trino_round(
            F.sum(F.col("_contrib").cast("decimal(38,12)")).cast("double"), 6
        ).alias("ece")
    )
    return (
        withgap.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n_rows",
            trino_round(F.col("_conf"), 6).alias("avg_conf"),
            trino_round(F.col("_acc"), 6).alias("avg_acc"),
            trino_round(F.abs(F.col("_acc") - F.col("_conf")), 6).alias(
                "abs_gap"
            ),
            "ece",
        )
        .orderBy("bin")
    )


def conformal_threshold_artifact(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    alpha: float = 0.1,
    salt: str = "conf",
    test_mod: int = 5,
) -> DataFrame:
    """Per-group split-conformal threshold ARTIFACT — the groups-sized
    table a serving-time gate (batch filter or
    :func:`~..streaming.ops.stream_conformal_gate`) broadcasts against
    arriving rows. One row per group:

        ``{group_col}, _pred, _thr, n_cal``

    where ``_pred`` is the calibration-split mean predictor and
    ``_thr`` the ⌈(n_cal+1)(1−α)⌉-th smallest round8 nonconformity
    score |value − pred| (clipped to n_cal). Same md5 hash-split,
    decimal-fenced mean, and two-phase rank-k election as
    :func:`conformal_split_calibrate` (which composes this artifact
    with a held-out-coverage readout); derivation is fully
    distributed — the per-group k-th order statistic rides
    :func:`~..operators.timeseries.two_phase_running_sum`, never a
    whole group in one window task.
    """
    from .hashing import md5_long
    from .timeseries import two_phase_running_sum

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
        (
            md5_long(
                F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}"))
            )
            % test_mod
            == 0
        ).alias("_is_test"),
    )
    pred = (
        base.filter(~F.col("_is_test"))
        .groupBy("_g")
        .agg(
            (
                F.sum(F.col("_v").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("_pred"),
            F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        )
    )
    # groups-sized by the same contract that broadcasts it below;
    # consumed TWICE (cal's broadcast build + the final join), and each
    # evaluation re-runs the md5 hash-split scan (r19 interleaved A/B
    # on stats_conformal_coverage: 1.67 -> 1.39 s min, values equal)
    from .fencing import fence_if_small
    pred = fence_if_small(pred)
    cal = (
        base.filter(~F.col("_is_test"))
        .join(F.broadcast(pred), "_g")
        .withColumn(
            "_s", trino_round(F.abs(F.col("_v") - F.col("_pred")), 8)
        )
        .withColumn("_one", F.lit(1))
    )
    cum = two_phase_running_sum(
        cal, "_one", order=["_s"], keys=["_g"], out="_c"
    )
    k = F.least(
        F.ceil((F.col("n_cal") + F.lit(1)).cast("double") * F.lit(1.0 - alpha)),
        F.col("n_cal"),
    )
    thr = (
        cum.filter(F.col("_c") >= k)
        .groupBy("_g")
        .agg(F.min("_s").alias("_thr"))
    )
    return pred.join(thr, "_g").select(
        F.col("_g").alias(group_col), "_pred", "_thr", "n_cal"
    )


def conformal_split_calibrate(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    alpha: float = 0.1,
    salt: str = "conf",
    test_mod: int = 5,
) -> DataFrame:
    """Split-conformal calibration (Papadopoulos et al. 2002 / Vovk,
    public): hash-split rows into calibration (md5 parity — reproducible,
    no RNG) and test; fit the trivial per-group mean predictor on the
    CALIBRATION split only; take each group's conformal threshold as
    the ⌈(n_cal+1)(1−α)⌉-th smallest nonconformity score |value − pred|
    (clipped to n_cal — the finite-sample split-conformal quantile);
    report empirical coverage of {score ≤ threshold} on the held-out
    TEST split, which is ≥ 1−α in expectation by the conformal
    guarantee.

    Scale shape: the per-group k-th order statistic comes from
    :func:`~..operators.timeseries.two_phase_running_sum` over the
    calibration scores (running COUNT partitioned by (group,
    range-bucket) — never a whole group in one task, unlike a bare
    ntile/row_number window; the RFM boundary-swap precedent), then
    threshold = min score whose running count reaches k. The threshold
    table is groups-sized and broadcasts back over the test split.
    Determinism: the predictor mean is one IEEE division of a decimal
    sum; scores are round8-fenced; rank-k election on exact integer
    running counts.

    Output per group: ``{group_col}, n_cal, threshold, n_test,
    n_covered, coverage`` (round6), ordered by group. The threshold
    table itself (for a serving-time gate) is
    :func:`conformal_threshold_artifact`, which this composes.
    """
    from .hashing import md5_long

    g = F.col(group_col)
    base = df.filter(F.col(value_col).isNotNull()).select(
        g.alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
        (
            md5_long(
                F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}"))
            )
            % test_mod
            == 0
        ).alias("_is_test"),
    )
    art = conformal_threshold_artifact(
        df,
        group_col,
        key_col,
        value_col,
        alpha=alpha,
        salt=salt,
        test_mod=test_mod,
    ).withColumnRenamed(group_col, "_g")
    test = (
        base.filter(F.col("_is_test"))
        .join(F.broadcast(art), "_g")
        .withColumn(
            "_s", trino_round(F.abs(F.col("_v") - F.col("_pred")), 8)
        )
    )
    return (
        test.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.min("n_cal").alias("n_cal"),
            trino_round(F.min("_thr"), 6).alias("threshold"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("_s") <= F.col("_thr"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
            trino_round(
                F.sum(F.when(F.col("_s") <= F.col("_thr"), 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("coverage"),
        )
        .orderBy(group_col)
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label via the
    rank-statistic identity AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋) with
    MIDRANKS for tied scores (Hanley & McNeil 1982; equivalent to the
    Mann-Whitney U normalization) — the ranking-quality audit for any
    quality-classifier score before it drives corpus filtering.

    Same single-task-dodge as :func:`mann_whitney_u`: never row-ranks N
    rows. The table collapses to |distinct score| value-grouped counts
    (n at the value, positives at the value); the running count rides
    :func:`~..operators.timeseries.two_phase_running_sum`; the positive
    rank sum is an exact integer aggregate of that table carried
    DOUBLED in DECIMAL(38,0) (midranks live in halves). AUC is then
    one IEEE division of exact integers — engine-identical, no
    ordering sensitivity.

    Output (one row): ``n_pos, n_neg, rank_sum_pos, auc, gini``
    (round6; gini = 2·AUC − 1).
    """
    from .timeseries import two_phase_running_sum

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    by_v = df.select(s.alias("v"), y.alias("_y")).groupBy("v").agg(
        F.count(F.lit(1)).alias("n_v"),
        F.sum("_y").alias("n_pos_v"),
    )
    ranked = two_phase_running_sum(by_v, F.col("n_v"), order=["v"], out="cum")
    ar2 = 2 * F.col("cum") - F.col("n_v") + 1  # doubled midrank
    # Cast each OPERAND to decimal(19,0) before multiplying: n_pos_v·ar2
    # reaches ~2·N·n_pos_v, which wraps int64 silently (non-ANSI Spark)
    # around a few 1e9 rows if the product is formed in bigint first.
    # 19-digit operands multiply exactly into DECIMAL(38,0) on both
    # Spark and DuckDB (38+38 would exceed DuckDB's max width).
    d19 = "decimal(19,0)"
    m = ranked.agg(
        F.sum(F.col("n_v") - F.col("n_pos_v")).alias("_n0"),
        F.sum("n_pos_v").alias("_n1"),
        F.sum(F.col("n_pos_v").cast(d19) * ar2.cast(d19)).alias("_rx2"),
    )
    n0, n1 = F.col("_n0").cast("double"), F.col("_n1").cast("double")
    r1 = F.col("_rx2").cast("double") / F.lit(2.0)
    auc = F.try_divide(r1 - n1 * (n1 + 1) / F.lit(2.0), n1 * n0)
    return m.select(
        F.col("_n1").cast("bigint").alias("n_pos"),
        F.col("_n0").cast("bigint").alias("n_neg"),
        trino_round(r1, 6).alias("rank_sum_pos"),
        trino_round(auc, 6).alias("auc"),
        trino_round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact precision-recall curve: one point per DISTINCT score
    threshold v (predict positive when score ≥ v), descending — the
    operating-point table a quality classifier is actually tuned on
    (pick the threshold whose precision meets the corpus-admission
    bar, read off the recall you paid for it). Completes the
    calibration suite next to :func:`roc_auc` (ranking),
    :func:`ece_reliability` (calibration), and :func:`lift_gain_table`
    (volume-budget deciles).

    Scale shape (the roc_auc collapse): rows collapse to |distinct
    score| value-grouped counts FIRST; the descending cumulative
    counts (n_pred, tp at each cut) are two
    :func:`~..operators.timeseries.two_phase_running_sum` passes over
    the NEGATED score sharing one bounds probe — raw rows are never
    ranked or sorted, and the output is value-grouped-sized. All
    counts are exact integers; precision/recall/F1 are IEEE divisions
    at emit (F1 from the round6 precision/recall so both engines
    derive it from identical inputs).

    Output per threshold (descending): ``threshold, n_pred, tp,
    precision, recall, f1`` (round6; recall/f1 are NULL when the input
    has no positives).
    """
    from .timeseries import two_phase_running_sum

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    # negate: descending score order becomes ascending nv order
    by_v = (
        df.filter(s.isNotNull())
        .select((-s).alias("nv"), y.alias("_y"))
        .groupBy("nv")
        .agg(
            F.count(F.lit(1)).alias("n_v"),
            F.sum("_y").alias("np_v"),
        )
        .localCheckpoint()
    )
    lo, hi, n_rows = by_v.agg(
        F.min("nv"), F.max("nv"), F.count(F.lit(1))
    ).first()
    if int(n_rows) == 0:
        return df.sparkSession.createDataFrame(
            [],
            "threshold double, n_pred bigint, tp bigint, "
            "precision double, recall double, f1 double",
        )
    bounds = (float(lo), float(hi), int(n_rows))
    c1 = two_phase_running_sum(
        by_v, F.col("n_v"), order=["nv"], out="cum_n", bounds=bounds
    )
    c2 = two_phase_running_sum(
        c1, F.col("np_v"), order=["nv"], out="cum_p", bounds=bounds
    )
    prec = trino_round(
        F.col("cum_p").cast("double") / F.col("cum_n").cast("double"), 6
    )
    rec = trino_round(
        F.try_divide(
            F.col("cum_p").cast("double"), F.col("cum_p_total").cast("double")
        ),
        6,
    )
    staged = c2.select(
        (-F.col("nv")).alias("threshold"),
        F.col("cum_n").cast("bigint").alias("n_pred"),
        F.col("cum_p").cast("bigint").alias("tp"),
        prec.alias("precision"),
        rec.alias("recall"),
    )
    f1 = trino_round(
        F.try_divide(
            F.lit(2.0) * F.col("precision") * F.col("recall"),
            F.col("precision") + F.col("recall"),
        ),
        6,
    )
    return staged.withColumn("f1", f1).orderBy(F.desc("threshold"))


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    in_sample_1: Column,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic
    D = max_x |F₁(x) − F₂(x)| between the rows where ``in_sample_1``
    holds and the rest — the standard distribution-drift test between
    two corpus slices.

    Integer-exact formulation: collapse to value-grouped counts
    (n₁ at v, n₂ at v), take ONE bounds probe then two
    :func:`~..operators.timeseries.two_phase_running_sum` passes
    sharing it (running counts per sample), and maximize the INTEGER
    cross-product |cum₁·n₂ − cum₂·n₁| — D and its achieving value
    (smallest on ties) divide by n₁·n₂ only at emit, so the argmax is
    engine-identical with no float comparison anywhere. The max is a
    1-row broadcast combiner (no global sort).

    Output (one row): ``n_1, n_2, ks_stat, ks_at`` (round6; ``ks_at``
    is the smallest value achieving the supremum).
    """
    from .timeseries import two_phase_running_sum

    v = F.col(value_col).cast("double")
    by_v = (
        df.filter(v.isNotNull())
        .select(v.alias("v"), in_sample_1.cast("int").alias("_s1"))
        .groupBy("v")
        .agg(
            F.sum("_s1").alias("n1_v"),
            F.sum(F.lit(1) - F.col("_s1")).alias("n2_v"),
        )
        .localCheckpoint()
    )
    lo, hi, n_rows = by_v.agg(
        F.min("v"), F.max("v"), F.count(F.lit(1))
    ).first()
    if int(n_rows) == 0:
        # Empty / all-null input: min/max are None — return the empty
        # result shape rather than TypeError-ing on float(None).
        return df.sparkSession.createDataFrame(
            [], "n_1 bigint, n_2 bigint, ks_stat double, ks_at double"
        )
    bounds = (float(lo), float(hi), int(n_rows))
    c1 = two_phase_running_sum(
        by_v, F.col("n1_v"), order=["v"], out="cum1", bounds=bounds
    )
    c2 = two_phase_running_sum(
        c1, F.col("n2_v"), order=["v"], out="cum2", bounds=bounds
    )
    tot = c2.agg(
        F.max("cum1_total").alias("_n1"), F.max("cum2_total").alias("_n2")
    )
    # Operand-first decimal(19,0) casts: cum·n reaches n1·n2 ≈ N²/4,
    # past int64 around ~6e9 pooled rows if multiplied in bigint first;
    # 19-digit operands multiply exactly into DECIMAL(38,0) on both
    # engines (38+38 would exceed DuckDB's max decimal width).
    d19 = "decimal(19,0)"
    scored = c2.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(
            F.col("cum1").cast(d19) * F.col("_n2").cast(d19)
            - F.col("cum2").cast(d19) * F.col("_n1").cast(d19)
        ).alias("_ds"),
        "_n1",
        "_n2",
    )
    mx = scored.agg(F.max("_ds").alias("_md"))
    return (
        scored.crossJoin(F.broadcast(mx))
        .filter(F.col("_ds") == F.col("_md"))
        .groupBy()
        .agg(
            F.max("_n1").cast("bigint").alias("n_1"),
            F.max("_n2").cast("bigint").alias("n_2"),
            trino_round(
                F.max("_md").cast("double")
                / (
                    F.max("_n1").cast("double")
                    * F.max("_n2").cast("double")
                ),
                6,
            ).alias("ks_stat"),
            F.min("v").alias("ks_at"),
        )
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the (binned) Brier score (Murphy 1973,
    public): over the same fixed-width score bins as
    :func:`ece_reliability`,

        reliability  = Σ n_b/N · (conf_b − acc_b)²   (miscalibration)
        resolution   = Σ n_b/N · (acc_b − ȳ)²        (discrimination)
        uncertainty  = ȳ(1 − ȳ)
        brier_binned = reliability − resolution + uncertainty

    plus the RAW Brier score Σ(s − y)²/N for reference (the identity
    holds exactly for the binned forecast, approximately for the raw
    one — the gap is the within-bin variance). Same scale shape as
    ECE: one grouped aggregate to ≤ n_bins rows, a 1-row broadcast
    combiner, nothing user-sized after the scan. Round8 fences on
    per-row squares and per-bin contributions; base rate ȳ is one
    IEEE division of exact integers.

    Output (one row): ``n_rows, brier, brier_binned, reliability,
    resolution, uncertainty`` (round6).
    """
    s = F.col(score_col).cast("double")
    y = F.col(outcome_col).cast("int")
    binned = df.select(
        F.least(
            F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        trino_round(s, 8).alias("_s"),
        y.alias("_y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        (
            F.sum(F.col("_s").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_conf"),
        (
            F.sum("_y").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_acc"),
        F.sum("_y").cast("bigint").alias("_npos"),
        F.sum(
            trino_round(
                (F.col("_s") - F.col("_y").cast("double"))
                * (F.col("_s") - F.col("_y").cast("double")),
                8,
            ).cast("decimal(38,12)")
        ).alias("_sqsum"),
    )
    tot = bins.agg(
        F.sum("_n").cast("double").alias("_nt"),
        F.sum("_npos").cast("double").alias("_pt"),
        F.sum("_sqsum").cast("double").alias("_sq"),
    )
    ybar = F.col("_pt") / F.col("_nt")
    wb = F.col("_n").cast("double") / F.col("_nt")
    contrib = bins.crossJoin(F.broadcast(tot)).select(
        trino_round(
            wb * (F.col("_conf") - F.col("_acc"))
            * (F.col("_conf") - F.col("_acc")),
            8,
        ).alias("_rel"),
        trino_round(
            wb * (F.col("_acc") - ybar) * (F.col("_acc") - ybar), 8
        ).alias("_res"),
        "_nt",
        "_pt",
        "_sq",
    )
    dsum = lambda c: F.sum(F.col(c).cast("decimal(38,12)")).cast("double")  # noqa: E731
    agg = contrib.agg(
        dsum("_rel").alias("_reliability"),
        dsum("_res").alias("_resolution"),
        F.max("_nt").alias("_n"),
        F.max("_pt").alias("_p"),
        F.max("_sq").alias("_s2"),
    )
    yb = F.col("_p") / F.col("_n")
    unc = yb * (F.lit(1.0) - yb)
    return agg.select(
        F.col("_n").cast("bigint").alias("n_rows"),
        trino_round(F.col("_s2") / F.col("_n"), 6).alias("brier"),
        trino_round(
            F.col("_reliability") - F.col("_resolution") + unc, 6
        ).alias("brier_binned"),
        trino_round(F.col("_reliability"), 6).alias("reliability"),
        trino_round(F.col("_resolution"), 6).alias("resolution"),
        trino_round(unc, 6).alias("uncertainty"),
    )


def lift_gain_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table (the classic model-targeting
    report): rank rows by score DESCENDING, cut into ``n_buckets``
    population-equal buckets, and report per bucket the positives
    captured, the cumulative gain (share of all positives reached) and
    the lift vs random targeting — the go/no-go readout for a quality
    classifier that will gate corpus admission at some volume budget.

    Scale shape (the RFM boundary-swap machinery end-to-end): rows
    collapse to |distinct score| value-grouped counts FIRST, a
    :func:`~..operators.timeseries.two_phase_running_sum` running
    count elects the bucket boundary VALUES at the exact cut positions
    p_t = t·⌊N/n⌋ + min(t, N mod n), boundaries broadcast as one sorted
    array, and bucket assignment is a row-local array fold over the
    value-grouped table — raw rows are never touched after the first
    groupBy and nothing row-scale is ever sorted. Ties that straddle a
    cut land in the better (lower-numbered) bucket as a block, on both
    engines, because assignment is by VALUE. Gains cumulate over the
    ≤ n_buckets-row output with a window; every count is an exact
    integer, lift/gain are IEEE divisions at emit.

    Output per bucket: ``bucket, n_rows, n_pos, cum_pos, gain, lift``
    (round6), ordered by bucket.
    """
    from .timeseries import two_phase_running_sum

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    # negate: descending score order becomes ascending nv order
    by_v = df.select((-s).alias("nv"), y.alias("_y")).groupBy("nv").agg(
        F.count(F.lit(1)).alias("n_v"),
        F.sum("_y").alias("np_v"),
    ).localCheckpoint()
    cum = two_phase_running_sum(by_v, F.col("n_v"), order=["nv"], out="c")
    tot = by_v.agg(
        F.sum("n_v").alias("_n"), F.sum("np_v").alias("_p")
    )
    spark = df.sparkSession
    tiles = F.broadcast(
        spark.createDataFrame([(t,) for t in range(1, n_buckets)], "t int")
    )
    cuts = tiles.crossJoin(F.broadcast(tot)).select(
        "t",
        (
            F.col("t") * F.floor(F.col("_n") / n_buckets)
            + F.least(F.col("t").cast("bigint"), F.col("_n") % n_buckets)
        ).alias("p"),
    )
    bnd = (
        cum.join(
            F.broadcast(cuts),
            (F.col("c") >= F.col("p"))
            & (F.col("c") - F.col("n_v") < F.col("p")),
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list("nv")).alias("_bnd"))
    )
    assigned = by_v.crossJoin(F.broadcast(bnd)).select(
        (
            F.lit(1)
            + F.aggregate(
                F.col("_bnd"),
                F.lit(0),
                lambda acc, b: acc + F.when(F.col("nv") > b, 1).otherwise(0),
            )
        ).alias("bucket"),
        "n_v",
        "np_v",
    )
    per = assigned.groupBy("bucket").agg(
        F.sum("n_v").cast("bigint").alias("n_rows"),
        F.sum("np_v").cast("bigint").alias("n_pos"),
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the window runs over the <= n_buckets-row output table
    out = per.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_rows",
        "n_pos",
        F.sum("n_pos").over(w).cast("bigint").alias("cum_pos"),
        F.sum("n_rows").over(w).alias("_cum_n"),
        "_n",
        "_p",
    )
    gain = F.try_divide(
        F.col("cum_pos").cast("double"), F.col("_p").cast("double")
    )
    lift = F.try_divide(
        F.col("cum_pos").cast("double") / F.col("_cum_n").cast("double"),
        F.col("_p").cast("double") / F.col("_n").cast("double"),
    )
    return out.select(
        "bucket",
        "n_rows",
        "n_pos",
        "cum_pos",
        trino_round(gain, 6).alias("gain"),
        trino_round(lift, 6).alias("lift"),
    ).orderBy("bucket")


def psi_drift(
    df: DataFrame,
    value_col: str,
    in_ref: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a REFERENCE slice and a
    comparison slice of the same column — the standard score-drift
    monitor (banking/scoring practice; PSI < 0.1 stable, > 0.25
    shifted):

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    over ``n_bins`` population-equal bins of the REFERENCE distribution
    (its own deciles, the standard binning), with Laplace-smoothed
    proportions p_b = (n_b + 0.5) / (N + 0.5·B) so an empty comparison
    bin contributes a large-but-finite term instead of ∞ (documented
    smoothing; both engines compute it identically).

    Scale shape: ONE value-grouped count pass carries both slices
    (two conditional counts per distinct value); the reference decile
    boundaries come from a
    :func:`~..operators.timeseries.two_phase_running_sum` running count
    at the exact cut positions (the lift/gain machinery), broadcast as
    an array; bin assignment is a row-local fold over the value-grouped
    table. Per-bin ln terms are round8-fenced and decimal-summed —
    B ≤ n_bins addends, order-free. Reference slice must have at least
    ``n_bins`` rows.

    Output per bin: ``bin, n_ref, n_cmp, p_ref, p_cmp, contrib, psi``
    (round6; ``psi`` is the same corpus-level value on every row),
    ordered by bin.
    """
    from .timeseries import two_phase_running_sum

    v = F.col(value_col).cast("double")
    r = in_ref.cast("int")
    by_v = (
        df.filter(v.isNotNull())
        .select(v.alias("v"), r.alias("_r"))
        .groupBy("v")
        .agg(
            F.sum("_r").alias("nr_v"),
            F.sum(F.lit(1) - F.col("_r")).alias("nc_v"),
        )
        .localCheckpoint()
    )
    cum = two_phase_running_sum(by_v, F.col("nr_v"), order=["v"], out="c")
    tot = by_v.agg(
        F.sum("nr_v").alias("_nr"), F.sum("nc_v").alias("_nc")
    )
    spark = df.sparkSession
    tiles = F.broadcast(
        spark.createDataFrame([(t,) for t in range(1, n_bins)], "t int")
    )
    cuts = tiles.crossJoin(F.broadcast(tot)).select(
        "t",
        (
            F.col("t") * F.floor(F.col("_nr") / n_bins)
            + F.least(F.col("t").cast("bigint"), F.col("_nr") % n_bins)
        ).alias("p"),
    )
    bnd = (
        cum.join(
            F.broadcast(cuts),
            (F.col("c") >= F.col("p"))
            & (F.col("c") - F.col("nr_v") < F.col("p")),
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list("v")).alias("_bnd"))
    )
    assigned = by_v.crossJoin(F.broadcast(bnd)).select(
        (
            F.lit(1)
            + F.aggregate(
                F.col("_bnd"),
                F.lit(0),
                lambda acc, b: acc + F.when(F.col("v") > b, 1).otherwise(0),
            )
        ).alias("bin"),
        "nr_v",
        "nc_v",
    )
    per = assigned.groupBy("bin").agg(
        F.sum("nr_v").cast("bigint").alias("n_ref"),
        F.sum("nc_v").cast("bigint").alias("n_cmp"),
    )
    wide = per.crossJoin(F.broadcast(tot))
    p = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
        F.col("_nr").cast("double") + F.lit(0.5 * n_bins)
    )
    q = (F.col("n_cmp").cast("double") + F.lit(0.5)) / (
        F.col("_nc").cast("double") + F.lit(0.5 * n_bins)
    )
    contrib = trino_round((p - q) * F.log(p / q), 8)
    scored = wide.withColumn("_ct", contrib)
    psi = scored.agg(
        trino_round(
            F.sum(F.col("_ct").cast("decimal(38,12)")).cast("double"), 6
        ).alias("psi")
    )
    return (
        scored.crossJoin(F.broadcast(psi))
        .select(
            "bin",
            "n_ref",
            "n_cmp",
            trino_round(p, 6).alias("p_ref"),
            trino_round(q, 6).alias("p_cmp"),
            trino_round(F.col("_ct"), 6).alias("contrib"),
            "psi",
        )
        .orderBy("bin")
    )


def cvm_two_sample(
    df: DataFrame,
    value_col: str,
    in_sample_1: Column,
) -> DataFrame:
    """Two-sample Cramér-von Mises statistic
    T = (n₁n₂/N²) · Σ_v m_v · (F₁(v) − F₂(v))² (the integral companion
    to :func:`ks_two_sample`'s supremum — sensitive to distributed
    small differences a single KS crossing misses; m_v is the pooled
    multiplicity at v).

    Same collapse as KS: value-grouped counts, ONE bounds probe shared
    by two :func:`~..operators.timeseries.two_phase_running_sum`
    passes. Each CDF difference is two correctly-rounded IEEE divisions
    and a subtraction in fixed order, the per-value contribution
    m_v·d² is round8-fenced and decimal-summed (order-free), and the
    final n₁n₂/N² scaling is a fixed-order double chain — so the
    statistic is engine-identical at any scale with no wide-integer
    overflow (unlike the exact-integer cross-product form, which
    exceeds DECIMAL(38) beyond ~10⁷ pooled rows).

    Output (one row): ``n_1, n_2, cvm_stat`` (round6).
    """
    from .timeseries import two_phase_running_sum

    v = F.col(value_col).cast("double")
    by_v = (
        df.filter(v.isNotNull())
        .select(v.alias("v"), in_sample_1.cast("int").alias("_s1"))
        .groupBy("v")
        .agg(
            F.sum("_s1").alias("n1_v"),
            F.sum(F.lit(1) - F.col("_s1")).alias("n2_v"),
        )
        .localCheckpoint()
    )
    lo, hi, n_rows = by_v.agg(
        F.min("v"), F.max("v"), F.count(F.lit(1))
    ).first()
    if int(n_rows) == 0:
        # Empty / all-null input: return the empty shape (see ks_two_sample).
        return df.sparkSession.createDataFrame(
            [], "n_1 bigint, n_2 bigint, cvm_stat double"
        )
    bounds = (float(lo), float(hi), int(n_rows))
    c1 = two_phase_running_sum(
        by_v, F.col("n1_v"), order=["v"], out="cum1", bounds=bounds
    )
    c2 = two_phase_running_sum(
        c1, F.col("n2_v"), order=["v"], out="cum2", bounds=bounds
    )
    tot = c2.agg(
        F.max("cum1_total").alias("_n1"), F.max("cum2_total").alias("_n2")
    )
    d = (
        F.col("cum1").cast("double") / F.col("_n1").cast("double")
        - F.col("cum2").cast("double") / F.col("_n2").cast("double")
    )
    contrib = trino_round(
        (F.col("n1_v") + F.col("n2_v")).cast("double") * d * d, 8
    )
    agg = (
        c2.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(contrib.cast("decimal(38,12)")).cast("double").alias("_s"),
            F.max("_n1").alias("_n1x"),
            F.max("_n2").alias("_n2x"),
        )
    )
    n1d = F.col("_n1x").cast("double")
    n2d = F.col("_n2x").cast("double")
    nd = n1d + n2d
    return agg.select(
        F.col("_n1x").cast("bigint").alias("n_1"),
        F.col("_n2x").cast("bigint").alias("n_2"),
        trino_round(F.col("_s") * n1d / nd * n2d / nd, 6).alias("cvm_stat"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact Spearman rank correlation (Spearman 1904, public) between
    two numeric columns — Pearson correlation of MIDRANKS, the
    tie-correct definition — for monotone-association audits where
    Pearson's linearity assumption misleads (heavy-tailed quality
    scores, token counts, latencies).

    Never row-ranks N rows: each column collapses to its |distinct
    value| count table, midranks come from
    :func:`~..operators.timeseries.two_phase_running_sum` running
    counts (midrank = cum − n/2 + 1/2, carried DOUBLED so it stays
    integer), and the doubled ranks join back to rows by value — two
    value-keyed shuffles, no global sort. The five Pearson moments
    (Σdx, Σdy, Σdx², Σdy², Σdx·dy) are exact DECIMAL(38,0) aggregates
    of decimal(19,0) operand products (the roc_auc overflow
    discipline; exact to ~1e12 rows), and the doubling cancels in the
    correlation ratio. The final combination is a fixed-order IEEE
    chain over the exact sums' double casts — engine-identical.

    Output (one row): ``n, rho`` (round6; rho NULL when either column
    is constant).
    """
    from .timeseries import two_phase_running_sum

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        x.alias("_x"), y.alias("_y")
    )

    # ONE up-front probe replaces the former per-rank eager machinery
    # (a localCheckpoint per column to fence two_phase_running_sum's
    # eager bounds probe = four driver-serialized jobs before the real
    # query). The distinct-value min/max of each column equals the base
    # column's min/max, and the base row count is a sound stand-in for
    # the distinct count in the small-input guard: both running-sum
    # paths are bit-identical by contract, so an over-count can only
    # flip WHICH identical-valued plan runs (row-scale input at 100 TB
    # correctly lands on the bucketed path either way). The rank tables
    # then stay lazy and execute exactly once, inside the final plan.
    lox, hix, loy, hiy, n_rows = base.agg(
        F.min("_x"), F.max("_x"), F.min("_y"), F.max("_y"), F.count(F.lit(1))
    ).first()

    def doubled_ranks(col: str, out: str, lo, hi) -> DataFrame:
        by_v = base.groupBy(col).agg(F.count(F.lit(1)).alias("_n"))
        # _x/_y are cast("double") at base construction, so lo/hi are
        # already in two_phase_running_sum's post-cast double domain
        # (identity bsrc for double columns — the timestamp/date micros
        # conversion never applies here). lo/hi are None only when base
        # is EMPTY (all-null input): (0.0, 0.0, 0) then routes an empty
        # table through the single-window plan — same one output row
        # (n=0, rho NULL) either way.
        cum = two_phase_running_sum(
            by_v,
            F.col("_n"),
            order=[col],
            out="_c",
            bounds=(
                float(lo) if lo is not None else 0.0,
                float(hi) if hi is not None else 0.0,
                int(n_rows),
            ),
        )
        return cum.select(
            col, (2 * F.col("_c") - F.col("_n") + 1).alias(out)
        )

    rx = doubled_ranks("_x", "_dx", lox, hix)
    ry = doubled_ranks("_y", "_dy", loy, hiy)
    d19 = "decimal(19,0)"
    joined = base.join(rx, "_x").join(ry, "_y")
    m = joined.agg(
        F.count(F.lit(1)).alias("_nn"),
        F.sum(F.col("_dx").cast(d19)).alias("_sx"),
        F.sum(F.col("_dy").cast(d19)).alias("_sy"),
        F.sum(F.col("_dx").cast(d19) * F.col("_dx").cast(d19)).alias("_sxx"),
        F.sum(F.col("_dy").cast(d19) * F.col("_dy").cast(d19)).alias("_syy"),
        F.sum(F.col("_dx").cast(d19) * F.col("_dy").cast(d19)).alias("_sxy"),
    )
    nd = F.col("_nn").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    num = nd * sxy - sx * sy
    den = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    return m.select(
        F.col("_nn").cast("bigint").alias("n"),
        trino_round(F.try_divide(num, den), 6).alias("rho"),
    )


def kaplan_meier(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958, public) with right censoring, per group — time-to-event
    analytics (churn, time-to-conversion, job-failure survival) over
    the same exact-sequential seam as the forecasting folds:

        at distinct duration t:  d_t events, c_t censored,
                                 n_t = subjects with duration ≥ t
        S(t) = Π_{u ≤ t, d_u > 0} round8(1 − d_u / n_u)
               (each product step round8-fenced)

    Scale shape: subjects collapse to |group × distinct duration|
    (duration, d, c) counts FIRST (one grouped aggregate); the
    sequential product then folds the COLLAPSED table per group on the
    bucketed Arrow ``applyInPandas`` seam (:func:`~..operators.
    timeseries.holt_smoothing`'s contract: buckets parallelize,
    per-group work is bounded by its distinct durations, nothing on
    the driver). Every step is round8-fenced, so the curve is
    bit-identical across engines and the oracle twin is a recursive
    CTE stepping the same product — exact, not rows-only.

    Output per (group, distinct duration), ascending: ``{group_col},
    {duration_col}, n_risk, n_event, n_censored, survival`` (round6).
    """
    import math

    import pandas as pd

    g, t = F.col(group_col), F.col(duration_col)
    ev = F.col(event_col).cast("int")
    per_t = (
        df.filter(t.isNotNull())
        .groupBy(g.alias("_g"), t.alias("_t"))
        .agg(
            F.sum(ev).cast("long").alias("_d"),
            F.sum(F.lit(1) - ev).cast("long").alias("_c"),
        )
    )

    def r8(x: float) -> float:
        return (math.floor(abs(x) * 1e8 + 0.5) / 1e8) * (
            1.0 if x >= 0 else -1.0
        )

    def r6(x: float) -> float:
        return (math.floor(abs(x) * 1e6 + 0.5) / 1e6) * (
            1.0 if x >= 0 else -1.0
        )

    g_type = df.schema[group_col].dataType.simpleString()
    t_type = df.schema[duration_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {g_type}, {duration_col} {t_type}, n_risk long, "
        "n_event long, n_censored long, survival double"
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["_g", "_t"])
        g_arr = pdf["_g"].to_numpy()
        t_arr = pdf["_t"].to_numpy()
        d_arr = pdf["_d"].to_numpy(dtype="int64")
        c_arr = pdf["_c"].to_numpy(dtype="int64")
        out = {group_col: [], duration_col: [], "n_risk": [],
               "n_event": [], "n_censored": [], "survival": []}
        starts = np.flatnonzero(
            np.r_[True, g_arr[1:] != g_arr[:-1]]
        ).tolist() + [len(g_arr)]
        for s0, s1 in zip(starts[:-1], starts[1:]):
            n_risk = int(d_arr[s0:s1].sum() + c_arr[s0:s1].sum())
            surv = 1.0
            for i in range(s0, s1):
                d, c = int(d_arr[i]), int(c_arr[i])
                if d > 0:
                    surv = r8(surv * r8(1.0 - d / n_risk))
                out[group_col].append(g_arr[i])
                out[duration_col].append(t_arr[i])
                out["n_risk"].append(n_risk)
                out["n_event"].append(d)
                out["n_censored"].append(c)
                out["survival"].append(r6(surv))
                n_risk -= d + c
        return pd.DataFrame(out)

    if n_buckets is None:
        n_buckets = max(
            64, 2 * df.sparkSession.sparkContext.defaultParallelism
        )
    bucket = F.pmod(F.xxhash64(F.col("_g")), F.lit(n_buckets))
    return per_t.groupBy(bucket.alias("_bk")).applyInPandas(fold, out_schema)


def isotonic_calibration(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Isotonic regression calibration via pool-adjacent-violators
    (Ayer et al. 1955 / Robertson-Wright-Dykstra, public), per group —
    the standard monotone score→probability calibrator (the
    non-parametric alternative to Platt scaling) fitted to a binary
    label.

    EXACT-INTEGER formulation: rows collapse to |distinct score|
    (n at score, positives at score) counts FIRST; PAV then merges
    adjacent blocks while the mean DECREASES, and because block means
    are rationals s/n of integer sums, every violation test is the
    integer cross-product ``s_prev·n_last > s_last·n_prev`` — no float
    comparison anywhere in the fit, so block boundaries are
    engine-identical by construction. The sequential merge folds the
    COLLAPSED table per group on the bucketed Arrow ``applyInPandas``
    seam (bounded by the group's distinct scores); calibrated values
    are one IEEE division of exact integers at emit.

    The oracle twin is the minimax identity ŷᵢ = max_{j≤i} min_{k≥i}
    avg(y_j..y_k) over interval averages of the same collapsed table —
    a closed form SQL can evaluate, which equals the PAV block mean at
    every position (saddle attained at the block boundaries).

    Output per (group, distinct score), ascending: ``{group_col},
    {score_col}, n, n_pos, pos_rate, calibrated`` (round6;
    ``calibrated`` is non-decreasing in score within each group).
    """
    import math

    import pandas as pd

    g = F.col(group_col)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    by_v = (
        df.filter(s.isNotNull())
        .groupBy(g.alias("_g"), s.alias("_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(y).cast("long").alias("_p"),
        )
    )

    def r6(x: float) -> float:
        return (math.floor(abs(x) * 1e6 + 0.5) / 1e6) * (
            1.0 if x >= 0 else -1.0
        )

    g_type = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {g_type}, {score_col} double, n long, n_pos long, "
        "pos_rate double, calibrated double"
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["_g", "_s"])
        g_arr = pdf["_g"].to_numpy()
        s_arr = pdf["_s"].to_numpy(dtype="float64")
        n_arr = pdf["_n"].to_numpy(dtype="int64")
        p_arr = pdf["_p"].to_numpy(dtype="int64")
        out = {group_col: [], score_col: [], "n": [], "n_pos": [],
               "pos_rate": [], "calibrated": []}
        starts = np.flatnonzero(
            np.r_[True, g_arr[1:] != g_arr[:-1]]
        ).tolist() + [len(g_arr)]
        for s0, s1 in zip(starts[:-1], starts[1:]):
            # PAV stack of (n, s, width): all-integer violation tests
            stack: list[list[int]] = []
            for i in range(s0, s1):
                n_b, p_b, w_b = int(n_arr[i]), int(p_arr[i]), 1
                while stack and stack[-1][1] * n_b > p_b * stack[-1][0]:
                    pn, pp, pw = stack.pop()
                    n_b, p_b, w_b = n_b + pn, p_b + pp, w_b + pw
                stack.append([n_b, p_b, w_b])
            i = s0
            for n_b, p_b, w_b in stack:
                cal = r6(p_b / n_b)
                for _ in range(w_b):
                    out[group_col].append(g_arr[i])
                    out[score_col].append(float(s_arr[i]))
                    out["n"].append(int(n_arr[i]))
                    out["n_pos"].append(int(p_arr[i]))
                    out["pos_rate"].append(r6(int(p_arr[i]) / int(n_arr[i])))
                    out["calibrated"].append(cal)
                    i += 1
        return pd.DataFrame(out)

    if n_buckets is None:
        n_buckets = max(
            64, 2 * df.sparkSession.sparkContext.defaultParallelism
        )
    bucket = F.pmod(F.xxhash64(F.col("_g")), F.lit(n_buckets))
    return by_v.groupBy(bucket.alias("_bk")).applyInPandas(fold, out_schema)


def ols_two_features(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Two-feature OLS with intercept, solved in CLOSED FORM from the
    normal equations via Cramer's rule — the mergeable-moment shape a
    100 TB regression needs (one partial-aggregated shuffle produces
    nine moment sums; the 3×3 solve is scalar arithmetic on the
    1-row aggregate, the same contract as ``agg_corr_regression``'s
    single-feature form). No iterative solver, no collect of data.

    Determinism: every moment is a decimal-fenced sum (order-free);
    the Cramer determinants and R² = 1 − SSE/SST (with
    SSE = Syy − b₀Sy − b₁Sx₁y − b₂Sx₂y from the normal-equation
    identity) are a fixed-order IEEE chain over the bit-identical
    moments, with output rounding absorbing the one compiler-level
    FMA ulp the single-feature query documents.

    Output (one row): ``n, intercept, beta1, beta2, r2`` (round6;
    NULLs when the design matrix is singular).
    """
    y = F.col(y_col).cast("double")
    x1 = F.col(x1_col).cast("double")
    x2 = F.col(x2_col).cast("double")
    base = df.filter(
        y.isNotNull() & x1.isNotNull() & x2.isNotNull()
    ).select(y.alias("_y"), x1.alias("_x1"), x2.alias("_x2"))

    # NOT the Arrow moment pass (r19 negative result): with only nine
    # cheap product terms over three shipped columns, the Arrow
    # serialization outweighs the saved decimal casts — interleaved A/B
    # at sf0.1: JVM fence 1.05 s vs Arrow twin 1.27 s min (same for
    # agg_corr_regression, 0.94 vs 1.28). The pass pays off where the
    # per-row cast work is heavy relative to shipped bytes
    # (skew_kurtosis: four POWER sums after a join, 2.92 -> 1.54).
    def dsum(c):
        return F.sum(c.cast("decimal(28,8)")).cast("double")

    m = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("_x1")).alias("sx1"),
        dsum(F.col("_x2")).alias("sx2"),
        dsum(F.col("_y")).alias("sy"),
        dsum(F.col("_x1") * F.col("_x1")).alias("s11"),
        dsum(F.col("_x2") * F.col("_x2")).alias("s22"),
        dsum(F.col("_x1") * F.col("_x2")).alias("s12"),
        dsum(F.col("_x1") * F.col("_y")).alias("s1y"),
        dsum(F.col("_x2") * F.col("_y")).alias("s2y"),
        dsum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n, sx1, sx2, sy = F.col("n"), F.col("sx1"), F.col("sx2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - sx2 * s12)
        + sx2 * (sx1 * s12 - sx2 * s11)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1y * (sx1 * s22 - sx2 * s12)
        + s2y * (sx1 * s12 - sx2 * s11)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sx1 * (sy * s22 - sx2 * s2y)
        + sx2 * (sy * s12 - sx2 * s1y)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    )
    b0 = F.try_divide(det0, det)
    b1 = F.try_divide(det1, det)
    b2 = F.try_divide(det2, det)
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / n
    return m.select(
        n.cast("bigint").alias("n"),
        trino_round(b0, 6).alias("intercept"),
        trino_round(b1, 6).alias("beta1"),
        trino_round(b2, 6).alias("beta2"),
        trino_round(F.lit(1.0) - F.try_divide(sse, sst), 6).alias("r2"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Exact Gini concentration coefficient (Gini 1912, public) of a
    non-negative value column, tie-correct via midranks:

        G = (Σ dᵥ·v·nᵥ − (n+1)·Σx) / (n·Σx),   dᵥ = doubled midrank

    — the single-number Lorenz summary next to ``orders_pareto_share``'s
    top-k cut points (0 = perfect equality, →1 = one unit holds all).

    Never sorts rows: values collapse to |distinct v| counts, doubled
    midranks ride :func:`~..operators.timeseries.two_phase_running_sum`
    (the Mann-Whitney/Spearman machinery), and both weighted sums are
    decimal(38,8)-fenced aggregates of fixed-order double terms — the
    final ratio is one IEEE chain over bit-identical sums.

    Output (one row): ``n, total, gini`` (round6; gini NULL when the
    total is 0).
    """
    from .timeseries import two_phase_running_sum

    v = F.col(value_col).cast("double")
    by_v = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint()
    )
    cum = two_phase_running_sum(by_v, F.col("_n"), order=["_v"], out="_c")
    d = (2 * F.col("_c") - F.col("_n") + 1).cast("double")
    d38 = "decimal(38,8)"
    m = cum.agg(
        F.sum("_n").cast("double").alias("_nn"),
        F.sum(
            ((d * F.col("_n").cast("double")) * F.col("_v")).cast(d38)
        )
        .cast("double")
        .alias("_sdx"),
        F.sum(
            (F.col("_v") * F.col("_n").cast("double")).cast(d38)
        )
        .cast("double")
        .alias("_sx"),
    )
    nn, sdx, sx = F.col("_nn"), F.col("_sdx"), F.col("_sx")
    return m.select(
        nn.cast("bigint").alias("n"),
        trino_round(sx, 6).alias("total"),
        trino_round(
            F.try_divide(sdx - (nn + F.lit(1.0)) * sx, nn * sx), 6
        ).alias("gini"),
    )


def ips_offpolicy(
    df: DataFrame,
    context_col: str,
    action_col: str,
    reward_col: str,
) -> DataFrame:
    """Off-policy evaluation of the greedy target policy by inverse
    propensity scoring (Horvitz-Thompson 1952 / Li et al. 2011 bandit
    replay, public): from a log of (context, action, reward),
    estimate what the argmax-mean-reward policy WOULD earn, without
    deploying it.

        p(a|x)  = n_{x,a} / n_x           (empirical logging propensity)
        π(x)    = argmax_a round8(mean reward)   (ties → smallest action)
        IPS     = (1/N) Σ 1{aᵢ=π(xᵢ)} rᵢ/p(aᵢ|xᵢ)
        SNIPS   = Σ 1{·} rᵢ/pᵢ  ÷  Σ 1{·} 1/pᵢ   (self-normalized)

    Plan shape: ONE (context, action) grouped aggregate produces
    counts and decimal-fenced mean rewards; the argmax ranks the
    contexts×actions table (bounded, never rows); propensities and
    the policy broadcast back over the log for one more aggregate.
    Per-row weights are fixed-order IEEE terms fenced into decimal
    sums via the double→decimal(38,8) cast (quantizes identically on
    both engines, no floor-domain limit), so both estimators are
    engine-identical.

    Output (one row): ``n, n_matched, match_rate, ips_value,
    snips_value`` (round6; with zero matched rows IPS is 0 and SNIPS
    is NULL — the self-normalizer has nothing to normalize).
    """
    from pyspark.sql import Window

    x = F.col(context_col)
    a = F.col(action_col)
    r = F.col(reward_col).cast("double")
    base = df.filter(r.isNotNull()).select(
        x.alias("_x"), a.alias("_a"), r.alias("_r")
    )
    per_xa = base.groupBy("_x", "_a").agg(
        F.count(F.lit(1)).alias("_nxa"),
        trino_round(
            F.sum(F.col("_r").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            8,
        ).alias("_mu"),
    )
    per_x = per_xa.groupBy("_x").agg(F.sum("_nxa").alias("_nx"))
    w = Window.partitionBy("_x").orderBy(F.desc("_mu"), F.asc("_a"))
    pol = (
        per_xa.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("_x", F.col("_a").alias("_pi"))
    )
    d38 = "decimal(38,8)"
    ips_w = F.col("_r") * (
        F.col("_nx").cast("double") / F.col("_nxa").cast("double")
    )
    inv_p = F.col("_nx").cast("double") / F.col("_nxa").cast("double")
    scored = (
        base.join(F.broadcast(per_xa.select("_x", "_a", "_nxa")), ["_x", "_a"])
        .join(F.broadcast(per_x), "_x")
        .join(F.broadcast(pol), "_x")
        .withColumn("_hit", (F.col("_a") == F.col("_pi")).cast("int"))
    )
    m = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_hit").cast("bigint").alias("n_matched"),
        # direct decimal casts, NOT round8: r/p weights can exceed
        # trino_round's floor domain at extreme propensities; the
        # double->decimal(38,8) cast quantizes identically both engines
        F.sum(
            F.when(F.col("_hit") == 1, ips_w)
            .otherwise(F.lit(0.0))
            .cast(d38)
        )
        .cast("double")
        .alias("_sw"),
        F.sum(
            F.when(F.col("_hit") == 1, inv_p)
            .otherwise(F.lit(0.0))
            .cast(d38)
        )
        .cast("double")
        .alias("_sp"),
    )
    return m.select(
        "n",
        "n_matched",
        trino_round(
            F.col("n_matched").cast("double") / F.col("n").cast("double"), 6
        ).alias("match_rate"),
        trino_round(
            F.try_divide(F.col("_sw"), F.col("n").cast("double")), 6
        ).alias("ips_value"),
        trino_round(F.try_divide(F.col("_sw"), F.col("_sp")), 6).alias(
            "snips_value"
        ),
    )


def wilson_intervals(
    df: DataFrame,
    group_col: str,
    success: Column,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Wilson score confidence interval (Wilson 1927, public) for a
    per-group binomial proportion — the interval that stays inside
    [0, 1] and behaves at small n / extreme rates where the Wald
    interval collapses; the readout a conversion/defect-rate dashboard
    should gate on:

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    One grouped count pass (n, successes — exact integers); the
    interval is a fixed-order IEEE chain per group with the z constant
    embedded as the same literal on both engines.

    Output per group: ``{group_col}, n, n_success, rate, ci_low,
    ci_high`` (round6), ordered by group.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(success.cast("int")).cast("bigint").alias("n_success"),
    )
    nd = F.col("n").cast("double")
    p = F.col("n_success").cast("double") / nd
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / nd
    center = (p + z2 / (F.lit(2.0) * nd)) / denom
    half = (
        F.lit(z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / nd
            + z2 / (F.lit(4.0) * nd * nd)
        )
        / denom
    )
    return per.select(
        group_col,
        "n",
        "n_success",
        trino_round(p, 6).alias("rate"),
        trino_round(F.greatest(center - half, F.lit(0.0)), 6).alias(
            "ci_low"
        ),
        trino_round(F.least(center + half, F.lit(1.0)), 6).alias("ci_high"),
    ).orderBy(group_col)


def skew_kurtosis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group skewness and excess kurtosis from the first four
    decimal-fenced raw moments (the mergeable-moment shape —
    Fisher-Pearson g₁ = m₃/m₂^1.5 and g₂ = m₄/m₂² − 3 with population
    central moments expanded from Σx, Σx², Σx³, Σx⁴) — the shape
    profile a distribution-drift audit reads next to mean/variance.

    Raw values are pre-scaled by the per-group round8 MEAN MAGNITUDE
    before the power sums (skewness/kurtosis are scale-invariant, and
    unscaled x⁴ overflows the decimal(38,8) fence for prices at
    corpus scale); moments combine in one fixed-order IEEE chain.

    The four power sums run as an Arrow-vectorized exact pass (r19,
    guide §4): per batch, x/x²/x³/x⁴ are the same left-associated IEEE
    doubles the JVM expression built, summed EXACTLY in integer 1e-8
    units (:func:`_round8_unit_sum` — bit-equal to the former
    ``sum(CAST(.. AS DECIMAL(38,8)))`` fence), with only the ≤1-row-
    per-(batch,group) decimal partials crossing back to the JVM. The
    per-row double→BigDecimal casts this replaces dominated the query
    (interleaved A/B at sf0.1: 2.92 → 1.54 s min, values identical).

    Output per group: ``{group_col}, n, skewness, kurtosis`` (round6;
    NULLs for a constant group), ordered by group.
    """
    v = F.col(value_col).cast("double")

    pre = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    scale = pre.groupBy("_g").agg(
        trino_round(
            F.greatest(
                F.sum(F.abs(F.col("_v")).cast("decimal(38,8)")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                F.lit(1.0),
            ),
            8,
        ).alias("_sc")
    )

    def _pow_terms(sub):
        # left-associated like the JVM chain: ((x*x)*x)*x
        x = sub["_v"].to_numpy() / sub["_sc"].to_numpy()
        x2 = x * x
        x3 = x2 * x
        x4 = x3 * x
        return (x, x2, x3, x4)

    m = _arrow_fenced_moment_pass(
        pre.join(F.broadcast(scale), "_g"),
        "_g",
        ("s1", "s2", "s3", "s4"),
        _pow_terms,
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - F.lit(3.0) * mu * F.col("s2") / n + F.lit(2.0) * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * mu * F.col("s3") / n
        + F.lit(6.0) * mu * mu * F.col("s2") / n
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return m.select(
        F.col("_g").alias(group_col),
        n.cast("bigint").alias("n"),
        trino_round(
            F.try_divide(m3, F.sqrt(m2) * m2), 6
        ).alias("skewness"),
        trino_round(
            F.try_divide(m4, m2 * m2) - F.lit(3.0), 6
        ).alias("kurtosis"),
    ).orderBy(group_col)


def tost_equivalence(
    df: DataFrame,
    user_col: str,
    convert: Column,
    margin: float = 0.02,
    salt: str = "ab",
    z_alpha: float = 1.6448536269514722,
) -> DataFrame:
    """Two-one-sided-tests (TOST, Schuirmann 1987, public) EQUIVALENCE
    check between the md5 hash-split arms — the non-inferiority gate a
    refactor/migration ships on: unlike :func:`ab_lift`'s difference
    test ("is B different?"), TOST demands evidence that |rate_B −
    rate_A| < ``margin`` (both one-sided z's must clear z_α; failing
    to reject difference is NOT evidence of equivalence).

        z_lower = (diff + margin) / SE     (H₀: diff ≤ −margin)
        z_upper = (margin − diff) / SE     (H₀: diff ≥ +margin)
        equivalent ⇔ min(z_lower, z_upper) > z_α

    Same arm machinery and unpooled SE as ``ab_lift`` (one user-level
    aggregate + one 2-row aggregate); z_α embedded as the same literal
    on both engines.

    Output (1 row): ``n_a, n_b, rate_a, rate_b, diff, se, z_lower,
    z_upper, equivalent`` (round6).
    """
    from .hashing import md5_long as _md5

    per_user = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(convert.cast("int")).alias("_conv")
    )
    armed = per_user.select(
        (_md5(F.concat(F.col("_u").cast("string"), F.lit(f"|{salt}"))) % 2)
        .cast("int")
        .alias("_arm"),
        "_conv",
    )
    wide = armed.groupBy("_arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_conv").cast("bigint").alias("_c"),
    ).agg(
        F.max(F.when(F.col("_arm") == 0, F.col("_n"))).alias("n_a"),
        F.max(F.when(F.col("_arm") == 0, F.col("_c"))).alias("conv_a"),
        F.max(F.when(F.col("_arm") == 1, F.col("_n"))).alias("n_b"),
        F.max(F.when(F.col("_arm") == 1, F.col("_c"))).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    diff = pb - pa
    se = F.sqrt(
        pa * (F.lit(1.0) - pa) / F.col("n_a").cast("double")
        + pb * (F.lit(1.0) - pb) / F.col("n_b").cast("double")
    )
    # try_divide: degenerate arms (rate 0 or 1 on both sides) have
    # SE = 0 — z's and the verdict are NULL, the ab_lift convention
    zl = F.try_divide(diff + F.lit(margin), se)
    zu = F.try_divide(F.lit(margin) - diff, se)
    return wide.select(
        "n_a",
        "n_b",
        trino_round(pa, 6).alias("rate_a"),
        trino_round(pb, 6).alias("rate_b"),
        trino_round(diff, 6).alias("diff"),
        trino_round(se, 6).alias("se"),
        trino_round(zl, 6).alias("z_lower"),
        trino_round(zu, 6).alias("z_upper"),
        (F.least(zl, zu) > F.lit(z_alpha)).alias("equivalent"),
    )
