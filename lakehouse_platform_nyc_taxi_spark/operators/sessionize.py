"""Batch sessionization (gaps-and-islands) over an event stream.

The batch twin of ``streaming/ops.py`` session windows: given events with
a user key and timestamp, assign each event to a session that closes when
the gap to the previous event exceeds ``gap``; emit one row per session.

Scale notes: one shuffle on the user key (the window partition); every
window function here shares that single partitioning, so Catalyst plans
exactly one Exchange and the session flag/index/rollup all run inside it.
Per-user event counts are bounded in practice (a user's history fits a
partition); a pathological hot key is a salting candidate but cannot be
salted here without breaking session continuity — the standard answer is
a per-(user, day) pre-split when a key's history exceeds partition
memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """One row per (user, session): start/end, event count, value total.

    A new session starts when the gap since the previous event is
    STRICTLY greater than ``gap_minutes`` (an event landing exactly on
    the boundary extends the session — the inclusive-gap convention of
    ``streaming/ops.py`` session windows). Ordering ties on ``ts`` are
    broken by ``order_tiebreak`` so the running flag-sum is
    deterministic; the session rollup itself is tiebreak-insensitive.

    The value total goes through the decimal fence (order-independent
    double sum) so results are stable across partitionings/engines.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond arithmetic throughout: unix_timestamp() truncates each
    # endpoint to seconds, which both misjudges gaps that straddle a
    # second boundary and off-by-ones the session duration.
    # timestamp_diff (not unix_micros) so TIMESTAMP_NTZ inputs work.
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = df.select(
        user_col,
        ts_col,
        order_tiebreak,
        value_col,
        new_session.alias("_new"),
    )
    # running sum of the new-session flags = 1-based session index
    sess_idx = F.sum("_new").over(
        Window.partitionBy(user_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NB: _new references lag() — compute it in its own select, then the
    # running sum in the next, so the window functions chain instead of
    # nesting (nested window expressions are rejected by the analyzer).
    with_idx = flagged.select(
        user_col, ts_col, value_col, sess_idx.alias("session_idx")
    )
    return (
        with_idx.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(28,8)"))
            .cast("double")
            .alias("total_value"),
        )
        .withColumn(
            "duration_s",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end) div 1000000"
            ),
        )
    )


def funnel_counts(
    df: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    stages: Sequence[str],
    max_events_per_stage: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users reached stage i having
    passed stages 0..i-1 IN TIME ORDER (a later "view" can't claim an
    earlier "purchase").

    Single-scan formulation: one conditional-min aggregate per user
    computes the first timestamp of every stage, then the stage-k
    reach time is folded left as
    ``t_k = min ts of stage_k events AFTER t_{k-1}`` — which equals
    min-over-events only when events are totally ordered per stage, so
    instead each user keeps the SORTED timestamp array per stage
    (bounded by that user's stage events) and the fold picks the first
    element after the previous stage's reach time. One shuffle on
    user, one 1-row final aggregate; per-user arrays are bounded by
    that user's own event count. ``max_events_per_stage`` keeps only
    each user's EARLIEST k events per stage via a per-(user, stage)
    ``row_number`` filter BEFORE the aggregate, so the collect_list
    buffer itself — not just the fold-column width — is bounded (cost:
    one extra shuffle+sort on (user, stage); without the cap the
    operator stays single-shuffle). When the cap truncates, the fold
    becomes a conservative approximation: a user counts as reaching
    stage i only via their first k stage-i events, so n_users is a
    lower bound (exact for every user under the cap).

    Returns one row: (stage, stage_idx, n_users) per stage.
    """
    per_user = _per_user_stage_times(
        df, user, event_type, ts, stages, max_events_per_stage
    )
    # left-fold the reach times: reach_0 = first stage-0 ts; reach_i =
    # first stage-i ts strictly after reach_{i-1}
    reach_prev = F.try_element_at(F.col("_ts_0"), F.lit(1))
    reached = per_user.withColumn("_reach_0", reach_prev)
    for i in range(1, len(stages)):
        # expr form: a python lambda with a bound default would read as
        # PySpark's 2-arg (element, index) variant
        reached = reached.withColumn(
            f"_reach_{i}",
            F.expr(
                f"try_element_at(filter(_ts_{i}, t -> t > _reach_{i-1}), 1)"
            ),
        )
    counts = reached.agg(
        *[
            F.count(F.col(f"_reach_{i}")).cast("bigint").alias(f"n_{i}")
            for i in range(len(stages))
        ]
    )
    rows = [
        F.struct(
            F.lit(s).alias("stage"),
            F.lit(i).alias("stage_idx"),
            F.col(f"n_{i}").alias("n_users"),
        )
        for i, s in enumerate(stages)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.stage", "r.stage_idx", "r.n_users"
    )


def _per_user_stage_times(
    df: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    stages: Sequence[str],
    max_events_per_stage: int | None,
) -> DataFrame:
    """One row per user with the sorted per-stage timestamp arrays the
    funnel fold consumes (``u``, ``_ts_0`` .. ``_ts_{n-1}``).

    With ``max_events_per_stage`` set, non-stage events are dropped and a
    per-(user, stage) ``row_number`` keeps only the earliest k BEFORE the
    collect_list, so no aggregation buffer ever holds more than k
    timestamps per stage (one extra shuffle+sort on (user, stage); the
    uncapped path is untouched and stays single-shuffle).
    """
    if max_events_per_stage is not None and max_events_per_stage < 1:
        raise ValueError(
            f"max_events_per_stage must be >= 1, got {max_events_per_stage}"
        )
    src = df
    if max_events_per_stage is not None:
        rn = F.row_number().over(
            Window.partitionBy(user, event_type).orderBy(ts)
        )
        src = (
            df.filter(F.col(event_type).isin(list(stages)))
            .withColumn("_rn", rn)
            .filter(F.col("_rn") <= max_events_per_stage)
            .drop("_rn")
        )

    def _stage_ts(i: int, s: str):
        arr = F.array_sort(
            F.collect_list(F.when(F.col(event_type) == s, F.col(ts)))
        )
        return arr.alias(f"_ts_{i}")

    return src.groupBy(F.col(user).alias("u")).agg(
        *[_stage_ts(i, s) for i, s in enumerate(stages)]
    )


def markov_transitions(
    df: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for every observed (current, next) event-type pair, the transition
    count and probability P(next | current).

    One window shuffle on the user key (lead over (ts, tiebreak) — the
    tiebreak makes same-timestamp order engine-identical), then a
    transition-pair groupBy whose output is bounded by |event types|^2;
    row totals come from a window over THAT bounded table, not a second
    scan. Probabilities are exact count ratios (round6) — no float
    accumulation at all.

    Output: ``cur, nxt, n_transitions, p`` ordered by (cur, nxt).
    """
    w = Window.partitionBy(user).orderBy(ts, tiebreak)
    pairs = df.select(
        F.col(event_type).alias("cur"),
        F.lead(event_type).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    tot = F.sum("n_transitions").over(Window.partitionBy("cur"))
    from ..functions.trino import trino_round

    return counts.select(
        "cur",
        "nxt",
        "n_transitions",
        trino_round(
            F.col("n_transitions").cast("double") / tot.cast("double"), 6
        ).alias("p"),
    ).orderBy("cur", "nxt")


def attribution_last_touch(
    df: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    tiebreak: str,
    conversion: str = "purchase",
    lookback_days: int = 7,
    value_col: str = "value",
) -> DataFrame:
    """Last-touch marketing attribution: credit each conversion event to
    the user's most recent PRECEDING non-conversion event within the
    lookback window; conversions with no touch in range are 'direct'.

    One window shuffle on the user key — the carried last-touch is an
    ``ignoreNulls`` last_value over rows strictly before the current one
    (ordered by (ts, tiebreak), so same-timestamp order is engine-
    identical); no self-join, no per-conversion scan. Output is the
    |channels|-bounded conversion table: ``channel, n_conversions,
    total_value`` (fenced, round6).
    """
    from ..functions.trino import trino_round

    w = (
        Window.partitionBy(user)
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(event_type) != conversion,
        F.struct(F.col(ts).alias("t"), F.col(event_type).alias("ch")),
    )
    carried = df.withColumn("_lt", F.last(touch, ignorenulls=True).over(w))
    conv = carried.filter(F.col(event_type) == conversion)
    # microsecond-exact difference: timestamps are integer micros, so
    # timestampdiff(MICROSECOND) == DuckDB date_diff('microsecond') with
    # no boundary-crossing ambiguity (unlike SECOND granularity)
    in_window = F.col("_lt").isNotNull() & (
        F.expr(f"timestampdiff(MICROSECOND, _lt.t, {ts})")
        <= F.lit(lookback_days * 86400 * 1_000_000).cast("long")
    )
    channel = F.when(in_window, F.col("_lt.ch")).otherwise(F.lit("direct"))
    return (
        conv.groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            trino_round(
                F.sum(F.col(value_col).cast("decimal(38,12)")).cast("double"), 6
            ).alias("total_value"),
        )
        .orderBy("channel")
    )


def attribution_time_decay(
    df: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    tiebreak: str,
    conversion: str = "purchase",
    lookback_days: int = 7,
    half_life_days: float = 3.5,
    value_col: str = "value",
) -> DataFrame:
    """Time-decay multi-touch attribution: every non-conversion event in
    the lookback window before a conversion shares that conversion's
    value, weighted exp(-ln2 * age / half_life) and normalized per
    conversion; conversions with no touch in range credit 'direct'.

    The multi-touch complement of ``attribution_last_touch``: a
    conversion's credit is split across ALL its touches instead of
    handed to the latest one. Plan shape: a per-user range join
    (conversion x touches within the window — keyed on the user,
    range as residual, never a cartesian), per-conversion weight
    normalization via a window over the conversion id (high-cardinality
    key — parallel at any scale), then a |channels|-bounded rollup.
    Determinism fence: exp() can differ in the last ulp across engines,
    so each weight is round8'd BEFORE the decimal-exact normalizing sum
    and each credit round8'd before the decimal-exact channel sum.

    Output: ``channel, n_credits, attributed_value`` (round6).
    """
    from ..functions.trino import trino_round

    lb_us = int(lookback_days * 86400 * 1_000_000)
    hl_us = float(half_life_days * 86400 * 1_000_000)
    conv = df.filter(F.col(event_type) == conversion).select(
        F.col(user).alias("_u"),
        F.col(tiebreak).alias("_cid"),
        F.col(ts).alias("_ct"),
        F.col(value_col).alias("_v"),
    )
    touch = df.filter(F.col(event_type) != conversion).select(
        F.col(user).alias("_tu"),
        F.col(event_type).alias("_ch"),
        F.col(ts).alias("_tt"),
    )
    dt = F.expr("timestampdiff(MICROSECOND, _tt, _ct)")
    j = conv.join(
        touch,
        (F.col("_u") == F.col("_tu"))
        & (F.col("_tt") < F.col("_ct"))
        & (dt <= F.lit(lb_us)),
        "left",
    ).withColumn(
        "_w",
        F.round(F.exp(F.lit(-0.6931471805599453) * dt / F.lit(hl_us)), 8),
    )
    # normalize per (user, conversion): _cid alone would silently pool
    # weight sums if a caller passed a non-globally-unique tiebreak
    # column (ADVICE r12); adding _u costs nothing and makes per-user-
    # unique conversion ids safe too
    sw = F.sum(F.col("_w").cast("decimal(28,8)")).over(
        Window.partitionBy("_u", "_cid")
    ).cast("double")
    credit = F.when(
        F.col("_ch").isNotNull(),
        F.round(F.col("_v") * F.col("_w") / sw, 8),
    ).otherwise(F.round(F.col("_v"), 8))
    channel = F.coalesce(F.col("_ch"), F.lit("direct"))
    return (
        j.select(channel.alias("channel"), credit.alias("_credit"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            trino_round(
                F.sum(F.col("_credit").cast("decimal(28,8)")).cast("double"), 6
            ).alias("attributed_value"),
        )
        .orderBy("channel")
    )


def funnel_latency(
    df: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    stages: Sequence[str],
    max_events_per_stage: int | None = None,
) -> DataFrame:
    """Stage-transition latency for the ordered funnel: among users who
    reached stage i, how long after reaching stage i-1 (seconds). Same
    single-scan greedy fold as :func:`funnel_counts` (identical reach
    times), then one 1-row aggregate per transition — latencies are
    exact microsecond integers decimal-summed, so the means are
    partition-order-free.

    Output: one row per transition —
    ``stage, stage_idx, n_users, mean_latency_s, max_latency_s``
    (round6).
    """
    from ..functions.trino import trino_round

    per_user = _per_user_stage_times(
        df, user, event_type, ts, stages, max_events_per_stage
    )
    reached = per_user.withColumn(
        "_reach_0", F.try_element_at(F.col("_ts_0"), F.lit(1))
    )
    for i in range(1, len(stages)):
        reached = reached.withColumn(
            f"_reach_{i}",
            F.expr(
                f"try_element_at(filter(_ts_{i}, t -> t > _reach_{i-1}), 1)"
            ),
        )
    lat = [
        F.expr(
            f"timestampdiff(MICROSECOND, _reach_{i-1}, _reach_{i})"
        ).alias(f"_lat_{i}")
        for i in range(1, len(stages))
    ]
    lats = reached.select(*lat)
    aggs = []
    for i in range(1, len(stages)):
        c = F.col(f"_lat_{i}")
        aggs += [
            F.count(c).cast("bigint").alias(f"n_{i}"),
            (
                F.sum(c.cast("decimal(38,12)")).cast("double")
                / F.count(c).cast("double")
                / F.lit(1e6)
            ).alias(f"mean_{i}"),
            (F.max(c).cast("double") / F.lit(1e6)).alias(f"max_{i}"),
        ]
    wide = lats.agg(*aggs)
    rows = [
        F.struct(
            F.lit(stages[i]).alias("stage"),
            F.lit(i).cast("int").alias("stage_idx"),
            F.col(f"n_{i}").alias("n_users"),
            trino_round(F.col(f"mean_{i}"), 6).alias("mean_latency_s"),
            trino_round(F.col(f"max_{i}"), 6).alias("max_latency_s"),
        )
        for i in range(1, len(stages))
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.stage", "r.stage_idx", "r.n_users", "r.mean_latency_s",
        "r.max_latency_s",
    )


def sequence_mining(
    df: DataFrame,
    user_col: str,
    order_col: str,
    event_col: str,
    tiebreak_col: str | None = None,
    max_len: int = 3,
    min_support: int = 2,
) -> DataFrame:
    """Frequent CONTIGUOUS event-sequence mining (the n-gram special
    case of PrefixSpan / GSP, public): which 2-step and 3-step
    event-type paths do at least ``min_support`` distinct users walk?
    The product-analytics companion to :func:`markov_transitions` —
    transitions give one-step probabilities, this surfaces the actual
    multi-step paths with their user reach.

    Plan shape: per-user ``lead`` windows (partitioned by user —
    bounded per-user work, no global sort) build each row's length-2..
    ``max_len`` forward n-gram; support counts DISTINCT users per
    pattern (map-side partial dedup on (pattern, user)), never
    occurrences, so one looping user can't fake popularity. Patterns
    below ``min_support`` drop before the final ordering; output is
    pattern-cardinality-sized.

    Output: ``pattern`` ('a>b>c'), ``length``, ``n_users``,
    ``support`` (share of all users, round6), ordered by
    (length, n_users desc, pattern).
    """
    if max_len < 2:
        raise ValueError("max_len must be >= 2")
    from ..functions.trino import trino_round

    order_cols = [F.col(order_col)]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(event_col).alias("_e0"),
        *[
            F.lead(F.col(event_col), i).over(w).alias(f"_e{i}")
            for i in range(1, max_len)
        ],
    )
    # one bounded-metadata scalar (user count) — off the RAW frame so
    # the probe never evaluates the lead windows
    tot = df.select(F.col(user_col)).distinct().count()
    pats = []
    for ln in range(2, max_len + 1):
        cols = [F.col(f"_e{i}") for i in range(ln)]
        cond = cols[ln - 1].isNotNull()
        pats.append(
            base.filter(cond)
            .select(
                F.concat_ws(">", *cols).alias("pattern"),
                F.lit(ln).alias("length"),
                "_u",
            )
        )
    allp = pats[0]
    for p in pats[1:]:
        allp = allp.unionAll(p)
    return (
        allp.groupBy("pattern", "length")
        .agg(F.count_distinct("_u").cast("bigint").alias("n_users"))
        .filter(F.col("n_users") >= min_support)
        .select(
            "pattern",
            "length",
            "n_users",
            trino_round(
                F.col("n_users").cast("double") / F.lit(float(tot)), 6
            ).alias("support"),
        )
        .orderBy("length", F.desc("n_users"), "pattern")
    )
