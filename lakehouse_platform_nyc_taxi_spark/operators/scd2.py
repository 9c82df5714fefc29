"""Slowly-changing-dimension type 2: versioned attribute history.

The reference's marts are type-1 (latest value wins); SCD2 is the other
standard warehouse dimension shape — every attribute change becomes a
new row with a validity interval, so facts can join to the dimension AS
OF their event time. Two operators:

- :func:`scd2_history` derives a full type-2 history from an event log
  in one pass (the backfill / bootstrap path);
- :func:`scd2_apply` folds a batch of updates into an existing SCD2
  table (the incremental path), closing changed current rows and
  inserting new versions.

Scale notes: both are one shuffle on the dimension key. ``scd2_history``
is gaps-and-islands (same plan family as ``sessionize``): all window
functions share a single ``(key) ORDER BY (ts, tiebreak)`` partitioning,
so Catalyst emits exactly one Exchange; the island rollup is a partial
agg on top. ``scd2_apply`` joins updates against ONLY the current rows
(the ``is_current`` filter prunes at the scan on a partitioned layout)
and passes closed history through untouched — the incremental path never
rewrites history. Per-key version counts are bounded (a key's history
fits a partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Collapse an event log into type-2 attribute history.

    Consecutive events of one key with the SAME attribute value form one
    version row: ``valid_from`` = the run's first event time, ``valid_to``
    = the next version's ``valid_from`` (NULL on the current version,
    ``is_current`` true), ``n_events`` = run length. Ordering ties on
    ``ts`` are broken by ``order_tiebreak`` so runs are deterministic;
    versions are sequenced by ``(valid_from, first tiebreak)`` so two
    runs sharing a boundary timestamp still order stably.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    change = F.when(
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col)),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.select(
        key_col, attr_col, ts_col, order_tiebreak, change.alias("_chg")
    )
    island = F.sum("_chg").over(
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        flagged.select(
            key_col, attr_col, ts_col, order_tiebreak, island.alias("_island")
        )
        .groupBy(key_col, "_island")
        .agg(
            F.first(attr_col).alias(attr_col),  # constant within an island
            F.min(ts_col).alias("valid_from"),
            F.min(order_tiebreak).alias("_first_tb"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    seq = Window.partitionBy(key_col).orderBy("valid_from", "_first_tb")
    return runs.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(seq).alias("valid_to"),
        F.lead("valid_from").over(seq).isNull().alias("is_current"),
        "n_events",
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    effective_ts,
) -> DataFrame:
    """Fold one batch of updates into an SCD2 dimension.

    ``dim``'s schema is ``key, *attrs, valid_from, valid_to, is_current``
    (extra columns are dropped); ``updates`` carries the key and new
    attribute values, at most one row per key. For each updated key whose
    tracked attributes actually CHANGED (null-safe comparison), the
    current row closes at ``effective_ts`` and a new current row opens
    there; no-op updates and untouched keys pass through; unseen keys
    insert as their first version.
    """
    cols = [key_col, *attr_cols, "valid_from", "valid_to", "is_current"]
    dim = dim.select(cols)
    ts_type = dim.schema["valid_from"].dataType
    eff = F.lit(effective_ts).cast(ts_type)
    upd = updates.select(
        F.col(key_col),
        *[F.col(c).alias(f"_new_{c}") for c in attr_cols],
        F.lit(True).alias("_has_upd"),
    )
    closed = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))
    joined = current.join(upd, on=key_col, how="left")
    changed = F.coalesce(F.col("_has_upd"), F.lit(False)) & ~F.struct(
        *[F.col(c) for c in attr_cols]
    ).eqNullSafe(F.struct(*[F.col(f"_new_{c}").alias(c) for c in attr_cols]))
    kept = joined.filter(~changed).select(cols)
    to_close = joined.filter(changed)
    closed_out = to_close.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    reopened = to_close.select(
        F.col(key_col),
        *[F.col(f"_new_{c}").alias(c) for c in attr_cols],
        eff.alias("valid_from"),
        F.lit(None).cast(ts_type).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # every live key has exactly one current row (the operator's
    # invariant), so anti-joining against CURRENT keys — a fraction of
    # the full history — is sufficient and cheaper at scale
    inserted = (
        upd.join(current.select(key_col), on=key_col, how="left_anti")
        .select(
            F.col(key_col),
            *[F.col(f"_new_{c}").alias(c) for c in attr_cols],
            eff.alias("valid_from"),
            F.lit(None).cast(ts_type).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    out = closed
    for part in (kept, closed_out, reopened, inserted):
        out = out.unionByName(part)
    return out


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (as-of) enrichment against SCD2 history: each fact
    row joins the version whose ``[valid_from, valid_to)`` interval
    covers its timestamp — the feature-store correctness rule that
    prevents time-travel leakage (training rows must see the dimension
    AS IT WAS, never a later version).

    Versions partition each key's timeline (scd2_history guarantees
    half-open adjacency), so at most one version matches per fact.
    ``how="left"`` keeps facts that predate the first version (NULL
    attributes). Plan: an equi-join on the key with the interval as a
    residual range filter — per-key version lists are small, so the
    join side stays skew-friendly; no cartesian.
    """
    h = history.withColumnRenamed(key_col, "__pit_key")
    cond = (
        (facts[key_col] == h["__pit_key"])
        & (h[valid_from] <= facts[ts_col])
        & (h[valid_to].isNull() | (facts[ts_col] < h[valid_to]))
    )
    return facts.join(h, cond, how).drop("__pit_key")
