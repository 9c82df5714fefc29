"""Size-guarded lineage fences for multiply-consumed intermediates.

Spark replans (and re-executes) the build side of self-joins and of
1-row-combiner crossJoins — exchange/subtree reuse does not fire for
these shapes (verified in executed plans, r18). Where an expensive
pipeline collapses to a small artifact read by several consumers, a
``localCheckpoint()`` at the collapse point executes the pipeline once
and hands every consumer the materialized rows.

``localCheckpoint`` has two scale hazards (VERDICT r18 #2/#3):

1. it materializes the artifact NON-REPLICATED to executor storage and
   truncates lineage — at 100 TB an unbounded artifact (one row per
   basket / per distinct shingle / per vector) can exceed storage, and
   a lost executor can no longer recompute its slice;
2. it erases Catalyst size stats, so a downstream non-equi join can
   flip to CartesianProduct (the r18 containment incident; bounded
   sides get an explicit ``F.broadcast`` and tests/test_plans.py pins
   no-cartesian-below-fence).

:func:`fence_if_small` keeps the fence when the optimizer's size
estimate says the artifact is comfortably executor-memory-small, and
returns the frame UNCHANGED (lazy — consumers replan the pipeline,
the recompute-safe default) when the estimate crosses ``max_bytes``.
The estimate derives from the input file sizes (SizeInBytesOnly
visitor), so it scales with the data: every bench/test scale factor
stays far below the default threshold (measured ≤ tens of MB at
sf0.1) and a 100 TB input blows through it — no per-deployment knob
to mis-tune, same query values on both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Default fence budget. Far above any test-scale artifact estimate
#: (≤ tens of MB at sf0.1) and far below what a single executor's
#: storage should absorb silently at 100 TB.
DEFAULT_FENCE_BYTES = 256 << 20


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate of ``df``'s optimized plan.

    Driver-side only (no job): the SizeInBytesOnly visitor folds scan
    file sizes through the operators, so the figure is a scale proxy,
    not an exact artifact size — exactly what a fence-or-replan
    decision needs."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def fence_if_small(
    df: DataFrame, max_bytes: int = DEFAULT_FENCE_BYTES
) -> DataFrame:
    """``df.localCheckpoint()`` when the plan-size estimate is at most
    ``max_bytes``; ``df`` unchanged (lazy) otherwise.

    NOTE the fence is EAGER: the artifact's pipeline runs at call time,
    not first action (callers are query builders whose construction
    already runs inside the timed region)."""
    if plan_size_estimate(df) <= max_bytes:
        return df.localCheckpoint()
    return df
