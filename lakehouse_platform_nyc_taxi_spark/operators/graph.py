"""Iterative graph analytics on edge DataFrames: weighted PageRank.

The reference exposes arbitrary interactive SQL over its marts
(README.md:163-167) but has no iterative-algorithm surface; this module
shows the Spark-native pattern for fixed-point graph computations: keep
the rank vector as a DataFrame keyed by node, express one iteration as
join + grouped aggregate, and loop on the driver WITHOUT collecting —
only the iteration *count* is driver-side, never the data.

Scale design (100 TB):
- one shuffle per iteration (the groupBy on ``dst``); the edges/ranks
  join reuses the same hash partitioning on the join key, so AQE folds
  it into the same exchange where sizes allow;
- the dangling-mass and normalization terms are 1-row aggregates
  broadcast back via ``crossJoin`` (the repo-standard 1-row ratio
  pattern) — O(1) data to the driver-side plan, nothing collected;
- lineage grows linearly with iterations; past ~15 iterations callers
  should pass ``checkpoint_every`` so the plan is truncated with
  ``localCheckpoint`` (eager) instead of growing a 100-join tree.

Determinism contract: per-edge contribution terms are computed in IEEE
double (bit-identical across engines), then summed through the decimal
fence (``dsum``), so the rank vector is bit-identical no matter the
partitioning / addition order — required for the DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dsum(col):
    """Order-independent double sum (decimal-fenced)."""
    return F.sum(F.col(col).cast("decimal(28,8)")).cast("double")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution.

    ``edges`` is (src, dst[, weight]); multi-edges are merged by summing
    weights. Returns (node, rank) with sum(rank) == 1 up to the decimal
    fence. ``iterations`` is fixed (no convergence test) so the result
    is a deterministic function of the input — required for oracle
    pairing and for predictable cluster cost.

    The aggregated edge/node/out-weight invariants are materialized once
    (eager ``localCheckpoint``) and the rank vector's lineage is
    truncated every ``checkpoint_every`` iterations: without this, each
    iteration's plan re-embeds the full upstream tree and the final
    plan re-reads the source once per *path* through the loop —
    hundreds of scans by iteration 3, exponential beyond. Total cost
    with truncation is the correct O(iterations * |E|). Pass
    ``checkpoint_every=0`` to keep the plan purely declarative (only
    sensible for 1-2 iterations).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
        )
        .groupBy("src", "dst")
        .agg(_dsum("w").alias("w"))
    )
    if checkpoint_every:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Bounded metadata: one scalar to the driver (node count), never rows.
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_w = e.groupBy("src").agg(_dsum("w").alias("ow"))
    if checkpoint_every:
        nodes = nodes.localCheckpoint(eager=True)
        out_w = out_w.localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for i in range(iterations):
        # rank * w / ow per edge (IEEE double, engine-identical), fenced
        # sum per destination (order-independent).
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(out_w, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("ow")).alias("c"),
            )
            .groupBy("node")
            .agg(_dsum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(out_w.select(F.col("src").alias("node")), "node", "left_anti")
            .agg(F.coalesce(_dsum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
