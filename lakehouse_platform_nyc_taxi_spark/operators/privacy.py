"""Privacy risk measurement: k-anonymity / l-diversity audit.

A training-data pipeline that ingests user-adjacent records needs to
know, before release, how re-identifiable each quasi-identifier (QI)
combination is. k-anonymity (Sweeney 2002) says every QI group must
contain at least k records; l-diversity (Machanavelli et al. 2007)
additionally requires at least l distinct sensitive values per group,
or a group of look-alikes still leaks the shared sensitive value.

Both are plain grouped aggregations — one shuffle on the QI key, with
count-distinct for l partially deduplicated map-side. At 100 TB the QI
key space is the operative cardinality (usually tiny vs row count);
hot QI groups are ordinary skewed aggregation keys (AQE/salting).

The reference has no privacy surface; this belongs to the
training-data extension inventory (brief: first-class LLM-pipeline
operators).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    qid_cols: Sequence[str],
    sensitive: str | None = None,
    k: int = 5,
    min_l: int = 2,
) -> DataFrame:
    """Per-QI-group audit row: group size, distinct sensitive values,
    and the pass/fail flags a release gate needs.

    Returns qid_cols + (group_size, k_anonymous) and, when
    ``sensitive`` is given, (l_diversity, l_diverse).
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("group_size")]
    if sensitive is not None:
        aggs.append(
            F.countDistinct(sensitive).cast("bigint").alias("l_diversity")
        )
    out = df.groupBy(*qid_cols).agg(*aggs)
    out = out.withColumn("k_anonymous", F.col("group_size") >= k)
    if sensitive is not None:
        out = out.withColumn("l_diverse", F.col("l_diversity") >= min_l)
    return out


def suppression_summary(
    df: DataFrame, qid_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row release report: how many records live in groups smaller
    than k (the rows a k-anonymizing release must suppress or
    generalize), total rows, and the suppression rate."""
    groups = df.groupBy(*qid_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return groups.agg(
        F.sum("group_size").cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("group_size") < k, F.col("group_size"))),
            F.lit(0),
        ).cast("bigint").alias("n_suppressed"),
        (
            F.coalesce(
                F.sum(F.when(F.col("group_size") < k, F.col("group_size"))),
                F.lit(0),
            )
            / F.sum("group_size")
        ).cast("double").alias("suppression_rate"),
    )


def t_closeness(
    df: DataFrame,
    qid_cols: Sequence[str],
    sensitive: str,
    t: float = 0.3,
) -> DataFrame:
    """t-closeness audit (Li et al. 2007, public): for every
    quasi-identifier group, the total-variation distance between the
    group's sensitive-value distribution and the global one — the
    release gate k-anonymity/l-diversity can't provide when a group is
    large and diverse but SKEWED toward one sensitive value.

    Shape: one groupBy to the (QI-group, sensitive) count cube, group
    and global margins as aggregates OF that table (never a second
    scan), global distribution broadcast onto the group cells, TVD =
    0.5 * sum|p - q| over the UNION of values — values absent from a
    group contribute q/2 each, folded in as (1 - group_mass_on_present)
    arithmetic instead of a grid join. Per-cell terms are round8
    decimal-summed.

    Output: qid_cols + ``(group_size, tvd, t_close)`` (round6, flag
    ``tvd <= t``).
    """
    from pyspark.sql import functions as F

    from ..functions.trino import trino_round

    # Fence the count cube: four consumers (group margin, global margin,
    # total, and the cell join) otherwise each replan the scan+aggregate
    # subtree — "margins as aggregates OF that table" only holds
    # physically once the |QI x sensitive| table is materialized.
    cells = df.groupBy(*qid_cols, sensitive).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    ).localCheckpoint()
    grp = cells.groupBy(*qid_cols).agg(
        F.sum("_c").cast("bigint").alias("group_size")
    )
    glob = cells.groupBy(sensitive).agg(F.sum("_c").alias("_g"))
    tot = cells.agg(F.sum("_c").alias("_n"))
    p = F.col("_c").cast("double") / F.col("group_size").cast("double")
    q = F.col("_g").cast("double") / F.col("_n").cast("double")
    # present-value terms: |p - q|; absent-value mass handled below
    term = F.round(F.abs(p - q), 8)
    qmass = F.round(q, 8)
    per_group = (
        cells.join(F.broadcast(grp), list(qid_cols))
        .join(F.broadcast(glob), sensitive)
        .crossJoin(F.broadcast(tot))
        .groupBy(*qid_cols, "group_size")
        .agg(
            F.sum(term.cast("decimal(28,8)")).cast("double").alias("_present"),
            F.sum(qmass.cast("decimal(28,8)")).cast("double").alias("_qpres"),
        )
    )
    # values the group never takes contribute |0 - q| = q each:
    # sum over absent values of q = 1 - sum over present values of q
    tvd = (F.col("_present") + (F.lit(1.0) - F.col("_qpres"))) / F.lit(2.0)
    return per_group.select(
        *qid_cols,
        "group_size",
        trino_round(tvd, 6).alias("tvd"),
        (trino_round(tvd, 6) <= F.lit(t)).alias("t_close"),
    ).orderBy(*qid_cols)


def entropy_l_diversity(
    df: DataFrame,
    qid_cols: Sequence[str],
    sensitive: str,
    l: int = 2,
) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al. 2007, public):
    for every quasi-identifier group, the Shannon entropy of its
    sensitive-value distribution must reach ln(l) — a strictly stronger
    gate than distinct-count l-diversity (``k_anonymity``'s
    ``l_diversity`` column), which a group that is 99% one value and 1%
    another still passes at l=2.

    Shape: one groupBy to the (QI-group, sensitive) count cube, group
    sizes as an aggregate OF that table broadcast back, entropy =
    sum(p * ln(1/p)) with per-cell terms round8 decimal-summed so the
    float log's last-ulp engine differences can't move the sum (the
    same fence as ``t_closeness``).

    Output: qid_cols + ``(group_size, entropy, entropy_l_diverse)``
    (round6, flag ``entropy >= ln(l)``).
    """
    import math

    from ..functions.trino import trino_round

    # Fenced for the same reason as t_closeness (two consumers).
    cells = df.groupBy(*qid_cols, sensitive).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    ).localCheckpoint()
    grp = cells.groupBy(*qid_cols).agg(
        F.sum("_c").cast("bigint").alias("group_size")
    )
    p = F.col("_c").cast("double") / F.col("group_size").cast("double")
    term = F.round(p * F.log(F.lit(1.0) / p), 8)
    per_group = (
        cells.join(F.broadcast(grp), list(qid_cols))
        .groupBy(*qid_cols, "group_size")
        .agg(F.sum(term.cast("decimal(28,8)")).cast("double").alias("_h"))
    )
    return per_group.select(
        *qid_cols,
        "group_size",
        trino_round(F.col("_h"), 6).alias("entropy"),
        (trino_round(F.col("_h"), 6) >= F.lit(round(math.log(l), 6))).alias(
            "entropy_l_diverse"
        ),
    ).orderBy(*qid_cols)
