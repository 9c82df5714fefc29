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
