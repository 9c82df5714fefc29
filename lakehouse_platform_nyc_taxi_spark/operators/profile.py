"""One-pass numeric column profiling (data-quality reconnaissance).

The reference's dbt layer tests columns one assertion at a time
(schema.yml not_null / accepted_range); an analyst onboarding a new
100 TB table needs the inverse: a single cheap pass that SUMMARIZEs
every column — row count, null count, distinct count, min / max / mean
— before any modeling. DuckDB ships this as ``SUMMARIZE``; Spark's
``df.summary()`` is string-typed and collect-oriented. This operator
returns it as a proper DataFrame: one row per profiled column.

Plan shape: a single wide aggregate over one scan (count-distinct on
multiple columns expands via Expand + partial aggregation — still one
pass over the data), then a rows-from-columns pivot via ``stack`` that
touches only the 1-row aggregate. No per-column rescans, nothing
collected.

Determinism: min/max/counts are exact; ``mean_val`` goes through the
decimal fence (order-independent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile numeric ``cols``: one output row per column with
    (column, n_rows, n_nulls, n_distinct, min_val, max_val, mean_val).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.sum(F.when(d.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(d).alias(f"{c}__distinct"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
            (
                F.sum(d.cast("decimal(28,8)")).cast("double")
                / F.count(d)
            ).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__mean"
        for c in cols
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val, mean_val)"
        ),
    ).select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val",
        "max_val",
        "mean_val",
    )
