"""One-pass numeric column profiling (data-quality reconnaissance).

The reference's dbt layer tests columns one assertion at a time
(schema.yml not_null / accepted_range); an analyst onboarding a new
100 TB table needs the inverse: a single cheap pass that SUMMARIZEs
every column — row count, null count, distinct count, min / max / mean
— before any modeling. DuckDB ships this as ``SUMMARIZE``; Spark's
``df.summary()`` is string-typed and collect-oriented. This operator
returns it as a proper DataFrame: one row per profiled column.

Plan shape: melt-then-aggregate over ONE scan — ``stack`` pivots the
scan stream to (col_name, val) pairs (codegen'd, fused into the scan),
and a single grouped aggregation computes everything per column. The
count-distinct partially de-duplicates map-side on (col_name, val), so
shuffle volume is the sum of per-column distinct-value counts, never
the melted stream. (The alternative — one wide aggregate with N
``count_distinct`` columns — plans an Expand whose grouping key is ALL
profiled columns at once: measured 2.5x slower at 4 columns and
superlinear in N.) No per-column rescans, nothing collected.

Determinism: min/max/counts are exact; ``mean_val`` goes through the
decimal fence (order-independent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile numeric ``cols``: one output row per column with
    (col_name, n_rows, n_nulls, n_distinct, min_val, max_val, mean_val).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    stack_args = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols)
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)")
    )
    val = F.col("val")
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(val.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.count_distinct(val).cast("bigint").alias("n_distinct"),
        F.min(val).alias("min_val"),
        F.max(val).alias("max_val"),
        (
            F.sum(val.cast("decimal(28,8)")).cast("double") / F.count(val)
        ).alias("mean_val"),
    )


def profile_categorical(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Categorical counterpart of :func:`profile_numeric`: one pass,
    one row per column with row/null/distinct counts and the modal
    value (most frequent non-null; ties broken toward the smallest
    value, so deterministic).

    Same melt-then-aggregate shape — ``stack`` fuses into the scan —
    but the mode needs per-(col, value) counts first, so the plan is
    a (col_name, val) count (map-side partial-agg collapses the melted
    stream to per-column cardinality) feeding two small per-column
    aggregates. Shuffle volume is the sum of per-column distincts,
    never the row stream.
    """
    pairs = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    melted = df.selectExpr(
        f"stack({len(cols)}, {pairs}) as (col_name, val)"
    )
    counts = melted.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.groupBy("col_name").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
        ).cast("bigint").alias("n_null"),
        F.count(F.when(F.col("val").isNotNull(), F.lit(1)))
        .cast("bigint")
        .alias("n_distinct"),
    )
    nonnull = counts.filter(F.col("val").isNotNull())
    top = (
        nonnull.groupBy("col_name")
        .agg(F.max("cnt").alias("top_count"))
        .join(nonnull, "col_name")
        .filter(F.col("cnt") == F.col("top_count"))
        .groupBy("col_name")
        .agg(
            F.min("val").alias("top_value"),
            F.max("cnt").cast("bigint").alias("top_count"),
        )
    )
    return stats.join(top, "col_name", "left")


def key_skew(df: DataFrame, cols: Sequence[str], top_k: int = 10) -> DataFrame:
    """Shuffle-skew pre-flight: for each candidate join/group key column,
    measure how concentrated its value distribution is — BEFORE a 100 TB
    job hashes on it and one reducer eats the hot key.

    Per column: distinct key count, Herfindahl concentration index
    ``hhi = sum((c_i/N)^2)``, its inverse (the "effective" number of
    keys a shuffle really spreads over), the max-key share, the top-k
    combined share, and the max/mean skew factor that sizes the salting
    decision (``join_skew_salted``'s input).

    Everything derives from the per-key count table (distinct-key-sized,
    one partial-agg shuffle per column): HHI is a pure decimal-fenced
    sum of squared counts — NO global rank or window, which is why this
    is HHI and not Gini (Gini needs a total order over all keys; at a
    billion keys that is its own skewed job). Top-k shares come from a
    TakeOrdered top-k, never a global sort. All ratios are exact
    integer arithmetic until one final double division.
    """
    from ..functions.trino import trino_round

    out = None
    for c in cols:
        counts = df.groupBy(F.col(c).cast("string").alias("_k")).agg(
            F.count(F.lit(1)).alias("_c")
        )
        stats = counts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("_c").cast("bigint").alias("n_rows"),
            F.sum(F.col("_c").cast("decimal(19,0)") * F.col("_c")).alias("_ss"),
            F.max("_c").cast("bigint").alias("_mx"),
        )
        top = (
            counts.orderBy(F.desc("_c"), F.asc("_k"))
            .limit(top_k)
            .agg(F.sum("_c").cast("bigint").alias("_tk"))
        )
        row = stats.crossJoin(F.broadcast(top)).select(
            F.lit(c).alias("key_name"),
            "n_keys",
            "n_rows",
            trino_round(
                F.col("_ss").cast("double")
                / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double")),
                6,
            ).alias("hhi"),
            trino_round(
                (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
                / F.col("_ss").cast("double"),
                6,
            ).alias("effective_keys"),
            trino_round(
                F.col("_mx").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("top1_share"),
            trino_round(
                F.col("_tk").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("topk_share"),
            trino_round(
                F.col("_mx").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_factor"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def benford_audit(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938,
    public) of a positive amount column — the standard fabricated-data
    / broken-feed screen for financial-style values: genuinely
    multiplicative quantities put digit d first with probability
    log10(1 + 1/d); hand-entered or truncated feeds don't.

    Engine-exact digit extraction: the value maps to an integer
    mantissa ``floor(|x|·scale + 0.5)`` (IEEE-identical everywhere),
    zero mantissas drop, and the leading digit is the first character
    of the INTEGER's decimal string — no log10 on doubles anywhere in
    the data path (libm log10 is not guaranteed correctly rounded at
    power-of-ten boundaries; integer-to-string is exact on every
    engine). One grouped count per digit; expected shares are the
    round8-fenced Benford masses.

    Output per digit 1-9: ``digit, n, observed, expected, abs_dev``
    (round6) plus the audit-level ``mad`` (mean absolute deviation —
    Nigrini's conformity statistic, same value on every row), ordered
    by digit.

    The total count and the MAD are window sums over the ≤9-row joined
    digit table (single-partition window over a digit-domain-bounded
    stream), not 1-row aggregate crossJoins: each broadcast combiner
    replans its build subtree, so the crossJoin form scanned the base
    table four times (digit counts for ``per`` and ``tot``, then all of
    ``per`` again for ``mad``). Values are unchanged — the window sums
    the same bigint/decimal addends, both order-independent.
    """
    import math

    from ..functions.trino import trino_round

    x = F.col(value_col).cast("double")
    m = F.floor(F.abs(x) * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    digits = (
        df.filter(x.isNotNull())
        .select(m.alias("_m"))
        .filter(F.col("_m") > 0)
        .select(
            F.substring(F.col("_m").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spark = df.sparkSession
    def _r8(v: float) -> float:
        return math.floor(abs(v) * 1e8 + 0.5) / 1e8

    expected = spark.createDataFrame(
        [(d, _r8(math.log10(1.0 + 1.0 / d))) for d in range(1, 10)],
        "digit int, expected double",
    )
    from pyspark.sql import Window

    w9 = Window.partitionBy()  # digit-domain table: ≤9 rows, one task
    per = (
        F.broadcast(expected)
        .join(digits, "digit", "left")
        .withColumn("_tot", F.sum("n").over(w9))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            trino_round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.col("_tot").cast("double"),
                6,
            ).alias("observed"),
            trino_round(F.col("expected"), 6).alias("expected"),
            trino_round(
                F.abs(
                    F.coalesce(F.col("n"), F.lit(0)).cast("double")
                    / F.col("_tot").cast("double")
                    - F.col("expected")
                ),
                6,
            ).alias("abs_dev"),
        )
    )
    mad = trino_round(
        F.sum(F.col("abs_dev").cast("decimal(28,8)")).over(w9).cast("double")
        / F.lit(9.0),
        6,
    )
    return per.withColumn("mad", mad).orderBy("digit")


def fd_audit(
    df: DataFrame, candidates: Sequence[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit: for each candidate FD
    ``determinant -> dependent``, measure how far the table is from
    satisfying it — the key-discovery / normalization-readiness check
    a profiling pass runs before modeling a new table (Papenbrock et
    al.'s FD-discovery metrics, public).

    Per candidate: collapse to (det, dep) counts (one grouped
    aggregate — the only data-scale work), then per determinant take
    row count, distinct dependents, and the majority dependent's
    count; aggregate to ``n_groups``, ``n_violating`` (determinants
    with >1 dependent), and ``repair_deletes`` = Σ (rows − majority) —
    the minimum deletions that make the FD hold. All exact integers.

    Output per candidate: ``determinant, dependent, n_rows, n_groups,
    n_violating, repair_deletes, holds``, in input order.
    """
    outs = []
    for det, dep in candidates:
        per_pair = (
            df.groupBy(F.col(det).alias("_a"), F.col(dep).alias("_b"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        per_det = per_pair.groupBy("_a").agg(
            F.sum("_n").alias("_rows"),
            F.count(F.lit(1)).alias("_deps"),
            F.max("_n").alias("_maj"),
        )
        outs.append(
            per_det.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.sum("_rows").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("_deps") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.sum(F.col("_rows") - F.col("_maj"))
                .cast("bigint")
                .alias("repair_deletes"),
                (F.max("_deps") <= 1).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
