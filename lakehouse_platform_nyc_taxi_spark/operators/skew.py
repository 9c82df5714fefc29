"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
join skew at runtime; these utilities cover the two cases AQE cannot:

- a single hot GROUP BY key overwhelming one reducer (salting splits the
  partial aggregation across ``n_salts`` reducers, then a second tiny
  aggregation merges the partials — correct for any reassociatable
  aggregate);
- a shuffled join where one side's hot keys must be split and the other
  (small) side replicated per salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — used only as an extra
    grouping/join key, never in results."""
    return df.withColumn(salt_col, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr), e.g.
    ``{"n": (F.count("*"), F.sum("n")), "total": (F.sum("v"), F.sum("total"))}``.
    Phase 1 groups by (keys + salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the ≤ n_salts partial rows per
    key, which is negligible regardless of skew.
    """
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted shuffle join: salt the skewed side, replicate the small side
    once per salt value (explode of a salt array), and join on
    (keys + salt). Each hot key's rows land on ``n_salts`` reducers
    instead of one. Result equals ``skewed.join(small, on, how)`` for
    ``how`` in ('inner', 'left') — the only joins where replicating the
    small side is transparent. For right/full outer, every unmatched
    small-side replica would surface (n_salts duplicate rows); for
    semi/anti the replicas change match semantics — so those are
    rejected.

    Use when the small side is too big to broadcast but small enough to
    replicate ``n_salts``× through the shuffle; otherwise prefer
    ``F.broadcast`` (no shuffle at all) or AQE skew splitting.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports how='inner'/'left' only: the replicated "
            f"small side breaks right/full-outer and semi/anti semantics (got {how!r})"
        )
    salted_left = with_salt(skewed, n_salts)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_left.join(replicated, [*on, "_salt"], how)
    return joined.drop("_salt")
