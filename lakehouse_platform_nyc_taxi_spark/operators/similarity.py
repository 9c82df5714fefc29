"""Similarity search over an embedding column (array<float>).

Two paths, same result contract (vec_id + rounded cosine score):
- ``cosine_topk``: brute-force scan — the exact baseline. One pass over
  the table, a 1-row broadcast of the query vector, TakeOrdered top-k.
  At 100 TB this is the "small query set × full scan" pattern — linear,
  no shuffle beyond the final top-k.
- ``cosine_topk_lsh``: sign-LSH bucketed variant — the scale path. Each
  vector gets a b-bit bucket from the signs of its leading components;
  the query probes only its own bucket (candidates shrink ~2^b) before
  exact re-scoring. Recall trades off with b; re-rank is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.trino import trino_round
from .dedup import cosine


def sign_lsh_bucket(vec: Column, bits: int = 8) -> Column:
    """Bucket id from the sign bits of the first ``bits`` components."""
    return sum(
        F.when(F.element_at(vec, i + 1) > 0, F.lit(2**i)).otherwise(0)
        for i in range(bits)
    ).cast("long")


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine against a 1-row query DataFrame
    (column ``qv``). Deterministic tiebreak on id."""
    scored = (
        df.join(F.broadcast(query))
        .withColumn("score", trino_round(cosine(F.col(vec_col), F.col("qv")), 6))
        .select(id_col, "score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def cosine_topk_lsh(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket, then
    exact cosine re-scoring inside it."""
    bucketed = df.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), bits))
    q = query.withColumn("qbucket", sign_lsh_bucket(F.col("qv"), bits))
    scored = (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .withColumn("score", trino_round(cosine(F.col(vec_col), F.col("qv")), 6))
        .select(id_col, "score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
