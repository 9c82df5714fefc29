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
from .dedup import dot_product, vec_norms


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
    (column ``qv``). Deterministic tiebreak on id. Row norms are computed
    once per row and the query norm once (inside the broadcast), so the
    scan pays one zip_with fold per row."""
    base = vec_norms(df, vec_col, [id_col])
    q = vec_norms(query, "qv", []).select(
        F.col("v").alias("qv_d"), F.col("nrm").alias("qnrm")
    )
    cos = F.col("dot") / (F.sqrt("nrm") * F.sqrt("qnrm"))
    scored = (
        base.join(F.broadcast(q))
        .withColumn("dot", dot_product(F.col("v"), F.col("qv_d")))
        .select(id_col, trino_round(cos, 6).alias("score"))
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
    base = vec_norms(df, vec_col, [id_col]).withColumn(
        "bucket", sign_lsh_bucket(F.col("v"), bits)
    )
    q = (
        vec_norms(query, "qv", [])
        .select(F.col("v").alias("qv_d"), F.col("nrm").alias("qnrm"))
        .withColumn("qbucket", sign_lsh_bucket(F.col("qv_d"), bits))
    )
    cos = F.col("dot") / (F.sqrt("nrm") * F.sqrt("qnrm"))
    scored = (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .withColumn("dot", dot_product(F.col("v"), F.col("qv_d")))
        .select(id_col, trino_round(cos, 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def cosine_topk_ivf(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions vectors into cells; the query probes only its ``n_probe``
    nearest cells, then exact cosine re-scores the candidates.

    The index build is MLlib KMeans (seeded — the engine's iterative-
    algorithm path); at scale the assignment column is materialized once
    per corpus and reused across queries, so each query reads ~n_probe/
    n_cells of the data with exact re-ranking — the standard IVF-Flat
    recall/cost trade. Probe-cell selection collects only the centroid
    list (n_cells small vectors) to the driver, mirroring the reference's
    scalar-watermark-sized collects; the corpus never leaves executors.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = vec_norms(df, vec_col, [id_col]).withColumn(
        "features", array_to_vector(F.col("v"))
    )
    model = KMeans(
        k=n_cells, seed=42, featuresCol="features", predictionCol="cell"
    ).fit(base)
    assigned = model.transform(base).select(id_col, "v", "nrm", "cell")

    qrow = vec_norms(query, "qv", []).select(
        F.col("v").alias("qv_d"), F.col("nrm").alias("qnrm")
    )
    qv, qnrm = qrow.first()
    centers = np.array([c for c in model.clusterCenters()])
    qarr = np.array(qv)
    probe_cells = [
        int(i)
        for i in np.argsort(((centers - qarr) ** 2).sum(axis=1))[:n_probe]
    ]

    cos = F.col("dot") / (F.sqrt("nrm") * F.lit(float(qnrm) ** 0.5))
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .withColumn(
            "dot",
            dot_product(F.col("v"), F.array(*[F.lit(float(x)) for x in qarr])),
        )
        .select(id_col, trino_round(cos, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
