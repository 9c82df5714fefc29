"""Similarity search and embedding analytics over array<float> columns.

Search paths, one result contract (vec_id + rounded cosine score):
- ``cosine_topk`` / ``cosine_topk_batch``: brute-force scan — the exact
  baseline. One pass, broadcast queries, TakeOrdered / per-qid top-k.
- ``cosine_topk_lsh``: sign-LSH bucketed variant — probe only the
  query's 2^b-pruned bucket, exact re-score inside.
- ``build_ivf_index`` + ``ivf_probe``(+``_batch``): IVF-Flat split into
  offline build and online probe (n_probe/n_cells of the corpus per
  query); persists as snapshot tables (``save/load_ivf_index``).
- ``quantize_int8`` + ``int8_topk``: 4x-compressed serving with exact
  integer accumulation.
- ``pq_train_encode`` + ``pq_adc_topk``(+``_batch``): product
  quantization — 32-64x code compression, zero-shuffle ADC lookup
  serving; persists via ``save/load_pq_index``.
- Quality dials measured in-engine: ``similarity_ivf_recall`` /
  ``similarity_pq_recall`` harness queries (recall@10 vs brute force).

Training-data utilities on the same column type: ``kmeans_semdedup``
(SemDeDup), ``hard_negatives`` (contrastive mining), ``centroid_drift``
(per-group drift audit), PCA / random projection / covariance, RRF
fusion. Every float reduction is either sequential-fold or
decimal-fenced so results are bit-reproducible across engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.trino import trino_round
from .dedup import dot_product, vec_norms
from .hashing import md5_long


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


@dataclass
class IvfIndex:
    """A built IVF-Flat index: the cell-assigned corpus plus the (tiny)
    centroid table. Build once per corpus (in production: write
    ``assigned`` to a table partitioned/bucketed by ``cell``), probe many
    times — probes read ~n_probe/n_cells of the data."""

    assigned: DataFrame  # (id_col, v, nrm, cell)
    centroids: DataFrame  # (cell, cv, cnrm) — n_cells rows
    id_col: str
    n_cells: int


def build_ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "hash",
    materialize: bool = True,
) -> IvfIndex:
    """Build the IVF coarse quantizer + cell assignment (the offline half
    of IVF-Flat, split from the probe so queries never pay it).

    ``method="hash"`` (default): centroids are the ``n_cells`` corpus
    vectors with the smallest salted key hash — a deterministic sample,
    reproducible in any engine (so the oracle can re-derive it in SQL).
    Assignment is then a pure zero-shuffle projection: per row, an array
    of ``n_cells`` cosine scores against literal centroids, argmax via
    array_position (first-max -> lowest cell wins ties). Only the
    n_cells centroid rows ever reach the driver.

    ``method="kmeans"``: MLlib KMeans (seeded) — better-shaped cells,
    engine-specific assignment (rows-only checkable), iterative cost at
    build time.

    ``materialize`` localCheckpoints the assignment (the "write the index
    once" step); pass False to keep the plan lazy.
    """
    import math

    base = vec_norms(df, vec_col, [id_col])
    if method == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = base.withColumn("features", array_to_vector(F.col("v")))
        model = KMeans(
            k=n_cells, seed=42, featuresCol="features", predictionCol="cell"
        ).fit(feat)
        assigned = model.transform(feat).select(id_col, "v", "nrm", "cell")
        centroid_rows = [
            (i, [float(x) for x in c], float(sum(x * x for x in c)))
            for i, c in enumerate(model.clusterCenters())
        ]
    elif method == "hash":
        salted = F.concat(F.col(id_col).cast("string"), F.lit("|ivf"))
        seeds = (
            base.select(F.col(id_col), "v", "nrm", md5_long(salted).alias("_hr"))
            .orderBy("_hr", id_col)  # TakeOrdered top-n_cells: no full sort
            .limit(n_cells)
            .collect()
        )
        centroid_rows = [
            (cell, list(r["v"]), float(r["nrm"])) for cell, r in enumerate(seeds)
        ]
        # Zero-shuffle assignment: materialize the score array in its own
        # projection (CollapseProject fences the n_cells dot-product folds
        # from being re-inlined per consumer), then first-index-of-max.
        # Scores come from ONE HOF expression over nested-array literals
        # (the PQ trainer's measured Py4J/codegen fix); the zip_with fold
        # computes the identical doubles as the expanded lambda dots.
        cents_lit = F.lit([cv for _, cv, _ in centroid_rows])
        csq_lit = F.lit([math.sqrt(cnrm) for _, _, cnrm in centroid_rows])
        scores = F.zip_with(
            cents_lit,
            csq_lit,
            lambda c, n: F.aggregate(
                F.zip_with(F.col("v"), c, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.sqrt("nrm") * n),
        )
        assigned = base.select(F.col(id_col), "v", "nrm", scores.alias("_cs")).select(
            F.col(id_col),
            "v",
            "nrm",
            (F.array_position(F.col("_cs"), F.array_max(F.col("_cs"))) - 1)
            .cast("int")
            .alias("cell"),
        )
    else:
        raise ValueError(f"method must be 'hash' or 'kmeans', got {method!r}")

    if materialize:
        assigned = assigned.localCheckpoint()
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        centroid_rows, "cell int, cv array<double>, cnrm double"
    )
    return IvfIndex(assigned=assigned, centroids=centroids, id_col=id_col, n_cells=n_cells)


def ivf_probe(
    index: IvfIndex,
    query: DataFrame,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """The online half of IVF-Flat: rank centroids by cosine to the query
    (n_cells rows — negligible), probe the best ``n_probe`` cells via a
    broadcast semi-join on the assignment, exact cosine re-rank inside.
    One lazy plan, no driver collect; candidate volume is
    ~n_probe/n_cells of the corpus."""
    q = vec_norms(query, "qv", []).select(
        F.col("v").alias("qv_d"), F.col("nrm").alias("qnrm")
    )
    probe_cells = (
        index.centroids.join(F.broadcast(q))
        .withColumn("_cscore", dot_product(F.col("cv"), F.col("qv_d")))
        .select(
            "cell", (F.col("_cscore") / (F.sqrt("cnrm") * F.sqrt("qnrm"))).alias("cscore")
        )
        .orderBy(F.desc("cscore"), F.asc("cell"))
        .limit(n_probe)
        .select("cell")
    )
    cos = F.col("dot") / (F.sqrt("nrm") * F.sqrt("qnrm"))
    return (
        index.assigned.join(F.broadcast(probe_cells), "cell")
        .join(F.broadcast(q))
        .withColumn("dot", dot_product(F.col("v"), F.col("qv_d")))
        .select(index.id_col, trino_round(cos, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(index.id_col))
        .limit(k)
    )


def cosine_topk_ivf(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "hash",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: build + probe in one call —
    convenience form; incremental/repeated querying should call
    ``build_ivf_index`` once and ``ivf_probe`` per query."""
    index = build_ivf_index(
        df, n_cells=n_cells, vec_col=vec_col, id_col=id_col, method=method,
        materialize=False,
    )
    return ivf_probe(index, query, k=k, n_probe=n_probe)


def cosine_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """Exact top-k per query for a *batch* of query vectors — the shape
    real ANN workloads take (dedup a candidate set, retrieve neighbors
    for a training batch).

    The query batch is broadcast (B rows, B small); every corpus row is
    scored against all B queries in one pass, then ranked per query with
    a window. The ranking shuffle carries (qid, id, score) triples —
    B×N slim rows. That is the honest brute-force cost; when B×N makes
    it the bottleneck, route through ``ivf_probe_batch`` (candidates
    shrink ~n_probe/n_cells before any shuffle)."""
    from pyspark.sql import Window

    base = vec_norms(df, vec_col, [id_col])
    q = vec_norms(queries, qvec_col, [qid_col]).select(
        qid_col, F.col("v").alias("qv_d"), F.col("nrm").alias("qnrm")
    )
    cos = F.col("dot") / (F.sqrt("nrm") * F.sqrt("qnrm"))
    scored = (
        base.join(F.broadcast(q))
        .withColumn("dot", dot_product(F.col("v"), F.col("qv_d")))
        .select(qid_col, id_col, trino_round(cos, 6).alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_probe_batch(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    qid_col: str = "qid",
    qvec_col: str = "qv",
    max_queries: int = 100_000,
) -> DataFrame:
    """Batch IVF probe: per query, rank centroids, keep the best
    ``n_probe`` cells, join the (qid, cell) probe list to the assignment
    on cell, exact re-rank per qid. Candidate volume per query is
    ~n_probe/n_cells of the corpus, so the ranking shuffle is
    B×N×(n_probe/n_cells) slim rows — the scale path for batch ANN.
    The query frame is force-broadcast, so it must stay bounded:
    frames past ``max_queries`` raise (guarded, not assumed)."""
    from pyspark.sql import Window

    # Guard + fence in ONE pass (r19): the bounded-batch probe used to
    # be a standalone limit+count job, after which the query subtree
    # was STILL re-executed once per broadcast build (twice here).
    # Checkpointing the capped frame makes the guard's scan the only
    # evaluation; the count and both broadcasts read the materialized
    # ≤(max_queries+1)-row artifact. limit(max+1) is the identity on
    # any batch that passes the guard, so values are unchanged; the
    # checkpoint is bounded by the same contract that lets the operator
    # force-broadcast q below.
    capped = queries.limit(max_queries + 1).localCheckpoint()
    if capped.count() > max_queries:
        raise ValueError(
            f"ivf_probe_batch saw more than max_queries={max_queries} "
            "query rows — the query batch is materialized driver-side / "
            "broadcast and is meant for training-batch cardinalities; "
            "chunk the query frame or raise max_queries explicitly"
        )
    queries = capped

    q = vec_norms(queries, qvec_col, [qid_col]).select(
        qid_col, F.col("v").alias("qv_d"), F.col("nrm").alias("qnrm")
    )
    cw = Window.partitionBy(qid_col).orderBy(F.desc("cscore"), F.asc("cell"))
    probe_cells = (
        index.centroids.join(F.broadcast(q))
        .withColumn("_cdot", dot_product(F.col("cv"), F.col("qv_d")))
        .select(
            qid_col,
            "cell",
            (F.col("_cdot") / (F.sqrt("cnrm") * F.sqrt("qnrm"))).alias("cscore"),
        )
        .withColumn("_crk", F.row_number().over(cw))
        .filter(F.col("_crk") <= n_probe)
        .select(qid_col, "cell")
    )
    cos = F.col("dot") / (F.sqrt("nrm") * F.sqrt("qnrm"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(index.id_col))
    return (
        index.assigned.join(F.broadcast(probe_cells), "cell")
        .join(F.broadcast(q.withColumnRenamed(qid_col, "_q2")),
              F.col(qid_col) == F.col("_q2"))
        .withColumn("dot", dot_product(F.col("v"), F.col("qv_d")))
        .select(qid_col, index.id_col, trino_round(cos, 6).alias("score"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


# ---------------------------------------------------------------------------
# Int8 scalar quantization — the memory/bandwidth scale dial for ANN
# ---------------------------------------------------------------------------


def _half_away(x: Column) -> Column:
    """Sign-aware round-half-away-from-zero on doubles (the convention
    this repo standardizes on for cross-engine reproducibility — see
    functions/trino.py notes on pandas/DuckDB tie behavior)."""
    return F.when(x >= 0, F.floor(x + F.lit(0.5))).otherwise(
        -F.floor(-x + F.lit(0.5))
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Row-local symmetric int8 quantization of an embedding column.

    Per vector: ``scale = max|v| / 127``, ``q_i = round(v_i / scale)``
    (half away from zero), so values land in [-127, 127] and the vector
    shrinks 4x (float32 -> int8) — the standard first compression step
    for billion-vector ANN serving. Everything is row-local arithmetic:
    no shuffle, no state, fuses into the scan. All math runs in double
    (float32 widening is exact), so results are bit-reproducible across
    engines; an all-zero vector quantizes to zeros with scale 0.

    Output: ``id_col, scale, q_int8 (array<int>), max_abs_err`` — the
    reconstruction-error column makes quantization loss observable.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = (amax / F.lit(127.0)).alias("scale")
    staged = df.select(F.col(id_col), v.alias("_v"), scale)
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("_v"), lambda x: _half_away(x / F.col("scale")).cast("int")
        ),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0)))
    with_q = staged.withColumn("q_int8", q)
    err = F.array_max(
        F.zip_with(
            F.col("q_int8"),
            F.col("_v"),
            lambda a, b: F.abs(a.cast("double") * F.col("scale") - b),
        )
    )
    return with_q.select(id_col, "scale", "q_int8", err.alias("max_abs_err"))


def int8_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """Approximate dot-product top-k over int8-quantized vectors.

    Both sides quantize row-locally; the accumulation is an INTEGER dot
    product (exact, order-independent — no float-summation drift), then
    one double multiply by the two scales recovers the approximate
    score: ``score ~= (sq * sd) * sum(qq_i * qd_i)``. This is the
    serving shape: int8 SIMD dot products over 4x-smaller vectors, with
    the fp reconstruction only on the scalar result. Broadcast 1-row
    query, linear scan, TakeOrdered top-k — same plan as the exact
    brute force, cheaper arithmetic.
    """
    qd = quantize_int8(query.select(F.col(qvec_col).alias("embedding")
                                    ).withColumn("_qid", F.lit(0)),
                       vec_col="embedding", id_col="_qid").select(
        F.col("scale").alias("qscale"), F.col("q_int8").alias("qq")
    )
    dd = quantize_int8(df, vec_col=vec_col, id_col=id_col)
    idot = F.aggregate(
        F.zip_with(F.col("q_int8"), F.col("qq"), lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = F.col("scale") * F.col("qscale") * idot.cast("double")
    return (
        dd.join(F.broadcast(qd))
        .select(id_col, trino_round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def dimension_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Exact d x d covariance matrix of an embedding column — the
    feature-decorrelation / whitening / drift-monitoring statistics pass
    (the input to PCA whitening) over ``array<float>``.

    Shape: each row builds its flattened outer product (d^2 doubles,
    row-local higher-order functions), which posexplode turns into
    (i, j, x_i*x_j) triples for ONE map-side-combined d^2-cell reduce;
    the per-dimension marginals come from a separate d-key reduce over
    the (cheap) second scan and broadcast-join back onto the grid —
    keeping the heavy n*d^2 stream down to a single decimal sum per
    triple. Shuffle volume is O(tasks * d^2) partial aggregates —
    independent of row count — and the result is d^2 scalars, never a
    driver-side matrix materialization until the caller collects it.
    Accumulation is decimal (exact, order-independent across
    partitions/engines); the final ``cov = E[xy] - E[x]E[y]`` arithmetic
    happens in double on those exact sums, so results are
    bit-reproducible.

    Output: ``dim_i, dim_j, n, cov`` (0-based dims, full symmetric grid).
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    outer = F.flatten(
        F.transform(F.col("_e"), lambda x: F.transform(F.col("_e"), lambda y: x * y))
    )
    staged = df.select(e.alias("_e")).select(
        F.size("_e").alias("_d"), outer.alias("_o")
    )
    trip = staged.select(
        F.col("_d"), F.posexplode("_o").alias("_pos", "_p")
    ).select(
        F.floor(F.col("_pos") / F.col("_d")).cast("int").alias("dim_i"),
        (F.col("_pos") % F.col("_d")).cast("int").alias("dim_j"),
        F.col("_p"),
    )
    pairs = trip.groupBy("dim_i", "dim_j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_p").cast("decimal(38,12)")).alias("_sp"),
    )
    dims = (
        df.select(e.alias("_e"))
        .select(F.posexplode("_e").alias("dim", "_x"))
        .groupBy("dim")
        .agg(F.sum(F.col("_x").cast("decimal(38,12)")).alias("_s"))
    )
    joined = pairs.join(
        F.broadcast(dims.select(F.col("dim").alias("dim_i"), F.col("_s").alias("_si"))),
        on="dim_i",
    ).join(
        F.broadcast(dims.select(F.col("dim").alias("dim_j"), F.col("_s").alias("_sj"))),
        on="dim_j",
    )
    n = F.col("n").cast("double")
    cov = (
        F.col("_sp").cast("double") / n
        - (F.col("_si").cast("double") / n) * (F.col("_sj").cast("double") / n)
    )
    return joined.select(
        "dim_i", "dim_j", "n", F.round(cov, 9).alias("cov")
    )


def dimension_covariance_fast(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """BLAS-speed covariance twin of :func:`dimension_covariance` — the
    100 TB fast path. Each Arrow batch computes its partial moment
    matrix with one ``X.T @ X`` (vectorized, cache-friendly — orders of
    magnitude faster per element than an exploded d^2 row stream), and
    emits d^2 partial rows (sum_xy, sum_x, sum_y, n); a single tiny
    aggregation over ``batches x d^2`` partials finishes the job.

    Float64 accumulation is not bit-identical to the exact decimal path
    (summation order varies with partitioning), but agrees to ~1e-9 for
    any sane embedding scale — use the exact twin when cross-engine
    hash-parity matters, this one when the corpus is large.
    """
    import pandas as pd  # noqa: F401 (schema side)

    def _partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = X.shape[1]
            m = X.T @ X
            s = X.sum(axis=0)
            i = np.repeat(np.arange(d, dtype=np.int32), d)
            j = np.tile(np.arange(d, dtype=np.int32), d)
            yield pd.DataFrame(
                {
                    "dim_i": i,
                    "dim_j": j,
                    "_sp": m.ravel(),
                    "_si": s[i],
                    "_sj": s[j],
                    "_n": np.full(d * d, len(pdf), dtype=np.int64),
                }
            )

    parts = df.select(vec_col).mapInPandas(
        _partials,
        "dim_i int, dim_j int, _sp double, _si double, _sj double, _n long",
    )
    agg = parts.groupBy("dim_i", "dim_j").agg(
        F.sum("_n").alias("n"),
        F.sum("_sp").alias("_sp"),
        F.sum("_si").alias("_si"),
        F.sum("_sj").alias("_sj"),
    )
    n = F.col("n").cast("double")
    cov = F.col("_sp") / n - (F.col("_si") / n) * (F.col("_sj") / n)
    return agg.select("dim_i", "dim_j", "n", cov.alias("cov"))


def _rp_signs(out_dim: int, in_dim: int, seed: str = "rp") -> list[list[int]]:
    """Deterministic ±1 Achlioptas/JL projection matrix from md5 parity.

    Data-independent, so it is generated ONCE driver-side (hashlib) and
    shipped as literals — no per-element hashing in the query plan, and
    the oracle SQL can embed the exact same constants.
    """
    import hashlib

    def sign(j: int, i: int) -> int:
        h = hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()
        return 1 if int(h[:15], 16) % 2 == 0 else -1

    return [[sign(j, i) for i in range(in_dim)] for j in range(out_dim)]


def random_projection(
    df: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection to ``out_dim`` wide
    columns ``p0..p{out_dim-1}`` — the dimensionality-reduction front
    end for ANN indexing / clustering at 100 TB (distances are preserved
    within (1±eps) while the per-vector footprint shrinks 8x here).

    Entirely row-local Catalyst: for each output dim a zip_with of the
    vector against a LITERAL ±1 row, each signed term floor-quantized at
    2^40 fixed point (power-of-two scaling is FP-exact, so every engine
    floors the same true value), then an exact integer fold (associative
    — partition- and engine-order-proof) scaled back by 1/sqrt(out_dim).
    No shuffle at all — it fuses into whatever scan feeds it.
    """
    signs = _rp_signs(out_dim, in_dim)
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = 1.0 / (float(out_dim) ** 0.5)
    # 2^40 fixed-point: float->double is exact, the ±1 flip is exact, and
    # a power-of-two scale shifts the exponent with ZERO FP error, so
    # floor() sees the exact product in every engine (decimal casts and
    # round() helpers both proved engine-divergent at the 8th decimal).
    # Totals stay under 2^48 — exactly representable back in double.
    fp = 2.0**40

    def proj(j: int) -> Column:
        srow = F.array(*[F.lit(s) for s in signs[j]])
        terms = F.zip_with(
            F.col("_e"),
            srow,
            lambda x, s: F.floor(x * s.cast("double") * F.lit(fp)),
        )
        total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)
        return ((total.cast("double") / F.lit(fp)) * F.lit(scale)).alias(f"p{j}")

    return df.select(F.col(id_col), e.alias("_e")).select(
        id_col, *[proj(j) for j in range(out_dim)]
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "vec_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of candidate lists from heterogeneous
    retrievers (e.g. BM25 lexical + embedding cosine): standard hybrid
    search. ``score(d) = sum over lists of 1/(c + rank_l(d))``, absent
    docs contribute 0 (fusion over the RETRIEVED lists, the serving
    pattern — no global ranking of the full corpus).

    Each input must carry ``(id_col, rank)`` with rank 1-based. Inputs
    are candidate-sized (top-N per retriever), so the outer joins are
    broadcast-small regardless of corpus size. The reciprocal terms are
    summed in fixed list order, rounded to 6 — deterministic; ties break
    on id.
    """
    fused = None
    for li, r in enumerate(ranked_lists):
        cur = r.select(F.col(id_col), F.col("rank").alias(f"_r{li}"))
        fused = cur if fused is None else fused.join(cur, id_col, "full_outer")
    score = None
    for li in range(len(ranked_lists)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col(f"_r{li}")).cast("double"), F.lit(0.0)
        )
        score = term if score is None else score + term
    out = fused.select(
        id_col,
        *[F.col(f"_r{li}").alias(f"rank_{li}") for li in range(len(ranked_lists))],
        trino_round(score, 6).alias("rrf"),
    )
    return out.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)


def pca_components(
    df: DataFrame, vec_col: str = "embedding", n_components: int = 8
) -> tuple[list[list[float]], list[float], list[float]]:
    """Principal components from the exact distributed covariance.

    The heavy pass is :func:`dimension_covariance` (shuffle volume
    O(tasks * d^2), independent of row count); only the d x d covariance
    grid — a few KB for any real embedding width — ever reaches the
    driver, where numpy's symmetric eigensolver factors it. Returns
    (components [n_components x d, descending eigenvalue order],
    eigenvalues, dimension means) for :func:`pca_project` to broadcast.
    """
    import numpy as np

    grid = dimension_covariance(df, vec_col)
    rows = grid.collect()  # O(d^2) scalars — bounded by design
    d = max(r["dim_i"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["dim_i"], r["dim_j"]] = r["cov"]
    means_df = (
        df.select(F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.avg("x").alias("mu"))
        .collect()
    )
    mu = np.zeros(d)
    for r in means_df:
        mu[r["dim"]] = r["mu"]
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T  # n_components x d
    return comps.tolist(), w[order].tolist(), mu.tolist()


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    means: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project vectors onto precomputed principal components (centered).

    The components ride into the plan as literal arrays (driver-built,
    broadcast by Catalyst constant-folding) — the projection itself is a
    row-local zip_with fold per output dim, shuffle-free, fusing into
    the scan like :func:`random_projection`.
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mu = F.array(*[F.lit(float(m)) for m in means])
    centered = F.zip_with(F.col("_e"), mu, lambda x, m: x - m)

    def proj(j: int) -> Column:
        crow = F.array(*[F.lit(float(c)) for c in components[j]])
        return F.aggregate(
            F.zip_with(F.col("_c"), crow, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias(f"pc{j}")

    return (
        df.select(F.col(id_col), e.alias("_e"))
        .select(id_col, centered.alias("_c"))
        .select(id_col, *[proj(j) for j in range(len(components))])
    )


def save_ivf_index(index: IvfIndex, path: str) -> tuple[int, int]:
    """Persist the IVF index AS LAKEHOUSE TABLES: ``<path>/assigned``
    (cell, id, vector, norm) and ``<path>/centroids`` become snapshot
    tables, so an index rebuild is an atomic commit (readers keep the
    old version mid-rebuild), history/rollback/time travel apply to the
    index like any table, and probes can pin a version for
    reproducible retrieval. Returns the committed (assigned_version,
    centroids_version)."""
    import os

    from ..sources import snapshots as snap

    def _put(df: DataFrame, p: str) -> int:
        cur = snap.current_version(p)
        if cur is None:
            return snap.create_table(df, p)
        files, stats = snap._write_data_files(df, p)
        return snap._commit(
            p, files, "rebuild", parent=cur,
            schema_json=df.schema.json(), new_stats=stats,
        )

    va = _put(index.assigned, os.path.join(path, "assigned"))
    vc = _put(index.centroids, os.path.join(path, "centroids"))
    return va, vc


def load_ivf_index(
    spark,
    path: str,
    id_col: str = "vec_id",
    version: tuple[int, int] | None = None,
) -> IvfIndex:
    """Open a persisted IVF index (optionally pinned to the
    ``(assigned_version, centroids_version)`` pair returned by
    :func:`save_ivf_index` — time-travel retrieval). The probe path is
    unchanged: the loaded assignment is just a snapshot-table scan."""
    import os

    from ..sources import snapshots as snap

    va, vc = version if version is not None else (None, None)
    assigned = snap.read_table(spark, os.path.join(path, "assigned"), va)
    centroids = snap.read_table(spark, os.path.join(path, "centroids"), vc)
    n_cells = centroids.count()
    return IvfIndex(
        assigned=assigned, centroids=centroids, id_col=id_col, n_cells=n_cells
    )


def kmeans_semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = None,
    iters: int = 2,
    tau: float = 0.9,
    seed: str = "km",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): k-means-cluster the embedding
    space, then flag semantic near-duplicates only WITHIN a cluster —
    the pairwise cosine work shrinks from O(n^2) to O(sum of cluster
    sizes squared), and clusters shard independently across executors.

    Deterministic distributed Lloyd's, engine-reproducible by design:

    - init: cell = salted-md5(id) mod k — a pure projection any engine
      can re-derive (no random seeds, no data-order dependence).
    - each iteration: centroids = per-(cell, dim) means over DECIMAL
      (38,12)-fenced sums (exact, associative, partition-order-free),
      converted to double only once summed; reassignment is a
      zero-shuffle projection scoring each row against the k literal
      centroid vectors (cosine, sequential fold), argmax via first-max
      -> lowest cell wins float ties. Only k*d mean scalars ever reach
      the driver (bounded metadata, SCALE.md invariant), and a cell
      that loses all members simply drops out of the scored set — both
      engines score only the cells present.
    - dedup: within each final cluster, a row is a duplicate iff some
      LOWER-id row in the same cluster has cosine >= ``tau`` (keep-first
      semantics; the survivor set is id-deterministic).

    Output: one row per vector — ``vec_id, cluster, is_dup``.
    """
    import math

    from .fencing import fence_if_small

    base = fence_if_small(vec_norms(df, vec_col, [id_col]))
    if k is None:
        # Within-cluster pairwise cost is O(n^2/k): k must grow with the
        # corpus or the quadratic term re-emerges at scale. sqrt(n) keeps
        # expected per-cluster pair work linear in n (SemDeDup paper uses
        # fixed large k for fixed corpus sizes); capped so the broadcast
        # centroid literal list (k*d scalars) stays driver-trivial. One
        # count() on the checkpointed base - no extra scan of the source.
        k = max(2, min(int(math.isqrt(base.count())), 16_384))
    salted = F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))
    assigned = base.select(
        id_col, "v", "nrm", (md5_long(salted) % k).cast("int").alias("cell")
    )
    for _ in range(iters):
        stats = (
            assigned.select("cell", F.posexplode("v").alias("dim", "_x"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(F.col("_x").cast("decimal(38,12)")).alias("_s"),
                F.count(F.lit(1)).alias("_c"),
            )
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["_s"]) / r["_c"]
        centroid_rows = []
        for cell in sorted(by_cell):
            means = by_cell[cell]
            cv = [means[d] for d in sorted(means)]
            cnrm = 0.0
            for x in cv:
                cnrm = cnrm + x * x
            centroid_rows.append((cell, cv, cnrm))
        # One tiny HOF expression over nested-array literals instead of
        # k expanded lambda dot products (the PQ trainer's measured
        # Py4J/codegen fix); the zip_with fold computes the identical
        # doubles — aggregate from 0.0 == the expanded sequential sum,
        # and sqrt(cnrm) stays a driver-side scalar exactly as before.
        cents_lit = F.lit([cv for _, cv, _ in centroid_rows])
        csq_lit = F.lit([math.sqrt(cnrm) for _, _, cnrm in centroid_rows])
        cells_lit = F.lit([cell for cell, _, _ in centroid_rows])
        scores = F.zip_with(
            cents_lit,
            csq_lit,
            lambda c, n: F.try_divide(
                F.aggregate(
                    F.zip_with(F.col("v"), c, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                F.sqrt("nrm") * n,
            ),
        )
        # Zero-norm vectors (or an all-zero centroid) make the cosine
        # denominator 0 — try_divide scores them NULL instead of the
        # ANSI divide-by-zero error. array_position then returns 0 and
        # element_at(…, 0) would raise (ADVICE r10 #4), so route them to
        # the first surviving cell deterministically; the dup join's
        # cosine against them is NULL downstream (try-guarded below), so
        # they can never be flagged dup.
        _pos = F.array_position(F.col("_cs"), F.array_max("_cs")).cast("int")
        assigned = base.select(
            F.col(id_col), "v", "nrm", scores.alias("_cs")
        ).select(
            F.col(id_col),
            "v",
            "nrm",
            F.when(
                (F.col("nrm") > 0) & (_pos > 0), F.element_at(cells_lit, _pos)
            )
            .otherwise(F.element_at(cells_lit, F.lit(1)))
            .alias("cell"),
        )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dup_ids = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
            & (
                F.try_divide(
                    dot_product(F.col("a.v"), F.col("b.v")),
                    F.sqrt(F.col("a.nrm")) * F.sqrt(F.col("b.nrm")),
                )
                >= tau
            ),
        )
        .select(F.col(f"a.{id_col}"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(dup_ids, id_col, "left")
        .select(
            id_col,
            F.col("cell").alias("cluster"),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )


@dataclass
class PqCodebook:
    """Trained product-quantization codebooks.

    ``cents[sub]`` is the ordered list of surviving centroids for
    subspace ``sub``: ``(cell, centroid_vector, squared_norm)`` tuples
    sorted by cell id. ``m * k * (dims/m) = k * dims`` scalars total —
    bounded metadata regardless of corpus size (SCALE.md invariant).
    """

    m: int
    k: int
    dims: int
    cents: dict[int, list[tuple[int, list[float], float]]]


def pq_train_encode(
    df: DataFrame,
    dims: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    seed: str = "pq",
) -> tuple[DataFrame, PqCodebook]:
    """Product quantization (Jegou et al. 2011, public): split each
    vector into ``m`` subspaces of ``dims/m`` dims and k-means-quantize
    every subspace independently — the corpus compresses to ``m`` small
    codes per vector (m=8, k=16 turns a 256-byte float64[32] payload
    into 8 nibbles, a 32-64x shrink), which is what lets a 100 TB
    embedding corpus be scanned from memory-resident codes.

    Training is the same deterministic distributed Lloyd's as
    ``kmeans_semdedup`` (salted-md5 init, DECIMAL(38,12)-fenced
    centroid means, literal-centroid scoring), run on all ``m``
    subspaces IN ONE exploded frame: one shuffle per iteration
    regardless of m, and only ``k * dims`` mean scalars ever reach the
    driver. Reassignment maximizes ``dot(x, c) - 0.5*||c||^2``
    (equivalent to L2 argmin; ties break to the lowest cell), scoring
    only cells that still have members — engine-reproducible, so a SQL
    twin can unroll it.

    Returns ``(codes, codebook)``: codes is one row per
    ``(id, sub, cell)`` w.r.t. the final-iteration centroids.
    """
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m

    from .fencing import fence_if_small

    base = fence_if_small(vec_norms(df, vec_col, [id_col]))
    pairs = F.array(
        *[
            F.struct(
                F.lit(sub).alias("sub"),
                F.slice("v", sub * dsub + 1, dsub).alias("sv"),
            )
            for sub in range(m)
        ]
    )
    p = base.select(id_col, F.inline(pairs))
    salted = F.concat(
        F.col(id_col).cast("string"),
        F.lit("|"),
        F.col("sub").cast("string"),
        F.lit(f"|{seed}"),
    )
    assigned = p.withColumn("cell", (md5_long(salted) % k).cast("int"))
    cents: dict[int, list[tuple[int, list[float], float]]] = {}
    for _ in range(iters):
        stats = (
            assigned.select("sub", "cell", F.posexplode("sv").alias("dim", "_x"))
            .groupBy("sub", "cell", "dim")
            .agg(
                F.sum(F.col("_x").cast("decimal(38,12)")).alias("_s"),
                F.count(F.lit(1)).alias("_c"),
            )
            .collect()
        )
        by_sub: dict[int, dict[int, dict[int, float]]] = {}
        for r in stats:
            by_sub.setdefault(r["sub"], {}).setdefault(r["cell"], {})[
                r["dim"]
            ] = float(r["_s"]) / r["_c"]
        cents = {}
        for sub in sorted(by_sub):
            rows = []
            for cell in sorted(by_sub[sub]):
                means = by_sub[sub][cell]
                cv = [means[d] for d in sorted(means)]
                cnrm = 0.0
                for x in cv:
                    cnrm = cnrm + x * x
                rows.append((cell, cv, cnrm))
            cents[sub] = rows
        # Reassignment as ONE tiny higher-order-function expression over
        # nested-array literals (CENTS[sub][i][dim], CNRM[sub][i],
        # CELLS[sub][i] — ragged per sub, only surviving cells): the
        # per-(sub, cell) expanded expression tree costs seconds of
        # Py4J/codegen per iteration at m*k=128; this tree is O(1) and
        # computes the identical doubles (aggregate fold from 0.0 ==
        # the expanded left-chained sum, bit for bit).
        cents_lit = F.lit([[cv for _, cv, _ in cents[s]] for s in sorted(cents)])
        cnrm_lit = F.lit([[cn for _, _, cn in cents[s]] for s in sorted(cents)])
        cells_lit = F.lit([[c for c, _, _ in cents[s]] for s in sorted(cents)])
        sub1 = F.col("sub") + 1
        scores = F.zip_with(
            F.element_at(cents_lit, sub1),
            F.element_at(cnrm_lit, sub1),
            lambda c, n: F.aggregate(
                F.zip_with(F.col("sv"), c, lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            - F.lit(0.5) * n,
        )
        pick = F.element_at(
            F.element_at(cells_lit, sub1),
            F.array_position(scores, F.array_max(scores)).cast("int"),
        )
        assigned = p.withColumn("cell", pick.cast("int"))
    codes = assigned.select(id_col, "sub", "cell")
    return codes, PqCodebook(m=m, k=k, dims=dims, cents=cents)


def pq_adc_topk(
    codes: DataFrame,
    codebook: PqCodebook,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact, every corpus vector is represented by its m codes, and the
    score is a pure table lookup — ``sum_sub lut[sub][code]`` with
    ``lut[sub][cell] = dot(q_sub, centroid)`` precomputed once from the
    query (m*k scalars, driver-side; the query vector itself is 1-row
    bounded metadata).

    Cosine is approximated against the reconstruction norm
    ``sqrt(sum_sub ||centroid_code||^2)``. The serving plan is the
    whole point at scale: codes pivot to one array per vector (one
    build-time shuffle), then scoring is a ZERO-shuffle whole-stage
    projection over literal lookup arrays ending in TakeOrdered —
    no join, no exchange, per-row cost m lookups instead of a
    ``dims``-long float dot.
    """
    import math

    lut, cnr, qn = _pq_query_lut(codebook, query_vec)
    arr = pq_code_arrays(codes, id_col)

    adot = None
    rnrm = None
    for sub in range(codebook.m):
        code1 = F.element_at("_codes", sub + 1) + F.lit(1)
        t = F.element_at(F.array(*[F.lit(x) for x in lut[sub]]), code1)
        n = F.element_at(F.array(*[F.lit(x) for x in cnr[sub]]), code1)
        adot = t if adot is None else adot + t
        rnrm = n if rnrm is None else rnrm + n
    score = adot / (F.lit(math.sqrt(qn)) * F.sqrt(rnrm))
    return (
        arr.select(id_col, trino_round(score, 6).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def _pq_query_lut(
    codebook: PqCodebook, query_vec: list[float]
) -> tuple[list[list[float]], list[list[float]], float]:
    """Per-query ADC lookup tables: ``lut[sub][cell] = dot(q_sub, c)``
    and the matching centroid squared norms, k-slot lists per subspace
    (cells that lost all members keep a never-referenced 0.0 pad).
    Sequential Python folds so the doubles match the SQL twin."""
    m, dsub = codebook.m, codebook.dims // codebook.m
    qn = 0.0
    for x in query_vec:
        qn = qn + float(x) * float(x)
    lut: list[list[float]] = []
    cnr: list[list[float]] = []
    for sub in range(m):
        qsv = [float(x) for x in query_vec[sub * dsub : (sub + 1) * dsub]]
        lrow = [0.0] * codebook.k
        nrow = [0.0] * codebook.k
        for cell, cv, cn in codebook.cents.get(sub, []):
            s = 0.0
            for a, b in zip(qsv, cv):
                s = s + a * b
            lrow[cell] = s
            nrow[cell] = cn
        lut.append(lrow)
        cnr.append(nrow)
    return lut, cnr, qn


def pq_code_arrays(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Pivot exploded ``(id, sub, cell)`` codes to ONE row per vector
    with a sub-ordered code array — the stored-index layout ADC serving
    scans. One build-time shuffle; every query after that is
    shuffle-free."""
    return (
        codes.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cell"))).alias("_sc"))
        .select(id_col, F.transform("_sc", lambda s: s["cell"]).alias("_codes"))
    )


def pq_adc_topk_batch(
    codes: DataFrame,
    codebook: PqCodebook,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    max_queries: int = 10_000,
) -> DataFrame:
    """Batch ADC: precompute each query's lookup table driver-side (the
    query batch is bounded metadata — m*k scalars per query), broadcast
    the LUT table, and score EVERY query against the code scan in one
    pass: per (vector, query) cost is m array lookups, no join on data
    keys, one window shuffle on qid for the per-query top-k.

    The "bounded metadata" contract is ENFORCED, not assumed: the
    collect is limit-capped at ``max_queries + 1`` rows and raises
    cleanly past the cap instead of OOMing the driver.

    Output: ``qid, vec_id, score`` — k rows per query, ranked by
    (rounded score DESC, vec_id) like every other search path.
    """
    import math

    from pyspark.sql import Window

    m, kk = codebook.m, codebook.k
    qrows = (
        queries.select(qid_col, qvec_col).limit(max_queries + 1).collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_adc_topk_batch saw more than max_queries={max_queries} "
            "query rows — the per-query LUT precompute is driver-side "
            "and meant for training-batch cardinalities; chunk the "
            "query frame or raise max_queries explicitly"
        )
    data = []
    for r in qrows:
        lut, cnr, qn = _pq_query_lut(codebook, [float(x) for x in r[qvec_col]])
        flat_l = [x for row in lut for x in row]
        flat_n = [x for row in cnr for x in row]
        data.append((r[qid_col], flat_l, flat_n, math.sqrt(qn)))
    spark = codes.sparkSession
    # Derive the qid field type from the query frame so int/string ids
    # work, not just long (ADVICE r10 #2).
    qid_type = T.StructField(qid_col, queries.schema[qid_col].dataType, True)
    qlut_schema = T.StructType(
        [
            qid_type,
            T.StructField("_lut", T.ArrayType(T.DoubleType()), True),
            T.StructField("_cnr", T.ArrayType(T.DoubleType()), True),
            T.StructField("_qsn", T.DoubleType(), True),
        ]
    )
    qluts = spark.createDataFrame(data, qlut_schema)
    arr = pq_code_arrays(codes, id_col)
    j = arr.join(F.broadcast(qluts))
    adot = None
    rnrm = None
    for sub in range(m):
        slot = F.lit(sub * kk + 1) + F.element_at("_codes", sub + 1)
        t = F.element_at("_lut", slot)
        n = F.element_at("_cnr", slot)
        adot = t if adot is None else adot + t
        rnrm = n if rnrm is None else rnrm + n
    scored = j.select(
        qid_col,
        id_col,
        trino_round(adot / (F.col("_qsn") * F.sqrt(rnrm)), 6).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(qid_col, id_col, "score")
    )


def centroid_drift(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Embedding drift audit: pairwise cosine between per-group centroid
    vectors — the check that says whether two sources / shards / time
    slices live in the same region of embedding space before they are
    mixed into one training run.

    Fully distributed and collect-free: per-(group, dim) DECIMAL-fenced
    means (ONE data-sized partial-agg shuffle; everything after runs on
    groups x dims rows), then dot products and norms as decimal-fenced
    sums of mean products — deterministic regardless of partitioning,
    so a SQL twin reproduces it bit-for-bit. Output:
    ``label_a, label_b, centroid_cosine, n_a, n_b`` for group pairs
    with label_a < label_b.
    """
    x = df.select(
        F.col(group_col).alias("label"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda v: v.cast("double"))
        ).alias("dim", "v"),
    )
    c = x.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    nn = c.groupBy("label").agg(
        F.sum((F.col("mu") * F.col("mu")).cast("decimal(38,12)"))
        .cast("double")
        .alias("nrm")
    )
    a = c.select(F.col("label").alias("label_a"), "dim", F.col("mu").alias("_ma"))
    b = c.select(F.col("label").alias("label_b"), "dim", F.col("mu").alias("_mb"))
    d = (
        a.join(b, (a["dim"] == b["dim"]) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("_ma") * F.col("_mb")).cast("decimal(38,12)"))
            .cast("double")
            .alias("_dt")
        )
    )
    cnt = df.groupBy(F.col(group_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    na = nn.select(F.col("label").alias("label_a"), F.col("nrm").alias("_na"))
    nb = nn.select(F.col("label").alias("label_b"), F.col("nrm").alias("_nb"))
    ca = cnt.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        d.join(na, "label_a")
        .join(nb, "label_b")
        .join(ca, "label_a")
        .join(cb, "label_b")
        .select(
            "label_a",
            "label_b",
            trino_round(
                F.col("_dt") / (F.sqrt("_na") * F.sqrt("_nb")), 6
            ).alias("centroid_cosine"),
            "n_a",
            "n_b",
        )
    )


def save_pq_index(
    codes: DataFrame, codebook: PqCodebook, path: str
) -> tuple[int, int]:
    """Persist a PQ index AS LAKEHOUSE TABLES: ``<path>/codes`` (the
    per-vector code rows — the 32-64x-compressed corpus) and
    ``<path>/codebook`` (one row per (sub, cell) centroid, plus the
    m/k/dims geometry on every row) become snapshot tables, so a
    re-encode is an atomic commit with history/rollback, and ADC
    serving can pin an index version for reproducible retrieval.
    Returns the committed (codes_version, codebook_version)."""
    import os

    from ..sources import snapshots as snap

    spark = codes.sparkSession
    rows = [
        (codebook.m, codebook.k, codebook.dims, sub, cell, cv, cnrm)
        for sub, cents in sorted(codebook.cents.items())
        for cell, cv, cnrm in cents
    ]
    book_df = spark.createDataFrame(
        rows,
        "m int, k int, dims int, sub int, cell int, "
        "cv array<double>, cnrm double",
    )

    def _put(df: DataFrame, p: str) -> int:
        cur = snap.current_version(p)
        if cur is None:
            return snap.create_table(df, p)
        files, stats = snap._write_data_files(df, p)
        return snap._commit(
            p, files, "rebuild", parent=cur,
            schema_json=df.schema.json(), new_stats=stats,
        )

    vc = _put(codes, os.path.join(path, "codes"))
    vb = _put(book_df, os.path.join(path, "codebook"))
    return vc, vb


def load_pq_index(
    spark,
    path: str,
    version: tuple[int, int] | None = None,
) -> tuple[DataFrame, PqCodebook]:
    """Open a persisted PQ index (optionally pinned to the
    ``(codes_version, codebook_version)`` pair from
    :func:`save_pq_index`). The codebook table is geometry-sized
    (m*k rows) — collecting it is bounded metadata; the code table
    stays a lazy snapshot scan for ADC to consume."""
    import os

    from ..sources import snapshots as snap

    vc, vb = version if version is not None else (None, None)
    codes = snap.read_table(spark, os.path.join(path, "codes"), vc)
    book_rows = snap.read_table(
        spark, os.path.join(path, "codebook"), vb
    ).collect()
    cents: dict[int, list[tuple[int, list[float], float]]] = {}
    m = k = dims = 0
    for r in sorted(book_rows, key=lambda r: (r["sub"], r["cell"])):
        m, k, dims = r["m"], r["k"], r["dims"]
        cents.setdefault(r["sub"], []).append(
            (r["cell"], [float(x) for x in r["cv"]], float(r["cnrm"]))
        )
    return codes, PqCodebook(m=m, k=k, dims=dims, cents=cents)


def hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    qlabel_col: str = "qlabel",
) -> DataFrame:
    """Hard-negative mining for embedding training: per query, the top-k
    most-similar corpus vectors whose label DIFFERS from the query's —
    the near-misses a contrastive loss learns the most from.

    Same shape as ``cosine_topk_batch`` with the class-mismatch
    predicate applied AT THE JOIN, before any scoring or ranking: the
    excluded same-class rows never enter the B x N score stream, so the
    ranking shuffle shrinks by each class's own share. The query batch
    (with labels) broadcasts; ties rank (rounded score DESC, id)."""
    from pyspark.sql import Window

    base = vec_norms(df, vec_col, [id_col, label_col])
    q = vec_norms(queries, qvec_col, [qid_col, qlabel_col]).select(
        qid_col,
        qlabel_col,
        F.col("v").alias("qv_d"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.col("dot") / (F.sqrt("nrm") * F.sqrt("qnrm"))
    scored = (
        base.join(F.broadcast(q), F.col(label_col) != F.col(qlabel_col))
        .withColumn("dot", dot_product(F.col("v"), F.col("qv_d")))
        .select(qid_col, id_col, trino_round(cos, 6).alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def mmr_rerank(
    df: DataFrame,
    query: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, public): from the ``pool`` most-relevant candidates, pick
    ``k`` iteratively, each step maximizing
    ``lam * rel(q, d) - (1 - lam) * max_{s in S} sim(d, s)`` — the
    relevance/diversity trade every retrieval stack applies between
    ANN and the LLM context window.

    MMR is inherently sequential in k, so the k steps UNROLL into k
    dataframe stages (the kmeans/PQ fixed-iteration precedent) — but
    every stage operates on the POOL-BOUNDED tables only: the
    pool-sized candidate set (one TakeOrdered over the corpus scan is
    the only input-sized step), its pool² pairwise-cosine table, and a
    ≤k-row selected set; each pick is a limit(1) TakeOrdered, nothing
    collects. Relevance and pairwise sims are round6-fenced before any
    comparison, mmr is closed-form IEEE over those fenced values with
    a literal lambda, and every argmax tie-breaks on the id — so the
    selected sequence is engine-exact. The first pick's diversity
    penalty is defined 0.0 (empty S).

    Output: ``rank, {id_col}, relevance, max_sim_selected, mmr_score``
    (round6), one row per selection in pick order.
    """
    base = vec_norms(df, vec_col, [id_col])
    q = vec_norms(query, "qv", []).select(
        F.col("v").alias("_qv"), F.col("nrm").alias("_qn")
    )
    rel = F.col("_dot") / (F.sqrt("nrm") * F.sqrt("_qn"))
    cands = (
        base.join(F.broadcast(q))
        .withColumn("_dot", dot_product(F.col("v"), F.col("_qv")))
        .select(
            F.col(id_col), trino_round(rel, 6).alias("rel"), "v", "nrm"
        )
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(pool)
        .localCheckpoint()  # pool-bounded; fences the corpus scan off
        # the k unrolled stages (each would otherwise rescan)
    )
    a = cands.select(
        F.col(id_col).alias("_ida"), F.col("v").alias("_va"), F.col("nrm").alias("_na")
    )
    b = cands.select(
        F.col(id_col).alias("_idb"), F.col("v").alias("_vb"), F.col("nrm").alias("_nb")
    )
    sims = (
        a.join(b, F.col("_ida") != F.col("_idb"))
        .select(
            "_ida",
            "_idb",
            trino_round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.sqrt("_na") * F.sqrt("_nb")),
                6,
            ).alias("_sim"),
        )
        .localCheckpoint()  # pool² rows
    )
    lam_c, inv_c = F.lit(float(lam)), F.lit(1.0 - float(lam))
    first = (
        cands.orderBy(F.desc("rel"), F.asc(id_col))
        .limit(1)
        .select(
            F.lit(1).alias("rank"),
            F.col(id_col),
            F.col("rel").alias("relevance"),
            F.lit(0.0).alias("max_sim_selected"),
            trino_round(lam_c * F.col("rel"), 6).alias("mmr_score"),
        )
    )
    # Each unrolled stage references the running selection THREE times
    # (penalty join, anti-join, union), so a lazy `sel` re-embeds its own
    # plan ~3x per step — k=5 planned ~320 exchanges of recomputed
    # subtrees and planning time dominated the query. Fencing the ≤k-row
    # selection with localCheckpoint after every pick keeps each stage's
    # plan constant-size: one tiny job per pick over the already-fenced
    # pool tables, identical joins, identical values.
    sel = first.localCheckpoint()
    for step in range(2, k + 1):
        pen = (
            sims.join(
                sel.select(F.col(id_col).alias("_sid")),
                F.col("_idb") == F.col("_sid"),
            )
            .groupBy("_ida")
            .agg(F.max("_sim").alias("_pen"))
        )
        pick = (
            cands.join(
                sel.select(F.col(id_col).alias("_sid")),
                F.col(id_col) == F.col("_sid"),
                "left_anti",
            )
            .join(pen, F.col(id_col) == F.col("_ida"))
            .withColumn("_mmr", lam_c * F.col("rel") - inv_c * F.col("_pen"))
            .orderBy(F.desc("_mmr"), F.asc(id_col))
            .limit(1)
            .select(
                F.lit(step).alias("rank"),
                F.col(id_col),
                F.col("rel").alias("relevance"),
                F.col("_pen").alias("max_sim_selected"),
                trino_round(F.col("_mmr"), 6).alias("mmr_score"),
            )
        )
        sel = sel.unionAll(pick).localCheckpoint()
    return sel


def mahalanobis_diag_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k embedding outliers by DIAGONAL Mahalanobis distance
    (per-dimension standardized squared distance, Mahalanobis 1936 —
    the covariance restricted to its diagonal, the standard first-pass
    embedding-space outlier screen before any expensive density
    model): d²(x) = Σ_i (x_i − μ_i)² / σ²_i.

    One posexplode pass computes the d-row per-dimension mean/variance
    table (decimal-fenced, population variance); it broadcasts back
    over the exploded stream, per-term contributions are round8-fenced
    and decimal-summed per vector (order-free), and the top-k ranking
    is a TakeOrderedAndProject on (distance DESC, id) — the corpus is
    scanned twice and never sorted. Zero-variance dimensions
    contribute 0 (they carry no outlier signal).

    Output: ``{id_col}, md_sq`` (round6) — k rows, ranked by
    (md_sq DESC, id ASC).
    """
    x = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col(vec_col), lambda v: v.cast("double"))
        ).alias("dim", "val"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(28,8)")).cast("double")

    cnt = F.count("val").cast("double")
    m = dsum(F.col("val")) / cnt
    stats = x.groupBy("dim").agg(
        m.alias("_m"),
        (dsum(F.col("val") * F.col("val")) / cnt - m * m).alias("_var"),
    )
    term = trino_round(
        F.when(
            F.col("_var") > 0,
            (F.col("val") - F.col("_m"))
            * (F.col("val") - F.col("_m"))
            / F.col("_var"),
        ).otherwise(F.lit(0.0)),
        8,
    )
    scored = (
        x.join(F.broadcast(stats), "dim")
        .select(id_col, term.alias("_t"))
        .groupBy(id_col)
        .agg(trino_round(dsum(F.col("_t")), 6).alias("md_sq"))
    )
    return scored.orderBy(F.desc("md_sq"), F.asc(id_col)).limit(k)
