"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]`` (one JVM); the same configs are
what we would ship to a 1000-executor cluster: AQE for runtime re-plan
(partition coalescing + skew-join splitting), UTC session time zone so
timestamp semantics are deterministic and oracle-comparable, and Arrow
for any Pandas-UDF boundary. ``spark.sql.shuffle.partitions`` defaults
to the local core count here; on a real cluster AQE's coalescing makes
the initial number far less sensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-level confs that every entry point (our factory, the driver's
# externally created session, tests) must agree on for deterministic,
# oracle-comparable results. All of these are runtime-settable SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp semantics; DuckDB timestamps are naive/UTC.
    "spark.sql.session.timeZone": "UTC",
    # The driver's `events` table stores TIMESTAMP(NANOS) parquet, which
    # Spark 4 otherwise refuses to read (PARQUET_TYPE_ILLEGAL). Read as
    # nanos-since-epoch longs; sources.testdata converts to timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones. Essential at 100 TB, harmless at test scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the Pandas-UDF slow path (10-100x vs pickle).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Incremental materializer rewrites only the partitions present in
    # the incoming batch (see sources.writers.incremental_delete_insert).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs to an externally built session.

    The bench/correctness driver hands us its own SparkSession; this makes
    query results independent of how that session was constructed.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static in some deployments; results then
            # depend on the host session, which is the best we can do.
            pass
    return spark


def get_spark(
    app_name: str = "lakehouse_platform_nyc_taxi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
