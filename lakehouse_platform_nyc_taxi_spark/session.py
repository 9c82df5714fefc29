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


#: Staging roots whose per-application subdirectories accumulate across
#: runs (each run writes /tmp/spark_graft_s9/<app_id>/... exactly once
#: and relies on uniqueness, not eager cleanup, for race isolation).
_STAGING_ROOTS = ("/tmp/spark_graft_s9",)
_STAGING_MAX_AGE_SEC = 7 * 24 * 3600


def _prune_stale_staging() -> None:
    """Best-effort removal of OTHER applications' stale staging dirs.

    Per-app uniqueness stays the race-isolation mechanism (ADVICE r16);
    this only stops long-lived bench boxes from accumulating one parquet
    table copy per run forever (ADVICE r17). Liveness is judged by the
    NEWEST mtime anywhere in the app dir's subtree, not the app dir
    itself (a directory's mtime is fixed at creation, so a soak session
    that wrote recently would otherwise look dead), and the week-long
    threshold leaves paused multi-day sessions alone. The subtree walk
    only runs for candidates whose root mtime is already past the
    cutoff. Runs at session creation, so it never races this
    application's own writes (our app dir does not exist yet).
    """
    import shutil
    import time

    cutoff = time.time() - _STAGING_MAX_AGE_SEC

    def newest_mtime(path: str) -> float:
        newest = os.path.getmtime(path)
        for dirpath, _dirs, files in os.walk(path):
            for entry in (dirpath, *(os.path.join(dirpath, f) for f in files)):
                try:
                    newest = max(newest, os.path.getmtime(entry))
                except OSError:
                    continue
        return newest

    for root in _STAGING_ROOTS:
        try:
            entries = [os.path.join(root, d) for d in os.listdir(root)]
        except OSError:
            continue
        for path in entries:
            try:
                if (
                    os.path.getmtime(path) < cutoff
                    and newest_mtime(path) < cutoff
                ):
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                continue


def get_spark(
    app_name: str = "lakehouse_platform_nyc_taxi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _prune_stale_staging()
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
