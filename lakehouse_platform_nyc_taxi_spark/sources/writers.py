"""Table sinks: partitioned append, overwrite (CTAS), incremental upsert.

Mirrors the reference's sink surface (SURVEY.md §2.1) on plain parquet —
the container has no Delta/Iceberg jars, so DML (DELETE/MERGE) is
re-expressed as partition-scoped rewrites, which is also the strategy
that scales: only the `(year, month)` partitions present in the incoming
batch are read and rewritten, never the whole table.

Reference parity notes:
- S6 partitioned append (ingest_spark_bulk.py:147-152): append +
  mergeSchema stands in for Iceberg ``accept-any-schema``.
- S9 incremental delete+insert (stg_nyc_taxi__yellow_trips.sql:2-8):
  delete target rows whose key appears in the batch, then insert the
  batch. Duplicates *within* one batch survive — that quirk is kept.
- S12 partition delete (ingest_spark_bulk.py:71-81): dynamic partition
  overwrite of the named partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check — avoids read-and-catch (which logs a
    JVM stack trace even when handled)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def append_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("year", "month"),
    merge_schema: bool = True,
) -> None:
    """S6: partitioned append with schema drift tolerated."""
    (
        df.write.mode("append")
        .option("mergeSchema", str(merge_schema).lower())
        .partitionBy(*partition_by)
        .parquet(path)
    )


def overwrite_table(
    df: DataFrame, path: str, partition_by: Sequence[str] | None = None
) -> None:
    """S7: CTAS-style full materialization."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def delete_partition(
    spark: SparkSession,
    path: str,
    partition_values: dict[str, object],
) -> None:
    """S12: idempotent re-ingest — drop one partition.

    A metadata-style delete (the parquet analogue of Iceberg's
    ``DELETE FROM t WHERE year=Y AND month=M``): remove the partition
    directory, never touching data in other partitions.
    """
    subdir = "/".join(f"{col}={val}" for col, val in partition_values.items())
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{subdir}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)


def partition_exists(spark: SparkSession, path: str, partition_values: dict[str, object]) -> bool:
    """S11: partition existence probe; missing table -> False.

    Filters on partition columns only, so Catalyst answers it from
    partition-directory pruning without scanning data files.
    """
    if not _path_exists(spark, path):
        return False
    df = spark.read.parquet(path)
    cond = F.lit(True)
    for col, val in partition_values.items():
        cond = cond & (F.col(col) == F.lit(val))
    return df.filter(cond).limit(1).count() > 0


def incremental_delete_insert(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    unique_key: Sequence[str],
    partition_by: Sequence[str] = ("year", "month"),
    delete_scope: str = "partition",
) -> None:
    """S9: dbt ``incremental_strategy='delete+insert'`` on parquet.

    First run -> plain CTAS. Subsequent runs: within the partitions the
    batch touches, drop existing rows whose ``unique_key`` appears in the
    batch (left-anti join), union the batch, and dynamically overwrite
    only those partitions. Rows in untouched partitions are never read
    or rewritten, so cost scales with the increment, not the table.

    Faithful quirk: the incoming batch is NOT deduplicated — delete+insert
    keeps within-batch duplicates (SURVEY.md §7.4).

    Known divergence from dbt (``delete_scope="partition"``, the default):
    dbt deletes by key across the WHOLE table, this deletes only within
    the batch's ``(year, month)`` partitions — a re-delivered key whose
    corrected timestamp moves it to a different month leaves the stale row
    behind in the old partition. When cross-partition key moves are
    possible, pass ``delete_scope="table"``: the full table is anti-joined
    against the batch keys and rewritten (dbt-equivalent result, at
    full-table-rewrite cost — the honest price of cross-partition DELETE
    without a snapshotting table format).
    """
    if delete_scope not in ("partition", "table"):
        raise ValueError(f"delete_scope must be 'partition' or 'table', got {delete_scope!r}")
    if not _path_exists(spark, path):
        overwrite_table(batch, path, partition_by)
        return
    existing = spark.read.parquet(path)

    if delete_scope == "table":
        keys = batch.select(*unique_key)
        survivors = existing.join(keys, on=list(unique_key), how="left_anti")
        result = survivors.select(*batch.columns).unionByName(batch)
        # Materialize before overwriting the path being read (lineage to
        # the source files must be cut or the overwrite corrupts its own
        # input). Full-table rewrite is inherent to table-wide DELETE on
        # plain parquet.
        result = result.localCheckpoint()
        overwrite_table(result, path, partition_by)
        return

    # Restrict the rewrite to the batch's partitions. The distinct list
    # of (year, month) pairs is tiny (one per ingested month) — a safe
    # driver-side collect, mirroring the reference's scalar watermark.
    parts = [tuple(r) for r in batch.select(*partition_by).distinct().collect()]
    if not parts:
        return
    part_pred = F.lit(False)
    for values in parts:
        cond = F.lit(True)
        for col, val in zip(partition_by, values):
            cond = cond & (F.col(col) == F.lit(val))
        part_pred = part_pred | cond

    touched = existing.filter(part_pred)
    keys = batch.select(*unique_key)
    survivors = touched.join(keys, on=list(unique_key), how="left_anti")
    # Align column order for the positional union.
    result = survivors.select(*batch.columns).unionByName(batch)
    (
        result.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (optionally sorted) managed/external table.

    The co-located-join lever: two tables bucketed on the same key with
    the same bucket count join with ZERO exchange — at 100 TB that
    removes the dominant all-to-all shuffle from every fact-to-fact join
    on the bucket key (tests assert the Exchange-free plan). ``sortBy``
    additionally pre-sorts each bucket file so sort-merge joins skip the
    per-task sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
