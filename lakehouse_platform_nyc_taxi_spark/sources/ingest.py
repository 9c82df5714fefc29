"""Bulk ingest entry point (SURVEY.md §3.1 — ingest_spark_bulk.py parity).

The reference's driver flow (`scripts/nyc_taxi/ingest_spark_bulk.py:84-199`):
per (source, year, month): probe the target partition (skip or delete for
idempotent re-runs), driver-side HTTP fetch of the monthly parquet with
404-treated-as-skip, stage where executors can read it, schema-on-read
``spark.read.parquet``, add ``year``/``month``/``loaded_at`` audit columns,
partitioned append with schema drift tolerated, then a per-source success/
records summary (`:240-271`).

Here the S3 staging hop disappears (any Spark-readable path works —
local, file://, http fetched to a shared dir); everything else keeps the
same semantics, including the skip/overwrite idempotency matrix. The
fetch stays a driver-side download exactly like the reference: a monthly
parquet is one file; executors parallelize over the *rows* after the
scan, not the download.
"""

from __future__ import annotations

import os
import shutil
import urllib.error
import urllib.request
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .writers import append_partitioned, delete_partition, partition_exists


@dataclass
class MonthSpec:
    """One ingest unit: a monthly file for one source/color."""

    source: str  # e.g. "yellow"
    url: str  # http(s)://, file://, or a plain local path
    year: int
    month: int


@dataclass
class IngestReport:
    loaded: dict[str, int] = field(default_factory=dict)  # source -> records
    skipped: list[str] = field(default_factory=list)
    missing: list[str] = field(default_factory=list)  # 404 / not found
    failed: dict[str, str] = field(default_factory=dict)  # source -> error

    @property
    def ok(self) -> bool:
        return not self.failed


def fetch(url: str, dest_dir: str, timeout: int = 300) -> str | None:
    """Driver-side fetch to a staging dir; None on 404/missing-file
    (the reference treats a missing month as skip, not failure —
    ingest_spark_bulk.py:165-168)."""
    os.makedirs(dest_dir, exist_ok=True)
    name = url.rstrip("/").rsplit("/", 1)[-1] or "download.parquet"
    dest = os.path.join(dest_dir, name)
    if "://" not in url:  # plain local path
        if not os.path.exists(url):
            return None
        shutil.copy(url, dest)
        return dest
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(
            dest, "wb"
        ) as out:
            shutil.copyfileobj(resp, out)
        return dest
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None
        raise
    except urllib.error.URLError as e:
        if isinstance(getattr(e, "reason", None), FileNotFoundError):
            return None
        raise


def ingest_month(
    spark: SparkSession,
    spec: MonthSpec,
    target_path: str,
    staging_dir: str,
    overwrite: bool = False,
) -> tuple[str, int]:
    """Ingest one monthly file. Returns (status, records) where status is
    'loaded' | 'skipped' | 'missing'.

    Idempotency matrix (ingest_spark_bulk.py:96-106): partition exists and
    not overwrite -> skip without fetching; exists and overwrite -> delete
    the partition, then append.
    """
    part = {"year": spec.year, "month": spec.month}
    if partition_exists(spark, target_path, part):
        if not overwrite:
            return "skipped", 0
        delete_partition(spark, target_path, part)
    local = fetch(spec.url, staging_dir)
    if local is None:
        return "missing", 0
    df = spark.read.parquet(local)  # schema-on-read, drift tolerated on append
    n = df.count()
    df = (
        df.withColumn("year", F.lit(int(spec.year)))
        .withColumn("month", F.lit(int(spec.month)))
        .withColumn("loaded_at", F.current_timestamp())
    )
    append_partitioned(df, target_path, partition_by=("year", "month"))
    return "loaded", n


def ingest_bulk(
    spark: SparkSession,
    specs: list[MonthSpec],
    target_root: str,
    staging_dir: str,
    overwrite: bool = False,
) -> IngestReport:
    """The reference's per-color loop with its summary/exit contract:
    each source lands in ``{target_root}/{source}_trips``; individual
    failures are recorded, not raised, and ``report.ok`` is the exit
    status (`ingest_spark_bulk.py:240-271`)."""
    report = IngestReport()
    for spec in specs:
        target = os.path.join(target_root, f"{spec.source}_trips")
        try:
            status, n = ingest_month(spark, spec, target, staging_dir, overwrite)
        except Exception as e:  # per-source isolation, like the reference
            report.failed[spec.source] = str(e)
            continue
        if status == "loaded":
            report.loaded[spec.source] = report.loaded.get(spec.source, 0) + n
        elif status == "skipped":
            report.skipped.append(spec.source)
        else:
            report.missing.append(spec.source)
    return report
