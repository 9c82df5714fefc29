"""Text-corpus ingestion: JSONL (and CSV) document sources.

The reference ingests parquet over HTTP (scripts/nyc_taxi/
ingest_spark_bulk.py); a training-data pipeline's raw inputs are more
often line-delimited JSON dumps. This module is the schema-contracted
read path for those:

- **Explicit schema, never inference.** Schema inference reads the data
  twice and silently widens types per batch; at 100 TB both are
  disqualifying. Malformed lines land in a ``_corrupt_record`` column
  (PERMISSIVE mode) instead of failing the job — the caller decides
  whether to quarantine or abort.
- **Quarantine split.** ``split_corrupt`` separates good rows from bad
  in one pass each (two filters over the same scan — Catalyst prunes
  the unused columns per branch).
- **Normalization to the documents contract** (doc_id, text, lang,
  source, n_chars) so every downstream operator (dedup, quality,
  curation) runs unchanged on ingested corpora.

JSON lines are splittable (newline-delimited, no multiline), so the
scan parallelizes by HDFS block at scale — unlike multiline JSON, which
is one task per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The engine-wide document contract (matches testdata documents.parquet).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


_CORRUPT_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"}


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if "_corrupt_record" in schema.fieldNames():
        return schema
    return T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
    )


def _parse_lines(raw: DataFrame, schema: T.StructType, parser) -> DataFrame:
    # text scan + from_json/from_csv (NOT spark.read.json/csv): the file
    # readers treat _corrupt_record as an internal column and refuse any
    # query that references only it (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    # which breaks quarantine counting. Parsing as an expression makes it
    # an ordinary column; same single scan, same per-line cost.
    parsed = raw.select(parser(F.col("value"), _with_corrupt(schema).simpleString(),
                               _CORRUPT_OPTS).alias("_r"))
    return parsed.select("_r.*")


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """PERMISSIVE JSONL read against an explicit schema; malformed lines
    carry the raw line in ``_corrupt_record`` and NULLs elsewhere."""
    return _parse_lines(spark.read.text(path), schema, F.from_json)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """Same contract for CSV sources. With ``header=True`` the header
    line (schema field names in declared order) is dropped; a header
    that doesn't match the schema parses as a corrupt row and lands in
    quarantine — surfacing the mismatch instead of silently misbinding
    columns."""
    raw = spark.read.text(path)
    if header:
        hdr = ",".join(f.name for f in schema.fields)
        raw = raw.filter(F.col("value") != hdr)
    return _parse_lines(raw, schema, F.from_csv)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows lose the ``_corrupt_record`` column;
    quarantine keeps only the raw line for reprocessing/audit."""
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def normalize_documents(df: DataFrame) -> DataFrame:
    """Coerce an ingested corpus to the documents contract: fill
    n_chars when absent, default lang/source, drop rows with no text."""
    out = df.filter(F.col("text").isNotNull())
    out = out.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )
    out = out.withColumn("lang", F.coalesce(F.col("lang"), F.lit("und")))
    out = out.withColumn("source", F.coalesce(F.col("source"), F.lit("unknown")))
    return out.select("doc_id", "text", "lang", "source", "n_chars")
