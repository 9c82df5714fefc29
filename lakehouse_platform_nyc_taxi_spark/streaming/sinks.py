"""Streaming sinks: append-to-parquet and foreachBatch incremental upsert.

The reference's staging layer is an *orchestrated incremental batch*
(delete+insert keyed on trip_id, SURVEY.md §2.1 S9). Its streaming mirror
is ``foreachBatch``: each micro-batch runs the same
``incremental_delete_insert`` materializer the batch pipeline uses, so
late re-deliveries of a key replace the old row instead of duplicating
it — exactly-once-per-key on top of at-least-once delivery. State is the
parquet table itself; the checkpoint only tracks source offsets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.writers import incremental_delete_insert


def stream_append_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = (),
    available_now: bool = True,
) -> StreamingQuery:
    """Plain streaming parquet append (the raw-layer landing sink)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    unique_key: Sequence[str],
    partition_by: Sequence[str] = ("year", "month"),
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch incremental upsert: every micro-batch is applied with
    the batch delete+insert materializer (partition-scoped rewrite), so
    re-delivered keys update in place. Mirrors the dbt incremental
    staging models as a continuous pipeline."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        incremental_delete_insert(
            batch_df.sparkSession,
            batch_df,
            path,
            unique_key=unique_key,
            partition_by=partition_by,
        )

    writer = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
