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


def stream_merge_snapshot(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: Sequence[str],
    app_id: str | None = None,
    mode: str = "cow",
) -> None:
    """Streaming CDC apply: MERGE each micro-batch into a snapshot table,
    exactly once — the Delta "streaming upsert" pattern
    (``foreachBatch`` + ``MERGE INTO``) on this repo's snapshot tables.

    Idempotence composes from the two layers: the batch dedups on
    ``key_cols`` within itself (replay order across crashes is not
    deterministic, so callers needing a specific winner among same-key
    rows should pre-aggregate), then commits through ``merge_into`` with
    the same ``(stream_id, batch_id)`` manifest tag ``append_stream``
    uses — a replayed batch after a crash-between-commit-and-checkpoint
    is skipped instead of merged twice. The merge rewrites only files
    whose key range intersects the batch (footer-stats pruning), so a
    narrow CDC batch against a clustered 100 TB table touches O(1)
    files. The first batch bootstraps the table.

    ``mode="mor"`` applies each batch with :func:`merge_into_mor`
    instead: matched rows are tombstoned and the batch appended —
    O(batch) per micro-batch with NO file rewrites, the right shape for
    a high-frequency CDC trickle (compact the read debt periodically
    with ``materialize_dvs``/``compact_small_files``). MOR commits also
    stay streamable: a downstream ``snapshot_cdf`` reader re-emits them
    as row-level changes without ``skipChangeCommits``.
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be cow|mor, got {mode!r}")
    import hashlib
    import os as _os

    from ..sources import snapshots as snap

    stream_id = app_id or hashlib.sha256(
        _os.path.abspath(checkpoint).encode("utf-8")
    ).hexdigest()[:16]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in snap.committed_stream_batches(path, stream_id):
            return
        deduped = batch_df.dropDuplicates(list(key_cols))
        tag = {"stream_batch_id": int(batch_id), "stream_id": stream_id}
        if mode == "mor" and snap.current_version(path) is not None:
            snap.merge_into_mor(
                batch_df.sparkSession,
                path,
                deduped,
                list(key_cols),
                validate_source_keys=False,  # just deduped
                commit_extra=tag,
            )
            return
        snap.merge_into(
            batch_df.sparkSession,
            path,
            deduped,
            list(key_cols),
            validate_source_keys=False,  # just deduped
            commit_extra=tag,
            allow_bootstrap=True,
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
