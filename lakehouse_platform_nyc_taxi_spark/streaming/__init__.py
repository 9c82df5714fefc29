"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.9) — its
incremental pattern is orchestrated batch. This module is the
extension mirror of that pipeline as real Structured Streaming:

- file stream source over the testdata events table,
- watermark + tumbling-window rollups (the fct_trips_daily analogue),
- dropDuplicates within the watermark (the staging-dedup analogue),
- native session windows (``F.session_window``),
- a custom stateful operator via ``applyInPandasWithState``.

Every transform is written against a plain DataFrame so it runs
identically on a batch frame (for unit-testing the logic) and on a
streaming frame; ``run_available_now`` drains a stream to a memory sink
and hands back the batch result, which is how the driver-contract
harness grades finalized-append semantics against a SQL oracle.
"""

from .ops import (
    dedup_counts,
    parallelize_stream,
    read_documents_stream,
    read_events_stream,
    run_available_now,
    session_windows,
    stateful_user_stats,
    stream_cms,
    stream_conformal_gate,
    stream_decontamination_gate,
    stream_dedup_gate,
    stream_phash_gate,
    stream_audio_gate,
    stream_attributed_rollup,
    stream_static_enrich,
    stream_stream_attribution,
    chained_window_rollup,
    grouping_sets_rollup,
    windowed_rollup,
)
from .sinks import stream_append_parquet, stream_upsert_parquet

__all__ = [
    "parallelize_stream",
    "read_documents_stream",
    "read_events_stream",
    "stream_cms",
    "stream_conformal_gate",
    "stream_decontamination_gate",
    "stream_dedup_gate",
    "stream_phash_gate",
    "stream_audio_gate",
    "run_available_now",
    "chained_window_rollup",
    "grouping_sets_rollup",
    "windowed_rollup",
    "dedup_counts",
    "session_windows",
    "stream_attributed_rollup",
    "stream_static_enrich",
    "stream_stream_attribution",
    "stateful_user_stats",
    "stream_append_parquet",
    "stream_upsert_parquet",
]
