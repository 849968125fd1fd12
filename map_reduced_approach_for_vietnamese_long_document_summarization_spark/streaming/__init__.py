"""Structured Streaming extension over the events table (SURVEY §2.10)."""

from .events import (
    correlate_event_pairs,
    interval_join_stream,
    dedup_events_stream,
    enrich_stream_with_dim,
    incremental_summarize_stream,
    read_events_stream,
    session_event_counts,
    sliding_event_counts,
    state_schema_migration_hint,
    stateful_user_running_stats,
    tumbling_event_counts,
)
from .sinks import (
    IdempotentParquetBatchWriter,
    read_committed_batches,
    write_stream_idempotent_parquet,
)

__all__ = [
    "IdempotentParquetBatchWriter",
    "read_committed_batches",
    "write_stream_idempotent_parquet",
    "read_events_stream",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_event_counts",
    "stateful_user_running_stats",
    "correlate_event_pairs",
    "interval_join_stream",
    "dedup_events_stream",
    "enrich_stream_with_dim",
    "incremental_summarize_stream",
    "state_schema_migration_hint",
]
