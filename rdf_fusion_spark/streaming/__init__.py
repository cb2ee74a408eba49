"""Structured Streaming operators over event streams (a Spark-native
extension; the reference has no streaming surface)."""

from .events import (
    dedup_stream,
    read_event_stream,
    run_to_memory,
    running_user_totals,
    sessionize,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream", "read_event_stream", "run_to_memory",
    "running_user_totals", "sessionize", "windowed_event_counts",
]
