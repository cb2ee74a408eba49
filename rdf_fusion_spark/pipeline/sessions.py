"""Batch sessionization over an event log (the batch counterpart of
streaming/events.py sessionize).

Classic training-data / analytics shape: per-entity ordered window →
gap detection → session ids via a running sum. One shuffle on the
entity key; the window sort is per-partition after that shuffle, so the
plan scales with the number of entities, not total events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds gap_minutes.

    Output: one row per event with (user_id, ts, session_id) where
    session_id is 1-based per user in time order.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
    new_session = F.when(
        prev.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.select(
        user_col, ts_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-user session statistics: session count, events, max session
    size, and total active span in seconds (sum of per-session spans)."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    per_session = (s.groupBy(user_col, "session_id")
                   .agg(F.count("*").alias("n_events"),
                        (F.unix_timestamp(F.max(ts_col))
                         - F.unix_timestamp(F.min(ts_col)))
                        .alias("span_s")))
    return (per_session.groupBy(user_col)
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 F.max("n_events").alias("max_session_events"),
                 F.sum("span_s").alias("active_seconds")))
