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


def sessionize_sliced(events: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      slice_minutes: int = 24 * 60) -> DataFrame:
    """Hot-key escalation of `sessionize` (the time-sliced salt the
    round-9 hot-key study specified; BASELINE.md "Round-9: hot-key
    study"): identical output, but no single task ever sorts one key's
    whole history.

    `sessionize` shuffles on the entity key alone, so a key owning 10^8+
    events (tracking pixels, null-ish ids — plausible at 100 TB)
    serializes its window sort into one task (measured 3.1x degradation
    at 3x10^7 rows/key, linear spill beyond). Here the window partition
    key is (user, time-slice): each slice sessionizes locally in
    parallel, then sessions are stitched across slice boundaries with a
    per-(user, slice) SUMMARY table — one row per slice, orders of
    magnitude smaller than the events — on which a second window
    computes (a) cumulative session counts and (b) boundary merges (a
    session continuing across a boundary iff the truncated-second gap
    from the previous slice's last event to this slice's first is
    <= gap, the exact `sessionize` rule). An event's global session id
    is its local id + cumulative prior sessions - cumulative boundary
    merges (each merge collapses one id for everything after it).

    Cost: one (user, slice) shuffle for the local window, a co-
    partitioned join of the offsets back onto it (the summary side is
    tiny), and a per-user window over slice summaries whose row count is
    #slices-per-user, bounded by the corpus time span — never by event
    volume. Equivalence with `sessionize` is property-tested including
    boundary-exact gaps (tests/test_pipeline.py) and pinned by the
    driver gate's oracle shape."""
    slice_s = slice_minutes * 60
    gap_s = gap_minutes * 60
    sec = F.unix_timestamp(F.col(ts_col))
    e = events.select(user_col, ts_col,
                      (sec / slice_s).cast("long").alias("__slice"))
    w = Window.partitionBy(user_col, "__slice").orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
    local = e.withColumn(
        "__lsid",
        F.sum(F.when(prev.isNull() | (gap > gap_s), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    summary = (local.groupBy(user_col, "__slice")
               .agg(F.min(ts_col).alias("__first"),
                    F.max(ts_col).alias("__last"),
                    F.max("__lsid").alias("__n")))
    ws = Window.partitionBy(user_col).orderBy("__slice")
    prev_last = F.lag("__last").over(ws)
    merge = F.when(
        prev_last.isNotNull()
        & (F.unix_timestamp(F.col("__first"))
           - F.unix_timestamp(prev_last) <= gap_s), 1).otherwise(0)
    run = ws.rowsBetween(Window.unboundedPreceding, 0)
    offsets = summary.select(
        user_col, "__slice",
        (F.sum("__n").over(run) - F.col("__n")
         - F.sum(merge).over(run)).alias("__off"))
    return (local.join(offsets, [user_col, "__slice"])
            .select(user_col, ts_col,
                    (F.col("__lsid") + F.col("__off")).alias("session_id")))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  slice_minutes: int | None = None) -> DataFrame:
    """Per-user session statistics: session count, events, max session
    size, and total active span in seconds (sum of per-session spans).

    `slice_minutes` routes through the `sessionize_sliced` hot-key
    escalation (identical output by contract; the r11 driver gate runs
    the same DuckDB oracle through both paths)."""
    if slice_minutes is not None:
        s = sessionize_sliced(events, gap_minutes, user_col, ts_col,
                              slice_minutes=slice_minutes)
    else:
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
