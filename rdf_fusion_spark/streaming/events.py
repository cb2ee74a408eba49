"""Structured Streaming operators over the events stream.

The reference engine has no streaming surface; this module is the
Spark-native extension a large-scale ingest pipeline needs: watermarked
windowed aggregation, in-stream deduplication, session windows, and a
custom stateful operator via applyInPandasWithState (Arrow-batched state
machine — the escape hatch when built-in windows can't express the
semantics).

All operators take/return streaming DataFrames and run identically on
batch DataFrames where Spark allows it (window aggregation, sessionize) —
test batch-vs-stream equivalence with an availableNow trigger.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: Optional[int] = None) -> DataFrame:
    """File-source stream of event rows (parquet directory)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          slide: Optional[str] = None,
                          watermark: str = "15 minutes") -> DataFrame:
    """Late-data-tolerant windowed aggregation per event type.

    Watermark bounds state: rows later than `watermark` behind the max
    event time are dropped and their windows finalized — state size is
    O(active windows), not O(stream length).
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "event_type", "n", "total_value")
    )


def dedup_stream(events: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """Exactly-once by event_id within the watermark horizon (bounded
    state; the streaming analogue of pipeline/dedup exact dedup)."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "15 minutes") -> DataFrame:
    """Per-user session windows (gap-based) with event counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("session"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("session_value"))
        .select(F.col("session.start").alias("session_start"),
                F.col("session.end").alias("session_end"),
                "user_id", "n_events", "session_value")
    )


RUNNING_TOTAL_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user totals via
    applyInPandasWithState (update mode).

    The built-in windows cannot express an unbounded running aggregate
    emitted per micro-batch; this is the applyInPandasWithState pattern —
    Arrow-batched input, explicit GroupState, per-key state O(1).
    """

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, RUNNING_TOTAL_SCHEMA,
                                    _STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def interval_join(left: DataFrame, right: DataFrame,
                  key: str = "user_id", time_col: str = "ts",
                  tolerance: str = "10 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event with
    right events of the same key whose timestamp falls in
    [left.ts, left.ts + tolerance] — the impression→conversion /
    cause→effect attribution shape.

    Scale notes: both sides carry a watermark so the join state is
    bounded (Spark drops buffered rows older than watermark+tolerance);
    the equi key keeps it a hash join with a time-range residual — the
    only state-safe shape for unbounded streams. Works identically on
    batch frames (plain range join).
    """
    def side(df: DataFrame, prefix: str, kname: str) -> DataFrame:
        # generic payload: every column except key/time rides along with
        # a side prefix (the function must not assume the events schema)
        payload = [c for c in df.columns if c not in (key, time_col)]
        return df.select(F.col(key).alias(kname),
                         F.col(time_col).alias(f"{prefix}_ts"),
                         *[F.col(c).alias(f"{prefix}_{c}") for c in payload])

    l = side(left, "l", "k")
    r = side(right, "r", "rk")
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = ((l["k"] == r["rk"]) &
            (r["r_ts"] >= l["l_ts"]) &
            (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {tolerance}")))
    out_cols = [F.col("k").alias(key)] + \
        [F.col(c) for c in l.columns if c != "k"] + \
        [F.col(c) for c in r.columns if c != "rk"]
    return l.join(r, cond).select(*out_cols)


def run_to_memory(stream: DataFrame, name: str, checkpoint: str,
                  output_mode: str = "complete") -> None:
    """Drain a stream with availableNow into an in-memory table `name`
    (test/debug sink)."""
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
