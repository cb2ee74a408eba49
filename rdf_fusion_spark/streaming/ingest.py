"""Continuous RDF ingestion with Structured Streaming.

The reference is batch-only (KleenePlusClosureExec declares
Boundedness::Bounded and the store loads via blocking readers); Spark's
file stream source turns the same line-parallel N-Triples parser into a
continuous ingest pipeline: drop .nt/.nq files into a directory and the
stream appends their quads to a parquet store location exactly once
(checkpointed file tracking), ready for GraphStore.from_parquet.

At scale this is the standard landing-zone pattern: upstream producers
write immutable files; the stream owns the parse and the store layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_ntriples(spark: SparkSession, path: str,
                    max_files_per_trigger: int = None,
                    strict: bool = False) -> DataFrame:
    """Streaming quads from a directory of N-Triples/N-Quads files.

    Defaults to strict=False: one corrupt line in a landing file would
    otherwise fail the whole long-running stream — skip-and-continue is
    the usual ingestion policy (pass strict=True to fail fast instead)."""
    from ..sources.ntriples import lines_to_quads
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(path).select(F.col("value").alias("line"))
    return lines_to_quads(lines, strict=strict)


def match_pattern_stream(quads: DataFrame, subject=None, predicate=None,
                         obj=None) -> DataFrame:
    """Continuous triple-pattern match over a quad stream: constants
    filter (leaf comparisons — pushdown-friendly), variables project as
    binding columns named after the open position. The streaming subset
    of the engine's scan_pattern; compose with windowed aggregation for
    continuous monitoring queries (e.g. per-predicate arrival rates)."""
    from ..terms import term_matches

    cond = F.lit(True)
    for colname, t in (("subject", subject), ("predicate", predicate),
                       ("object", obj)):
        if t is not None:
            cond = cond & term_matches(F.col(colname), t)
    out = quads.where(cond)
    cols = [F.col(c).alias(c) for c, t in
            (("subject", subject), ("predicate", predicate),
             ("object", obj)) if t is None]
    if not cols:
        # fully-bound pattern ("alert when this triple arrives"): emit a
        # one-column marker row per match — file sinks reject an empty
        # schema (same convention as the engine's no-variable matches)
        return out.select(F.lit(True).alias("__match__"))
    return out.select(*cols)


def predicate_rates(quads: DataFrame, window: str = "1 minute",
                    watermark: str = "5 minutes") -> DataFrame:
    """Continuous per-predicate arrival counts over processing-receipt
    windows — the monitoring aggregate a landing-zone ingest runs
    alongside the parquet sink (watermark bounds the window state)."""
    with_ts = quads.withColumn("__arrival", F.current_timestamp()) \
        .withWatermark("__arrival", watermark)
    return (with_ts.groupBy(F.window("__arrival", window).alias("win"),
                            F.col("predicate")["v"].alias("pred"))
            .agg(F.count(F.lit(1)).alias("n")))


def ingest_to_parquet(quads: DataFrame, store_path: str, checkpoint: str,
                      available_now: bool = False):
    """Append a streaming quads DataFrame to a parquet store location.
    Returns the StreamingQuery; with available_now=True the call drains
    the currently visible files and stops (batch-like semantics for
    tests and catch-up runs)."""
    w = (quads.writeStream.format("parquet")
         .option("path", store_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    if available_now:
        q.awaitTermination()
    return q
