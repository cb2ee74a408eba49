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
