"""Trace per-round wall time inside the unseeded Kleene fixpoint by
wrapping DataFrame.localCheckpoint and DataFrame.count with timers.

Usage: python tools/kleene_round_trace.py [chain_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame

    from rdf_fusion_spark import GraphStore

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("kleene-round-trace")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    nt = "".join(
        f"<http://ex/n{i}> <http://ex/next> <http://ex/n{i + 1}> .\n"
        for i in range(CHAIN_N))
    with tempfile.NamedTemporaryFile("w", suffix=".nt", delete=False) as f:
        f.write(nt)
        path = f.name
    store = GraphStore.load(spark, path)

    events: list[tuple[str, float]] = []
    orig_ckpt = DataFrame.localCheckpoint
    orig_count = DataFrame.count

    def traced_ckpt(self, eager=True):
        t0 = time.perf_counter()
        out = orig_ckpt(self, eager)
        events.append(("ckpt", time.perf_counter() - t0))
        return out

    def traced_count(self):
        t0 = time.perf_counter()
        out = orig_count(self)
        events.append(("count", time.perf_counter() - t0))
        return out

    DataFrame.localCheckpoint = traced_ckpt
    DataFrame.count = traced_count
    try:
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            store.quads.count()
            print(f"quads.count {tag}: {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()
        res = store.query(
            "SELECT (COUNT(*) AS ?n) WHERE { ?a <http://ex/next>+ ?b }")
        n = int(res.df.collect()[0]["n"]["v"])
        total = time.perf_counter() - t0
    finally:
        DataFrame.localCheckpoint = orig_ckpt
        DataFrame.count = orig_count
    print(f"n={n} total={total:.1f}s")
    traced = sum(dt for _, dt in events)
    print(f"traced={traced:.1f}s untraced={total - traced:.1f}s")
    for i, (kind, dt) in enumerate(events):
        print(f"  {i:3d} {kind:5s} {dt:6.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
