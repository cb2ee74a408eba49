"""Isolate the initial-edges cost of the Kleene fixpoint on a chain NT
load: times each plan step separately, twice, to separate driver-side
(codegen/planning) cost from execution.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def t(label, fn):
    for i in range(2):
        t0 = time.perf_counter()
        fn()
        print(f"{label} [{i}]: {time.perf_counter() - t0:.2f}s", flush=True)


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from rdf_fusion_spark import GraphStore
    from rdf_fusion_spark.terms import NamedNode, term_matches

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("kleene-init-isolate")
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

    q = store.quads
    t("quads.count", lambda: q.count())
    pred = term_matches(F.col("predicate"), NamedNode("http://ex/next"))
    edges = q.where(pred).select(F.col("subject").alias("__src"),
                                 F.col("object").alias("__tgt"))
    t("edges.count", lambda: edges.count())
    dd = edges.dropDuplicates()
    t("edges.dedup.count", lambda: dd.count())
    t("edges.dedup.ckpt", lambda: dd.localCheckpoint(eager=True))
    ck = dd.localCheckpoint(eager=True)
    t("ckpt.count", lambda: ck.count())
    spark.stop()


if __name__ == "__main__":
    main()
