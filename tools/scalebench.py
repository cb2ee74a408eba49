"""At-scale scaling record (r11 verdict "next round" #5): bench a query
subset on the 10x key-shifted replica (tools/make_replica.py) at two
core counts, same noop-sink methodology as bench.py.

The sf0.1 scaling block is an overhead detector (every query sub-2.5 s,
ratios ~1 or inverted); this record is the parallelism detector: on 10x
the data, scan/agg-bound queries should speed up with cores.

Usage:
  python tools/make_replica.py 10 /root/testdata/sf0.1 /tmp/sfbig
  SPARK_GRAFT_CPUS=32 python tools/scalebench.py /tmp/sfbig q1_pricing_summary ...
  SPARK_GRAFT_CPUS=8  python tools/scalebench.py /tmp/sfbig q1_pricing_summary ...

Prints one JSON line {"cpus": N, "dir": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    big_dir = sys.argv[1]
    names = sys.argv[2:]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rdf-fusion-spark-scalebench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rdf_fusion_spark import entry_queries as EQ

    qs = EQ.queries()
    names = [n for n in names if n in qs]
    EQ.get_graph(spark, big_dir)
    # plan build + JIT warmup at the small SF, mirroring bench.py
    for name in names:
        try:
            qs[name](spark, big_dir)
        except Exception:
            pass
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"scalebench:{name}")
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, big_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"cpus": int(CPUS), "dir": big_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
