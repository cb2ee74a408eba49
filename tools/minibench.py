"""Time a subset of bench queries with bench.py's exact protocol
(same session confs, same noop-sink timing, min-of-N), plus the
tripwire control query for floor normalization.

Usage: python tools/minibench.py [-n REPS] <query> [query ...]
Prints one JSON line: {"queries": {...}, "control_x": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rdf-fusion-spark-minibench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from rdf_fusion_spark import entry_queries as EQ

    qs = EQ.queries()
    names = [n for n in args if n in qs]
    control = bench.TRIPWIRE_CONTROL
    if control not in names:
        names.append(control)
    EQ.get_graph(spark, SF_DIR)
    # plan build + small-SF warmup, mirroring bench.py
    for name in names:
        try:
            qs[name](spark, SF_DIR)
        except Exception:
            pass
    warm_dir = "/root/testdata/sf0.001"
    if os.path.exists(warm_dir):
        for name in names:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
    out: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
    ctl_x = round(out[control] / bench.BEST_KNOWN[control], 2)
    print(json.dumps({"queries": out, "control_x": ctl_x}))
    spark.stop()


if __name__ == "__main__":
    main()
