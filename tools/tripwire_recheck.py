"""Fresh-session recheck of bench-tripwire DIAG entries.

Usage: python tools/tripwire_recheck.py q_name[:reps] [q_name[:reps] ...]

Reproduces bench.py's measurement protocol exactly — same session confs,
plan prepared once, an untimed sf0.001 warmup pass, then `reps` timed
noop-write executions at $SPARK_GRAFT_SF_DIR — and prints every sample
plus the min alongside the BEST_KNOWN pin, so a DIAG flag can be
adjudicated noise-vs-regression from an idle fresh JVM instead of from
whatever state the flagging run's session was in (round-8 verdict #1:
the tripwire "exists to be followed, not predicted").
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
    targets = []
    for arg in sys.argv[1:]:
        name, _, reps = arg.partition(":")
        targets.append((name, int(reps) if reps else 3))
    if not targets:
        raise SystemExit("usage: tripwire_recheck.py q_name[:reps] ...")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("tripwire-recheck")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import BEST_KNOWN
    from rdf_fusion_spark import entry_queries as EQ

    qs = EQ.queries()
    EQ.get_graph(spark, SF_DIR)

    out = {}
    for name, reps in targets:
        fn = qs[name]
        fn(spark, SF_DIR)  # prepare/caches the plan, like bench's split
        try:  # untimed JIT/codegen warmup at the smallest SF
            fn(spark, "/root/testdata/sf0.001").write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        pin = BEST_KNOWN.get(name)
        out[name] = {
            "samples": samples, "min": min(samples), "pin": pin,
            "x_vs_pin": round(min(samples) / pin, 2) if pin else None,
        }
        print("RECHECK " + json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "recheck": out}))


if __name__ == "__main__":
    main()
