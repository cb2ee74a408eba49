"""A/B for BSBM BI Q6's shared-subquery persist under the prepared-plan
path (round-7 verdict task 5: bi_q6 was the only mirror that moved the
wrong way driver-to-driver, +6% — is reregister_persists still restoring
the shared 4-way rating UNION's cache on plan-cache hits, or was the
drift noise?).

Runs q_bsbm_bi_q6 at sf0.1 min-of-N twice through the SAME prepared-plan
cache path the bench uses (entry_queries.queries()):

  A: stock        — reregister_persists restores the persist snapshot
  B: disabled     — reregister_persists patched to a no-op, so cache
                    hits re-execute the shared subtree once per consumer

If the persist still fires, B must be measurably slower than A.
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, EQ, n: int) -> float:
    qs = EQ.queries()
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df = qs["q_bsbm_bi_q6"](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        # evict the bi_q6 persists the way the bench's OTHER queries
        # would: run a different query so _release_prior_persists fires
        qs["q2_join_region_filter"](spark, SF_DIR).write.format(
            "noop").mode("overwrite").save()
    return best


def main() -> None:
    from pyspark.sql import SparkSession
    from rdf_fusion_spark import entry_queries as EQ
    from rdf_fusion_spark.plans import translator as T

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("bi-q6-persist-ab")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.files.maxPartitionBytes", "1m")
             .config("spark.sql.files.openCostInBytes", "256k")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    EQ.get_graph(spark, SF_DIR)

    a = run(spark, EQ, n)                      # stock (warm + measure)
    orig = T.reregister_persists
    T.reregister_persists = lambda session, dfs: None
    try:
        b = run(spark, EQ, n)                  # persists never restored
    finally:
        T.reregister_persists = orig
    a2 = run(spark, EQ, n)                     # stock again (drift check)

    print(json.dumps({
        "sf_dir": SF_DIR, "min_of": n,
        "stock_s": round(a, 3),
        "reregister_disabled_s": round(b, 3),
        "stock_again_s": round(a2, 3),
        "slowdown_x": round(b / min(a, a2), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
