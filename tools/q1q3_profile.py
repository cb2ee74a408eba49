"""Floor study for q1/q3 (r12): engine time vs the ideal raw-SQL plan,
with and without the exact DECIMAL(38,18) oracle convention, to locate
where the remaining seconds live (RDF layer vs decimal arithmetic vs
irreducible shuffle).

Usage: python tools/q1q3_profile.py [REPS]
Prints one JSON line.
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

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("q1q3-profile")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rdf_fusion_spark import entry_queries as EQ

    qs = EQ.queries()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li.createOrReplaceTempView("lineitem")
    od.createOrReplaceTempView("orders")

    DEC = "decimal(38,18)"

    variants = {
        "q1_engine": lambda: qs["q1_pricing_summary"](spark, SF_DIR),
        "q1_sql_dec38": lambda: spark.sql(f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS STRING) AS DOUBLE),
                   CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS STRING) AS DOUBLE),
                   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS STRING) AS DOUBLE),
                   CAST(CAST(SUM(CAST(l_discount AS {DEC})) AS STRING) AS DOUBLE) / COUNT(l_discount),
                   COUNT(*)
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus"""),
        "q1_sql_double": lambda: spark.sql("""
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity), SUM(l_extendedprice),
                   SUM(l_extendedprice * (1 - l_discount)),
                   SUM(l_discount) / COUNT(l_discount), COUNT(*)
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus"""),
        "q3_engine": lambda: qs["q3_topk_revenue"](spark, SF_DIR),
        "q3_sql_dec38": lambda: spark.sql(f"""
            SELECT o_orderkey,
                   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS STRING) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
        "q3_sql_dec38_nojoin": lambda: spark.sql(f"""
            SELECT l_orderkey,
                   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS STRING) AS DOUBLE) AS revenue
            FROM lineitem
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
        "q3_sql_double": lambda: spark.sql("""
            SELECT o_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
        "control": lambda: qs["q_bsbm_explore_q9"](spark, SF_DIR),
    }

    # warmup (JIT) on the small SF for engine paths, and one run of each
    EQ.get_graph(spark, SF_DIR)
    for name, fn in variants.items():
        try:
            fn().write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"WARM-FAIL {name}: {exc}", file=sys.stderr)

    out = {}
    for name, fn in variants.items():
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
