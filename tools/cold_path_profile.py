"""Interactive cold-path split for one BSBM Explore template (round-7
verdict task 8): where do the 0.2-0.5 s of per-cold-query driver time go —
parse, algebra translation (Python), or Catalyst analysis (py4j/JVM)?

Runs N parameterized instances of explore_q4 (distinct constants, so
every instance is a cold plan-cache miss, exactly like `bench.py --mix`),
and times each phase separately:

  - parse_s:      sparql text -> AST (pure Python, sparql/parser.py)
  - translate_s:  AST -> DataFrame (plans/translator.py; includes the
                  py4j Column-building round-trips AND Catalyst analysis
                  triggered by DataFrame construction)
  - analyze_s:    forcing queryExecution().analyzed() on the result (any
                  residual lazy analysis not already paid above)

Prints one JSON line with per-phase mean/min over the instances.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession
    from rdf_fusion_spark import entry_queries as EQ
    from rdf_fusion_spark.sparql.parser import parse_query
    from rdf_fusion_spark.plans.translator import evaluate_query

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("cold-path-profile")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    store = EQ.get_graph(spark, SF_DIR)

    texts = EQ.bsbm_mix_instances(n)["explore_q4"]
    # JVM/py4j warm-up on a throwaway instance
    store.query(texts[0]).df.count()

    phases = {"parse_s": [], "translate_s": [], "analyze_s": []}
    for text in texts:
        t0 = time.perf_counter()
        ast = parse_query(text)
        t1 = time.perf_counter()
        res = evaluate_query(store, ast)
        t2 = time.perf_counter()
        res.df._jdf.queryExecution().analyzed()
        t3 = time.perf_counter()
        phases["parse_s"].append(t1 - t0)
        phases["translate_s"].append(t2 - t1)
        phases["analyze_s"].append(t3 - t2)

    out = {"template": "explore_q4", "n": n, "sf_dir": SF_DIR}
    for k, v in phases.items():
        out[k] = {"mean": round(sum(v) / len(v), 4), "min": round(min(v), 4)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
