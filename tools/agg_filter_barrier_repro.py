"""Minimal repro justifying the aggregate-filter pushdown barrier
(plans/translator.py _apply_plain_filters; r11 verdict asked for a
re-test after the flat-predicate work, r12 re-confirms).

Runs q_bsbm_bi_q6 — FILTER(?ravg > ?g * 1.5) over two aggregate-output
vars — with RFS_NO_AGG_FILTER_BARRIER=1 under a watchdog. Without the
barrier Catalyst's PushDownPredicates alias-substitutes the stacked
post-aggregate projections (promotion ladder + materialize_lexical,
~12x expansion per level) into the pushed condition and the optimizer
never returns (observed: >180 s for a query that executes in ~1.2 s
with the barrier; historically a 445 MB plan string).

Usage: python tools/agg_filter_barrier_repro.py [timeout_s]
Prints one line: BARRIER-STILL-REQUIRED (optimizer exceeded the budget)
or BARRIER-OBSOLETE (query completed without it — remove the barrier).
"""

from __future__ import annotations

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["RFS_NO_AGG_FILTER_BARRIER"] = "1"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("agg-filter-barrier-repro")
             .config("spark.driver.memory", "6g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from rdf_fusion_spark import entry_queries as EQ

    done = threading.Event()

    def run() -> None:
        df = EQ.queries()["q_bsbm_bi_q6"](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    if done.wait(BUDGET_S):
        print("BARRIER-OBSOLETE: bi_q6 completed without the barrier "
              f"inside {BUDGET_S:.0f}s — re-evaluate removing it")
    else:
        print("BARRIER-STILL-REQUIRED: bi_q6 did not finish within "
              f"{BUDGET_S:.0f}s without the barrier (optimizer-bound); "
              "with the barrier it executes in ~1 s")
    os._exit(0)  # daemon thread may be wedged inside the JVM


if __name__ == "__main__":
    main()
