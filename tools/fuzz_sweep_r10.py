"""Offline differential-fuzz sweep for the round-10 layers.

Usage: python tools/fuzz_sweep_r10.py [n_seeds] (default 250; each seed
runs 2 queries per layer).

Layers (all round-10): agg2 (AVG promotion/DISTINCT-over-values,
SAMPLE legality, GROUP_CONCAT per the reference's string-only/
common-lang rules, HAVING over computed COUNT/SUM), order_proj with
per-key mixed ASC/DESC directions (positional first-occurrence
DISTINCT), GRAPH (scoping/enumeration/var-collisions/path leaves),
UPDATE sequences (quad-set final-state compare), LATERAL (SEP-0006
substitution), and BIND-arithmetic. Same recorded-campaign pattern as
tools/fuzz_sweep_r9.py. The driver session carries a 10g heap: the
arith/lateral layers generate occasional cross-product-shaped queries
whose accumulated one-JVM state OOMs the 1g default long before any
semantic issue (BASELINE.md round-10).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fuzz-sweep-r10")
        .config("spark.driver.memory", "10g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import test_algebra_fuzz as FZ

    t0 = time.time()
    bad = 0
    for layer, fn in (("agg2", FZ.run_agg2_case),
                      ("order_proj_mixed", FZ.run_order_proj_case),
                      ("graph", FZ.run_graph_case),
                      ("update", FZ.run_update_case),
                      ("lateral", FZ.run_lateral_case),
                      ("arith", FZ.run_arith_case)):
        for seed in range(n):
            try:
                fn(spark, seed)
            except AssertionError:
                bad += 1
                print(f"DIVERGENCE layer={layer} seed={seed}", flush=True)
                traceback.print_exc()
            except Exception:
                bad += 1
                print(f"ERROR layer={layer} seed={seed}", flush=True)
                traceback.print_exc()
            if seed and seed % 25 == 0:
                print(f"{layer}: {seed}/{n} ({time.time()-t0:.0f}s)",
                      flush=True)
    print(f"SWEEP DONE layers=6 seeds={n} "
          f"divergences={bad} wall={time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
