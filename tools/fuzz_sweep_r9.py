"""Offline differential-fuzz sweep for the round-9 layers.

Usage: python tools/fuzz_sweep_r9.py [n_seeds] (default 150; each seed
runs 2 aggregate + 2 ORDER BY/LIMIT/OFFSET queries -> 4*n queries).

Drives tests/test_algebra_fuzz.py's run_agg_case / run_order_case over
seed ranges far beyond the in-suite 12, printing every divergence with
its seed so a failure can be pinned as a regression test. The in-suite
seeds stay small so `pytest tests/` stays fast; this script is the
recorded-campaign runner (BASELINE.md fuzz records).
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fuzz-sweep-r9")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import test_algebra_fuzz as FZ

    t0 = time.time()
    bad = 0
    for layer, fn in (("agg", FZ.run_agg_case), ("order", FZ.run_order_case),
                      ("order_proj", FZ.run_order_proj_case),
                      ("order_full", FZ.run_order_full_case),
                      ("agg_order", FZ.run_agg_order_case)):
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
    print(f"SWEEP DONE layers=5 seeds={n} queries={10*n} "
          f"divergences={bad} wall={time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
