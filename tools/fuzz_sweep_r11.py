"""Offline differential-fuzz sweep for the round-11 layers.

Usage: python tools/fuzz_sweep_r11.py [n_seeds] [layers...] (default 250
seeds; each seed runs 2 queries per layer). Layers: sfn (scalar-function
compositions: strings/accessors/casts under BIND+FILTER vs the pure-
Python evaluator), construct (CONSTRUCT template fuzz vs graph-
isomorphism compare), describe (DESCRIBE CBD). Same recorded-campaign
pattern as tools/fuzz_sweep_r10.py.
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
    args = [a for a in sys.argv[1:]]
    n = int(args.pop(0)) if args and args[0].isdigit() else 250
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fuzz-sweep-r11")
        .config("spark.driver.memory", "10g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import test_algebra_fuzz as FZ

    layers = {"sfn": FZ.run_sfn_case}
    for name in ("construct", "describe", "dur"):
        fn = getattr(FZ, f"run_{name}_case", None)
        if fn is not None:
            layers[name] = fn
    wanted = args or list(layers)

    t0 = time.time()
    bad = 0
    for layer in wanted:
        fn = layers[layer]
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
    print(f"SWEEP DONE layers={len(wanted)} seeds={n} "
          f"divergences={bad} wall={time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
