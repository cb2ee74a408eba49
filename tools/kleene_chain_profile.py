"""Profile the unseeded Kleene closure on a chain graph: total wall and
per-round deltas, under (a) default knobs, (b) dictionary from round 1,
(c) a lower mid-fixpoint upgrade threshold.

Usage: python tools/kleene_chain_profile.py [chain_n] [mode ...]
Modes: default dict0 up50k  (all three when omitted)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
MODES = sys.argv[2:] or ["default", "dict0", "up50k"]


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession

    from rdf_fusion_spark import GraphStore
    from rdf_fusion_spark.plans import paths as P

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("kleene-chain-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    nt = "".join(
        f"<http://ex/n{i}> <http://ex/next> <http://ex/n{i + 1}> .\n"
        for i in range(CHAIN_N))
    with tempfile.NamedTemporaryFile("w", suffix=".nt", delete=False) as f:
        f.write(nt)
        path = f.name
    store = GraphStore.load(spark, path)

    defaults = (P.KLEENE_DICT_MIN_EDGES, P.KLEENE_DICT_MIN_PAIRS)
    for mode in MODES:
        if mode == "default":
            P.KLEENE_DICT_MIN_EDGES, P.KLEENE_DICT_MIN_PAIRS = defaults
        elif mode == "dict0":
            P.KLEENE_DICT_MIN_EDGES, P.KLEENE_DICT_MIN_PAIRS = 0, defaults[1]
        elif mode == "up50k":
            P.KLEENE_DICT_MIN_EDGES, P.KLEENE_DICT_MIN_PAIRS = \
                defaults[0], 50_000
        else:
            raise SystemExit(f"unknown mode {mode}")
        t0 = time.perf_counter()
        res = store.query(
            "SELECT (COUNT(*) AS ?n) WHERE { ?a <http://ex/next>+ ?b }")
        n = int(res.df.collect()[0]["n"]["v"])
        dt = time.perf_counter() - t0
        expect = CHAIN_N * (CHAIN_N + 1) // 2
        print(f"mode={mode} n={n} ok={n == expect} "
              f"rounds={P.LAST_KLEENE_ROUNDS['rounds']} wall={dt:.1f}s",
              flush=True)
    P.KLEENE_DICT_MIN_EDGES, P.KLEENE_DICT_MIN_PAIRS = defaults
    spark.stop()


if __name__ == "__main__":
    main()
