"""Kleene-closure scale study (r10 verdict #5): does the distributed
path-doubling + adaptive node-dictionary fixpoint (plans/paths.py
_kleene_plus) hold at ~10^7 edges, where the reference executes the
whole closure in ONE partition (lib/physical/src/paths/kleene_plus/
physical.rs:164-438)?

Three topologies, each driven END-TO-END through store.query():

- deep   : a single 2k-node chain — the ADVERSARIAL worst case for
           path doubling: on a pure chain, round k's delta.paths join
           emits ~|delta_k| x 2^(k-1) intermediate rows before dedup
           (every split point of every new pair), so total intermediate
           volume is Theta(n^3) while the closure is only n(n+1)/2.
           n=2000 keeps that ~10^9 (minutes); n=10^4 would be ~10^11 —
           measured once (killed at 30 min) and documented as the
           operator's contract limit: deep UNSEEDED chains beyond ~5k
           nodes are intermediate-bound; a seeded (reachability) query
           is the scale path. Starts UNencoded (2k edges <
           KLEENE_DICT_MIN_EDGES) so the mid-fixpoint dictionary
           UPGRADE fires under real volume; closure count validated
           against the closed form.
- bushy  : 10^5 disjoint complete binary trees x ~100 nodes
           (~10^7 edges): shallow diameter -> few doubling rounds,
           validates pairs = sum-of-depths closed form.
- seeded : G(n=10^6, m=10^7) random digraph, query <n0> p+ ?o —
           frontier stepping pays for REACHABILITY, not the (utterly
           infeasible ~n^2) full closure; this is the operator the
           engine claims to beat the reference on at scale.

Prints one RESULT line per phase: wall seconds, rounds
(paths.LAST_KLEENE_ROUNDS), result rows, expected rows (or None).
Usage: python tools/kleene_scale_study.py [deep|bushy|seeded ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = "http://x/p"


def _iri(col):
    from pyspark.sql import functions as F

    from rdf_fusion_spark.terms import term_struct
    return term_struct(F.lit(0), F.concat(F.lit("http://x/n"),
                                          col.cast("string")))


def _store(spark, edges_df):
    """(src:long, tgt:long) -> GraphStore with IRI terms and predicate P."""
    from pyspark.sql import functions as F

    from rdf_fusion_spark.store import GraphStore
    from rdf_fusion_spark.terms import TERM_TYPE, term_struct
    quads = edges_df.select(
        F.lit(None).cast(TERM_TYPE).alias("graph"),
        _iri(F.col("src")).alias("subject"),
        term_struct(F.lit(0), F.lit(P)).alias("predicate"),
        _iri(F.col("tgt")).alias("object"))
    return GraphStore(spark, quads)


def deep_edges(spark, n=2_000):
    from pyspark.sql import functions as F
    return (spark.range(n).select(F.col("id").alias("src"),
                                  (F.col("id") + 1).alias("tgt")),
            (n + 1) * n // 2)


def bushy_edges(spark, trees=100_000, size=100):
    from pyspark.sql import functions as F
    # node i of tree t: child edges parent=(i-1)//2 -> i for i>=1;
    # expected pairs per tree = sum over nodes of depth(i)
    import math
    exp_tree = sum(int(math.log2(i + 1)) for i in range(size))
    e = (spark.range(trees * size)
         .select((F.col("id") / size).cast("long").alias("t"),
                 (F.col("id") % size).alias("i"))
         .where(F.col("i") >= 1)
         .select((F.col("t") * size + (F.col("i") - 1).cast("long") / 2
                  ).cast("long").alias("src"),
                 (F.col("t") * size + F.col("i")).alias("tgt")))
    return e, exp_tree * trees


def seeded_edges(spark, n=1_000_000, m=10_000_000):
    from pyspark.sql import functions as F
    # deterministic pseudo-random digraph: xxhash-derived endpoints
    e = (spark.range(m).select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n).alias("src"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n).alias("tgt")))
    return e, None


def run_phase(spark, name):
    from rdf_fusion_spark.plans import paths as PA
    if name == "deep":
        edges, expect = deep_edges(spark)
        q = f"SELECT ?s ?o WHERE {{ ?s <{P}>+ ?o }}"
    elif name == "bushy":
        edges, expect = bushy_edges(spark)
        q = f"SELECT ?s ?o WHERE {{ ?s <{P}>+ ?o }}"
    else:
        edges, expect = seeded_edges(spark)
        q = f"SELECT ?o WHERE {{ <http://x/n0> <{P}>+ ?o }}"
    store = _store(spark, edges)
    t0 = time.perf_counter()
    rows = store.query(q).df.count()
    wall = round(time.perf_counter() - t0, 1)
    rec = {"phase": name, "wall_s": wall, "rows": rows,
           "expected": expect, "rounds": PA.LAST_KLEENE_ROUNDS["rounds"],
           "seeded": PA.LAST_KLEENE_ROUNDS["seeded"],
           "ok": expect is None or rows == expect}
    print("RESULT " + json.dumps(rec), flush=True)
    return rec


def main() -> None:
    from pyspark.sql import SparkSession
    phases = sys.argv[1:] or ["deep", "bushy", "seeded"]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("kleene-scale-study")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in phases:
        run_phase(spark, name)
    print("STUDY DONE", flush=True)


if __name__ == "__main__":
    main()
