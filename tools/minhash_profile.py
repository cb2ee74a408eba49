"""Stage-level profile of q_dedup_minhash_lsh (round-8 verdict #8: the
slowest bench entry at 2.5-2.8 s — find a cheap signature-stage win or
reject with a measurement).

Decomposes the pipeline cumulatively at $SPARK_GRAFT_SF_DIR documents
(min-of-3 each, separate actions so Spark can't share work):

  words     : scan + words_col + size agg
  shingles  : + n-gram construction
  md5       : + _md5i per shingle (md5 + hex conv)
  sig       : + the 8 rehash array_min transforms (= minhash_signature)
  sig1pass  : EXPERIMENT — signature via ONE F.aggregate traversal
              computing all 8 mins in a struct accumulator, instead of
              8 transform+array_min passes
  full      : minhash_lsh_pairs end-to-end (count)

Usage: python tools/minhash_profile.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rdf_fusion_spark.pipeline import dedup as D

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.files.maxPartitionBytes", "1m")
             .config("spark.sql.files.openCostInBytes", "256k")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def timed(name, mk):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({name: round(best, 3)}), flush=True)
        return best

    words = lambda: docs.select(F.size(D.words_col(F.col("text"))).alias("n"))
    sh = lambda: docs.select(F.size(D.shingles_col(F.col("text"))).alias("n"))
    md5 = lambda: docs.select(
        F.aggregate(F.transform(D.shingles_col(F.col("text")), D._md5i),
                    F.lit(0).cast("long"), lambda a, x: a + x).alias("s"))
    sig = lambda: D.minhash_signature(docs).drop("sh")

    def sig1pass():
        s = docs.select(F.col("doc_id").alias("id"),
                        D.shingles_col(F.col("text")).alias("sh"))
        init = F.struct(*[F.lit(D.MINHASH_P).cast("long").alias(f"s{k}")
                          for k in range(D.NUM_HASHES)])

        def step(acc, shg):
            h = D._md5i(shg)
            return F.struct(*[
                F.least(acc[f"s{k}"],
                        (h * D.MINHASH_A[k] + D.MINHASH_B[k]) % D.MINHASH_P)
                .alias(f"s{k}") for k in range(D.NUM_HASHES)])

        agg = F.aggregate(F.col("sh"), init, step)
        return s.select("id", *[agg[f"s{k}"].alias(f"s{k}")
                                for k in range(D.NUM_HASHES)])

    full = lambda: D.minhash_lsh_pairs(docs, 0.7)

    for name, mk in [("words", words), ("shingles", sh), ("md5", md5),
                     ("sig", sig), ("sig1pass", sig1pass), ("full", full)]:
        timed(name, mk)


if __name__ == "__main__":
    main()
