"""Empirical scale study for the SimHash near-dup candidate generator
(round-6 verdict task 6: the 32k-bucket claim was analytical only).

Synthesizes N documents fully distributed (spark.range → deterministic
token sequences over a VOCAB-word vocabulary; ~DOC_LEN tokens/doc; a
DUP_FRACTION slice are near-copies of earlier docs with a few tokens
perturbed, so the corpus has a realistic near-dup population), then
measures for the CURRENT banding scheme in pipeline/dedup.py:

  - fingerprint wall-time (the 60-bit simhash aggregate)
  - band-bucket histogram (max / p99 / mean memberships per bucket)
  - candidate-pair count BEFORE the exact hamming filter (the join
    output that dominates cost at scale)
  - surviving pairs after hamming <= 3
  - dropped bucket-cap mass

Usage: python tools/simhash_scale_study.py [N ...]   (default 100000 1000000)
Prints one JSON line per N; paste the table into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 50_000
DOC_LEN = 80
DUP_FRACTION = 0.02


def make_docs(spark, n: int):
    from pyspark.sql import functions as F
    base = spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.col("id"),
        # dup slice: near-copy of doc id-7 with the first 3 token slots
        # perturbed (hamming distance of the fingerprints stays small)
        F.when((F.col("id") % F.lit(int(1 / DUP_FRACTION)) == 0)
               & (F.col("id") >= 7), F.col("id") - 7)
        .otherwise(F.col("id")).alias("src"),
        (F.when((F.col("id") % F.lit(int(1 / DUP_FRACTION)) == 0)
                & (F.col("id") >= 7), F.lit(3))
         .otherwise(F.lit(0))).alias("perturb"),
    )
    tok = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_LEN)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(
                F.when(i <= F.col("perturb"),
                       F.col("id") * 1_000_003 + i)      # perturbed slot
                .otherwise(F.col("src") * 1_000_003 + i)),
                F.lit(VOCAB))))
    return base.select("doc_id", F.array_join(tok, " ").alias("text"))


def study(spark, n: int) -> dict:
    from pyspark.sql import functions as F
    from rdf_fusion_spark.pipeline import dedup

    docs = make_docs(spark, n).repartition(
        max(spark.sparkContext.defaultParallelism, 8)).persist()
    docs.count()

    t0 = time.perf_counter()
    sig = dedup.simhash(docs).persist()
    n_sig = sig.count()
    t_fingerprint = time.perf_counter() - t0

    # band-bucket histogram for the scheme dedup.py actually uses
    bands = dedup._band_keys_col()
    memb = sig.select(F.explode(bands).alias("b")).select("b.*")
    hist = (memb.groupBy("band_idx", "band_val").count()
            .agg(F.max("count").alias("max"),
                 F.expr("percentile_approx(count, 0.99)").alias("p99"),
                 F.avg("count").alias("mean"),
                 F.count("*").alias("distinct_buckets"),
                 F.sum(F.expr("count * (count - 1) / 2")).alias(
                     "candidate_pairs_upper")).collect()[0].asDict())

    t0 = time.perf_counter()
    pairs = dedup.simhash_near_dup_pairs(docs, 3)
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0

    docs.unpersist()
    sig.unpersist()
    return {
        "n_docs": n,
        "n_fingerprints": n_sig,
        "fingerprint_s": round(t_fingerprint, 1),
        "pairs_s": round(t_pairs, 1),
        "bucket_max": int(hist["max"]),
        "bucket_p99": int(hist["p99"]),
        "bucket_mean": round(float(hist["mean"]), 2),
        "distinct_buckets": int(hist["distinct_buckets"]),
        "candidate_pairs": int(hist["candidate_pairs_upper"]),
        "surviving_pairs": n_pairs,
    }


def main() -> None:
    from pyspark.sql import SparkSession
    ns = [int(x) for x in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("simhash-scale-study")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(study(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
