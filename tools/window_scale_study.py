"""Empirical scale study for the shared-window (exact sub-document
duplication) operators (round-7 verdict task 3: SimHash got the 10^6-doc
treatment in round 7; the window-hash join had only sf0.1 evidence).

Synthesizes N documents fully distributed (spark.range → deterministic
~80-token docs over a huge token space, so baseline windows are unique),
with two duplication populations layered in:

  - PAIRWISE near-dups: 2% of docs copy a 16-token span from doc id-7
    (the Lee et al. sub-document duplication case — small buckets).
  - BOILERPLATE: 0.5% of docs share one GLOBAL 16-token span (the
    license-header / generated-text case — ONE mega bucket per window,
    500 members at 100k docs (below the 4096 cap → the round-8 cap gate
    must skip the rank window), 5000 at 1M (over the cap → rank path
    runs, dropped mass must be logged)).

Measured per N, for the operators as shipped in pipeline/dedup.py:

  - window memberships (explode count) and distinct window hashes
  - bucket histogram: max / p99 / mean members, candidate-pair upper
    bound sum C(c,2) BEFORE the cap
  - shared_window_pairs wall time + surviving pair count + capped mass
  - remove_shared_windows wall time + docs/tokens removed (the round-8
    transform — its canon aggregate shuffles full window STRINGS, the
    price of collision-proof removal; this measures that price)

Usage: python tools/window_scale_study.py [N ...]  (default 100000 1000000)
Prints one JSON line per N; paste the table into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOC_LEN = 80
SPAN_AT, SPAN_LEN = 21, 16          # pairwise-copied span: slots 21..36
BP_AT = 51                          # boilerplate span: slots 51..66
PAIR_EVERY = 50                     # 2% pairwise dups
BP_EVERY = 200                      # 0.5% boilerplate docs


def make_docs(spark, n: int):
    from pyspark.sql import functions as F
    base = spark.range(n).select(
        F.col("id"),
        ((F.col("id") % PAIR_EVERY == 0) & (F.col("id") >= 7))
        .alias("is_pair_dup"),
        (F.col("id") % BP_EVERY == 1).alias("is_bp"),
    )
    span_src = F.when(F.col("is_pair_dup"), F.col("id") - 7) \
        .otherwise(F.col("id"))

    def slot_token(i):
        # token of slot i: from the span source inside the copied span,
        # global boilerplate inside the bp span (bp docs only), else
        # unique to this doc. 10^15 token space → cross-doc collisions
        # of NON-duplicated windows are negligible.
        src = F.when((i >= SPAN_AT) & (i < SPAN_AT + SPAN_LEN), span_src) \
            .otherwise(F.col("id"))
        tok = F.concat(F.lit("w"), F.pmod(
            F.xxhash64(src * F.lit(1_000_003) + i), F.lit(10 ** 15)))
        return F.when(
            F.col("is_bp") & (i >= BP_AT) & (i < BP_AT + SPAN_LEN),
            F.concat(F.lit("bp"), i.cast("string"))).otherwise(tok)

    tok = F.transform(F.sequence(F.lit(1), F.lit(DOC_LEN)), slot_token)
    return base.select(F.col("id").alias("doc_id"),
                       F.array_join(tok, " ").alias("text"))


def study(spark, n: int) -> dict:
    from pyspark.sql import functions as F
    from rdf_fusion_spark.pipeline import dedup

    docs = make_docs(spark, n).repartition(
        max(spark.sparkContext.defaultParallelism, 8)).persist()
    docs.count()
    k = dedup.WINDOW_TOKENS
    cap = dedup.LSH_BUCKET_CAP

    # membership + bucket shape for the hash the operator actually joins on
    memb = docs.select(
        F.explode(dedup.shingles_col(F.col("text"), n=k)).alias("win")) \
        .select(F.xxhash64("win").alias("wh"))
    hist = (memb.groupBy("wh").count()
            .agg(F.count("*").alias("distinct_buckets"),
                 F.sum("count").alias("memberships"),
                 F.max("count").alias("max"),
                 F.expr("percentile_approx(count, 0.99)").alias("p99"),
                 F.avg("count").alias("mean"),
                 F.sum(F.expr("count * (count - 1) / 2"))
                 .alias("candidate_pairs_upper"),
                 F.sum(F.expr(f"greatest(count - {cap}, 0)"))
                 .alias("capped_mass")).collect()[0].asDict())

    t0 = time.perf_counter()
    n_pairs = dedup.shared_window_pairs(docs, k=k).count()
    t_pairs = time.perf_counter() - t0

    t0 = time.perf_counter()
    removed = dedup.remove_shared_windows(docs, k=k) \
        .agg(F.sum(F.expr("CAST(n_removed_tokens > 0 AS BIGINT)"))
             .alias("docs_hit"),
             F.sum("n_removed_tokens").alias("tokens_removed")) \
        .collect()[0]
    t_removal = time.perf_counter() - t0

    docs.unpersist()
    return {
        "n_docs": n,
        "memberships": int(hist["memberships"]),
        "distinct_buckets": int(hist["distinct_buckets"]),
        "bucket_max": int(hist["max"]),
        "bucket_p99": int(hist["p99"]),
        "bucket_mean": round(float(hist["mean"]), 3),
        "candidate_pairs_upper": int(hist["candidate_pairs_upper"]),
        "capped_mass": int(hist["capped_mass"]),
        "pairs_s": round(t_pairs, 1),
        "surviving_pairs": n_pairs,
        "removal_s": round(t_removal, 1),
        "docs_with_removal": int(removed["docs_hit"]),
        "tokens_removed": int(removed["tokens_removed"]),
    }


def main() -> None:
    from pyspark.sql import SparkSession
    ns = [int(x) for x in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # removal's canon aggregate shuffles the full window STRINGS (73M ×
    # ~50 B at 10^6 docs) through the ONE local JVM that is driver +
    # every executor at once — 16g OOMed its heap. On a cluster this
    # shuffle spreads across executors; locally, give the single JVM
    # real heap and more partitions so per-task hash tables stay small
    # enough to spill.
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("window-scale-study")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_STUDY_MEM", "48g"))
             .config("spark.sql.shuffle.partitions",
                     str(max(int(cpus) * 4, 64)))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(study(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
