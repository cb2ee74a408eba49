"""Empirical scale study for the temporal join operators (asof_join,
interval_join — pipeline/temporal.py): wall time and output growth over
synthetic event logs at increasing row counts.

Events are synthesized fully distributed (spark.range): N rows across
N/666 users, timestamps spread uniformly over ~30 days, 20% 'error'
rows and 20% 'click' rows (the shapes the registry queries use). The
PER-USER event density is held constant as N grows — users scale with
the data, like a real warehouse — so:

  - asof_join output = #clicks (one row per left row) -> linear, and
    the per-key window sort cost is constant per user.
  - interval_join output ~ #clicks x (errors within ±6h per user)
    -> linear at constant density.

A quadratic blowup in either wall time or output would mean the plan
degenerated into the range join these operators exist to avoid.

Usage: python tools/temporal_scale_study.py [N ...]
       (default 100000 1000000)
Prints one JSON line per N; paste into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USERS_PER = 666          # users = N // USERS_PER (sf0.1's 100k/150 ratio)
SPAN_S = 30 * 86_400     # event horizon
WINDOW_S = 21_600        # interval query's ±6 h
TOL_S = 172_800          # asof query's 2-day tolerance


def synth(spark, n):
    from pyspark.sql import functions as F
    n_users = max(1, n // USERS_PER)
    return (spark.range(n)
            .select(F.col("id").alias("event_id"),
                    F.timestamp_seconds(
                        1_700_000_000
                        + (F.xxhash64(F.col("id"), F.lit(1))
                           % SPAN_S + SPAN_S) % SPAN_S).alias("ts"),
                    ((F.xxhash64(F.col("id"), F.lit(2)) % n_users + n_users)
                     % n_users).alias("user_id"),
                    F.element_at(
                        F.array(F.lit("click"), F.lit("error"),
                                F.lit("view"), F.lit("purchase"),
                                F.lit("signup")),
                        ((F.xxhash64(F.col("id"), F.lit(3)) % 5 + 5) % 5 + 1)
                        .cast("int")).alias("event_type"),
                    (F.xxhash64(F.col("id"), F.lit(4)) % 1000 / 100.0)
                    .alias("value")))


def study(spark, n):
    from pyspark.sql import functions as F

    from rdf_fusion_spark.pipeline.temporal import (asof_join,
                                                    interval_join, micros)
    ev = synth(spark, n).localCheckpoint(eager=True)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    errors = (ev.where(F.col("event_type") == "error")
              .groupBy("user_id", "ts").agg(F.max("value").alias("ev")))
    t0 = time.time()
    n_asof = asof_join(clicks, errors, "ts", ("user_id",),
                       tolerance_s=TOL_S).count()
    t_asof = time.time() - t0

    us = WINDOW_S * 1_000_000
    pts = clicks.withColumn("p_us", micros(F.col("ts"), "timestamp"))
    iv = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"),
        (micros(F.col("ts"), "timestamp") - us).alias("lo_us"),
        (micros(F.col("ts"), "timestamp") + us).alias("hi_us"))
    t0 = time.time()
    n_int = interval_join(pts, iv, "p_us", "lo_us", "hi_us",
                          bucket_width=2 * us, by=("user_id",)).count()
    t_int = time.time() - t0
    return {"n": n, "users": max(1, n // USERS_PER),
            "clicks": clicks.count(), "errors": errors.count(),
            "asof_rows": n_asof, "asof_wall_s": round(t_asof, 2),
            "interval_pairs": n_int, "interval_wall_s": round(t_int, 2)}


def main():
    from pyspark.sql import SparkSession
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(study(spark, n)), flush=True)


if __name__ == "__main__":
    main()
