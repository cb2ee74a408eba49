"""Hot-key (skew) study for the window-partitioned operators
(asof_join — pipeline/temporal.py; sessionize — pipeline/sessions.py).

Both operators shuffle on the entity key and run an ordered window per
key, so their parallelism is bounded by the key distribution: a single
key owning 10^7 events serializes that key's sort + running scan into
ONE task. This study measures exactly that worst case against a
uniform-key control at the same N:

  uniform : N rows over N/666 users (the temporal_scale_study shape)
  hot     : the same N rows, but a `hot_frac` share of them all carry
            user_id = 0 (one sentinel entity — a bot account, a null-ish
            default key, a tracking pixel), remainder uniform.

Reported per mode: wall seconds for asof_join (clicks vs per-user error
aggregate) and sessionize, plus the hot key's row count. The question
is not whether the hot task is slower (it must be) but whether the
single-task sort is wall-clock-acceptable and memory-safe at 10^7 —
i.e. whether a time-sliced salt is NEEDED or the bound just needs
documenting (round-8 verdict #7).

Usage: python tools/hotkey_scale_study.py [N ...] [--hot-frac F]
       (default N=10000000, hot_frac=0.5)
Prints one JSON line per (N, mode); paste into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from temporal_scale_study import TOL_S, USERS_PER, synth  # noqa: E402


def with_hot_key(ev, hot_frac):
    from pyspark.sql import functions as F
    hot = (F.xxhash64(F.col("event_id"), F.lit(99)) % 1000 + 1000) % 1000 \
        < int(hot_frac * 1000)
    return ev.withColumn(
        "user_id", F.when(hot, F.lit(0)).otherwise(F.col("user_id")))


def study(spark, n, hot_frac, mode):
    from pyspark.sql import functions as F

    from rdf_fusion_spark.pipeline.sessions import (sessionize,
                                                     sessionize_sliced)
    from rdf_fusion_spark.pipeline.temporal import (asof_join,
                                                    asof_join_sliced)

    ev = synth(spark, n)
    if mode == "hot":
        ev = with_hot_key(ev, hot_frac)
    ev = ev.localCheckpoint(eager=True)

    hot_rows = ev.where(F.col("user_id") == 0).count()
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    errors = (ev.where(F.col("event_type") == "error")
              .groupBy("user_id", "ts").agg(F.max("value").alias("ev")))

    t0 = time.time()
    n_asof = asof_join(clicks, errors, "ts", ("user_id",),
                       tolerance_s=TOL_S).count()
    t_asof = time.time() - t0

    t0 = time.time()
    n_asof_sl = asof_join_sliced(clicks, errors, "ts", ("user_id",),
                                 tolerance_s=TOL_S,
                                 slice_minutes=360).count()
    t_asof_sl = time.time() - t0
    assert n_asof_sl == n_asof, (n_asof_sl, n_asof)

    t0 = time.time()
    plain = (sessionize(ev.select("user_id", "ts"), gap_minutes=30)
             .groupBy("user_id").agg(F.max("session_id").alias("m")))
    n_sess, ck = plain.agg(F.count(F.lit(1)), F.sum("m")).head()
    t_sess = time.time() - t0

    # the r10 hot-key escalation: same semantics, (user, 6h-slice)
    # window partitioning -> the hot key's sort parallelizes across
    # ~120 slices of the 30-day horizon; checksum pins equivalence
    t0 = time.time()
    sliced = (sessionize_sliced(ev.select("user_id", "ts"), gap_minutes=30,
                                slice_minutes=360)
              .groupBy("user_id").agg(F.max("session_id").alias("m")))
    n_sl, ck_sl = sliced.agg(F.count(F.lit(1)), F.sum("m")).head()
    t_sliced = time.time() - t0
    assert (n_sl, ck_sl) == (n_sess, ck), \
        f"sliced != plain: {(n_sl, ck_sl)} vs {(n_sess, ck)}"

    return {"n": n, "mode": mode, "hot_frac": hot_frac if mode == "hot" else 0,
            "hot_key_rows": hot_rows, "users": max(1, n // USERS_PER),
            "asof_rows": n_asof, "asof_wall_s": round(t_asof, 2),
            "asof_sliced_wall_s": round(t_asof_sl, 2),
            "sessionize_users": n_sess, "sessionize_wall_s": round(t_sess, 2),
            "sessionize_sliced_wall_s": round(t_sliced, 2),
            "sessions_checksum": int(ck)}


def main():
    from pyspark.sql import SparkSession
    argv = sys.argv[1:]
    hot_frac = 0.5
    if "--hot-frac" in argv:
        i = argv.index("--hot-frac")
        hot_frac = float(argv[i + 1])
        del argv[i:i + 2]
    ns = [int(a) for a in argv] or [10_000_000]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # two interleaved passes, min-of-2 per mode: the first pass of a
    # fresh JVM pays JIT/codegen compile that would otherwise bias
    # whichever mode runs first (observed: uniform-first read 2.6x its
    # own steady-state)
    for n in ns:
        results = {}
        for _rep in range(2):
            for mode in ("uniform", "hot"):
                r = study(spark, n, hot_frac, mode)
                prev = results.get(mode)
                tot = lambda x: (x["asof_wall_s"] + x["asof_sliced_wall_s"]
                                 + x["sessionize_wall_s"]
                                 + x["sessionize_sliced_wall_s"])
                if prev is None or tot(r) < tot(prev):
                    results[mode] = r
        for mode in ("uniform", "hot"):
            print(json.dumps(results[mode]), flush=True)


if __name__ == "__main__":
    main()
