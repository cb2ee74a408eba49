"""asof_join (pipeline/temporal.py) vs a pure-Python reference.

The reference implements the textbook definition directly — for every
left row, scan ALL right rows of the same key and pick the greatest
right.ts <= left.ts (backward) / smallest right.ts >= left.ts
(forward), inclusive, tolerance applied after the pick (merge_asof
semantics). The operator under test is the union-tag windowed plan,
a completely different algorithm.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from rdf_fusion_spark.pipeline.temporal import asof_join, interval_join

BASE = dt.datetime(2024, 1, 1)


def T(s):
    return BASE + dt.timedelta(seconds=s)


def ref_asof(left_rows, right_rows, direction="backward", tolerance_s=None):
    """left_rows: [(key, ts_s, tag)]; right_rows: [(key, ts_s, val)].
    Returns {(key, ts_s, tag): (r_ts_s, val) | None}."""
    out = {}
    for key, lts, tag in left_rows:
        if direction == "backward":
            cand = [(rts, v) for k, rts, v in right_rows
                    if k == key and rts <= lts]
            pick = max(cand, key=lambda c: c[0], default=None)
        else:
            cand = [(rts, v) for k, rts, v in right_rows
                    if k == key and rts >= lts]
            pick = min(cand, key=lambda c: c[0], default=None)
        if pick is not None and tolerance_s is not None \
                and abs(lts - pick[0]) > tolerance_s:
            pick = None
        out[(key, lts, tag)] = pick
    return out


def _random_case(seed):
    rng = random.Random(seed)
    keys = [1, 2, 3]
    # distinct (key, ts) on the right: asof ties are unspecified
    right_slots = {(k, rng.randrange(0, 120)) for k in keys
                   for _ in range(rng.randrange(0, 8))}
    right = [(k, ts, rng.choice([None, round(rng.uniform(0, 9), 2)]))
             for k, ts in sorted(right_slots)]
    left = [(rng.choice(keys + [4]), rng.randrange(0, 120), f"t{i}")
            for i in range(rng.randrange(1, 25))]
    return left, right


def _run(spark, left, right, **kw):
    ldf = spark.createDataFrame(
        [(k, T(ts), tag) for k, ts, tag in left],
        "user_id long, ts timestamp, tag string")
    rdf = spark.createDataFrame(
        [(k, T(ts), v) for k, ts, v in right],
        "user_id long, ts timestamp, val double")
    rows = asof_join(ldf, rdf, "ts", ("user_id",), **kw).collect()
    return {(r.user_id, int((r.ts - BASE).total_seconds()), r.tag):
            (None if r.ts_r is None
             else (int((r.ts_r - BASE).total_seconds()), r.val_r))
            for r in rows}


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_reference(spark, seed, direction):
    left, right = _random_case(seed)
    got = _run(spark, left, right, direction=direction)
    want = ref_asof(left, right, direction=direction)
    assert len(got) == len(left)
    # NULL val with a matched ts is a REAL match whose payload is null —
    # the reference keeps (ts, None); an unmatched row maps to None.
    assert got == want


@pytest.mark.parametrize("tolerance_s", [0, 7, 30])
def test_asof_tolerance(spark, tolerance_s):
    left, right = _random_case(99)
    got = _run(spark, left, right, tolerance_s=tolerance_s)
    want = ref_asof(left, right, tolerance_s=tolerance_s)
    assert got == want


def test_asof_null_payload_does_not_leak_older_row(spark):
    # right rows: ts=10 val=1.0, ts=15 val=NULL. A left row at ts=20
    # must match (15, NULL) — carrying columns independently would skip
    # the NULL and mix 15's ts with 10's value.
    got = _run(spark, [(1, 20, "a")], [(1, 10, 1.0), (1, 15, None)])
    assert got == {(1, 20, "a"): (15, None)}


def test_asof_inclusive_at_equal_ts_both_directions(spark):
    left = [(1, 10, "a")]
    right = [(1, 10, 5.0)]
    assert _run(spark, left, right)[(1, 10, "a")] == (10, 5.0)
    assert _run(spark, left, right, direction="forward")[(1, 10, "a")] \
        == (10, 5.0)


def test_asof_no_match_is_left_outer(spark):
    got = _run(spark, [(7, 5, "x")], [(1, 1, 2.0)])
    assert got == {(7, 5, "x"): None}


def test_asof_single_shuffle_no_range_join(spark):
    # The plan must be ONE exchange on the key feeding a window — never
    # a (range/theta) join that pairs every left row with every earlier
    # right row. At 100 TB the latter is quadratic in events-per-key.
    ldf = spark.createDataFrame([(1, T(1), "a")],
                                "user_id long, ts timestamp, tag string")
    rdf = spark.createDataFrame([(1, T(1), 1.0)],
                                "user_id long, ts timestamp, val double")
    plan = asof_join(ldf, rdf, "ts", ("user_id",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------- interval


def ref_interval(points, intervals):
    """points: [(key, x, tag)]; intervals: [(key, lo, hi, iid)]."""
    return {(k, x, tag, iid)
            for k, x, tag in points
            for ik, lo, hi, iid in intervals
            if k == ik and lo <= x <= hi}


def _run_interval(spark, points, intervals, width):
    pdf = spark.createDataFrame(points, "user_id long, x long, tag string")
    idf = spark.createDataFrame(intervals,
                                "user_id long, lo long, hi long, iid long")
    rows = interval_join(pdf, idf, "x", "lo", "hi", width,
                         by=("user_id",)).collect()
    return {(r.user_id, r.x, r.tag, r.iid_i) for r in rows}


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("width", [1, 7, 100])
def test_interval_join_matches_bruteforce(spark, seed, width):
    rng = random.Random(seed)
    points = [(rng.randrange(1, 4), rng.randrange(-50, 150), f"p{i}")
              for i in range(30)]
    intervals = []
    for i in range(12):
        lo = rng.randrange(-60, 140)
        intervals.append((rng.randrange(1, 4), lo,
                          lo + rng.randrange(0, 40), i))
    # include a degenerate lo > hi interval: must match nothing
    intervals.append((1, 50, 40, 99))
    got = _run_interval(spark, points, intervals, width)
    assert got == ref_interval(points, intervals)


def test_interval_join_boundary_inclusive(spark):
    got = _run_interval(spark, [(1, 10, "a"), (1, 20, "b"), (1, 21, "c")],
                        [(1, 10, 20, 0)], width=10)
    assert got == {(1, 10, "a", 0), (1, 20, "b", 0)}


def test_interval_join_no_nested_loop(spark):
    pdf = spark.createDataFrame([(1, 5, "a")],
                                "user_id long, x long, tag string")
    idf = spark.createDataFrame([(1, 0, 9, 0)],
                                "user_id long, lo long, hi long, iid long")
    plan = interval_join(pdf, idf, "x", "lo", "hi", 10, by=("user_id",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_reserved_names_rejected(spark):
    ldf = spark.createDataFrame([(1, T(1), 1.0)],
                                "user_id long, ts timestamp, __r double")
    rdf = spark.createDataFrame([(1, T(1), 1.0)],
                                "user_id long, ts timestamp, val double")
    with pytest.raises(ValueError, match="reserved column"):
        asof_join(ldf, rdf, "ts", ("user_id",))
    with pytest.raises(ValueError, match="reserved column"):
        asof_join(rdf, ldf, "ts", ("user_id",))


def test_floor_div_exact_beyond_double_precision(spark):
    """_floor_div must be exact for longs > 2^53 — a double division
    rounds 19-digit values and can misplace boundary values."""
    from rdf_fusion_spark.pipeline.temporal import _floor_div
    vals = [2**60 + 1, 2**60, -(2**60) - 1, 2**62 + 7, -3, 0,
            9_223_372_036_854_775_000, -9_223_372_036_854_775_000]
    width = 7
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.v: r.b for r in
           df.select("v", _floor_div(F.col("v"), width, "bigint")
                     .alias("b")).collect()}
    assert got == {v: v // width for v in vals}


def test_interval_join_sentinel_interval_clamped(spark):
    """Round-8 verdict #1: an open-ended sentinel interval (hi ~ 10^15,
    the epoch-micros magnitude of 9999-12-31) must NOT explode into
    hi/width bucket rows. Unclamped, width=10 here would mean a 10^14-
    element sequence() — far over Spark's array limit, a guaranteed
    crash; clamping to the point range makes it ~30 buckets."""
    points = [(1, x, f"p{x}") for x in range(0, 300, 7)]
    intervals = [(1, 250, 10**15, 0),       # sentinel "valid_to"
                 (1, -10**15, 50, 1),       # open-ended start too
                 (1, 40, 60, 2),            # normal interval
                 (2, 0, 10**15, 3)]         # key with no points at all
    got = _run_interval(spark, points, intervals, width=10)
    assert got == ref_interval(points, intervals)


def test_interval_join_bucket_cap_raises(spark):
    pdf = spark.createDataFrame([(1, 0, "a"), (1, 10**6, "b")],
                                "user_id long, x long, tag string")
    idf = spark.createDataFrame([(1, 0, 10**6, 0)],
                                "user_id long, lo long, hi long, iid long")
    guarded = interval_join(pdf, idf, "x", "lo", "hi", 1, by=("user_id",),
                            max_buckets_per_interval=100)
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        guarded.collect()
    # cap disabled: same plan must execute (10^6 buckets is big but legal)
    ok = interval_join(pdf, idf, "x", "lo", "hi", 1, by=("user_id",),
                       max_buckets_per_interval=None)
    assert {(r.x, r.iid_i) for r in ok.collect()} == {(0, 0), (10**6, 0)}


def test_interval_join_still_no_nested_loop_with_clamp(spark):
    pdf = spark.createDataFrame([(1, 5, "a")],
                                "user_id long, x long, tag string")
    idf = spark.createDataFrame([(1, 0, 9, 0)],
                                "user_id long, lo long, hi long, iid long")
    # keyed: the per-key bounds join is a real equi-join — no BNLJ at all
    plan = interval_join(pdf, idf, "x", "lo", "hi", 10, by=("user_id",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # keyless: Catalyst constant-folds the __one key, leaving ONE BNLJ
    # whose build side is the guaranteed-1-row bounds aggregate under a
    # broadcast — a scalar-subquery shape, constant cost, not the
    # |P|x|I| BNLJ this operator exists to avoid. The point join on
    # __bkt must still be an equi-join.
    plan = interval_join(pdf, idf, "x", "lo", "hi", 10, by=()) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "IdentityBroadcastMode" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin [__bkt" in plan or "ShuffledHashJoin [__bkt" in plan \
        or "BroadcastHashJoin [__bkt" in plan


def _run_sliced(spark, left, right, **kw):
    from rdf_fusion_spark.pipeline.temporal import asof_join_sliced
    ldf = spark.createDataFrame(
        [(k, T(ts), tag) for k, ts, tag in left],
        "user_id long, ts timestamp, tag string")
    rdf = spark.createDataFrame(
        [(k, T(ts), v) for k, ts, v in right],
        "user_id long, ts timestamp, val double")
    rows = asof_join_sliced(ldf, rdf, "ts", ("user_id",), **kw).collect()
    return {(r.user_id, int((r.ts - BASE).total_seconds()), r.tag):
            (None if r.ts_r is None
             else (int((r.ts_r - BASE).total_seconds()), r.val_r))
            for r in rows}


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_sliced_equals_plain(spark, seed, direction):
    """The hot-key escalation (asof_join_sliced) must reproduce
    asof_join exactly — matches crossing slice boundaries come from the
    carry-in seeds, left-only slices included. slice_minutes is tiny
    (events span 0-120 s, slices of 1 min) so nearly every match
    crosses a boundary; tolerance exercises the post-coalesce filter
    against a seed row's original timestamp."""
    left, right = _random_case(seed)
    for tol in (None, 45):
        plain = _run(spark, left, right, direction=direction,
                     tolerance_s=tol)
        sliced = _run_sliced(spark, left, right, direction=direction,
                             tolerance_s=tol, slice_minutes=1)
        assert sliced == plain, (seed, direction, tol)


def test_asof_sliced_left_only_slice_gets_carry_in(spark):
    """A left row slices ahead of every right row: the spine must still
    deliver the carry-in (right at t=10s, left at t=500s = a later
    1-minute slice with no rights)."""
    from rdf_fusion_spark.pipeline.temporal import asof_join_sliced
    ldf = spark.createDataFrame([(1, T(500), "a")],
                                "user_id long, ts timestamp, tag string")
    rdf = spark.createDataFrame([(1, T(10), 7.0)],
                                "user_id long, ts timestamp, val double")
    got = asof_join_sliced(ldf, rdf, "ts", ("user_id",),
                           slice_minutes=1).collect()
    assert len(got) == 1 and got[0].val_r == 7.0
