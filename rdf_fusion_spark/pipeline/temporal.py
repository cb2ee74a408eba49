"""Temporal joins over event logs — the as-of join a training-data /
feature-engineering pipeline runs constantly (attach the latest sensor
reading, price, or error to each observation).

Spark has no built-in ASOF JOIN (DuckDB/Pandas do). The naive encoding
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` is a range join: every
left row pairs with ALL earlier right rows before the per-row max is
taken — quadratic in events-per-key and a guaranteed 100-TB blowup.

This implementation is the union-tag + ordered-window plan instead:
tag both sides, union them, and carry the most recent right payload
forward (or the next one backward) with ``last(ignorenulls)`` /
``first(ignorenulls)`` over a per-key time-ordered window. Cost is ONE
shuffle on the key plus a per-key sort — the same shape as a merge-join
based ASOF (and as sessions.py sessionize), linear in |L|+|R|, with
skew bounded by the largest single key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def micros(c: Column, dtype: str) -> Column:
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column.

    ``unix_micros`` rejects TIMESTAMP_NTZ, so NTZ is cast to TIMESTAMP
    first, which reads the wall-clock in the session zone. Callers here
    only ever compare DIFFERENCES of two such values, which is exact
    under any fixed-offset session zone (the engine pins UTC)."""
    if dtype.startswith("timestamp_ntz"):
        c = c.cast("timestamp")
    return F.unix_micros(c)


def asof_join(left: DataFrame, right: DataFrame, ts_col: str = "ts",
              by: Sequence[str] = ("user_id",),
              direction: str = "backward",
              tolerance_s: float | None = None,
              suffix: str = "_r") -> DataFrame:
    """As-of join: for each left row, attach the single right row of the
    same `by` key with the greatest ``right.ts <= left.ts`` (backward,
    the default) or the smallest ``right.ts >= left.ts`` (forward).
    Matching is inclusive at equal timestamps, like DuckDB's ASOF JOIN
    and ``pandas.merge_asof``.

    Output: every left row and column, plus each right non-key column
    renamed ``<name><suffix>`` (including the matched right ``ts_col``);
    all-NULL when no right row qualifies — LEFT OUTER semantics.

    ``tolerance_s`` (optional): a match further than this many seconds
    from the left timestamp is discarded (NULLs), like merge_asof's
    ``tolerance``.

    Right rows must be unique per (by, ts) — with ties the carried row
    is unspecified (DuckDB's ASOF documents the same caveat); aggregate
    the right side first when ties are possible.

    The right payload travels as ONE struct so a NULL inside a right
    column never makes ``last(ignorenulls)`` skip over that row and mix
    fields from two different right rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    clash = {"__ts", "__side", "__r"} & (set(left.columns) | set(right.columns))
    if clash:  # internal tags — a column of the same name would be
        raise ValueError(  # silently shadowed in the union/select below
            f"asof_join: reserved column names in input: {sorted(clash)}")
    by = list(by)
    l_dt = dict(left.dtypes)
    lonly = [c for c in left.columns if c not in by and c != ts_col]
    rpay = [c for c in right.columns if c not in by]
    if ts_col not in l_dt or ts_col not in dict(right.dtypes):
        raise ValueError(f"ts_col {ts_col!r} must exist on both sides")

    # Equal-ts inclusivity: the right row must land inside the left
    # row's window frame, so at equal ts the right row sorts before the
    # left row when looking backward and after it when looking forward.
    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)
    r_struct = F.struct(*[F.col(c).alias(c) for c in rpay])
    struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    l2 = left.select(
        *by, F.col(ts_col).alias("__ts"), F.lit(l_side).alias("__side"),
        *[F.col(c) for c in lonly],
        F.lit(None).cast(struct_type).alias("__r"))
    r2 = right.select(
        *by, F.col(ts_col).alias("__ts"), F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(l_dt[c]).alias(c) for c in lonly],
        r_struct.alias("__r"))

    w = Window.partitionBy(*by).orderBy(F.asc("__ts"), F.asc("__side"))
    if direction == "backward":
        carried = F.last("__r", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
    else:
        carried = F.first("__r", ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing))

    m = (l2.unionByName(r2)
         .select(*by, "__ts", "__side", *lonly, carried.alias("__r"))
         .where(F.col("__side") == l_side))
    if tolerance_s is not None:
        lag_us = micros(F.col("__ts"), l_dt[ts_col]) \
            - micros(F.col("__r")[ts_col], dict(right.dtypes)[ts_col])
        if direction == "forward":
            lag_us = -lag_us
        m = m.withColumn(
            "__r", F.when(lag_us <= int(tolerance_s * 1_000_000),
                          F.col("__r")))
    return m.select(
        *by, F.col("__ts").alias(ts_col), *lonly,
        *[F.col("__r")[c].alias(c + suffix) for c in rpay])


def asof_join_sliced(left: DataFrame, right: DataFrame, ts_col: str = "ts",
                     by: Sequence[str] = ("user_id",),
                     direction: str = "backward",
                     tolerance_s: float | None = None,
                     suffix: str = "_r",
                     slice_minutes: int = 24 * 60) -> DataFrame:
    """Hot-key escalation of `asof_join` (same contract, same output):
    the ordered window runs per (key, TIME-SLICE) instead of per key, so
    a key owning 10^8+ events never serializes into one sort task (the
    round-9 hot-key study's documented bound, measured 3.1x at 3x10^7
    rows/key).

    Matches that cross a slice boundary are preserved by SEEDING each
    slice with a carry-in row: per (key, slice) the latest right payload
    (earliest, for forward) is aggregated — one row per slice — and a
    tiny per-key window over the slice SPINE (every (key, slice) seen on
    either side, so left-only slices still receive their carry-in)
    carries it across slices; the seed sorts before every real row of
    its slice (NULL ts, nulls-first; nulls-last for forward), so the
    local `last(ignorenulls)` window alone reconstructs the global
    answer. Cost: one (key, slice) shuffle of |L|+|R| for the main
    window, a right-side aggregate, and a spine window whose row count
    is #slices-per-key — bounded by the corpus time span, never by
    event volume. Equivalence with `asof_join` is property-tested for
    both directions with and without tolerance
    (tests/test_temporal.py)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    clash = {"__ts", "__side", "__r", "__slice"} \
        & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join_sliced: reserved column names in input: "
            f"{sorted(clash)}")
    by = list(by)
    l_dt = dict(left.dtypes)
    r_dt = dict(right.dtypes)
    lonly = [c for c in left.columns if c not in by and c != ts_col]
    rpay = [c for c in right.columns if c not in by]
    if ts_col not in l_dt or ts_col not in r_dt:
        raise ValueError(f"ts_col {ts_col!r} must exist on both sides")
    slice_us = slice_minutes * 60 * 1_000_000

    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)
    r_struct = F.struct(*[F.col(c).alias(c) for c in rpay])
    struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    def slice_of(dt: str) -> Column:
        return _floor_div(micros(F.col(ts_col), dt), slice_us, "bigint")

    l2 = left.select(
        *by, slice_of(l_dt[ts_col]).alias("__slice"),
        F.col(ts_col).alias("__ts"), F.lit(l_side).alias("__side"),
        *[F.col(c) for c in lonly],
        F.lit(None).cast(struct_type).alias("__r"))
    r2 = right.select(
        *by, slice_of(r_dt[ts_col]).alias("__slice"),
        F.col(ts_col).alias("__ts"), F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(l_dt[c]).alias(c) for c in lonly],
        r_struct.alias("__r"))

    # carry-in seeds over the slice spine (slices seen on EITHER side:
    # a left-only slice still needs the latest right of earlier slices)
    pick = F.max_by if direction == "backward" else F.min_by
    summ = r2.groupBy(*by, "__slice").agg(pick("__r", "__ts").alias("__r"))
    spine = (l2.select(*by, "__slice").union(r2.select(*by, "__slice"))
             .distinct())
    sp = spine.join(summ, [*by, "__slice"], "left")
    ws = Window.partitionBy(*by).orderBy("__slice")
    if direction == "backward":
        carry = F.last("__r", ignorenulls=True).over(
            ws.rowsBetween(Window.unboundedPreceding, -1))
    else:
        carry = F.first("__r", ignorenulls=True).over(
            ws.rowsBetween(1, Window.unboundedFollowing))
    seeds = sp.select(
        *by, "__slice",
        F.lit(None).cast(l_dt[ts_col]).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(l_dt[c]).alias(c) for c in lonly],
        carry.alias("__r")).where(F.col("__r").isNotNull())

    if direction == "backward":
        order = [F.asc_nulls_first("__ts"), F.asc("__side")]
        carried = F.last("__r", ignorenulls=True).over(
            Window.partitionBy(*by, "__slice").orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0))
    else:
        order = [F.asc_nulls_last("__ts"), F.asc("__side")]
        carried = F.first("__r", ignorenulls=True).over(
            Window.partitionBy(*by, "__slice").orderBy(*order)
            .rowsBetween(0, Window.unboundedFollowing))

    m = (l2.unionByName(r2).unionByName(seeds)
         .select(*by, "__ts", "__side", *lonly, carried.alias("__r"))
         .where(F.col("__side") == l_side))
    if tolerance_s is not None:
        lag_us = micros(F.col("__ts"), l_dt[ts_col]) \
            - micros(F.col("__r")[ts_col], r_dt[ts_col])
        if direction == "forward":
            lag_us = -lag_us
        m = m.withColumn(
            "__r", F.when(lag_us <= int(tolerance_s * 1_000_000),
                          F.col("__r")))
    return m.select(
        *by, F.col("__ts").alias(ts_col), *lonly,
        *[F.col("__r")[c].alias(c + suffix) for c in rpay])


_INTEGRAL = ("tinyint", "smallint", "int", "bigint", "long")


def _floor_div(c: Column, width: int, dtype: str) -> Column:
    """floor(c / width) as BIGINT, exact for integral inputs. pmod makes
    the numerator an exact multiple of width (also for negative c); the
    division then runs in DECIMAL so no step rounds through binary
    doubles — a long > 2^53 divided as a double can land in the wrong
    bucket (a 19-digit quotient at scale 6 is 25 digits, exact within
    decimal(38,x))."""
    if dtype in _INTEGRAL:
        exact = c.cast("decimal(38,0)") \
            - F.pmod(c, F.lit(width)).cast("decimal(38,0)")
        return (exact / F.lit(width)).cast("long")
    return F.floor(c / F.lit(width)).cast("long")


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, lo_col: str, hi_col: str,
                  bucket_width: int, by: Sequence[str] = (),
                  suffix: str = "_i",
                  max_buckets_per_interval: int | None = 65536) -> DataFrame:
    """Range (interval containment) join: every (point, interval) pair
    with ``lo <= point <= hi``, optionally key-scoped by `by` — inner
    semantics, one output row per qualifying pair.

    Spark's own planner turns the BETWEEN predicate into a broadcast
    nested loop (all |P|x|I| comparisons) — quadratic at 100 TB. This is
    the bucketized plan instead: slice the number line into fixed
    `bucket_width` buckets, explode each interval into the buckets it
    covers, bucket each point once, and equi-join on (by..., bucket)
    before the exact containment filter. A point lives in EXACTLY one
    bucket, so no pair is emitted twice and no dedup pass is needed.
    Cost: one equi-shuffle over |P| + |I| * (len/width + 1) rows — pick
    `bucket_width` near the typical interval length so the explosion
    factor stays ~2.

    Sentinel-interval guard (round-8 verdict): real warehouses carry
    open-ended intervals (``valid_to = 9999-12-31``) that the naive
    explode turns into ~10^9 bucket rows. Each interval's bucket range
    is therefore CLAMPED to the observed per-key [min, max] point bucket
    (a small groupBy aggregate of the point side, equi-joined onto the
    intervals) — semantics unchanged, because a bucket outside its key's
    point range can never match a point, and an interval whose key has
    no points at all matches nothing and is dropped before the explode.
    After clamping, any interval still spanning more than
    `max_buckets_per_interval` buckets raises at execution time with an
    explicit message (instead of Spark's opaque array-length error):
    that only happens when `bucket_width` is far too small for the data
    span. Pass ``max_buckets_per_interval=None`` to disable the raise.

    `point_col`, `lo_col`, `hi_col` must be numeric (for timestamps,
    convert with `micros()` first). Interval columns other than `by`
    come back suffixed; intervals with lo > hi yield nothing.
    """
    by = list(by)
    pdt, idt = dict(points.dtypes), dict(intervals.dtypes)
    ipay = [c for c in intervals.columns if c not in by]
    pbkt = _floor_div(F.col(point_col), bucket_width, pdt[point_col])
    p = points.withColumn("__bkt", pbkt)
    # per-key point-bucket bounds; with no `by` keys a constant key
    # makes it an equi-join on a single guaranteed-1-row broadcast side
    # (NOT a crossJoin — this operator's plan invariant is "no
    # BroadcastNestedLoopJoin", tests/test_temporal.py)
    keyed = by if by else ["__one"]
    pts = points if by else points.withColumn("__one", F.lit(1))
    bounds = pts.groupBy(*keyed).agg(F.min(pbkt).alias("__pmin"),
                                     F.max(pbkt).alias("__pmax"))
    if not by:
        bounds = F.broadcast(bounds)
    c_lo = F.greatest(
        _floor_div(F.col(lo_col), bucket_width, idt[lo_col]),
        F.col("__pmin"))
    c_hi = F.least(
        _floor_div(F.col(hi_col), bucket_width, idt[hi_col]),
        F.col("__pmax"))
    seq = F.sequence(c_lo, c_hi)
    if max_buckets_per_interval is not None:
        n = c_hi - c_lo + F.lit(1)
        seq = F.when(n <= F.lit(max_buckets_per_interval), seq).otherwise(
            F.raise_error(F.concat(
                F.lit("interval_join: an interval spans "),
                n.cast("string"),
                F.lit(f" buckets even after clamping to the point range "
                      f"(> max_buckets_per_interval="
                      f"{max_buckets_per_interval}); bucket_width="
                      f"{bucket_width} is too small for this data span"))))
    ints = intervals if by else intervals.withColumn("__one", F.lit(1))
    i = (ints.where(F.col(lo_col) <= F.col(hi_col))
         .join(bounds, on=keyed)
         # the c_lo <= c_hi filter is required, not an optimization: an
         # interval entirely outside its key's point range would make
         # sequence() step BACKWARDS (same reason as the lo > hi filter)
         .where(c_lo <= c_hi)
         .select(*by, *[F.col(c).alias(c + suffix) for c in ipay],
                 F.explode(seq).alias("__bkt")))
    return (p.join(i, on=by + ["__bkt"])
            .where((F.col(point_col) >= F.col(lo_col + suffix))
                   & (F.col(point_col) <= F.col(hi_col + suffix)))
            .drop("__bkt"))
