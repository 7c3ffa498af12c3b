"""Event-table joins Spark lacks as built-ins: as-of join and range join.

The as-of join ("latest right row at-or-before each left row's time, per
key") is the workhorse of feature backfills and point-in-time-correct
training data. Spark has no ASOF JOIN operator; the naive formulation —
theta-join on ``l.ts >= r.ts`` + rank — explodes to |L|x|R| per key. The
scale-safe shape used here is the UNION-SORT trick: tag both sides, sort
each key's rows by time within one window, and carry the right side's
columns forward with ``last(..., ignorenulls=True)``. Cost: ONE shuffle on
the key (the window sort), state linear in |L|+|R|, no pair explosion —
this holds at 100 TB where the theta-join does not.

DuckDB's native ASOF JOIN is the oracle twin in the local sweep.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: Optional[list[str]] = None,
    tolerance: Optional[int] = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: the most recent right row with ``r.on <= l.on``
    within the same ``by`` key (backward as-of). Left rows with no earlier
    right row keep NULLs. ``tolerance`` (same units as ``on``) nulls out
    matches older than ``on - tolerance``.

    Returns all left columns plus ``<value_col><suffix>`` for each right
    value column and ``<on><suffix>`` (the matched right timestamp).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    lcols = left.columns
    # ties on `on`: right rows sort BEFORE left rows (side 0 < 1) so a
    # same-timestamp right row is visible to the left row (<= semantics)
    l_tagged = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("_rt"),
    )
    r_tagged = right.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(on).alias("_rt"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_k", "_t", "_side", "_l",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in value_cols],
        F.last("_rt", ignorenulls=True).over(w).alias("_rt"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        fresh = F.col("_t") - F.col("_rt") <= F.lit(tolerance)
        out = out.select(
            "_k", "_t", "_l",
            *[F.when(fresh, F.col(f"_rv_{c}")).alias(f"_rv_{c}") for c in value_cols],
            F.when(fresh, F.col("_rt")).alias("_rt"),
        )
    return out.select(
        *[F.col("_l").getField(c).alias(c) for c in lcols],
        *[F.col(f"_rv_{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("_rt").alias(f"{on}{suffix}"),
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    max_span_buckets: int = 64,
    levels: int = 1,
) -> DataFrame:
    """Point-in-interval join (l.p BETWEEN r.lo AND r.hi) via
    MULTI-RESOLUTION bucketing: level k uses buckets of width
    ``bucket_width * max_span_buckets**k``; every interval lands at the
    smallest level where it spans at most ``max_span_buckets`` buckets and
    replicates into just the buckets it overlaps there, so the per-row
    replication factor is bounded by the cap at EVERY width — wide
    intervals cost a coarser bucket, never an unbounded explode (and
    never a silent truncation).  Each level is an equi-join on its bucket
    id + the residual range filter; levels with no intervals collapse to
    empty relations that AQE prunes at runtime, so the common all-narrow
    case pays exactly one join.  Intervals spanning more than
    ``max_span_buckets**levels`` base buckets ride a broadcast
    theta-join residue — if such intervals were ever numerous the
    broadcast build fails loudly rather than dropping matches (r8
    silently truncated them).  ``levels`` defaults to 1 (single bucket
    width + residue): each extra level multiplies the point side's
    shuffle rows, so raise it only when wide intervals are expected to
    be NUMEROUS — pick levels such that
    ``bucket_width * max_span_buckets**levels`` exceeds the widest
    common interval.  This is the scale-safe replacement for Spark's
    O(|L|x|R|) BroadcastNestedLoopJoin on range predicates."""
    # empty intervals (hi < lo) match nothing — drop them BEFORE the
    # bucket sequences, which would otherwise throw on start > stop
    right = right.filter(F.col(right_hi) >= F.col(right_lo))
    in_range = (F.col(left_point) >= F.col(right_lo)) & (
        F.col(left_point) <= F.col(right_hi)
    )

    def bk(col: str, k: int) -> Column:
        return (F.col(col) / F.lit(bucket_width * max_span_buckets**k)).cast("long")

    # ONE equi-join on the composite (level, bucket) key: every interval
    # explodes at ITS level only; every point contributes one key per
    # level.  Folding the level into the key (instead of one join per
    # level) keeps this a single shuffle stage — per-level joins cost a
    # scheduling round-trip each even when AQE prunes their empty sides.
    lvl = F.lit(None).cast("int")
    for k in reversed(range(levels)):
        # strict <: a bucket-id diff of d means d+1 replicas, so the
        # per-row replication is truly bounded by max_span_buckets
        fits = (bk(right_hi, k) - bk(right_lo, k)) < F.lit(max_span_buckets)
        lvl = F.when(fits, F.lit(k)).otherwise(lvl)
    r = right.withColumn("_lv", lvl)
    lo_bk = hi_bk = None
    for k in range(levels):
        at_k = F.col("_lv") == k
        lo_bk = bk(right_lo, k) if lo_bk is None else F.when(at_k, bk(right_lo, k)).otherwise(lo_bk)
        hi_bk = bk(right_hi, k) if hi_bk is None else F.when(at_k, bk(right_hi, k)).otherwise(hi_bk)
    narrow = (
        r.filter(F.col("_lv").isNotNull())
        .withColumn("_bk", F.explode(F.sequence(lo_bk, hi_bk)))
    )
    if levels == 1:  # single width: the constant level adds nothing
        l = left.withColumn("_bk", bk(left_point, 0))
        out = l.join(narrow.drop("_lv"), "_bk").filter(in_range).drop("_bk")
    else:
        l = left.select(
            "*",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(k).alias("_lv"), bk(left_point, k).alias("_bk")
                    )
                    for k in range(levels)
                ])
            ).alias("_lb"),
        ).select(
            "*", F.col("_lb._lv").alias("_lv"), F.col("_lb._bk").alias("_bk")
        ).drop("_lb")
        out = l.join(narrow, ["_lv", "_bk"]).filter(in_range).drop("_lv", "_bk")
    # astronomically-wide residue (> max_span_buckets**levels base
    # buckets): broadcast theta-join, lazily empty in any realistic
    # dataset (AQE prunes the empty side at runtime)
    wide = r.filter(F.col("_lv").isNull()).drop("_lv")
    return out.unionByName(left.join(F.broadcast(wide), in_range))


def range_join_count_sum(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    right_id: str,
    max_span_buckets: int = 64,
) -> DataFrame:
    """Per-interval COUNT and SUM of matching points — the aggregation
    pushdown of ``range_join_bucketed`` + ``groupBy(right_id)`` (guide
    §1.2/§8: don't materialize rows you only aggregate).  Returns
    (``right_id``, n_in_range BIGINT, sum_points BIGINT) for intervals
    with at least one match (inner-join semantics, identical to
    aggregating the pairs).

    Shape: the point side aggregates ONCE per bucket (cnt, sum); an
    interval's interior buckets — every bucket strictly between
    bucket(lo) and bucket(hi), whose points are provably all inside
    [lo, hi] because the bucket map is monotone — consume those
    per-bucket aggregates wholesale, so only the (at most two) EDGE
    buckets ever touch raw point rows with the residual range check.
    The pairs formulation evaluates |matches| joined rows; this
    evaluates |intervals| x (2 x bucket occupancy) + |intervals| x
    span interior-bucket lookups — at 100 TB the difference between
    output-proportional and input-proportional work when matches are
    dense.  Exactness: counts and sums are BIGINT partial sums over a
    disjoint partition of the match set (interior vs edge), so the
    result is bit-identical to aggregating the pairs.

    Intervals spanning more than ``max_span_buckets`` buckets ride the
    same broadcast theta-join residue as ``range_join_bucketed`` (loud
    fail if ever numerous, never a silent truncation)."""
    right = right.filter(F.col(right_hi) >= F.col(right_lo))

    def bk(col: str) -> Column:
        return (F.col(col) / F.lit(bucket_width)).cast("long")

    pts = left.select(F.col(left_point).alias("_p"), bk(left_point).alias("_bk"))
    # one small shuffle: (bucket, cnt, sum) — bounded by the occupied
    # bucket count, not the point count
    pts_agg = pts.groupBy("_bk").agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum("_p").alias("_sum")
    )

    span_ok = (bk(right_hi) - bk(right_lo)) < F.lit(max_span_buckets)
    narrow = right.filter(span_ok).select(
        F.col(right_id), F.col(right_lo), F.col(right_hi),
        bk(right_lo).alias("_blo"), bk(right_hi).alias("_bhi"),
    )

    # interior buckets: strictly between the edge buckets -> every point
    # there is strictly inside (lo, hi) by monotonicity of bk
    interior = (
        narrow.filter(F.col("_bhi") - F.col("_blo") >= 2)
        .select(
            right_id,
            F.explode(
                F.sequence(F.col("_blo") + 1, F.col("_bhi") - 1)
            ).alias("_bk"),
        )
        .join(pts_agg, "_bk")
        .select(right_id, "_cnt", "_sum")
    )
    # edge buckets (bucket(lo) and bucket(hi), deduped when equal):
    # raw-point join with the residual range check
    edges = (
        narrow.select(
            right_id, right_lo, right_hi,
            F.explode(
                F.array_distinct(F.array(F.col("_blo"), F.col("_bhi")))
            ).alias("_bk"),
        )
        .join(pts, "_bk")
        .filter((F.col("_p") >= F.col(right_lo)) & (F.col("_p") <= F.col(right_hi)))
        .groupBy(right_id)
        .agg(F.count(F.lit(1)).alias("_cnt"), F.sum("_p").alias("_sum"))
    )
    # astronomically-wide residue: broadcast theta-join against the raw
    # points (same loud-fail contract as range_join_bucketed)
    wide = (
        left.select(F.col(left_point).alias("_p"))
        .join(
            F.broadcast(right.filter(~span_ok).select(right_id, right_lo, right_hi)),
            (F.col("_p") >= F.col(right_lo)) & (F.col("_p") <= F.col(right_hi)),
        )
        .groupBy(right_id)
        .agg(F.count(F.lit(1)).alias("_cnt"), F.sum("_p").alias("_sum"))
    )
    return (
        interior.unionByName(edges).unionByName(wide)
        .groupBy(right_id)
        .agg(
            F.sum("_cnt").alias("n_in_range"),
            F.sum("_sum").alias("sum_points"),
        )
    )


def sliding_aggregate(
    df: DataFrame,
    ts_col: str,
    window: int,
    slide: int,
    aggs: "list[Column]",
    keys: "tuple[str, ...]" = (),
    start_col: str = "win_start",
) -> DataFrame:
    """Batch sliding-window aggregation over an integer timestamp column
    — the batch twin of streaming/stream.py sliding_counts (which rides
    Spark's native ``F.window`` on an event-time column; this one works
    on raw integer timestamps, e.g. epoch nanos).

    Each row replicates MAP-SIDE into the ``window // slide`` windows
    covering its timestamp (the window starts aligned to multiples of
    ``slide``: start_k = floor((ts - k*slide) / window) * window +
    k*slide for k in 0..n-1 — pairwise distinct, and ts - start_k lands
    in [0, window) for every k), then ONE (``start_col``, *keys)-keyed
    groupBy computes the aggregates.  Scale shape: a single shuffle
    whose row count is input x replication factor, with map-side
    partial aggregation collapsing it per (window, key) before the
    exchange — no Python evaluation anywhere (plan-guarded in
    tests/test_plans.py).

    ``window`` must be a positive multiple of ``slide``.  ``aggs`` are
    pre-aliased aggregate Columns evaluated over the replicated rows;
    ``keys`` are extra grouping columns."""
    if slide <= 0 or window <= 0 or window % slide != 0:
        raise ValueError(
            f"window ({window}) must be a positive multiple of slide ({slide})"
        )
    n = window // slide
    starts = F.array(
        *[
            (
                F.floor((F.col(ts_col) - F.lit(k * slide)) / F.lit(window))
                * window
                + F.lit(k * slide)
            ).cast("long")
            for k in range(n)
        ]
    )
    rep = df.select(F.explode(starts).alias(start_col), "*")
    return rep.groupBy(start_col, *keys).agg(*aggs)
