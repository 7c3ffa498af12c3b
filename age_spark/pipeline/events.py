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

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Point-in-interval join (l.p BETWEEN r.lo AND r.hi) via bucketing:
    each interval replicates into the buckets it overlaps, the join becomes
    an equi-join on bucket id + a residual filter. Replication factor =
    interval span / bucket_width, bounded by ``max_span_buckets``: intervals
    spanning MORE buckets than the cap are routed through a separate
    broadcast range-join lane instead of being replicated (or truncated) —
    wide intervals are outliers by construction of the cap, so that side is
    small, and if it ever were not, the broadcast build fails loudly rather
    than dropping matches. This is the standard replacement for Spark's
    O(|L|x|R|) BroadcastNestedLoopJoin on range predicates: only the rare
    wide-interval residue pays the nested-loop price."""
    lo_bk = (F.col(right_lo) / bucket_width).cast("long")
    hi_bk = (F.col(right_hi) / bucket_width).cast("long")
    # empty intervals (hi < lo) match nothing — drop them BEFORE the
    # bucket sequence, which would otherwise throw on start > stop
    right = right.filter(F.col(right_hi) >= F.col(right_lo))
    span_ok = (hi_bk - lo_bk) <= F.lit(max_span_buckets)
    narrow = right.filter(span_ok).withColumn("_bk", F.explode(F.sequence(lo_bk, hi_bk)))
    l = left.withColumn("_bk", (F.col(left_point) / bucket_width).cast("long"))
    in_range = (F.col(left_point) >= F.col(right_lo)) & (
        F.col(left_point) <= F.col(right_hi)
    )
    out = l.join(narrow, "_bk").filter(in_range).drop("_bk")
    # Wide-interval lane: a broadcast theta-join over just the outliers.
    # Kept lazy — when no interval exceeds the cap (the common case) the
    # wide side is an empty relation and AQE prunes the join at runtime.
    wide = right.filter(~span_ok)
    out = out.unionByName(left.join(F.broadcast(wide), in_range))
    return out
