"""As-of join (point-in-time join): for each left row, the latest right row
with right.time <= left.time, per key.

Spark has no native ASOF JOIN; the scalable pattern is union-tag-sort:
union both sides on (key, time), then ``last(right_cols, ignorenulls)`` over a
window ordered by (time, side) — a single shuffle on the key, O(n log n)
within partitions, no range-explosion. This beats the naive
inequality-join + groupBy-max (which Catalyst would execute as a broadcast
nested-loop or a huge range join).

Skew note: a hot key (one user with millions of events) serializes into one
partition's sort — acceptable because the window is per-key sequential by
definition; salt only if a single key exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """ASOF LEFT JOIN: every left row + most recent right row at or before it.

    ``direction='backward'`` (only mode implemented): right.time <= left.time.
    Right side must be unique per (key, time) — pre-dedup if not, or results
    are ambiguous (same caveat as DuckDB's ASOF JOIN).
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]

    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(right.select(*right_cols).schema).alias("_r"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(*left.columns).schema).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    # right rows sort before left rows at equal time → "at or before" inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )
    return out
