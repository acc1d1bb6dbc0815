"""As-of join (point-in-time join): match each left row with the latest
right row at-or-before it (backward), the earliest at-or-after it
(forward), or whichever is closer in time (nearest) — per key.

Spark has no native ASOF JOIN; the scalable pattern is union-tag-sort:
union both sides on (key, time), then an ignore-nulls running last/first
over a window ordered by (time, side) — a single shuffle on the key,
O(n log n) within partitions, no range-explosion. This beats the naive
inequality-join + groupBy-max (which Catalyst would execute as a broadcast
nested-loop or a huge range join). ``nearest`` evaluates both directional
windows over the SAME keyed exchange (one shuffle, two in-partition
sorts) and picks the smaller time delta, ties to backward — pandas
``merge_asof`` semantics.

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
    """ASOF LEFT JOIN: every left row + its as-of right row.

    ``direction``: 'backward' (right.time <= left.time, latest wins),
    'forward' (right.time >= left.time, earliest wins), or 'nearest'
    (smaller |delta| wins, exact ties go backward). Right side must be
    unique per (key, time) — pre-dedup if not, or results are ambiguous
    (same caveat as DuckDB's ASOF JOIN).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    # the match struct carries the right time as _rt so 'nearest' can
    # compare deltas without a second pass over the right side
    rstruct = right.select(F.col(right_time).alias("_rt"), *right_cols)
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rstruct.schema).alias("_r"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(*left.columns).schema).alias("_l"),
        F.struct(F.col(right_time).alias("_rt"), *right_cols).alias("_r"),
    )
    # backward: right rows sort before left at equal time → inclusive <=
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left rows sort before right at equal time → inclusive >=
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = lt.unionByName(rt)
    if direction == "backward":
        merged = merged.withColumn("_match", F.last("_r", ignorenulls=True).over(wb))
    elif direction == "forward":
        merged = merged.withColumn("_match", F.first("_r", ignorenulls=True).over(wf))
    else:  # nearest — both windows share the _k hash exchange
        back = F.last("_r", ignorenulls=True).over(wb)
        fwd = F.first("_r", ignorenulls=True).over(wf)
        merged = (
            merged.withColumn("_b", back)
            .withColumn("_f", fwd)
            .withColumn(
                "_match",
                F.when(F.col("_b").isNull(), F.col("_f"))
                .when(F.col("_f").isNull(), F.col("_b"))
                .when(
                    (F.col("_f._rt") - F.col("_t")) < (F.col("_t") - F.col("_b._rt")),
                    F.col("_f"),
                )
                .otherwise(F.col("_b")),  # ties go backward
            )
        )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )
    return out
