"""Exact distributed percentiles (percentile_disc semantics) — the
precise counterpart to Spark's approx_percentile sketch.

``percentile_disc(p)`` returns the FIRST value whose cumulative rank
reaches ceil(p·n) — an actual element of the group, no interpolation —
so the result is deterministic even under duplicate values (the value at
a rank is unique however ties are ordered) and needs no float arithmetic:
percentiles are passed as RATIONALS (num, den) and the target rank is
``(num·n + den − 1) div den``, all int64. That makes the gate bit-exact
cross-engine, unlike interpolating forms whose ``p·(n−1)`` index
arithmetic hinges on float rounding.

Scale shape: ONE shuffle on the group keys — row_number and the group
count ride the same window exchange; each requested percentile is a
filter over the ranked frame (no second sort, no collect). The known
limit is the per-group sort itself: a single giant group serializes into
one task's sort — for grouped percentiles that group is the parallel
unit by definition; for GLOBAL percentiles over a 100 TB column use
approx_percentile (t-digest class) or a two-pass range-bucket count
(the budget.py prefix-sum trick keyed on value ranges).

No analog in the reference engine; training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: list[tuple[int, int]],
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Exact discrete percentiles of ``value_col`` per ``keys`` group.

    ``ps``: rational percentiles as (num, den), e.g. (1, 2) = median,
    (9, 10) = p90. Returns (keys..., p string "num/den", value), one row
    per group per percentile.
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    for num, den in ps:
        if not 0 < num <= den:
            raise ValueError(f"percentile {num}/{den} outside (0, 1]")
    wrank = Window.partitionBy(*keys).orderBy(value_col)
    wall = Window.partitionBy(*keys)
    ranked = (
        df.select(*keys, value_col)
        .withColumn("_rn", F.row_number().over(wrank))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
    )
    out = None
    for num, den in ps:
        sel = ranked.filter(
            F.col("_rn") == F.expr(f"({num} * _n + {den} - 1) div {den}")
        ).select(
            *keys,
            F.lit(f"{num}/{den}").alias("p"),
            F.col(value_col).alias("value"),
        )
        out = sel if out is None else out.unionByName(sel)
    return out
