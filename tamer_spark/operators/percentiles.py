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


def _check_ps(ps: list[tuple[int, int]]) -> None:
    if not ps:
        raise ValueError("ps must be non-empty")
    for num, den in ps:
        if not 0 < num <= den:
            raise ValueError(f"percentile {num}/{den} outside (0, 1]")


def global_percentile_bucketed(
    df: DataFrame,
    value_col: str,
    ps: list[tuple[int, int]],
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact GLOBAL percentile_disc over an integral column in two bounded
    passes — the scale path ``exact_percentiles``'s own docstring defers to
    (a global window serializes the entire 100 TB column into ONE task's
    sort; this never sorts more than the target buckets).

    Pass 1 — histogram: equi-width integer buckets over [min, max]
    (``width = (max−min) div B + 1`` so the id stays in [0, B) and a
    constant column degenerates to one bucket, not a division by zero);
    the groupBy partial-aggregates to ≤ B rows per partition before the
    one bounded exchange — the CMS fixed-size-shuffle property. The
    collected histogram (≤ B rows) and the count/min/max scalars are
    model-parameter-sized driver state (the bounded-collect convention);
    prefix sums over B rows locate each target rank's bucket and its
    in-bucket offset.

    Pass 2 — refine: re-scan filtered to ONLY the target buckets (≤ |ps|
    of them), rank within bucket, keep the offset rows. The window
    partition is a single bucket ≈ n/B rows under any non-degenerate
    distribution — the parallel unit is the bucket, never the corpus. A
    pathological bucket (one value holding ≥ n/B duplicates) bounds at
    that value's multiplicity; ties make the ranked VALUE unique whatever
    order ties land in, so determinism survives. For adversarial skew,
    recurse: re-bucket the one hot bucket (not implemented — at one level
    the refine already reads ≤ |ps|·(n/B + max-multiplicity) rows).

    Rank convention: ``percentile_disc`` — target rank ``ceil(p·n)`` as
    ``(num·n + den − 1) div den`` in pure int64 (rationals in, actual data
    values out; identical to ``exact_percentiles``, cross-engine
    bit-exact). NULLs are excluded from n and the ranking, the SQL
    percentile rule. Requires an integral column (cast prices to cents —
    the repo convention); float bucketing would put the bucket boundary
    arithmetic at the mercy of rounding.

    Returns (p string, value, rank, n) — rank and n emitted so the gate
    pins the rank arithmetic, not just the landed value.

    Epoch posture: the pass-1 histogram is MERGEABLE (cell-wise sum, the
    cms_merge linearity) given a FROZEN (min, width) — persist one per
    epoch and re-refine against the union only when a query lands.

    No analog in the reference engine; training-data extension surface.
    """
    _check_ps(ps)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    dtype = dict(df.dtypes)[value_col]
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{value_col} must be integral (got {dtype}); cast to cents/int64 first"
        )
    spark = df.sparkSession
    out_schema = "p string, value long, rank long, n long"

    vals = df.select(F.col(value_col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    n, lo, hi = stats.n, stats.lo, stats.hi
    if n == 0:
        return spark.createDataFrame([], out_schema)

    width = (hi - lo) // n_buckets + 1
    # int64 `div`, not `/`+floor: float division would put bucket ids at
    # the mercy of double rounding once values approach 2^53
    bucket = F.expr(f"(v - {lo}) div {width}").alias("bkt")
    hist = sorted(
        (r.bkt, r.cnt)
        for r in vals.select(bucket).groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )

    targets = []  # (bkt, in-bucket offset, "num/den", global rank)
    for num, den in ps:
        k = (num * n + den - 1) // den
        cum = 0
        for bkt, cnt in hist:
            if cum + cnt >= k:
                targets.append((bkt, k - cum, f"{num}/{den}", k))
                break
            cum += cnt

    tgt_df = F.broadcast(
        spark.createDataFrame(targets, "bkt long, off long, p string, rank long")
    )
    wanted = sorted({b for b, *_ in targets})
    sub = vals.select("v", bucket).filter(F.col("bkt").isin(wanted))
    ranked = sub.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("bkt").orderBy("v"))
    )
    return (
        ranked.join(tgt_df, (ranked.bkt == tgt_df.bkt) & (ranked._rn == tgt_df.off))
        .select(
            "p",
            F.col("v").alias("value"),
            "rank",
            F.lit(n).cast("long").alias("n"),
        )
    )
