"""Token-budget corpus capping: "take ~N tokens from each source".

The curation counterpart to ratio-based stratified mixing
(operators/mixing.py): instead of sampling a fraction, keep the maximal
deterministic-priority PREFIX of each group whose cumulative weight fits
the group's budget (docs are never split; the first overflowing doc and
everything after it are dropped — a prefix, because the running sum is
monotone).

Priority is a stable hash of the id (functions/hashing.stable_hash64), so
"the first N tokens" is an unbiased, reproducible, engine-independent
sample — not ingestion order.

100 TB shape — the naive plan is a running SUM over a per-group global
window, which serializes every group into one task. This implements the
classic TWO-PHASE DISTRIBUTED PREFIX SUM instead:

1. bucket each row by the HIGH bits of its priority hash (range-monotonic:
   bucket order == priority order);
2. phase 1: per-(group, bucket) totals — a partial-aggregable shuffle that
   reduces to groups × n_buckets rows;
3. exclusive prefix offsets per group over that TINY frame (window over
   groups × n_buckets rows, never the corpus);
4. phase 2: broadcast the offsets back; a running sum WITHIN each
   (group, bucket) — partitions bounded by ~|group|/n_buckets — plus the
   bucket offset reconstructs the exact global running sum.

The keep set is bit-identical to the global-window formulation (pinned by
tests against a single-window reference and the DuckDB oracle).
No analog in the reference engine (tamer has no text/retrieval
operators); part of the training-data-pipeline extension surface.

"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_BITS = 60  # stable_hash64 < 2^60


def take_token_budget(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int | dict[str, int],
    group_col: str = "source",
    n_buckets: int = 64,
) -> DataFrame:
    """Keep the maximal stable-hash-ordered prefix of each ``group_col``
    group whose cumulative ``weight_col`` is <= the group's budget.

    ``budget``: one int for every group, or {group: budget}. Groups absent
    from a dict budget are dropped entirely. Returns the surviving rows
    (all original columns).
    """
    from tamer_spark.functions.hashing import stable_hash64

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = _HASH_BITS - n_buckets.bit_length() + 1

    keyed = df.withColumn("_ok", stable_hash64(F.col(id_col).cast("string")))
    keyed = keyed.withColumn("_bk", F.shiftrightunsigned(F.col("_ok"), shift))

    # phase 1: (group, bucket) totals -> exclusive per-group prefix offsets
    totals = keyed.groupBy(group_col, "_bk").agg(
        F.sum(weight_col).alias("_bucket_total")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_bucket_total").over(woff), F.lit(0))
    ).select(group_col, "_bk", "_offset")

    # phase 2: within-bucket running sum + offset == global running sum
    wrun = (
        Window.partitionBy(group_col, "_bk")
        .orderBy("_ok", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.join(F.broadcast(offsets), [group_col, "_bk"]).withColumn(
        "_cum", F.col("_offset") + F.sum(weight_col).over(wrun)
    )

    if isinstance(budget, dict):
        bdf = cum.sparkSession.createDataFrame(
            list(budget.items()), f"{group_col} string, _budget long"
        )
        cum = cum.join(F.broadcast(bdf), group_col)
    else:
        cum = cum.withColumn("_budget", F.lit(int(budget)))

    return cum.filter(F.col("_cum") <= F.col("_budget")).drop(
        "_ok", "_bk", "_offset", "_cum", "_budget"
    )
