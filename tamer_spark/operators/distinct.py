"""Incremental distinct counting across epochs — mergeable HLL sketches
(Apache DataSketches HllSketch, exposed by Spark as hll_sketch_agg /
hll_union_agg / hll_sketch_estimate; public Spark 3.5+ API).

The problem at 100 TB: "distinct users per event_type over ALL history"
re-computed per epoch is a full-history shuffle every time. The sketch
route makes each epoch O(sketch): build a per-key sketch from the NEW
batch only (one partial-aggregable groupBy over the batch), then
``hll_union_agg`` it with the persisted per-key sketch — register-wise
max, a few KB per key, associative and commutative, so epoch order and
partitioning cannot change the result.

Determinism contract (weaker than the repo's integer-exact gates, stated
honestly): the HLL registers are a deterministic function of the item SET
— same items, same lg_k, same estimate, regardless of order or epoch
split (pinned: merged-across-epochs == built-on-union, bit-equal
estimates). But the register encoding is library-specific, so there is no
cross-engine DuckDB replay; the graded surface for HLL accuracy is the
existing approx_distinct_users gate (estimate-within-rsd boolean), and
this module's epoch-fold equivalence is pytest-pinned.

The CMS sibling: operators/cms.py answers "how OFTEN does x occur"
incrementally; this answers "how MANY distinct x" incrementally.

No analog in the reference engine; training-data extension surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

__all__ = ["distinct_sketch", "merge_distinct_sketches", "estimate_distinct"]


def distinct_sketch(
    df: DataFrame, value_col: str, keys: tuple[str, ...] = (), lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``value_col`` — ``(keys..., sketch binary)``.

    One partial-aggregable groupBy over THIS batch only (sketches combine
    map-side); lg_k=12 ≈ 2.5 KB per key at ~1.6 % rsd."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_distinct_sketches(sketches: list[DataFrame], keys: tuple[str, ...] = ()) -> DataFrame:
    """Register-wise union of per-epoch sketch frames (same keys, same
    lg_k) — the O(sketch)-per-epoch fold. Keys absent from an epoch simply
    contribute nothing; union-then-group keeps them."""
    if not sketches:
        raise ValueError("merge_distinct_sketches needs at least one frame")
    return (
        reduce(DataFrame.unionByName, sketches)
        .groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def estimate_distinct(sketched: DataFrame) -> DataFrame:
    """Replace the binary sketch with its int64 estimate."""
    return sketched.select(
        *[c for c in sketched.columns if c != "sketch"],
        F.hll_sketch_estimate("sketch").cast("long").alias("n_distinct"),
    )
