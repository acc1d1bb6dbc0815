"""Incremental HLL distinct counting: epoch fold == all-at-once (bit-equal
estimates), order/partitioning invariance, accuracy vs exact, key isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.operators.distinct import (
    distinct_sketch,
    estimate_distinct,
    merge_distinct_sketches,
)
from tests.conftest import SF_DIR_MED


def _events(spark):
    from tamer_spark.queries import _t

    return _t(spark, SF_DIR_MED, "events")


def test_epoch_merge_equals_all_at_once(spark):
    """Three epoch batches sketched separately then union-merged must give
    the SAME estimate as sketching the full table — registers are a
    deterministic function of the item set (max-merge), so equality is
    exact, not approximate."""
    e = _events(spark)
    epochs = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    per_epoch = [distinct_sketch(ep, "user_id", keys=("event_type",)) for ep in epochs]
    merged = estimate_distinct(
        merge_distinct_sketches(per_epoch, keys=("event_type",))
    )
    full = estimate_distinct(distinct_sketch(e, "user_id", keys=("event_type",)))
    m = {r.event_type: r.n_distinct for r in merged.collect()}
    f = {r.event_type: r.n_distinct for r in full.collect()}
    assert m == f


def test_merge_is_order_and_partitioning_invariant(spark):
    e = _events(spark)
    a = distinct_sketch(e.filter("event_id % 2 = 0"), "user_id", keys=("event_type",))
    b = distinct_sketch(e.filter("event_id % 2 = 1"), "user_id", keys=("event_type",))
    ab = estimate_distinct(merge_distinct_sketches([a, b], keys=("event_type",)))
    ba = estimate_distinct(merge_distinct_sketches([b, a], keys=("event_type",)))
    repart = distinct_sketch(
        e.filter("event_id % 2 = 1").repartition(7), "user_id", keys=("event_type",)
    )
    ba2 = estimate_distinct(merge_distinct_sketches([repart, a], keys=("event_type",)))
    rows = lambda df: sorted((r.event_type, r.n_distinct) for r in df.collect())
    assert rows(ab) == rows(ba) == rows(ba2)


def test_estimate_accuracy_vs_exact(spark):
    """lg_k=12 ≈ 1.6 % rsd; assert within 5× that of the exact distinct per
    key (the approx_distinct_users gate's tolerance convention)."""
    e = _events(spark)
    est = {
        r.event_type: r.n_distinct
        for r in estimate_distinct(
            distinct_sketch(e, "user_id", keys=("event_type",))
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(1, 0.08 * n), (k, est[k], n)


def test_keys_absent_from_an_epoch_survive_the_merge(spark):
    a = spark.createDataFrame([("x", 1), ("x", 2)], "k string, v long")
    b = spark.createDataFrame([("y", 9)], "k string, v long")
    merged = estimate_distinct(
        merge_distinct_sketches(
            [distinct_sketch(a, "v", keys=("k",)), distinct_sketch(b, "v", keys=("k",))],
            keys=("k",),
        )
    )
    assert {(r.k, r.n_distinct) for r in merged.collect()} == {("x", 2), ("y", 1)}
