"""take_token_budget: two-phase prefix sum must be bit-identical to the
single-window formulation; prefix/budget/dict semantics; bucket-count
invariance."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tamer_spark.functions.hashing import stable_hash64
from tamer_spark.operators.budget import take_token_budget


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"src{i % 3}", 50 + (i * 37) % 200) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, source string, w long")


def _reference_keep(corpus, budget):
    """Single global-window formulation (the oracle shape)."""
    win = (
        Window.partitionBy("source")
        .orderBy(stable_hash64(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return {
        r.doc_id
        for r in corpus.withColumn("cum", F.sum("w").over(win))
        .filter(F.col("cum") <= budget)
        .collect()
    }


@pytest.mark.parametrize("n_buckets", [1, 4, 64])
def test_matches_global_window_any_bucket_count(spark, corpus, n_buckets):
    expected = _reference_keep(corpus, 3000)
    got = {
        r.doc_id
        for r in take_token_budget(
            corpus, "doc_id", "w", 3000, group_col="source", n_buckets=n_buckets
        ).collect()
    }
    assert got == expected


def test_kept_set_is_a_priority_prefix(spark, corpus):
    kept = take_token_budget(corpus, "doc_id", "w", 3000, group_col="source")
    rows = corpus.withColumn(
        "ok", stable_hash64(F.col("doc_id").cast("string"))
    ).join(kept.select("doc_id", F.lit(True).alias("k")), "doc_id", "left")
    for src in ("src0", "src1", "src2"):
        seq = [
            bool(r.k)
            for r in rows.filter(F.col("source") == src).orderBy("ok", "doc_id").collect()
        ]
        # once a row is dropped, everything after it in priority order is too
        assert seq == sorted(seq, reverse=True), src


def test_per_group_dict_budget_and_absent_group_dropped(spark, corpus):
    out = take_token_budget(
        corpus, "doc_id", "w", {"src0": 500, "src1": 10_000_000}, group_col="source"
    )
    by_src = {r["source"] for r in out.select("source").distinct().collect()}
    assert by_src == {"src0", "src1"}  # src2 absent from the budget -> dropped
    n_src1 = out.filter(F.col("source") == "src1").count()
    assert n_src1 == corpus.filter(F.col("source") == "src1").count()  # fits fully
    w0 = out.filter(F.col("source") == "src0").agg(F.sum("w")).first()[0]
    assert w0 is not None and w0 <= 500


def test_budget_zero_keeps_nothing(spark, corpus):
    assert take_token_budget(corpus, "doc_id", "w", 0, group_col="source").count() == 0


def test_non_power_of_two_buckets_rejected(spark, corpus):
    with pytest.raises(ValueError):
        take_token_budget(corpus, "doc_id", "w", 100, group_col="source", n_buckets=48)


def test_no_corpus_scale_global_window(spark, corpus):
    """The corpus-side running sum must partition by (group, bucket), never
    by group alone: no window whose partitioning is just the group key."""
    df = take_token_budget(corpus, "doc_id", "w", 3000, group_col="source", n_buckets=64)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # every corpus-side window spec lists two partition columns or is
        # the tiny offsets frame (which partitions by source over
        # groups x buckets rows and orders by _bk)
        assert "_bk" in spec, spec
