"""Temperature resampling: tail upsampled relative to head, alpha=1
recovers proportional sampling, small groups kept whole, determinism,
map-only plan."""

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.temperature import temperature_mix


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "head") for i in range(900)] + [(i + 1000, "tail") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _by_group(df):
    return {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_tail_upsampled_vs_proportional(spark, corpus):
    # proportional share of tail = 10%; sqrt share = sqrt(100)/(sqrt(900)+sqrt(100)) = 25%
    out = _by_group(temperature_mix(corpus, target=400, alpha=0.5))
    total = sum(out.values())
    tail_frac = out["tail"] / total
    assert 0.18 < tail_frac < 0.32, out  # ~25% +/- hash noise
    assert abs(total - 400) < 60, total


def test_alpha_one_is_proportional(spark, corpus):
    out = _by_group(temperature_mix(corpus, target=500, alpha=1.0))
    total = sum(out.values())
    assert 0.05 < out["tail"] / total < 0.16, out  # ~10%


def test_small_group_kept_whole_when_share_exceeds_size(spark, corpus):
    # tail share (25%) of target 1000 = 250 > 100 docs -> keep all 100
    out = _by_group(temperature_mix(corpus, target=1000, alpha=0.5))
    assert out["tail"] == 100


def test_deterministic(spark, corpus):
    a = {r.doc_id for r in temperature_mix(corpus, target=300).collect()}
    b = {r.doc_id for r in temperature_mix(corpus, target=300).collect()}
    assert a == b


def test_membership_monotone_in_target(spark, corpus):
    # hash-range membership: raising the target only ADDS docs
    small = {r.doc_id for r in temperature_mix(corpus, target=200).collect()}
    big = {r.doc_id for r in temperature_mix(corpus, target=600).collect()}
    assert small <= big


def test_invalid_alpha_rejected(spark, corpus):
    with pytest.raises(ValueError):
        temperature_mix(corpus, target=100, alpha=0.0)


def test_int64_headroom_guard_raises(spark):
    # one group large enough that (M-1)*W*n would wrap int64: W*n >= 2^63/M
    # with W ~ 1e6*sqrt(n) needs n ~ 44k — tiny frame, but the keep
    # predicate would silently corrupt sampling without the guard
    import pytest
    from pyspark.sql import functions as F

    from tamer_spark.operators.temperature import temperature_mix

    docs = spark.range(45_000).select(
        F.col("id").alias("doc_id"), F.lit("only-group").alias("source")
    )
    with pytest.raises(ValueError, match="headroom"):
        temperature_mix(docs, target=10)
