"""Bloom prefilter: no false negatives by construction, false positives
removed by the exact verify, bit-identical to the plain anti-join even
with a deliberately tiny (FP-heavy) filter."""

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    decontaminate_with_bloom,
)


@pytest.fixture(scope="module")
def values(spark):
    return spark.createDataFrame(
        [(f"shingle-{i}",) for i in range(200)], "s string"
    )


def test_no_false_negatives(spark, values):
    words = bloom_build(values, "s", m_bits=1 << 12, k=5)
    probed = bloom_might_contain(values, "s", words, 1 << 12, k=5)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_misses_mostly_rejected_at_sane_size(spark):
    members = spark.createDataFrame([(f"in-{i}",) for i in range(100)], "s string")
    others = spark.createDataFrame([(f"out-{i}",) for i in range(1000)], "s string")
    words = bloom_build(members, "s", m_bits=1 << 14, k=5)
    hits = bloom_might_contain(others, "s", words, 1 << 14, k=5).filter(
        F.col("bloom_hit")
    )
    # 100 members in 16384 bits with k=5 -> fp ~ 1e-5; allow generous slack
    assert hits.count() <= 5


def test_build_rejects_unaligned_m(spark, values):
    with pytest.raises(ValueError):
        bloom_build(values, "s", m_bits=100)


def _exact_anti(corpus_shingled, bench, docs):
    tainted = corpus_shingled.join(bench, "s").select("doc_id").distinct()
    return docs.join(tainted, "doc_id", "left_anti").select("doc_id")


@pytest.mark.parametrize("m_bits", [64, 1 << 14])  # 64 = FP-saturated filter
def test_bitwise_identical_to_exact_anti_join(spark, m_bits):
    rows = [(i, f"gram-{i % 37}") for i in range(300)]
    corpus = spark.createDataFrame(rows, "doc_id long, s string")
    bench = spark.createDataFrame([(f"gram-{i}",) for i in range(0, 37, 5)], "s string")
    docs = corpus.select("doc_id").distinct()
    expected = {r.doc_id for r in _exact_anti(corpus, bench, docs).collect()}
    got = {
        r.doc_id
        for r in decontaminate_with_bloom(
            corpus, bench, docs, m_bits=m_bits, k=3
        ).collect()
    }
    assert got == expected
