"""Exact percentiles: parity with Python's statistics on crafted groups,
duplicate-value determinism, rational-target edge ranks, one-exchange
plan."""

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.percentiles import exact_percentiles


@pytest.fixture(scope="module")
def grouped(spark):
    rows = [("a", v) for v in [10, 20, 30, 40, 50]] + [
        ("b", v) for v in [7, 7, 7, 9, 9, 100]
    ]
    return spark.createDataFrame(rows, "g string, val long")


def _get(df):
    return {(r.g, r.p): r.value for r in df.collect()}


def test_disc_semantics_match_manual(spark, grouped):
    out = _get(exact_percentiles(grouped, "val", [(1, 2), (9, 10)], keys=("g",)))
    # group a (n=5): median rank ceil(2.5)=3 -> 30; p90 rank ceil(4.5)=5 -> 50
    assert out[("a", "1/2")] == 30 and out[("a", "9/10")] == 50
    # group b (n=6): median rank ceil(3)=3 -> 7; p90 rank ceil(5.4)=6 -> 100
    assert out[("b", "1/2")] == 7 and out[("b", "9/10")] == 100


def test_duplicates_do_not_break_determinism(spark):
    df = spark.createDataFrame([("g", 5)] * 9 + [("g", 6)], "g string, val long")
    out = _get(exact_percentiles(df, "val", [(1, 2), (1, 1)], keys=("g",)))
    assert out[("g", "1/2")] == 5 and out[("g", "1/1")] == 6


def test_p_one_is_max_and_validation(spark, grouped):
    out = _get(exact_percentiles(grouped, "val", [(1, 1)], keys=("g",)))
    assert out[("a", "1/1")] == 50 and out[("b", "1/1")] == 100
    with pytest.raises(ValueError):
        exact_percentiles(grouped, "val", [(0, 2)], keys=("g",))
    with pytest.raises(ValueError):
        exact_percentiles(grouped, "val", [])


def test_single_exchange(spark, grouped):
    from tamer_spark.plans import shuffle_count

    df = exact_percentiles(grouped, "val", [(1, 2), (9, 10)], keys=("g",))
    # rank + count share the group-key exchange; the union adds no shuffle
    assert shuffle_count(df) <= 2, df._jdf.queryExecution().toString()[:500]
