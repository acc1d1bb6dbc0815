"""Source-format variety (CSV/JSON round-trips match parquet) and
partition-pruned scans on date-partitioned layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.plans import explain_str
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_json_roundtrip_matches_parquet(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    schema = orders.schema

    csv_path, json_path = str(tmp_path / "o_csv"), str(tmp_path / "o_json")
    orders.write.option("header", True).csv(csv_path)
    orders.write.json(json_path)

    from_csv = spark.read.option("header", True).schema(schema).csv(csv_path)
    from_json = spark.read.schema(schema).json(json_path)
    assert _rows(from_csv) == _rows(orders)
    assert _rows(from_json) == _rows(orders)


def test_date_partitioned_scan_prunes(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    p = str(tmp_path / "orders_by_month")
    orders.write.partitionBy("order_month").parquet(p)

    part = spark.read.parquet(p)
    months = [r.order_month for r in part.select("order_month").distinct().collect()]
    target = sorted(months)[0]
    q = part.filter(F.col("order_month") == target)
    plan = explain_str(q, "formatted")
    # partition pruning: the filter appears as a PartitionFilter on the scan,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "order_month" in plan.split("PartitionFilters", 1)[1][:200], plan
    expected = orders.filter(F.col("order_month") == target).count()
    assert q.count() == expected
