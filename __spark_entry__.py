"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the registry in
``tamer_spark/queries.py`` — every entry is a (Spark DataFrame plan,
DuckDB oracle SQL) pair with deterministic cross-engine semantics (exact
integer arithmetic for aggregates, md5-derived hashing, total tie-break
orders). See SURVEY.md §2 for the operator inventory they cover.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tamer_spark.queries import REGISTRY, all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q5-style star join (broadcast dims, single
    shuffle) on /root/testdata/sf0.001."""
    return REGISTRY["q5_region_revenue"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
