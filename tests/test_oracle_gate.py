"""Local replica of the driver's t2 correctness gate: every registry query's
Spark result must hash-match its DuckDB oracle (order-insensitive)."""

from __future__ import annotations

import pytest

from tamer_spark.oracle import compare, duckdb_con
from tamer_spark.queries import REGISTRY
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.mark.parametrize("name", [n for n, q in REGISTRY.items() if q.oracle])
def test_query_matches_oracle(spark, con, name):
    query = REGISTRY[name]
    result = compare(name, query.spark(spark, SF_DIR), con.execute(query.oracle).df())
    assert result.match, f"{name}: {result.first_diff}"
    assert result.spark_rows > 0 or name.startswith(("join_anti", "set_except")), (
        f"{name}: empty result — not exercising anything"
    )


def test_all_queries_have_entries():
    from __spark_entry__ import oracle_sql, queries

    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
