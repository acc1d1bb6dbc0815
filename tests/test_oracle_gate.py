"""Local replica of the driver's t2 correctness gate: every registry query's
Spark result must hash-match its DuckDB oracle (order-insensitive)."""

from __future__ import annotations

import pytest

import os

from tamer_spark.oracle import compare, duckdb_con
from tamer_spark.queries import REGISTRY
from tests.conftest import SF_DIR as _DEFAULT_SF

# The suite replays the driver's gate at sf0.001 for speed; the sf0.1
# robustness sweep COVERAGE.md records is the same parametrization at a
# bigger SF — run it with
#   SPARK_GRAFT_GATE_SF=/root/testdata/sf0.1 pytest tests/test_oracle_gate.py
SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", _DEFAULT_SF)


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


def test_registry_fits_driver_correctness_window():
    """The external driver verifies only the FIRST 50 entries of
    ``queries()``. Round 5 let the registry grow to 68, silently dropping 18
    gates (including every r5 extension operator) out of the driver's
    independent correctness signal. Keep every entry inside the window —
    merge same-topic gates into tagged unions (the chunk_documents pattern)
    before adding a 51st entry."""
    from __spark_entry__ import queries

    assert len(queries()) <= 50, (
        f"registry has {len(queries())} entries; the driver checks only the "
        "first 50 — merge gates into tagged unions instead of overflowing"
    )


def test_approx_distinct_within_hll_error_of_exact(spark):
    """approx_distinct_users is the one rows-only gate entry (an HLL++ sketch
    no other engine reproduces bit-for-bit) — pin its VALUES here instead:
    every per-group estimate must sit within a generous HLL error band of the
    exact distinct count (default rsd 5%; 3-sigma ≈ 15%, doubled for the
    small-cardinality regime at test SF)."""
    from pyspark.sql import functions as F

    from tamer_spark.queries import REGISTRY, _t

    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_users"].spark(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in _t(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, est in approx.items():
        assert abs(est - exact[et]) <= max(3, 0.3 * exact[et]), (
            f"{et}: approx {est} vs exact {exact[et]}"
        )
