"""Retrieval-quality evaluation for the ANN tier.

The hash gates (queries.py ann_search) pin *determinism* — the implemented
algorithm produces exactly the result its spec says. They do not answer "is
the index any good": a user choosing ``nprobe``/``shortlist`` needs recall@k
against the exact brute-force baseline. This module computes that number as
a DataFrame op, and scripts/ann_recall.py publishes the curve
(docs/SCALING.md) that tests/test_ann_recall.py pins floors for.

Reference parity note: the reference engine (laserdisc-io/tamer) has no ANN
tier — this is part of the training-data-pipeline surface built on top of
the same engine contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Macro-averaged recall@k of an approximate ANN result against exact
    ground truth, both in the ``(query_id, neighbor_id, rank)`` result
    contract shared by cosine_knn / ivf_search / pq_search_adc /
    ivfadc_search.

    Per query: ``|approx ∩ exact| / |exact|``; the returned single row is
    the mean over queries present in the ground truth (a query the ANN
    method returned nothing for counts as recall 0, not a dropped row).

    Scale shape: one equi-join on (query_id, neighbor_id) over result sets
    of size queries × k — evaluation cost is independent of corpus size, so
    the same op audits an index over the full 100 TB corpus as cheaply as a
    fixture. Returns ``(recall double, n_queries long)``.
    """
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(hits, "query_id", "left")
        .withColumn("recall", F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true"))
    )
    return per_q.agg(
        F.round(F.avg("recall"), 4).alias("recall"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
    )


def recall_value(approx: DataFrame, exact: DataFrame) -> float:
    """Convenience: the scalar macro recall (one tiny collect)."""
    return float(recall_at_k(approx, exact).collect()[0]["recall"])
