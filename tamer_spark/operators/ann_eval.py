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


def ranking_metrics(run: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Per-query ranking-quality metrics of a retrieval ``run`` against a
    relevance set ``qrels`` — the standard IR eval battery (TREC
    conventions, Voorhees 1999 lineage), INTEGER-EXACT so any engine
    reproduces every value bit-for-bit:

    - ``n_rel``            |qrels(q)|
    - ``hits``             |run(q) ∩ qrels(q)| within rank ≤ k
    - ``recall_ppm``       (hits · 10⁶) div n_rel
    - ``mrr_ppm``          10⁶ div rank(first relevant hit), 0 if none —
                           the reciprocal-rank integerization (nDCG's
                           1/log₂(rank+1) is irrational, so MRR is the
                           exactness-compatible rank-position metric)
    - ``precision_ppm``    (hits · 10⁶) div k

    Contracts: ``run`` carries (query_id, neighbor_id, rank); ``qrels``
    carries (query_id, neighbor_id). A query present in qrels but absent
    from the run scores 0 across the board (LEFT join — silent drops are
    how broken eval harnesses overstate quality); a run query with no
    qrels entry is excluded (nothing to measure against).

    Scale shape: run is top-k-bounded per query before anything shuffles;
    both aggregations are partial-aggregable groupBys on query_id (MIN
    rank gives first_rel — no window, no sort). Evaluation cost is
    independent of corpus size: it sees only result sets and relevance
    sets, so the same op audits a 100 TB index as cheaply as a fixture.
    """
    bounded = run.filter(F.col("rank") <= k).select("query_id", "neighbor_id", "rank")
    n_rel = qrels.select("query_id", "neighbor_id").distinct().groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    hit = (
        bounded.join(qrels.select("query_id", "neighbor_id").distinct(),
                     ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"), F.min("rank").alias("first_rel"))
    )
    return (
        n_rel.join(hit, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.expr("coalesce(hits, 0) * 1000000 div n_rel").alias("recall_ppm"),
            F.coalesce(F.expr("1000000 div first_rel"), F.lit(0))
            .cast("long")
            .alias("mrr_ppm"),
            F.expr(f"coalesce(hits, 0) * 1000000 div {int(k)}").alias("precision_ppm"),
        )
    )


def macro_metrics(per_query: DataFrame) -> DataFrame:
    """Macro-average the ranking_metrics frame over queries — one row of
    (n_queries, recall_ppm, mrr_ppm, precision_ppm), each the integer mean
    (sum div count) of the per-query ppm values. Integer-exact like its
    input; one tiny partial agg."""
    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.expr("sum(recall_ppm) div count(*)").alias("recall_ppm"),
        F.expr("sum(mrr_ppm) div count(*)").alias("mrr_ppm"),
        F.expr("sum(precision_ppm) div count(*)").alias("precision_ppm"),
    )
