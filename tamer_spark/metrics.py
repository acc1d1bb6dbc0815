"""Pipeline observability via Spark's Observation API.

The reference exposes per-batch query metadata to user folds
(``ResultMetadata(queryExecutionTimeInNanos)``, db/model.scala:30-33) and
engine.BatchMetrics carries the engine-loop timings. This module adds
*data-plane* metrics: ``df.observe`` attaches aggregate expressions that
Spark computes during the normal action — zero extra passes — and reports
through an ``Observation`` handle. The idiomatic way to count rows/nulls/
bytes ingested per epoch without a second job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "metrics", exprs: list | None = None):
    """Attach observation metrics; returns (df, observation).

    Default metrics: row count + null count of every column. Read
    ``observation.get`` AFTER an action has run on the returned df.
    """
    if exprs is None:
        exprs = [F.count(F.lit(1)).alias("rows")] + [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
            for c in df.columns
        ]
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def ingest_quality_metrics(df: DataFrame, ts_col: str | None = None):
    """Standard ingestion health metrics: rows, per-column null counts, and
    event-time bounds (freshness / late-data indicators)."""
    exprs = [F.count(F.lit(1)).alias("rows")]
    exprs += [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}") for c in df.columns
    ]
    if ts_col:
        exprs += [F.min(ts_col).alias("min_ts"), F.max(ts_col).alias("max_ts")]
    return observed(df, "ingest_quality", exprs)
