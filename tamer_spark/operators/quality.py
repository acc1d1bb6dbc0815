"""Data-quality gates: declarative checks evaluated in one pass.

Ingestion pipelines need validation between landing and consumption. Checks
compile to a single aggregate job (one scan, no per-check passes);
referential checks compile to anti-join counts. Results are (check, n_bad)
rows — feed them to a threshold gate in the engine loop or alert on them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    predicate: Column  # TRUE for BAD rows


def not_null(col: str) -> Check:
    return Check(f"{col}_null", F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    p = F.lit(False)
    if lo is not None:
        p = p | (F.col(col) < lo)
    if hi is not None:
        p = p | (F.col(col) > hi)
    return Check(f"{col}_out_of_range", p)


def matches(col: str, pattern: str) -> Check:
    return Check(f"{col}_malformed", ~F.col(col).rlike(pattern))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All row-level checks in ONE aggregate pass → (check, n_bad)."""
    agg = df.agg(
        *[F.sum(F.when(c.predicate, 1).otherwise(0)).cast("long").alias(c.name) for c in checks]
    )
    names = [c.name for c in checks]
    stacked = agg.select(
        F.explode(
            F.array(*[F.struct(F.lit(n).alias("check"), F.col(n).alias("n_bad")) for n in names])
        ).alias("r")
    )
    return stacked.select("r.check", "r.n_bad")


def referential_check(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, name: str | None = None
) -> DataFrame:
    """Orphan count: child rows whose fk has no parent pk (anti join)."""
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti")
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("n_bad")).select(
        F.lit(name or f"{fk}_orphaned").alias("check"), "n_bad"
    )


def uniqueness_check(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Duplicate-key count: rows beyond the first per key."""
    dupes = df.groupBy(*cols).count().filter(F.col("count") > 1)
    extra = dupes.agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("long").alias("n_bad"))
    return extra.select(F.lit(name or ("_".join(cols) + "_duplicated")).alias("check"), "n_bad")
