"""Physical-plan inspection — makes the scale posture assertable.

"Would this survive a 100× scale-up" is a property of the physical plan:
small dims must broadcast (no shuffle of the fact table for a dim join),
filters and projections must reach the parquet scan (PushedFilters /
ReadSchema), map work must sit inside WholeStageCodegen spans, and shuffle
count should match the query's intrinsic needs. tests/test_plans.py pins
these properties so a regression (e.g. a lost broadcast hint turning a dim
join into a sort-merge of the fact table) fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_shuffle(df: DataFrame) -> bool:
    return shuffle_count(df) > 0


def shuffle_count(df: DataFrame) -> int:
    """Shuffle exchanges only — BroadcastExchange is deliberately NOT a
    shuffle (that's the whole point of broadcasting)."""
    plan = explain_str(df, mode="simple")
    return len(
        re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_str(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (ReadSchema) — column-pruning
    evidence: a 2-column projection must not scan 16 columns."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", explain_str(df)):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider spans = more fused JVM work)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
