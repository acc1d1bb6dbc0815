"""Local replica of the driver's correctness gate.

Runs each registry query on Spark and its oracle SQL on DuckDB (tables
pre-registered as views over the same parquet), then compares row count,
schema shape, and an order-insensitive value hash. Used by tests/ to keep the
gate green before the driver ever sees the code.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    match: bool
    first_diff: str = ""

    def __bool__(self) -> bool:
        return self.match


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> CompareResult:
    spdf = spark_df.toPandas()
    a = canonical_rows(spdf)
    b = canonical_rows(oracle_pdf)
    if a == b:
        return CompareResult(name, len(a), len(b), True)
    diff = ""
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            diff = f"row {i}: spark={x} oracle={y}"
            break
    else:
        diff = f"row count {len(a)} vs {len(b)}"
        if len(a) > len(b):
            diff += f"; extra spark row: {a[len(b)]}"
        elif len(b) > len(a):
            diff += f"; extra oracle row: {b[len(a)]}"
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        diff = f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}; " + diff
    return CompareResult(name, len(a), len(b), False, diff)


def run_gate(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from tamer_spark.queries import REGISTRY

    con = duckdb_con(sf_dir)
    out = []
    for name, query in REGISTRY.items():
        if names and name not in names:
            continue
        if query.oracle is None:
            continue
        sdf = query.spark(spark, sf_dir)
        opdf = con.execute(query.oracle).df()
        out.append(compare(name, sdf, opdf))
    return out
