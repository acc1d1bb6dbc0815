"""Shared scaffolding for the example apps: session, tmp workspace, printing."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark


def session(name: str):
    spark = tamer_spark.get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def workspace() -> Path:
    return Path(tempfile.mkdtemp(prefix="tamer-spark-example-"))


def show(sink, limit: int = 10) -> None:
    rows = sink.rows
    print(f"--- ingested {len(rows)} records ---")
    for r in rows[:limit]:
        print(dict(r.asDict()))
    if len(rows) > limit:
        print(f"... and {len(rows) - limit} more")
