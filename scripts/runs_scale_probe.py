#!/usr/bin/env python
"""Geometry-controlled scale probe for substring_run_pairs.

The shared scale_probe.py 10x corpus is 10 VERBATIM copies of every doc,
so a substring-run query's pair output grows as C(10,2) per original
shared window — quadratic by construction of the synthetic duplication,
which is why the operator was excluded from the main linearity table
(docs/SCALING.md r6) on a geometry argument. This probe replaces the
argument with a measurement by CONTROLLING the geometry:

- N docs, 120 tokens each; every token is globally unique
  (md5 of (doc_id, pos)) EXCEPT a planted 80-token run at positions
  20..99 shared by each (2i, 2i+1) partner pair (md5 of (pair_id, pos)).
- Pair output is therefore EXACTLY N/2 rows at every N — overlap density
  is fixed, so a 10x doc step is a 10x token step AND a 10x output step:
  the honest linear-scaling regime a real corpus (bounded duplication
  rate) presents, where the window-hash map stage dominates.
- Every pair's max_run_tokens must be exactly 80 and its
  n_shared_windows exactly 31 (80 - 50 + 1) — the probe asserts both, so
  the timing is also a correctness check at both scales.

Steps: N=5_000 and N=50_000 (10x), cold plans (cache cleared), corpus
written as 32 parquet files (the scale_probe.py layout rule — a
single-file corpus serializes the map stage onto one core and measures
the layout, not the plan). Prints one JSON line per step plus a ratio
line for the SCALING.md linearity table.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from pyspark.sql import functions as F
from tamer_spark.operators.runs import substring_run_pairs

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch" / "runs_scale_probe"

N_TOKENS = 120
RUN_START, RUN_END = 20, 99  # inclusive: 80-token planted run
LENGTH = 50


def synthesize(spark, n_docs: int, dst: Path) -> None:
    """N docs of globally-unique 12-hex tokens; partner pairs (2i, 2i+1)
    share tokens at positions 20..99 (keyed by pair id — no window crosses
    into the unique region without breaking, so the shared run is exactly
    80 tokens and nothing else matches)."""
    dst.mkdir(parents=True, exist_ok=True)
    text = F.expr(
        f"""
        concat_ws(' ', transform(sequence(0, {N_TOKENS - 1}), j ->
          CASE WHEN j BETWEEN {RUN_START} AND {RUN_END}
               THEN substr(md5(concat('p-', CAST(id DIV 2 AS STRING), '-',
                                      CAST(j AS STRING))), 1, 12)
               ELSE substr(md5(concat('u-', CAST(id AS STRING), '-',
                                      CAST(j AS STRING))), 1, 12) END))
        """
    )
    (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(dst))
    )


def probe(spark, n_docs: int, path: Path) -> dict:
    spark.catalog.clearCache()
    docs = spark.read.parquet(str(path))
    t0 = time.monotonic()
    out = substring_run_pairs(docs, length=LENGTH).persist()
    n_pairs = out.count()
    dt = time.monotonic() - t0
    bad = out.filter(
        (F.col("max_run_tokens") != (RUN_END - RUN_START + 1))
        | (F.col("n_shared_windows") != (RUN_END - RUN_START + 1 - LENGTH + 1))
    ).count()
    out.unpersist()
    want = n_docs // 2
    assert n_pairs == want, f"pair output not linear: {n_pairs} != {want}"
    assert bad == 0, f"{bad} pairs with wrong run geometry"
    return {"op": "substring_run_pairs", "n_docs": n_docs, "sec": round(dt, 3), "pairs": n_pairs}


def main() -> None:
    spark = tamer_spark.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    try:
        # untimed warm-up at a small N: JIT-compiles the generated code and
        # primes the session so the FIRST timed step doesn't absorb JVM
        # startup (observed: step 1 slower than the 10x step without this)
        warm = SCRATCH / "docs_warm"
        synthesize(spark, 1_000, warm)
        probe(spark, 1_000, warm)
        for n in (5_000, 50_000):
            p = SCRATCH / f"docs_{n}"
            synthesize(spark, n, p)
            r = probe(spark, n, p)
            results.append(r)
            print(json.dumps(r), flush=True)
        ratio = results[1]["sec"] / results[0]["sec"]
        print(
            json.dumps(
                {
                    "op": "substring_run_pairs",
                    "data_ratio": 10.0,
                    "time_ratio": round(ratio, 2),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
