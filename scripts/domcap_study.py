#!/usr/bin/env python
"""A/B: ``cap_per_group`` plain-window vs mega-group prefilter posture —
the measured decision rule for when the prefilter's extra passes pay for
themselves (SCALING.md records the outcome, the skew_ab pattern).

Fixture: ``--rows`` rows over ``--keys`` groups with ONE hot group owning
``f`` of the table (swept over ``--fractions``), cap fixed at ``--cap``.
Landed in scratch parquet so both arms pay the same scan. Arms, per
fraction (median of ``--reps`` timed ``count()``s, cache cleared):

- ``plain``     — one rank window partitioned on the group: the hot
                  group's rows all sort in ONE task.
- ``prefilter`` — counts + map-side threshold cut (~cap·slack rows per
                  over-cap group) + ONE rank window over survivors.

The interesting read is the crossover: at low skew the prefilter's two
extra exchanges are pure overhead; once one group is big enough that a
single task's sort dominates the stage, the cut wins — and the gap
widens with the hot fraction while ``plain`` degrades linearly in the
hot group's size.

Prints one JSON line: per-fraction median seconds per arm + the ratio.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from pyspark.sql import functions as F
from tamer_spark.operators.mixing import cap_per_group

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch" / "domcap_study"


def build_fixture(spark, rows: int, keys: int, hot_fraction: float) -> str:
    hot_rows = int(rows * hot_fraction)
    cold = spark.range(rows - hot_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % (keys - 1)).cast("string")).alias("g"),
    )
    hot = spark.range(rows - hot_rows, rows).select(
        F.col("id").alias("doc_id"), F.lit("hotgroup").alias("g")
    )
    path = str(SCRATCH / f"fixture_{hot_fraction}")
    cold.unionByName(hot).repartition(32).write.mode("overwrite").parquet(path)
    return path


def time_arm(spark, path: str, cap: int, slack: int | None, reps: int) -> float:
    times = []
    for _ in range(1 + reps):  # first iteration is warm-up
        spark.catalog.clearCache()
        df = spark.read.parquet(path)
        t0 = time.monotonic()
        cap_per_group(df, "g", cap=cap, prefilter_slack=slack).count()
        times.append(time.monotonic() - t0)
    return round(statistics.median(times[1:]), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, default=1_000)
    ap.add_argument("--cap", type=int, default=100)
    ap.add_argument("--slack", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--fractions", type=float, nargs="+", default=[0.01, 0.2, 0.5, 0.9]
    )
    args = ap.parse_args()
    if args.keys < 2:
        raise SystemExit("--keys must be >= 2 (one hot group + at least one cold group)")
    spark = tamer_spark.get_spark("domcap-study")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    try:
        for f in args.fractions:
            path = build_fixture(spark, args.rows, args.keys, f)
            plain = time_arm(spark, path, args.cap, None, args.reps)
            pre = time_arm(spark, path, args.cap, args.slack, args.reps)
            out[str(f)] = {
                "plain_s": plain,
                "prefilter_s": pre,
                "prefilter_over_plain": round(pre / plain, 2) if plain else None,
            }
            print(f"# f={f}: {out[str(f)]}", file=sys.stderr)
        print(
            json.dumps(
                {"rows": args.rows, "keys": args.keys, "cap": args.cap, "results": out}
            )
        )
    finally:
        shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
