"""A/B: profiler-driven ``salted_join`` vs AQE's skew-join split on a
synthetic hot-key join — the measured decision rule the skew profiler's
docstring promises (SCALING.md "Key-skew profiler" section records the
outcome).

Fixture (scale_probe-style): a fact table of ``--rows`` rows over
``--keys`` distinct keys with a single hot key owning ``f`` of the table
(swept over ``--fractions``), joined to a ``--keys``-row dim. Both sides
land in scratch parquet first so every arm pays the same scan. The dim is
sized well past any broadcast threshold *behavior-wise* by forcing
``autoBroadcastJoinThreshold=-1`` — skew only matters on a shuffled join;
a broadcast join never shuffles the probe side and is the FIRST answer to
skew when the dim fits (SCALING.md).

Arms, per fraction (median of ``--reps`` timed ``count()``s over the join
+ a group-by, cache cleared between runs):

- ``aqe``      — plain join, AQE skew split enabled with thresholds
                 lowered (8 MB / factor 2) so the splitter can actually
                 trigger at local scale; at defaults (256 MB) a local
                 partition never qualifies, which IS the 100 TB analogy:
                 AQE splits when a partition exceeds the threshold.
- ``no_skew``  — plain join, AQE skew split disabled: the unmitigated
                 hot-partition cost, the control both mitigations chase.
- ``salt``     — ``salted_join`` at the profiler's ``suggested_salt``
                 (skew split disabled so the arm is pure salting).

Prints one JSON line: per-fraction ``skew_ppm``, ``suggested_salt``, and
median seconds per arm.
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

SCRATCH = Path("/tmp/tamer_spark_skew_ab")

# AQE skew-split knobs for the "aqe" arm: the default trigger is a
# partition > max(256 MB, factor 5 × median) — unreachable at local scale,
# so lower it until the splitter CAN act; what we then measure is the
# mechanism, and the 100 TB read-across is by partition-size ratio.
_AQE_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(8 * 1024 * 1024),
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(4 * 1024 * 1024),
}


def build_fixture(spark, rows: int, keys: int, hot_fraction: float) -> tuple[str, str]:
    """Write (fact, dim) scratch parquet: fact has one key owning
    ``hot_fraction`` of all rows, the rest uniform over the key space."""
    from pyspark.sql import functions as F

    fact_path = str(SCRATCH / f"fact_{int(hot_fraction * 100)}")
    dim_path = str(SCRATCH / "dim")
    n_hot = int(rows * hot_fraction)
    base = spark.range(rows).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") * 17 % 1000).alias("v"),
    )
    base.write.mode("overwrite").parquet(fact_path)
    if not Path(dim_path).exists():
        spark.range(keys).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("payload")
        ).write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def _joined_count(spark, fact_path: str, dim_path: str, salt: int | None) -> int:
    from pyspark.sql import functions as F

    from tamer_spark.operators.skew import salted_join

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    j = fact.join(dim, "k") if salt is None else salted_join(fact, dim, "k", salt=salt)
    # a group-by after the join so the hot partition pays its full cost
    # (join output of the hot key stays on one task without mitigation)
    return j.groupBy("payload").agg(F.sum("v").alias("s")).count()


def time_arm(spark, fact_path: str, dim_path: str, conf: dict[str, str], salt: int | None, reps: int) -> float:
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            _joined_count(spark, fact_path, dim_path, salt)
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)
    finally:
        for k in conf:
            spark.conf.unset(k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--fractions", type=float, nargs="+", default=[0.0, 0.2, 0.5, 0.8])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import tamer_spark
    from tamer_spark.operators.skew import skew_summary

    spark = tamer_spark.get_spark("skew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # shuffled join or nothing: broadcast would sidestep skew entirely
    base_conf = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    no_split = {**base_conf, "spark.sql.adaptive.skewJoin.enabled": "false"}

    out: dict[str, dict] = {}
    try:
        for f in args.fractions:
            fact_path, dim_path = build_fixture(spark, args.rows, args.keys, f)
            summ = skew_summary(spark.read.parquet(fact_path), "k").collect()[0]
            # suggested_salt levels the hot key to the MEAN key load — on a
            # hugely hot key that can exceed the cluster's parallelism by
            # orders of magnitude, and every extra salt unit replicates the
            # whole dim once for zero extra parallelism. The practical salt
            # is min(suggested, ~2x tasks): enough to fill every core.
            n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
            salt = max(2, min(int(summ.suggested_salt), 2 * n_parts))
            rec = {
                "skew_ppm": int(summ.skew_ppm),
                "suggested_salt": int(summ.suggested_salt),
                "salt_used": salt,
                "no_skew_s": time_arm(spark, fact_path, dim_path, no_split, None, args.reps),
                "aqe_s": time_arm(
                    spark, fact_path, dim_path, {**base_conf, **_AQE_SKEW_CONF}, None, args.reps
                ),
                "salt_s": time_arm(spark, fact_path, dim_path, no_split, salt, args.reps),
            }
            out[f"f={f}"] = rec
            print(f"# {f}: {rec}", file=sys.stderr)
        print(json.dumps({"rows": args.rows, "keys": args.keys, "results": out}))
    finally:
        shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
