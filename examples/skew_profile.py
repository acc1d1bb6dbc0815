"""Profile → suggest → salt: the skew-handling loop on a hot-key join.

The workflow the skew profiler's docs describe, end to end:

1. ``key_counts`` once (ONE count shuffle) feeds both profiler views;
2. ``heavy_hitters`` names the hot keys, ``skew_summary`` quantifies the
   skew (ppm vs a uniform key load) and emits ``suggested_salt`` — the
   exact ``salted_join(salt=...)`` value that levels the hottest key down
   to the mean key load;
3. ``salted_join`` with that suggested salt produces results IDENTICAL to
   the plain join (asserted below, row count and aggregate) while the hot
   key's rows spread over ``salt`` partitions instead of landing on one
   executor.

The fact table is sf0.001 events with a synthetic megauser grafted on (the
classic 100 TB shape: one key owning a third of the table); the dim side is
the customer table. At this scale AQE's skew split would of course also
cope — the example pins the *workflow contract*, not a speed claim (see
docs/SCALING.md's profiler section for the measured AQE-vs-salt rule).
"""

from __future__ import annotations

from _common import session

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
HOT_USER = 7


def main() -> None:
    spark = session("skew-profile-example")
    from tamer_spark.operators.skew import heavy_hitters, key_counts, salted_join, skew_summary

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_base = events.count()
    # graft a megauser: replicate ~half the table onto one user_id so the
    # profiler has a genuinely hot key to find (testdata events are mild)
    hot = events.limit(n_base // 2).withColumn("user_id", F.lit(HOT_USER).cast("long"))
    fact = events.unionByName(hot)

    # -- 1. profile: one count shuffle shared by both views ---------------
    counts = key_counts(fact, "user_id")
    top = heavy_hitters(fact, "user_id", 5, counts=counts).collect()
    summ = skew_summary(fact, "user_id", counts=counts).collect()[0]

    print(f"--- skew profile of events.user_id ({summ.n_rows} rows) ---")
    for r in top:
        print(f"  #{r.rank}: key={r.key} n={r.n}")
    print(
        f"  n_keys={summ.n_keys} max_n={summ.max_n} "
        f"skew_ppm={summ.skew_ppm} suggested_salt={summ.suggested_salt}"
    )
    assert top[0].key == HOT_USER, "profiler must surface the grafted megauser"
    assert summ.suggested_salt > 1, "a hot key this heavy must warrant salting"
    assert summ.skew_ppm > 1_000_000, "ppm > 1e6 means hotter than uniform"

    # -- 2. act on the advice: salted join with the CAPPED suggestion -----
    # suggested_salt levels the hot key to the MEAN key load; past the task
    # count each extra unit replicates the dim once for zero parallelism
    # gain, so cap at ~2x the shuffle partitions (skew.py docstring /
    # SCALING.md r11 — the same rule scripts/skew_ab.py applies)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    salt = max(2, min(int(summ.suggested_salt), 2 * n_parts))
    dim = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    plain = fact.join(dim, "user_id")
    salted = salted_join(fact, dim, "user_id", salt=salt)

    # contract: identical results, physical distribution only (each join
    # runs once: counts cached in locals, equality checked on aggregates)
    n_plain, n_salted = plain.count(), salted.count()
    assert n_salted == n_plain, "salted join must not change row count"
    agg = lambda df: sorted(  # noqa: E731
        map(tuple, df.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect())
    )
    assert agg(salted) == agg(plain), "salted join must match the plain join's aggregates"
    print(
        f"salted_join(salt={salt}, suggested {summ.suggested_salt} capped at "
        f"2x{n_parts} partitions) == plain join: {n_plain} rows — OK"
    )

    spark.stop()


if __name__ == "__main__":
    main()
