"""Upsert sink (merge semantics, partial-bucket rewrite, replay idempotence)
and salted skew join (identical results, spread hot key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.operators.skew import salted_join
from tamer_spark.sinks.upsert import ParquetUpsertSink


def test_upsert_inserts_then_updates(spark, tmp_path):
    sink = ParquetUpsertSink(str(tmp_path / "t"), ["id"], num_buckets=4)
    sink.upsert(spark, spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    assert {(r.id, r.v) for r in sink.read(spark).collect()} == {(1, "a"), (2, "b")}
    # update key 2, insert key 3; key 1 untouched
    sink.upsert(spark, spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"))
    assert {(r.id, r.v) for r in sink.read(spark).collect()} == {(1, "a"), (2, "B"), (3, "c")}


def test_upsert_replay_is_idempotent(spark, tmp_path):
    sink = ParquetUpsertSink(str(tmp_path / "t"), ["id"], num_buckets=4)
    batch = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
    sink.write(batch, epoch=0)
    sink.write(batch, epoch=0)  # replayed epoch (crash before state commit)
    rows = sink.read(spark).collect()
    assert len(rows) == 20  # no duplicates


def test_upsert_via_engine_with_reingestion(spark, tmp_path):
    """Periodic-rescan shape: the same keys arrive again with new values;
    the upsert sink keeps exactly the latest version per key."""
    sink = ParquetUpsertSink(str(tmp_path / "t"), ["id"], num_buckets=4)
    sink.upsert(spark, spark.createDataFrame([(i, 0) for i in range(10)], "id long, version int"))
    sink.upsert(spark, spark.createDataFrame([(i, 1) for i in range(5, 15)], "id long, version int"))
    got = {r.id: r.version for r in sink.read(spark).collect()}
    assert got == {**{i: 0 for i in range(5)}, **{i: 1 for i in range(5, 15)}}


def test_salted_join_matches_plain_join(spark):
    # hot key: one user with 5k rows, others tiny
    rows = [(1, i) for i in range(5000)] + [(u, 0) for u in range(2, 50)]
    large = spark.createDataFrame(rows, "user long, x long")
    small = spark.createDataFrame([(u, f"u{u}") for u in range(1, 50)], "user long, name string")
    plain = large.join(small, "user").groupBy("user").count()
    salted = salted_join(large, small, "user", salt=8).groupBy("user").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    large = spark.createDataFrame([(1, i) for i in range(1000)], "user long, x long")
    small = spark.createDataFrame([(1, "hot")], "user long, name string")
    lg_salted = salted_join(large, small, "user", salt=8)
    assert lg_salted.count() == 1000
    # the salt column spreads the single key across multiple values
    from tamer_spark.operators.skew import F as _F  # noqa: N811
    salts = (
        large.withColumn(
            "_salt",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat_ws("\x00", *[F.col(c).cast("string") for c in large.columns])), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(8),
            ),
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8
