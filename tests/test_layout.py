"""Data-layout tools: sized writes, compaction, Morton clustering."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tamer_spark.sinks.layout import (
    compact_small_files,
    morton_order,
    write_sized,
    write_zordered,
)


def _parquet_files(path):
    return [f for f in glob.glob(f"{path}/**/*.parquet", recursive=True)]


def test_compact_small_files(spark, tmp_path):
    p = str(tmp_path / "frag")
    spark.range(100_000).repartition(64).write.parquet(p)
    assert len(_parquet_files(p)) == 64
    compact_small_files(spark, p, target_file_mb=128)
    files = _parquet_files(p)
    assert len(files) == 1  # ~1 MB of data → one 128 MB-target file
    assert spark.read.parquet(p).count() == 100_000


def test_write_sized_row_preserving(spark, tmp_path):
    p = str(tmp_path / "sized")
    df = spark.range(50_000).withColumn("v", F.rand(seed=1))
    write_sized(df, p, target_file_mb=1)
    assert spark.read.parquet(p).count() == 50_000


def test_morton_interleave_bits():
    import itertools

    # python twin of the interleave for verification
    def py_morton(xs, bits):
        out = 0
        for b in range(bits):
            for i, x in enumerate(xs):
                out |= ((x >> b) & 1) << (b * len(xs) + i)
        return out

    vals = list(itertools.product(range(8), repeat=2))
    import tamer_spark

    spark = tamer_spark.get_spark()
    df = spark.createDataFrame(vals, "x long, y long").withColumn(
        "z", morton_order([F.col("x"), F.col("y")], bits=3)
    )
    got = {(r.x, r.y): r.z for r in df.collect()}
    assert got == {(x, y): py_morton([x, y], 3) for x, y in vals}


def test_zorder_write_localizes_ranges(spark, tmp_path):
    p = str(tmp_path / "z")
    df = spark.createDataFrame(
        [(i % 100, (i * 37) % 100, i) for i in range(20_000)], "a long, b long, id long"
    )
    write_zordered(df, p, ["a", "b"], bits=7, n_files=8)
    out = spark.read.parquet(p)
    assert out.count() == 20_000
    # data skipping evidence: a tight predicate on either column should prune
    # row groups — check spark reports fewer rows scanned via file pruning
    # (hard to observe directly; assert correctness of the filtered result)
    assert out.filter((F.col("a") < 10) & (F.col("b") < 10)).count() == df.filter(
        (F.col("a") < 10) & (F.col("b") < 10)
    ).count()
