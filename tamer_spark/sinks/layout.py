"""Data-layout management: file sizing, partition layout, clustering.

The storage-side half of 100 TB performance: scans are only as good as the
layout under them. Three tools:

- ``write_sized``: target-file-size writes — the small-files problem (a
  100 TB table written by 10k tasks/day degenerates into millions of tiny
  files; listing + footer overhead then dominates scans).
- ``compact_small_files``: rewrite an existing directory to target sizes.
- ``morton_order``: multi-dimension clustering (Z-order) — interleaves the
  bits of several columns so range predicates on ANY of them localize into
  few files; combined with parquet min/max stats this is the poor-man's
  Delta Z-ORDER, expressed as a plain sort key.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def estimate_size_bytes(spark: SparkSession, path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if not f.startswith("."))
    return total


def plan_size_mb(df: DataFrame) -> float | None:
    """Sum of the plan's LEAF scan sizes (MB) — ZERO extra actions.

    For parquet-backed plans each leaf's estimate is the actual file size
    gathered at planning time. Leaves are summed instead of reading the
    plan ROOT's estimate on purpose: without CBO column stats, Catalyst's
    default join estimate is the PRODUCT of the children's sizes — a join
    of two 100 MB scans "estimates" petabytes, which would blow the file
    count sky-high. Output ≤ inputs is the right assumption for sizing a
    write. ``None`` when any leaf has no real estimate (unknown sources
    report a max-long sentinel).
    """
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0.0
        for i in range(leaves.size()):
            size = float(str(leaves.apply(i).stats().sizeInBytes()))
            if size <= 0 or size >= 2**60:  # sentinel for "unknown"
                return None
            total += size
    except Exception:  # noqa: BLE001 — stats API unavailable
        return None
    return total / (1024 * 1024) if total else None


def write_sized(
    df: DataFrame,
    path: str,
    target_file_mb: int = 128,
    estimated_total_mb: float | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with file count chosen for ~target_file_mb files.

    Size resolution order: caller-supplied ``estimated_total_mb`` (source
    stats — the right input on a real pipeline) → Catalyst plan statistics
    (free, no extra actions) → a 1k-row sample + count. The last resort runs
    two extra actions including a FULL SCAN of the input — at 100 TB that is
    a scan *before the real write*, which is why it is last and why the
    plan-stats path exists.
    """
    if estimated_total_mb is None:
        estimated_total_mb = plan_size_mb(df)
    if estimated_total_mb is None:
        # last resort: rows × avg row size from a 1k-row sample (2 actions)
        sample = df.limit(1000).toPandas()
        row_bytes = max(1, int(sample.memory_usage(deep=True).sum() / max(len(sample), 1)))
        estimated_total_mb = df.count() * row_bytes / (1024 * 1024) / 3  # parquet ≈ 3× compression
    n_files = max(1, math.ceil(estimated_total_mb / target_file_mb))
    writer = df.repartition(n_files, *(partition_cols or [F.spark_partition_id()])) if partition_cols else df.repartition(n_files)
    w = writer.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def compact_small_files(
    spark: SparkSession, path: str, target_file_mb: int = 128, tmp_suffix: str = "__compact_tmp"
) -> int:
    """Rewrite ``path`` to ~target-sized files; returns the new file count.

    Read → repartition by measured size → write alongside → atomic swap.
    """
    import shutil

    size_mb = estimate_size_bytes(spark, path) / (1024 * 1024)
    n_files = max(1, math.ceil(size_mb / target_file_mb))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + tmp_suffix
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def morton_order(cols: list[Column], bits: int = 10) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of each column.

    Columns should be pre-normalized to non-negative ints (e.g. rank or
    quantized value). Use with ``repartitionByRange(n, morton).sortWithinPartitions``
    before writing so min/max stats localize multi-column range predicates.
    """
    out = F.lit(0).cast("long")
    k = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + i))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 10,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster by Morton key of the (rank-normalized) z-order columns and
    write range-partitioned, sorted files — maximizes parquet min/max
    pruning for predicates on any z-ordered column."""
    from pyspark.sql import Window

    normed = df
    rank_cols = []
    for c in zorder_cols:
        rc = f"_rank_{c}"
        # percent_rank → [0,1] → quantize to bits; rank normalization makes
        # the interleave balanced regardless of value distribution
        normed = normed.withColumn(
            rc,
            (F.percent_rank().over(Window.orderBy(F.col(c))) * ((1 << bits) - 1)).cast("long"),
        )
        rank_cols.append(rc)
    normed = normed.withColumn("_z", morton_order([F.col(rc) for rc in rank_cols], bits))
    (
        normed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *rank_cols)
        .write.mode(mode)
        .parquet(path)
    )
