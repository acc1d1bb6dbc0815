"""Structured-Streaming-native pipelines.

Where the reference's driver loop pulls one batch at a time (its only
execution mode), Spark can run the same ingestion *as a stream*: file-source
discovery replaces the S3 polling fiber (S3Setup.scala:74-106 — new-object
detection is native), watermarks replace the ``lag`` guard
(db/package.scala:37-41), and the checkpoint log replaces the compacted
state topic. ``Trigger.AvailableNow`` gives the batch-like "drain what
exists, then stop" mode the engine loop uses for backfills.

Scale notes: ``maxFilesPerTrigger`` bounds per-micro-batch work (the
``bufferSize`` backpressure analog, config.scala:104); watermark delay
bounds state size for windowed aggs — without it, 100 TB of late-data state
accumulates unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_lines(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Line-per-record file stream — the streaming form of the S3 object
    pipeline (utf8 + splitLines, S3Setup.scala:133)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def stream_parquet(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with a watermark.

    The streaming analog of the reference's tumbling JDBC window (#10): the
    watermark is the ``lag`` guard — events later than it are dropped instead
    of blocking progress.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), *(keys or []))
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Gap-based session windows (``session_window``) — the streaming form of
    queries.sessionize_events."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *(keys or []))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *(keys or []),
            "n_events",
        )
    )


def stream_dedup_exact(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication — the streaming form of
    operators/dedup.dedup_exact.

    With ``ts_col``, uses ``dropDuplicatesWithinWatermark``: state for a key
    is held only until the watermark passes it, so dedup state is bounded by
    (arrival rate × watermark) instead of growing with the whole corpus —
    the only shape that survives an unbounded 100 TB stream. Without
    ``ts_col``, falls back to global ``dropDuplicates`` (state grows
    forever; only for bounded backfills).

    Deduplicate on a digest of the payload (e.g.
    ``F.md5(F.col("text")).alias("content_hash")`` projected beforehand) so
    state stores ~32 bytes per key, not the document.
    """
    if ts_col is None:
        return df.dropDuplicates(key_cols)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join:
    ``right_time ∈ [left_time - lower, left_time + upper]`` per key.

    Both sides carry a watermark AND the join condition carries the time
    interval — together they bound the state store: Spark retains each
    side's rows only while the other side's watermark can still produce a
    match (state ≈ rate × (watermark + interval)), the only shape that
    survives an unbounded stream. Without the interval bound the state
    grows forever and the job eventually OOMs — this helper makes the
    bound impossible to forget.

    ``how='left_outer'``/``'right_outer'`` emit unmatched rows once the
    watermark closes their interval (null other side).
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_time] >= F.expr(f"{left_time} - interval {lower}"))
        & (rw[right_time] <= F.expr(f"{left_time} + interval {upper}"))
    )
    joined = lw.join(rw, cond, how)
    # single key column out (coalesced so outer-join unmatched rows keep it)
    return joined.select(
        F.coalesce(lw[on], rw[on]).alias(on),
        *[lw[c] for c in left.columns if c != on],
        *[rw[c] for c in right.columns if c != on],
    )


def run_available_now(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> None:
    """Drain all currently-available input, then stop (backfill mode).

    The checkpoint dir carries offsets across runs: a second invocation
    processes only newly-arrived files — the engine-loop resume contract,
    provided by Structured Streaming itself.
    """
    q = (
        stream_df.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_foreach_batch(
    stream_df: DataFrame,
    checkpoint_dir: str,
    batch_fn,
    output_mode: str = "update",
) -> None:
    """availableNow drain through foreachBatch — for sinks that need custom
    epoch-idempotent writes (the engine's Sink contract).

    Default ``update`` mode: with a watermark + aggregation, ``append`` only
    emits windows the watermark has finalized — the trailing windows of a
    drained backlog would be withheld until a later run. Update emits every
    changed window each epoch; idempotent sinks upsert by window key.
    """
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka micro-batch source (needs the spark-sql-kafka package).

    Returns the standard Kafka schema (key/value BINARY, topic, partition,
    offset, timestamp, headers). Compose with serde.unframe_confluent +
    from_json/from_avro to decode registry-framed payloads;
    ``maxOffsetsPerTrigger`` is the per-trigger backpressure bound (the
    reference's bufferSize analog, config.scala:104).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()
