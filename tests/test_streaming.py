"""Structured Streaming pipelines: exactly-once file ingestion across
restarts, watermarked windowed aggregation vs the batch oracle, and custom
stateful operators in the state store."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from tamer_spark.streaming import (
    run_available_now,
    stateful_running_totals,
    stream_lines,
    stream_parquet,
    windowed_agg,
)
from tamer_spark.streaming.readers import run_available_now_foreach_batch


def test_file_stream_exactly_once_across_restarts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("a1\na2\n")
    (src / "b.txt").write_text("b1\n")
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    run_available_now(stream_lines(spark, str(src)), out, cp)
    got1 = sorted(r.value for r in spark.read.parquet(out).collect())
    assert got1 == ["a1", "a2", "b1"]

    # new file arrives; re-run drains ONLY the new file (checkpoint resume)
    (src / "c.txt").write_text("c1\nc2\n")
    run_available_now(stream_lines(spark, str(src)), out, cp)
    got2 = sorted(r.value for r in spark.read.parquet(out).collect())
    assert got2 == ["a1", "a2", "b1", "c1", "c2"]


def test_streaming_curation_matches_batch(spark, tmp_path):
    """The cleaning tier's MAP-ONLY stages (C4 line filter, within-doc line
    dedup, the aggregate-free Gopher rule subset) compose directly into a
    Structured Streaming pipeline — no watermark, no state store, append
    mode — and a streamed run over the same files equals the batch run.
    This is the 100 TB ingest posture: clean and score documents as they
    land, leaving corpus-level stages (n-gram repetition, cross-doc span
    dedup, LSH) to per-epoch batch jobs over the landed data."""
    from tamer_spark.operators.c4 import c4_line_filter
    from tamer_spark.operators.dedup import dedup_lines_in_doc
    from tamer_spark.operators.gopher import gopher_signals

    src = tmp_path / "docs"
    rows = [
        (1, "Good first line stays right here.\nGood first line stays right here.\nno terminal"),
        (2, "Second doc has a long single line that ends with punctuation."),
        (3, "Please enable javascript to continue browsing.\nA real line of content survives here."),
        (4, ""),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(str(src))

    def curate(df):
        ld = dedup_lines_in_doc(df)
        cleaned = c4_line_filter(
            ld.select("doc_id", F.col("text_clean").alias("text")), min_sentences=1
        )
        sig = gopher_signals(
            cleaned.select("doc_id", F.col("text_clean").alias("text")),
            min_words=5,
            top_ngrams=(),
            dup_ngrams=(),
            line_signals=True,
        )
        return cleaned.select("doc_id", "text_clean", "n_lines_kept").join(
            sig.select("doc_id", "keep"), "doc_id"
        )

    batch = {
        r.doc_id: (r.text_clean, r.n_lines_kept, r.keep)
        for r in curate(spark.read.parquet(str(src))).collect()
    }

    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    # the join above is a stream-stream shape; keep the STREAM plan pure
    # map-only by composing the same stages without the join
    ld = dedup_lines_in_doc(stream)
    cleaned = c4_line_filter(
        ld.select("doc_id", F.col("text_clean").alias("text")), min_sentences=1
    )
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.doc_id: (r.text_clean, r.n_lines_kept)
        for r in spark.read.parquet(out).collect()
    }
    assert set(streamed) == set(batch)
    for k, (txt, nk, _keep) in batch.items():
        assert streamed[k] == (txt, nk), (k, streamed[k], batch[k])
    # the duplicated line was removed upstream, the bare line dropped by C4
    assert streamed[1][0] == "Good first line stays right here."
    assert streamed[3][0] == "A real line of content survives here."


def test_streaming_incremental_dedup_epochs(spark, tmp_path):
    """The incremental-dedup epoch posture ON the streaming runtime: each
    micro-batch folds against the persisted digest index via foreachBatch
    (survivors appended to the corpus, their digests appended to the index),
    so a document seen in ANY earlier epoch — or earlier in the same batch —
    never lands twice. This is the engine's O(batch) epoch contract driven
    by Structured Streaming's own checkpointed scheduler instead of the
    driver loop."""
    import pyspark.sql.functions as SF

    from tamer_spark.operators.dedup_incremental import (
        dedup_exact_incremental,
        exact_index,
    )
    from tamer_spark.sinks import ParquetEpochSink

    src = tmp_path / "in"
    src.mkdir()
    idx_dir, out, cp = (
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        str(tmp_path / "cp"),
    )
    corpus_sink, index_sink = ParquetEpochSink(out), ParquetEpochSink(idx_dir)
    # seed corpus + index (epoch 0)
    seed = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
    )
    corpus_sink.write(seed, 0)
    index_sink.write(exact_index(seed), 0)

    def fold(batch_df, epoch_id):
        # epoch-idempotent writes (the engine Sink contract): a replayed
        # micro-batch overwrites its own epoch partition instead of
        # appending duplicates — crash-between-writes safe. The index read
        # is partition-pruned to PRIOR epochs: a replayed epoch must not
        # dedup against the digests its own crashed attempt already wrote
        # (that would empty the partition on replay — data loss, not
        # idempotence).
        s = batch_df.sparkSession
        idx = index_sink.read(s).filter(
            SF.col("epoch") <= epoch_id
        ).select("content_hash")
        survivors = dedup_exact_incremental(batch_df, idx).persist()
        corpus_sink.write(survivors.select("doc_id", "text"), epoch_id + 1)
        index_sink.write(
            exact_index(survivors).join(idx, "content_hash", "left_anti"),
            epoch_id + 1,
        )
        survivors.unpersist()

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    # epoch 1: one duplicate of the seed corpus + two fresh docs (one
    # duplicated WITHIN the batch — in-batch min-id wins)
    spark.createDataFrame(
        [(10, "alpha doc"), (11, "gamma doc"), (12, "gamma doc")],
        "doc_id long, text string",
    ).write.mode("append").parquet(str(src))
    run_available_now_foreach_batch(stream, cp, fold, output_mode="append")
    # epoch 2: duplicates of epoch-1 survivors + one fresh doc
    spark.createDataFrame(
        [(20, "gamma doc"), (21, "delta doc")], "doc_id long, text string"
    ).write.mode("append").parquet(str(src))
    run_available_now_foreach_batch(stream, cp, fold, output_mode="append")

    corpus = corpus_sink.read(spark)
    texts = sorted(r.text for r in corpus.collect())
    assert texts == ["alpha doc", "beta doc", "delta doc", "gamma doc"]
    assert {r.doc_id for r in corpus.collect()} == {1, 2, 11, 21}
    # the index holds exactly one digest per distinct text
    assert index_sink.read(spark).count() == 4
    # content digests in the index match the corpus's
    idx_hashes = {r.content_hash for r in index_sink.read(spark).collect()}
    corpus_hashes = {
        r.h for r in corpus.select(SF.md5("text").alias("h")).collect()
    }
    assert idx_hashes == corpus_hashes
    # crash-replay safety: re-running a committed epoch's fold (the
    # foreachBatch replay after a crash between sink write and checkpoint
    # commit) overwrites its own epoch partitions — corpus unchanged
    replay = spark.createDataFrame(
        [(20, "gamma doc"), (21, "delta doc")], "doc_id long, text string"
    )
    fold(replay, 1)  # same epoch id the second drain committed
    assert sorted(r.text for r in corpus_sink.read(spark).collect()) == texts
    assert index_sink.read(spark).count() == 4


def test_windowed_agg_matches_batch(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(minutes=7 * i), i % 3, float(i)) for i in range(40)]
    schema = "ts timestamp, k int, v double"
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = windowed_agg(
        stream_parquet(spark, src, schema),
        "ts",
        window="1 hour",
        watermark="2 hours",
        keys=["k"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("v") * 100).cast("long")).alias("sum_c")],
    )
    # update mode re-emits changed windows per epoch; upsert by window key
    upserted: dict[tuple, tuple] = {}
    run_available_now_foreach_batch(
        stream,
        str(tmp_path / "cp"),
        lambda df, epoch: upserted.update(
            {(r.window_start, r.k): (r.n, r.sum_c) for r in df.collect()}
        ),
    )
    batch = (
        spark.read.parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("v") * 100).cast("long")).alias("sum_c"))
        .collect()
    )
    assert upserted == {(r.window_start, r.k): (r.n, r.sum_c) for r in batch}


def test_sliding_window_agg_matches_batch(spark, tmp_path):
    """Sliding windows (1h window, 30m slide): every event lands in exactly
    two windows; the streamed result must match the batch double-count."""
    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(minutes=11 * i), float(i)) for i in range(30)]
    schema = "ts timestamp, v double"
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = windowed_agg(
        stream_parquet(spark, src, schema),
        "ts",
        window="1 hour",
        slide="30 minutes",
        watermark="2 hours",
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    upserted: dict = {}
    run_available_now_foreach_batch(
        stream,
        str(tmp_path / "cp"),
        lambda df, epoch: upserted.update({r.window_start: r.n for r in df.collect()}),
    )
    # batch equivalent: window(ts, 1h, 30m) via the same built-in on a static read
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .collect()
    )
    assert upserted == {r.window_start: r.n for r in batch}
    # sliding property: total window-membership is 2x the event count
    assert sum(upserted.values()) == 2 * len(rows)


def test_stateful_running_totals_across_restarts(spark, tmp_path):
    src = tmp_path / "vals"
    src.mkdir()
    schema = "user long, v double"
    spark.createDataFrame([(1, 1.5), (1, 2.5), (2, 10.0)], schema).write.parquet(
        str(src / "batch1")
    )

    def make_stream():
        return stateful_running_totals(
            stream_parquet(spark, str(src / "batch*"), schema), "user", "v"
        )

    state1: dict[int, tuple] = {}
    run_available_now_foreach_batch(
        make_stream(),
        str(tmp_path / "cp"),
        lambda df, e: state1.update({r.user: (r.n, r.total_c) for r in df.collect()}),
    )
    assert state1 == {1: (2, 400), 2: (1, 1000)}

    # restart with more data: totals continue from checkpointed state
    spark.createDataFrame([(1, 1.0), (3, 5.0)], schema).write.parquet(str(src / "batch2"))
    state2: dict[int, tuple] = {}
    run_available_now_foreach_batch(
        make_stream(),
        str(tmp_path / "cp"),
        lambda df, e: state2.update({r.user: (r.n, r.total_c) for r in df.collect()}),
    )
    assert state2[1] == (3, 500)  # resumed, not recomputed
    assert state2[3] == (1, 500)


def test_session_window_agg(spark, tmp_path):
    from datetime import datetime, timedelta

    from tamer_spark.streaming import session_agg, stream_parquet

    t0 = datetime(2024, 1, 1)
    # two sessions per user: a burst, a >30min gap, another burst
    rows = []
    for u in (1, 2):
        rows += [(t0 + timedelta(minutes=m), u) for m in (0, 5, 10)]
        rows += [(t0 + timedelta(minutes=m), u) for m in (90, 95)]
    schema = "ts timestamp, user int"
    src = str(tmp_path / "sess")
    spark.createDataFrame(rows, schema).write.parquet(src)

    out: dict = {}
    stream = session_agg(
        stream_parquet(spark, src, schema), "ts", gap="30 minutes", keys=["user"]
    )
    # session windows reject update mode (windows can merge); complete mode
    # re-emits the full result each epoch, which the dict upsert absorbs
    run_available_now_foreach_batch(
        stream,
        str(tmp_path / "cp"),
        lambda df, e: out.update({(r.user, r.session_start): r.n_events for r in df.collect()}),
        output_mode="complete",
    )
    assert out == {
        (1, t0): 3,
        (1, t0 + timedelta(minutes=90)): 2,
        (2, t0): 3,
        (2, t0 + timedelta(minutes=90)): 2,
    }


def test_stateful_seen_filter_dedups_across_batches(spark, tmp_path):
    from tamer_spark.streaming.stateful import stateful_seen_filter

    src = tmp_path / "keys"
    src.mkdir()
    schema = "k long"
    spark.createDataFrame([(1,), (2,), (2,)], schema).write.parquet(str(src / "b1"))

    def run(expect):
        got = []
        run_available_now_foreach_batch(
            stateful_seen_filter(stream_parquet(spark, str(src / "b*"), schema), "k"),
            str(tmp_path / "cp"),
            lambda df, e: got.extend(r.k for r in df.collect()),
        )
        assert sorted(got) == expect

    run([1, 2])  # in-batch dup of 2 collapsed
    # second drop: 2 repeats (already seen — dropped), 3 is new
    spark.createDataFrame([(2,), (3,)], schema).write.parquet(str(src / "b2"))
    run([3])


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicate keys arriving within the watermark
    are collapsed; state is keyed on the digest, bounded by the watermark."""
    import pyspark.sql.types as T

    from tamer_spark.streaming import stream_parquet
    from tamer_spark.streaming.readers import run_available_now, stream_dedup_exact

    src = tmp_path / "in"
    base = datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (1, "hello world", base),
        (2, "hello world", base + timedelta(seconds=30)),  # dup content
        (3, "something else", base + timedelta(seconds=60)),
        (4, "hello world", base + timedelta(seconds=90)),  # dup again
    ]
    spark.createDataFrame(rows, "doc_id long, text string, ts timestamp").write.parquet(str(src))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = stream_parquet(spark, str(src), schema).select(
        "doc_id", "ts", F.md5("text").alias("content_hash")
    )
    deduped = stream_dedup_exact(stream, ["content_hash"], ts_col="ts", watermark="10 minutes")
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    run_available_now(deduped, out, cp)
    got = spark.read.parquet(out).collect()
    assert len(got) == 2  # one per distinct content
    assert sorted({r.content_hash for r in got}) == sorted(set(r.content_hash for r in got))


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the static interval join
    over the same files: clicks join impressions within [0, 30m] after the
    impression, per ad id. Also pins that the helper attaches watermarks to
    BOTH sides (the state-bound contract — without them Spark rejects or
    retains forever)."""
    from tamer_spark.streaming.readers import stream_interval_join

    t0 = datetime(2024, 3, 1)
    imps = [(i % 5, t0 + timedelta(minutes=4 * i)) for i in range(30)]
    clicks = [
        (i % 5, t0 + timedelta(minutes=4 * i + d))
        for i in range(30)
        for d in (2, 45)  # one click inside the 30m window, one far outside
    ]
    imp_schema, clk_schema = "ad int, imp_ts timestamp", "ad int, clk_ts timestamp"
    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")
    spark.createDataFrame(imps, imp_schema).write.parquet(imp_src)
    spark.createDataFrame(clicks, clk_schema).write.parquet(clk_src)

    joined = stream_interval_join(
        stream_parquet(spark, imp_src, imp_schema),
        stream_parquet(spark, clk_src, clk_schema),
        on="ad",
        left_time="imp_ts",
        right_time="clk_ts",
        lower="0 seconds",
        upper="30 minutes",
        watermark="1 hour",
    )
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    run_available_now(joined, out, cp)
    got = {
        (r.ad, r.imp_ts, r.clk_ts) for r in spark.read.parquet(out).collect()
    }

    li, ri = spark.read.parquet(imp_src), spark.read.parquet(clk_src)
    expected = {
        (r.ad, r.imp_ts, r.clk_ts)
        for r in li.join(
            ri,
            (li.ad == ri.ad)
            & (ri.clk_ts >= li.imp_ts)
            & (ri.clk_ts <= li.imp_ts + F.expr("interval 30 minutes")),
        )
        .select(li.ad, "imp_ts", "clk_ts")
        .collect()
    }
    assert got == expected and len(got) > 0
    # the far-outside clicks never join
    assert all((c - i).total_seconds() <= 1800 for _, i, c in got)


def test_streaming_exsub_removal_epochs(spark, tmp_path):
    """ExactSubstr REMOVAL on the streaming runtime: each micro-batch cuts
    its duplicated token runs against the persisted window-hash index via
    foreachBatch (rebuilt texts appended to the corpus, the batch's
    distinct window hashes appended to the index), so a verbatim run seen
    in ANY earlier epoch — or earlier in the same batch — survives exactly
    once corpus-wide while every host doc keeps its unique remainder
    (row-preserving, unlike the drop-a-doc dedup fold above)."""
    import pyspark.sql.functions as SF

    from tamer_spark.operators.runs import (
        exsub_dedup_incremental,
        exsub_window_index,
        token_window_hashes,
    )
    from tamer_spark.sinks import ParquetEpochSink

    L = 4
    src = tmp_path / "in"
    src.mkdir()
    corpus_sink = ParquetEpochSink(str(tmp_path / "out"))
    index_sink = ParquetEpochSink(str(tmp_path / "widx"))
    seed = spark.createDataFrame(
        [(1, "k1 k2 k3 k4 k5", 0)], "doc_id long, text string, n_removed long"
    )
    corpus_sink.write(seed, 0)
    seed = seed.select("doc_id", "text")
    index_sink.write(exsub_window_index(seed, length=L), 0)

    def fold(batch_df, epoch_id):
        s = batch_df.sparkSession
        idx = (
            index_sink.read(s).filter(SF.col("epoch") <= epoch_id).select("h")
        )
        cut = exsub_dedup_incremental(batch_df, idx, length=L).persist()
        corpus_sink.write(
            cut.select("doc_id", SF.col("text_dedup").alias("text"), "n_removed"),
            epoch_id + 1,
        )
        index_sink.write(
            token_window_hashes(batch_df, length=L)
            .select("h")
            .distinct()
            .join(idx, "h", "left_anti"),
            epoch_id + 1,
        )
        cut.unpersist()

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    # epoch 1: one doc embeds the seed's run (cut, remainder kept), one
    # fresh doc, and an intra-batch pair sharing a novel run
    spark.createDataFrame(
        [
            (10, "pre k1 k2 k3 k4 k5 post"),
            (11, "n1 n2 n3 n4 n5"),
            (12, "x0 n1 n2 n3 n4 n5 x1"),
        ],
        "doc_id long, text string",
    ).write.mode("append").parquet(str(src))
    run_available_now_foreach_batch(stream, str(tmp_path / "cp"), fold, output_mode="append")
    # epoch 2: a doc embedding epoch-1's novel run — the ADVANCED index
    # must cut it
    spark.createDataFrame(
        [(20, "z1 n1 n2 n3 n4 z2")], "doc_id long, text string"
    ).write.mode("append").parquet(str(src))
    run_available_now_foreach_batch(stream, str(tmp_path / "cp"), fold, output_mode="append")

    got = {
        r.doc_id: (r.text, r.n_removed)
        for r in corpus_sink.read(spark).filter(SF.col("epoch") > 0).collect()
    }
    # doc 10 lost the 5-token seed run but kept its remainder; doc 11 is
    # canonical for the novel run; doc 12 (intra-batch later (id, pos))
    # lost it; doc 20 lost it against the advanced index
    assert got[10] == ("pre post", 5)
    assert got[11] == ("n1 n2 n3 n4 n5", 0)
    assert got[12] == ("x0 x1", 5)
    assert got[20] == ("z1 z2", 4)
    # every batch doc survives as a row (row-preserving contract)
    assert set(got) == {10, 11, 12, 20}
    # crash-replay: re-running a committed epoch's fold overwrites its own
    # partitions — corpus unchanged
    replay = spark.createDataFrame(
        [(20, "z1 n1 n2 n3 n4 z2")], "doc_id long, text string"
    )
    fold(replay, 1)
    got2 = {
        r.doc_id: (r.text, r.n_removed)
        for r in corpus_sink.read(spark).filter(SF.col("epoch") > 0).collect()
    }
    assert got2 == got
