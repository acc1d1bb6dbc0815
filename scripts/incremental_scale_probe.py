"""Incremental-dedup epoch cost vs index size — the measurement behind the
bloom sidecar (operators/dedup_incremental.py, SCALING.md r11).

Claim under test: ``dedup_exact_incremental`` shuffles only the batch, but
its anti-join still SCANS the whole digest index every epoch, so per-epoch
wall time grows with corpus history even though the batch is fixed. The
bloom sidecar (``dedup_exact_incremental_bloom``) removes the index from
the epoch entirely (probabilistic mode) or reduces the exact check to the
bloom-positive sliver (verify mode — scan returns, shuffle doesn't).

Fixture: digest indexes of 1× / 4× / 16× ``--base-index`` synthetic keys
written to scratch parquet, one FIXED ``--batch``-row batch (~20 % true
dups against every index size, so survivor counts are comparable). Arms,
median of ``--reps`` timed runs:

- ``exact``      — dedup_exact_incremental, broadcast disabled (the
                   at-scale shuffled shape; broadcast would hide the scan
                   behind a driver collect that ALSO grows with the index)
- ``bloom_prob`` — bloom sidecar only, no index access (words prebuilt —
                   the sidecar is maintained by O(m_bits) merges per
                   epoch, not rebuilt, so build time is not epoch cost)
- ``bloom_verify`` — sidecar prefilter + exact anti-join on positives

Prints one JSON line keyed by index scale with seconds per arm.
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

SCRATCH = Path("/tmp/tamer_spark_incr_probe")


def synth_index(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    spark.range(n).select(F.md5(F.concat(F.lit("doc-"), F.col("id").cast("string"))).alias("content_hash")).write.mode("overwrite").parquet(path)


def synth_batch(spark, n: int, dup_fraction: float, path: str) -> None:
    """Batch texts: ``dup_fraction`` of rows collide with index keys 0..
    (every index size contains them — ids are a prefix), the rest novel."""
    from pyspark.sql import functions as F

    n_dup = int(n * dup_fraction)
    spark.range(n).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.when(F.col("id") < n_dup, F.concat(F.lit("doc-"), F.col("id").cast("string")))
        .otherwise(F.concat(F.lit("novel-"), F.col("id").cast("string")))
        .alias("text"),
    ).write.mode("overwrite").parquet(path)


def synth_exsub_docs(spark, n_docs: int, path: str, prefix: str, dup_of: str | None = None, dup_fraction: float = 0.0) -> None:
    """15-token docs (4 windows at L=12) with per-doc-unique tokens;
    ``dup_fraction`` of rows verbatim-copy the ``dup_of`` corpus's doc
    (id mod base) so window hashes collide at every index scale."""
    from pyspark.sql import functions as F

    toks = [F.concat(F.lit(f"{prefix}t{j}x"), F.col("src").cast("string")) for j in range(15)]
    n_dup = int(n_docs * dup_fraction)
    df = spark.range(n_docs).select(
        (F.col("id") + (20_000_000 if dup_of else 0)).alias("doc_id"),
        F.col("id").alias("src"),
    )
    text = F.concat_ws(" ", *toks)
    if dup_of:
        dup_toks = [
            F.concat(F.lit(f"{dup_of}t{j}x"), F.col("src").cast("string")) for j in range(15)
        ]
        text = F.when(F.col("src") < n_dup, F.concat_ws(" ", *dup_toks)).otherwise(text)
    df.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-index", type=int, default=500_000)
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--batch", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--m-bits", type=int, default=1 << 27)  # 16 MB sidecar
    ap.add_argument("--exsub-base-docs", type=int, default=50_000)
    ap.add_argument("--exsub-batch", type=int, default=10_000)
    args = ap.parse_args()

    import tamer_spark
    from tamer_spark.operators.dedup_incremental import (
        dedup_exact_incremental,
        dedup_exact_incremental_bloom,
        exact_bloom_index_df,
    )
    from tamer_spark.operators.runs import (
        exsub_bloom_index_df,
        exsub_dedup_incremental,
        exsub_dedup_incremental_bloom,
        exsub_window_index,
    )

    spark = tamer_spark.get_spark("incremental-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # the synthetic batch texts ARE the index keys' preimages for the dup
    # slice, so md5(text) == index digest — same hashing as production
    batch_path = str(SCRATCH / "batch")
    synth_batch(spark, args.batch, 0.2, batch_path)

    out: dict[str, dict] = {}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for s in args.scales:
            n = args.base_index * s
            idx_path = str(SCRATCH / f"idx_{s}x")
            synth_index(spark, n, idx_path)
            index = spark.read.parquet(idx_path)
            # sidecar build time is reported but NOT epoch cost: a real loop
            # merges per-epoch words (O(m_bits/64) rows), it never rebuilds
            # history. DISTRIBUTED form (r11): the words stay a sizing-encoded
            # frame persisted to parquet — a Python-list sidecar at this
            # size re-serializes ~25 s per action (measured; bloom.py)
            words_path = str(SCRATCH / f"bloom_{s}x")
            t0 = time.monotonic()
            exact_bloom_index_df(index, m_bits=args.m_bits).write.mode(
                "overwrite"
            ).parquet(words_path)
            build_s = round(time.monotonic() - t0, 3)
            words = spark.read.parquet(words_path)

            def timed(fn) -> float:
                ts = []
                for _ in range(args.reps):
                    spark.catalog.clearCache()
                    t = time.monotonic()
                    fn().count()
                    ts.append(time.monotonic() - t)
                return round(statistics.median(ts), 3)

            batch = spark.read.parquet(batch_path)
            rec = {
                "index_rows": n,
                "sidecar_build_s": build_s,
                "exact_s": timed(lambda: dedup_exact_incremental(batch, index)),
                "bloom_prob_s": timed(
                    lambda: dedup_exact_incremental_bloom(batch, words, m_bits=args.m_bits)
                ),
                "bloom_verify_s": timed(
                    lambda: dedup_exact_incremental_bloom(
                        batch, words, m_bits=args.m_bits, index=index
                    )
                ),
            }
            # exsub arm: window-hash index of s× history docs (4 windows/doc
            # at L=12), fixed batch with ~20 % history-dup docs — measures
            # the removal epoch's anti/semi joins + splice as the index
            # grows. Same posture as 'exact': the joins scan the index per
            # epoch (bucketed persistence removes the exchange, not the
            # scan); a bloom sidecar over window hashes is the same future
            # lever as the digest sidecar.
            hist_path = str(SCRATCH / f"exsub_hist_{s}x")
            synth_exsub_docs(spark, args.exsub_base_docs * s, hist_path, "h")
            xidx_path = str(SCRATCH / f"exsub_idx_{s}x")
            exsub_window_index(
                spark.read.parquet(hist_path), length=12
            ).write.mode("overwrite").parquet(xidx_path)
            xidx = spark.read.parquet(xidx_path)
            xbatch_path = str(SCRATCH / "exsub_batch")
            if s == args.scales[0]:
                synth_exsub_docs(
                    spark, args.exsub_batch, xbatch_path, "b", dup_of="h", dup_fraction=0.2
                )
            xbatch = spark.read.parquet(xbatch_path)
            rec["exsub_index_rows"] = xidx.count()
            rec["exsub_s"] = timed(
                lambda: exsub_dedup_incremental(xbatch, xidx, length=12)
            )
            # r13: the window-hash bloom sidecar landed (exsub_bloom_index_df
            # / exsub_dedup_incremental_bloom) — the arm that shows the
            # epoch cost decoupling from index growth (prob mode touches no
            # index; verify mode joins only the positive sliver)
            xwords_path = str(SCRATCH / f"exsub_bloom_{s}x")
            t0 = time.monotonic()
            exsub_bloom_index_df(xidx, m_bits=args.m_bits).write.mode(
                "overwrite"
            ).parquet(xwords_path)
            rec["exsub_sidecar_build_s"] = round(time.monotonic() - t0, 3)
            xwords = spark.read.parquet(xwords_path)
            rec["exsub_bloom_prob_s"] = timed(
                lambda: exsub_dedup_incremental_bloom(xbatch, xwords, length=12)
            )
            rec["exsub_bloom_verify_s"] = timed(
                lambda: exsub_dedup_incremental_bloom(
                    xbatch, xwords, index=xidx, length=12
                )
            )
            out[f"{s}x"] = rec
            print(f"# {s}x: {rec}", file=sys.stderr)
        print(json.dumps({"batch": args.batch, "base_index": args.base_index, "results": out}))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
