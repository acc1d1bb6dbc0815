#!/usr/bin/env python
"""Scale-linearity probe: time the heavy operators across data-size steps.

Measures wall-clock for the operators whose 100 TB behavior matters most, at
sf0.01, sf0.1, and a synthesized 10×-sf0.1 corpus (documents/embeddings
exploded with salted ids so duplicate/near-duplicate structure is preserved,
not degenerate). Prints one JSON line per (op, step) plus a ratio summary.

A sub-linear or ~linear time ratio vs the data ratio is the evidence that a
plan's shuffle volume scales with the DESIGNED quantity (docs × k ints,
bucket ids, vocabulary) rather than with pairs² — run after touching any of
these operators. Scratch parquet goes under .scratch/ (gitignored, removed on
success).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from bench import HEADLINE
from pyspark.sql import functions as F
from tamer_spark.queries import resolve_query

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch" / "scale_probe"

# Hot-path callables shared with bench.py (pairs-only for the merged gates)
# so the linearity evidence tracks the same plans the bench times.
OPS = [
    "dedup_exact",
    "minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_profile",
    "dedup_embedding_cosine",
    "similarity_knn_lsh",
    "gopher_full",
    "c4_clean_docs",
    "q1_pricing_summary",
    "sessionize_events",
    # round 5 retrieval/curation tier. dedup_phash_images is deliberately
    # NOT probed: its gate derives synthetic (lang, source) hash families,
    # so the 10x corpus grows every family 10x and the PAIR OUTPUT 100x —
    # a quadratic artifact of the gate construction, not of the banded
    # operator (real perceptual hashes don't share one value per source).
    "bm25_topk_docs",
    "budget_cap_sources",
    # round 6: contamination scoring is scan-shaped (broadcast benchmark +
    # one per-doc agg) — probe it. substring_run_pairs is deliberately NOT
    # probed for the same reason as dedup_phash_images: the 10x corpus is
    # 10 verbatim copies of every doc, so the PAIR OUTPUT grows
    # quadratically by construction (C(10,2) per original window) — an
    # artifact of the synthetic duplication, not of the posting-capped
    # join; its scale posture is pinned by plan tests instead.
    "contamination_score_docs",
    # r11 continuation: DSIR selection is featurize (map + one bounded
    # count shuffle) + broadcast ratio join + TakeOrdered — expect ~linear
    "dsir_select_docs",
    # r11 continuation: markup stripping is pure map — expect ~linear
    "strip_markup_docs",
    # r11 continuation: url dedup is map-canonicalize + one digest shuffle
    # (doc_id-only scan); encoding repair is pure map; seeded shuffle is
    # one shard exchange + per-shard sort — all expect ~linear.
    # hard_negatives AND contrastive_pairs are deliberately NOT probed
    # (the dedup_phash_images / substring_run_pairs rule): the n× synthesis
    # duplicates every vector verbatim, so LSH buckets grow n× and
    # candidate PAIRS n²× — a quadratic artifact of the synthetic copies,
    # not of the bucket-capped join; their scale posture is pinned by the
    # no-cross-product / single-window plan tests.
    "url_dedup_docs",
    "fix_encoding_docs",
    "seeded_shuffle_docs",
    # r12: cross-doc line removal — line stream, freq agg, and rebuild all
    # grow n×; output is one row per doc. (The n× verbatim copies push
    # every line's doc_freq over the threshold, so the 10x run strips
    # everything — a semantics artifact of the synthesis, but the COST
    # stays linear, which is what the probe measures.)
    "line_dedup_docs",
    # r12: domain rollup — same cost shape as url_dedup (map extraction +
    # one digest shuffle); expect ~flat
    "domain_rollup_docs",
    # r12: SQ8 asymmetric search — map-side reconstruction + broadcast-query
    # fold + per-query window over 10 queries × corpus; expect ~linear
    # (encode/train are inside the warm-up memo, so the probe times search)
    "sq8_search",
    # r12 continuation: CMS build — token explode + the ONE (r, b)-bounded
    # exchange; expect ~linear in corpus tokens (shuffle size is FIXED).
    # RP projection — pure map under frozen signs; expect ~linear/flat.
    # (event_anomaly_daily is NOT probed: the synthesis copies events
    # unchanged, so a probe would measure nothing.)
    "cms_sketch_docs",
    "rp_project_embeddings",
    # r12 continuation: heavy hitters — two token scans, bounded sketch
    # exchange + candidate-only recount; expect ~linear in corpus tokens
    # (n× copies scale every true count n×, so the heavy SET is unchanged
    # and candidates stay proportional). Domain cap — count + threshold
    # cut + ~cap·slack-row windows; expect ~flat-linear (groups grow n×
    # but survivors stay ~cap·slack per group).
    "heavy_hitters_docs",
    "domain_cap_docs",
    # r13: grouped two-pass percentile — synthesize_nx now explodes ORDERS
    # as well (n× rows per o_orderpriority group, group count fixed), so
    # the #groups-bounded claim is probeable: pass 1 is one partial-agg
    # histogram per group, pass 2 refines only target buckets — expect
    # ~linear in rows with a fixed driver-side grid.
    # (global_percentiles_orders shares the same machinery with keys=();
    # the grouped form is the harder shape and covers it.
    # event_anomaly_daily stays unprobed: events is still copied unchanged.)
    "grouped_percentiles_orders",
    # r13: the composed lexical+semantic serving path (exact cosine kNN for
    # 10 queries + BM25 top-20 + RRF fuse) — per-query output is bounded at
    # k, the kNN fold and BM25 tf shuffle grow with the corpus; expect
    # ~linear. (ivfadc/hard_negatives stay excluded: hot-index memo timing
    # and the pair-blowup rule respectively.)
    "hybrid_retrieval_rrf",
    # r12 continuation: ExactSubstr REMOVAL — unlike its pair-detection
    # sibling (excluded above: pairs grow C(n,2)-quadratically under the
    # n× verbatim synthesis), removal never forms pairs: the duplicate-
    # occurrence table, interval assembly, and rebuild all grow n× (every
    # non-canonical copy's windows are dups) — expect ~linear, and the
    # probe existing is itself the evidence that the removal half dodges
    # the pair half's blowup.
    "exsub_dedup_docs",
    # r12 continuation: vocabulary-growth monitor — one vocabulary-bounded
    # debut agg + per-bucket occurrence counts + a #buckets-row window;
    # expect ~linear in corpus tokens. The builder derives bucket width
    # from each corpus's OWN max(doc_id) (div 10 + 1), so the salted-id
    # synthesis still yields ~10 buckets and the n_window=64 guard holds
    # at every step.
    "vocab_growth_docs",
    # r12 continuation: skip-gram pair mining — one (doc_id, pos) window
    # + vocab²-bounded count; expect ~linear in corpus tokens
    "skipgram_top_pairs",
]


def synthesize_nx(spark, src: str, dst: Path, n: int = 10) -> None:
    """Explode documents/embeddings n×: copies keep the text (so duplicate
    clusters survive, ×n) but take distinct doc ids; other tables copied."""
    dst.mkdir(parents=True, exist_ok=True)
    d = spark.read.parquet(f"{src}/documents.parquet")
    copies = spark.range(n).select(F.col("id").alias("copy"))
    # repartition(32) before write: the source file is ONE row group, so the
    # crossJoin would otherwise emit a single output file and every map-only
    # probe op would run single-threaded — an artifact, not a measurement. A
    # real corpus at any scale is many splits; 32 files makes the probe's
    # map parallelism honest.
    (
        d.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(dst / "documents.parquet"))
    )
    e = spark.read.parquet(f"{src}/embeddings.parquet")
    (
        e.crossJoin(copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(dst / "embeddings.parquet"))
    )
    # orders exploded too (r13): the grouped-percentile probe needs n× rows
    # PER GROUP (copies keep o_orderpriority/o_totalprice, so each group's
    # value multiset scales n× with identical group count — the regime the
    # #groups-bounded grid claim is about). Key salted like doc_id. No
    # other probed op reads orders, so existing series are unaffected.
    o = spark.read.parquet(f"{src}/orders.parquet")
    (
        o.crossJoin(copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(dst / "orders.parquet"))
    )
    for t in ("region", "nation", "customer", "supplier", "part", "lineitem", "events"):
        p = Path(src) / f"{t}.parquet"
        if p.is_dir():
            shutil.copytree(p, dst / p.name, dirs_exist_ok=True)
        else:
            shutil.copy(p, dst / p.name)


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = HEADLINE.get(name) or resolve_query(name)
    t0 = time.monotonic()
    fn(spark, sf_dir).count()
    return round(time.monotonic() - t0, 3)


def watch_mode(spark, ops: list[str]) -> None:
    """Focused 1×/3×/10× linearity run for the named OPS entries only (r10:
    the standing bench-watch follow-up — an entry sitting above its r6
    level gets one probe run here to pin flat-vs-linear before anyone
    touches its plan). Skips the specialty sections; prints the same
    one-JSON summary shape with per-step ratios."""
    steps = [("sf0.1", "/root/testdata/sf0.1")]
    try:
        for n in (3, 10):
            dst = SCRATCH.parent / f"scale_probe_{n}x"
            synthesize_nx(spark, "/root/testdata/sf0.1", dst, n)
            steps.append((f"sf0.1x{n}", str(dst)))
        results: dict[str, dict[str, float]] = {}
        for name in ops:
            # untimed sf0.01 warmup: the session's FIRST execution of a plan
            # pays JIT/codegen/broadcast warmup that would otherwise inflate
            # the 1× step and fake a sub-linear ratio. Same per-op isolation
            # as the timed steps: a warmup failure logs and moves on rather
            # than aborting the whole watch run (the timed step will record
            # -1.0 for this op and the others keep their timings).
            try:
                time_op(spark, name, "/root/testdata/sf0.01")
            except Exception as e:  # noqa: BLE001
                print(f"# {name}@warmup: {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = {}
            for label, path in steps:
                spark.catalog.clearCache()
                # per-op try/except like full-probe main(): one failing op
                # must not abort the run (and leak the scratch corpora) or
                # discard the other ops' timings
                try:
                    results[name][label] = time_op(spark, name, path)
                except Exception as e:  # noqa: BLE001
                    results[name][label] = -1.0
                    print(f"# {name}@{label}: {type(e).__name__}: {e}", file=sys.stderr)
                print(f"# {name}@{label}: {results[name][label]}s", file=sys.stderr)
        summary = {
            name: {
                **{f"t_{k}": v for k, v in r.items()},
                "ratio_3x": round(r["sf0.1x3"] / r["sf0.1"], 2) if min(r.values()) > 0 else None,
                "ratio_10x": round(r["sf0.1x10"] / r["sf0.1"], 2) if min(r.values()) > 0 else None,
            }
            for name, r in results.items()
        }
        print(json.dumps(summary, indent=2))
    finally:
        # scratch corpora are multi-GB: remove them on EVERY exit path
        for n in (3, 10):
            shutil.rmtree(SCRATCH.parent / f"scale_probe_{n}x", ignore_errors=True)


def select_watch_ops(argv: list[str]) -> list[str]:
    """Validate the watch-mode op names BEFORE any Spark session exists —
    session-free so the rejection path is unit-testable (the bench GROUPS
    SystemExit pattern). Empty argv = full-probe mode."""
    bad = [a for a in argv if a not in OPS]
    if bad:
        raise SystemExit(f"unknown ops {bad}; choose from {OPS}")
    return argv


def main() -> None:
    ops = select_watch_ops(sys.argv[1:])
    spark = tamer_spark.get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if ops:
        watch_mode(spark, ops)
        return
    try:
        # synthesis INSIDE the try: a mid-write failure (disk full is the
        # likely mode for a multi-GB parquet write) must also clean up the
        # partial scratch corpus, not just a failing probe op
        synthesize_nx(spark, "/root/testdata/sf0.1", SCRATCH)
        full_probe(spark)
    finally:
        # the 10x scratch corpus is multi-GB: remove it on EVERY exit path,
        # not just success (same fix as watch_mode, r10)
        shutil.rmtree(SCRATCH, ignore_errors=True)


def full_probe(spark) -> None:
    """The full probe sweep over OPS plus the specialty sections (incremental
    dedup, CC rounds, bigram-LM model size, semdedup cap, PQ/ADC, gopher,
    C4 hot-span skew). Assumes the 10x corpus already exists at SCRATCH."""
    steps = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf0.1x10", str(SCRATCH)),
    ]
    results: dict[str, dict[str, float]] = {}
    for name in OPS:
        results[name] = {}
        for label, path in steps:
            spark.catalog.clearCache()
            try:
                results[name][label] = time_op(spark, name, path)
            except Exception as e:  # noqa: BLE001
                results[name][label] = -1.0
                print(f"# {name}@{label}: {type(e).__name__}: {e}", file=sys.stderr)
            print(f"# {name}@{label}: {results[name][label]}s", file=sys.stderr)
    summary = {}
    for name, r in results.items():
        if all(v > 0 for v in r.values()):
            summary[name] = {
                "t_sf0.01": r["sf0.01"],
                "t_sf0.1": r["sf0.1"],
                "t_sf0.1x10": r["sf0.1x10"],
                "ratio_10x_docs": round(r["sf0.1x10"] / r["sf0.1"], 2),
            }
    print(json.dumps(summary, indent=2))

    # Incremental dedup: FIXED batch vs GROWING corpus index. The claim is
    # that epoch cost is O(batch), independent of corpus size — so time must
    # stay ~flat as the index grows 100× (the index scan is keys-only and
    # the batch side is the only shuffle).
    from tamer_spark.operators.dedup_incremental import (
        dedup_exact_incremental,
        exact_index,
    )

    batch = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    inc = {}
    for label, path in steps:
        spark.catalog.clearCache()
        idx = exact_index(spark.read.parquet(f"{path}/documents.parquet"))
        t0 = time.monotonic()
        dedup_exact_incremental(batch, idx).count()
        inc[label] = round(time.monotonic() - t0, 3)
        print(f"# dedup_exact_incremental(batch=sf0.01)@index={label}: {inc[label]}s", file=sys.stderr)
    print(json.dumps({"dedup_exact_incremental_fixed_batch": {
        **{f"t_idx_{k}": v for k, v in inc.items()},
        "ratio_100x_corpus": round(inc["sf0.1x10"] / inc["sf0.01"], 2),
    }}, indent=2))

    # Connected components: round count must grow ~log(cluster size), not
    # linearly. The 10× corpus turns every duplicate cluster into a 10×
    # bigger one (10 exact copies per doc), so edges grow superlinearly
    # while rounds should rise by only ~log2(10) ≈ 3.
    from tamer_spark.operators.cc import connected_components
    from tamer_spark.queries import _K, _BANDS, _MAX_BUCKET, _N, _t, minhash_lsh_pairs

    cc = {}
    for label, path in steps:
        spark.catalog.clearCache()
        pairs = minhash_lsh_pairs(
            _t(spark, path, "documents"), k=_K, bands=_BANDS, n=_N, seed=42,
            max_bucket=_MAX_BUCKET,
        ).persist()
        n_edges = pairs.count()
        st: dict = {}
        t0 = time.monotonic()
        n_nodes = connected_components(pairs, src="doc_a", dst="doc_b", stats=st).count()
        cc[label] = {
            "edges": n_edges, "nodes_in_components": n_nodes,
            "rounds": st.get("rounds"), "t_cc": round(time.monotonic() - t0, 3),
        }
        pairs.unpersist()
        print(f"# connected_components@{label}: {cc[label]}", file=sys.stderr)
    print(json.dumps({"connected_components": cc}, indent=2))

    # Bigram-LM scoring: the model tables are VOCAB-sized, not corpus-sized.
    # The 10× corpus adds zero new words (exact copies), so lm/unigram
    # shuffle volume is flat and the cost is the scan+extract over 10× docs
    # — time should grow far slower than 10× and the model row counts must
    # be IDENTICAL across sf0.1 and its 10× explosion.
    from tamer_spark.operators.lm import bigram_counts, bigram_lm_score

    lm_probe = {}
    for label, path in steps:
        spark.catalog.clearCache()
        docs = _t(spark, path, "documents")
        t0 = time.monotonic()
        n_scored = bigram_lm_score(docs).count()
        t_total = round(time.monotonic() - t0, 3)
        lm, uni, _ = bigram_counts(docs)
        lm_probe[label] = {
            "docs_scored": n_scored, "t_score": t_total,
            "bigram_model_rows": lm.count(), "unigram_model_rows": uni.count(),
        }
        print(f"# bigram_lm_score@{label}: {lm_probe[label]}", file=sys.stderr)
    print(json.dumps({"bigram_lm_score": lm_probe}, indent=2))

    # Round-4 semantic tier. semdedup: the within-cluster pair join grows
    # ~quadratically when exact copies inflate every cluster (the 10× corpus
    # is the designed worst case — 10 copies per vector). The max_cluster
    # salt-split must flatten that blowup; both timings run under a FROZEN
    # quantizer (per-epoch posture — training excluded). pq_search_adc must
    # scale ~linearly in corpus (m lookups per candidate, queries fixed).
    # gopher_signals is scan-bound + one vocab-shaped bigram shuffle.
    from tamer_spark.operators.gopher import gopher_signals
    from tamer_spark.operators.pq import pq_encode, pq_search_adc, pq_train
    from tamer_spark.operators.similarity import ivf_build, semdedup

    sem = {}
    for label, path in steps:
        spark.catalog.clearCache()
        emb = spark.read.parquet(f"{path}/embeddings.parquet")
        _, cents = ivf_build(emb, n_centroids=8, iters=2)
        t0 = time.monotonic()
        n_unc = semdedup(emb, threshold=0.3, model=cents).count()
        t_unc = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        n_cap = semdedup(emb, threshold=0.3, model=cents, max_cluster=1000).count()
        t_cap = round(time.monotonic() - t0, 3)
        sem[label] = {"t_uncapped": t_unc, "keep_uncapped": n_unc,
                      "t_cap1000": t_cap, "keep_cap1000": n_cap}
        print(f"# semdedup@{label}: {sem[label]}", file=sys.stderr)
    print(json.dumps({"semdedup_frozen_model": sem}, indent=2))

    adc = {}
    for label, path in steps:
        spark.catalog.clearCache()
        emb = spark.read.parquet(f"{path}/embeddings.parquet")
        cb = pq_train(emb, m=4, k=16, iters=2)
        coded = pq_encode(emb, cb).persist()
        n_codes = coded.count()
        t0 = time.monotonic()
        pq_search_adc(coded, cb, emb.filter(F.col("vec_id") < 10), topk=5).count()
        adc[label] = {"corpus": n_codes, "t_adc": round(time.monotonic() - t0, 3)}
        coded.unpersist()
        print(f"# pq_search_adc@{label}: {adc[label]}", file=sys.stderr)
    print(json.dumps({"pq_search_adc_hot_codes": adc}, indent=2))

    gop = {}
    for label, path in steps:
        spark.catalog.clearCache()
        docs = _t(spark, path, "documents")
        t0 = time.monotonic()
        n = gopher_signals(docs).count()
        gop[label] = {"docs": n, "t": round(time.monotonic() - t0, 3)}
        print(f"# gopher_signals@{label}: {gop[label]}", file=sys.stderr)
    print(json.dumps({"gopher_signals": gop}, indent=2))

    # C4 span dedup under a HOT span: EVERY document shares one boilerplate
    # 3-sentence run — the worst case for a per-span row_number window (all
    # occurrences of the hot span land in one window task) and exactly the
    # case the operator's aggregate-MIN design combines map-side. Probe the
    # shipped operator against an inline window-based comparator at growing
    # hot-key multiplicity; the gap is the measured cost of the wrong plan.
    from pyspark.sql import Window
    from tamer_spark.operators.c4 import c4_span_dedup

    def span_dedup_window_variant(docs):
        # identical pipeline, but global-first via row_number over the span
        sarr = docs.select(
            "doc_id",
            F.filter(
                F.transform(F.split(F.col("text"), "[.!?]"), lambda x: F.trim(x)),
                lambda x: F.length(x) > 0,
            ).alias("_ss"),
        )
        sents = sarr.select("doc_id", F.posexplode("_ss").alias("idx", "s"))
        spans = sarr.select(
            "doc_id",
            F.when(
                F.size("_ss") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("_ss") - 3),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.array_join(F.slice(F.col("_ss"), i + 1, 3), "\x1f").alias("sp"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<start:int,sp:string>>")).alias("_sps"),
        ).select("doc_id", F.explode("_sps").alias("o")).select(
            "doc_id", F.col("o.start").alias("start"), F.col("o.sp").alias("sp")
        )
        w = Window.partitionBy("sp").orderBy("doc_id", "start")
        dropped = (
            spans.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .select("doc_id", F.explode(F.sequence(F.col("start"), F.col("start") + 2)).alias("idx"))
            .distinct()
        )
        return sents.join(dropped, ["doc_id", "idx"], "left_anti").groupBy("doc_id").count()

    boiler = (
        "accept all cookies to continue. this site uses tracking pixels. "
        "dismiss this banner to proceed."
    )
    c4_skew = {}
    for n_docs in (5_000, 50_000):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(boiler + " unique tail number "),
                F.col("id").cast("string"),
                F.lit(" closes this document here."),
            ).alias("text"),
        ).repartition(32).persist()
        docs.count()
        t0 = time.monotonic()
        c4_span_dedup(docs).count()
        t_min = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        span_dedup_window_variant(docs).count()
        t_win = round(time.monotonic() - t0, 3)
        docs.unpersist()
        c4_skew[f"docs={n_docs}"] = {"t_min_agg": t_min, "t_window": t_win,
                                     "window_over_min": round(t_win / t_min, 2)}
        print(f"# c4_span_skew@{n_docs}: {c4_skew[f'docs={n_docs}']}", file=sys.stderr)
    print(json.dumps({"c4_span_dedup_hot_span": c4_skew}, indent=2))


if __name__ == "__main__":
    main()
