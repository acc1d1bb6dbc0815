#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "host_calib_s": ..., "shuffle_calib_s": ..., "load_avg_1m": {...}}

The last three fields are the in-record noise attribution (r13):
single-thread host calibration, the 32-thread shuffle-calibration twin,
and the 1-min load average sampled at start / after every group / at end
— scripts/bench_compare.py consumes them so a round-over-round flag can
be attributed to a host window without a separate same-code A/B rerun
(scripts/ab_entry.py remains the per-entry A/B harness when one is
needed).

Each query is executed to completion (count) so lazy plans actually run; time
includes plan + execution, not session startup. Per-query value is the MEDIAN
of $SPARK_GRAFT_BENCH_ITERS (default 3) timed iterations after a warm-up pass
— single-run numbers at 0.2-2 s per query on local[32] swing ±15-35 %
run-to-run, which makes round-over-round deltas unreadable; the spread
(min/max) is reported alongside so a wide interval is visible instead of
masquerading as a regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import tamer_spark
from pyspark.sql import functions as F
from tamer_spark import queries as Q
from tamer_spark.queries import resolve_query

# One-time per-(entry, sf_dir) setup products (persisted pairs, bucketed
# index tables) built during the warm-up pass so the timed iterations measure
# the operator itself, not its input construction. Holding the DataFrames
# here also pins their caches for the life of the process.
_MEMO: dict[tuple[str, str], object] = {}


def _dedup_exact_raw_only(spark, sf_dir):
    from tamer_spark.operators.dedup import dedup_exact

    return dedup_exact(Q._t(spark, sf_dir, "documents"))


def _minhash_lsh_pairs_only(spark, sf_dir):
    # the registry entry unions pairs + connected-component clusters for the
    # correctness gate; the bench times pair generation alone so the number
    # stays comparable across rounds. Timed COLD (signature stage included,
    # see _NO_WARM_KEEP): the operator's internal signature cache is tied to
    # the result's lifetime, so whether an iteration rides a previous
    # iteration's cache depends on GC/order — rounds ≤2 happened to time the
    # warm-signature banding+join only (~1.5 s at sf0.1); from round 3 the
    # number is the full cold path (~2.2 s) and is iteration-stable.
    return Q.minhash_lsh_pairs(
        Q._t(spark, sf_dir, "documents", floor=True), k=Q._K, bands=Q._BANDS, n=Q._N, seed=42,
        max_bucket=Q._MAX_BUCKET,
    )


def _cc_clusters_only(spark, sf_dir):
    # isolate connected components: the LSH candidate pairs are computed and
    # persisted ONCE (warm-up), so the timed iterations measure the
    # large-star/small-star rounds + cluster attach, not pair generation
    from tamer_spark.operators.cc import attach_cluster_ids

    key = ("lsh_pairs", sf_dir)
    if key not in _MEMO:
        d = Q._t(spark, sf_dir, "documents")
        # the extra repartition makes this plan NOT sameResult() as the
        # dedup_minhash_lsh timed entry's plan — without it the cache manager
        # substitutes this persisted copy there and that entry times a cache
        # scan instead of pair generation
        pairs = Q.minhash_lsh_pairs(
            d, k=Q._K, bands=Q._BANDS, n=Q._N, seed=42, max_bucket=Q._MAX_BUCKET
        ).repartition("doc_a").persist()
        pairs.count()
        _MEMO[key] = (d, pairs)
    d, pairs = _MEMO[key]
    return attach_cluster_ids(d.select("doc_id"), pairs)


def _ivf_model(spark, sf_dir):
    # frozen coarse quantizer, trained once in warm-up: the bench times the
    # operators a steady-state pipeline runs per epoch (assign/prune/encode/
    # search), not quantizer training — the incremental posture SCALING.md
    # documents (train once, append forever)
    from tamer_spark.operators.similarity import ivf_build

    key = ("ivf_model", sf_dir)
    if key not in _MEMO:
        emb = Q._t(spark, sf_dir, "embeddings")
        _, centroids = ivf_build(emb, n_centroids=8, iters=3)
        _MEMO[key] = centroids
    return _MEMO[key]


def _pq_model(spark, sf_dir):
    from tamer_spark.operators.pq import pq_train

    key = ("pq_model", sf_dir)
    if key not in _MEMO:
        _MEMO[key] = pq_train(Q._t(spark, sf_dir, "embeddings"), m=4, k=16, iters=3)
    return _MEMO[key]


def _semdedup_frozen(spark, sf_dir):
    # within-cluster cosine prune over the frozen quantizer — the semantic
    # dedup hot path (assignment is map-only; the pair join is cluster- and
    # max_cluster-bounded)
    from tamer_spark.operators.similarity import semdedup

    emb = Q._t(spark, sf_dir, "embeddings", floor=True)
    return semdedup(emb, threshold=0.3, model=_ivf_model(spark, sf_dir))


def _pq_encode_frozen(spark, sf_dir):
    # map-only encode of the full corpus under frozen codebooks (2 B/vector).
    # NOTE: at bench SF the time is dominated by per-plan fixed overhead
    # (analysis/codegen of the m*k literal-codebook expression tree —
    # measured flat from 500 to 2000 vectors), so the number is an upper
    # bound on per-epoch cost; the per-row work is a shuffle-free map.
    from tamer_spark.operators.pq import pq_encode

    return pq_encode(Q._t(spark, sf_dir, "embeddings"), _pq_model(spark, sf_dir))


def _pq_search_adc_hot(spark, sf_dir):
    # ADC top-5 for 10 queries over a PERSISTED code table (built in
    # warm-up): times the search itself — per-query m×k distance tables on
    # the broadcast side + m array lookups per candidate — not encoding
    from tamer_spark.operators.pq import pq_encode, pq_search_adc

    cb = _pq_model(spark, sf_dir)
    key = ("pq_codes", sf_dir)
    if key not in _MEMO:
        coded = pq_encode(Q._t(spark, sf_dir, "embeddings"), cb).persist()
        coded.count()
        _MEMO[key] = coded
    emb = Q._t(spark, sf_dir, "embeddings")
    return pq_search_adc(_MEMO[key], cb, emb.filter(F.col("vec_id") < 10), topk=5)


def _sq_search_hot(spark, sf_dir):
    # SQ8 top-5 for 10 queries over a PERSISTED code table under frozen
    # per-dimension bounds (both built in warm-up): times the asymmetric
    # search itself — map-side ×255-scale reconstruction + one int64
    # squared-diff fold per candidate against the broadcast query set
    from tamer_spark.operators.sq import sq_encode, sq_search, sq_train

    key = ("sq_model", sf_dir)
    if key not in _MEMO:
        emb = Q._t(spark, sf_dir, "embeddings")
        bounds = sq_train(emb)
        coded = sq_encode(emb, bounds).persist()
        coded.count()
        _MEMO[key] = (bounds, coded)
    bounds, coded = _MEMO[key]
    qs = Q._t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return sq_search(coded, bounds, qs, topk=5)


def _cms_sketch_docs(spark, sf_dir):
    # Count-Min sketch build over the corpus token stream (cold): map-side
    # explode to d cells per occurrence + the ONE bounded (r, b) exchange —
    # the fixed-size-shuffle counting path
    from tamer_spark.operators.cms import cms_build
    from tamer_spark.operators.dedup import normalize_text

    toks = (
        Q._t(spark, sf_dir, "documents", floor=True)
        .select(F.explode_outer(F.split(normalize_text(F.col("text")), " ")).alias("word"))
        .filter(F.col("word").isNotNull())
    )
    return cms_build(toks, d=4, w=1024, seed=42)


def _domain_cap_docs(spark, sf_dir):
    # Per-domain quota through the mega-group posture (count + threshold
    # cut + survivor recount + one rank window). The (doc_id, domain)
    # input frame is PERSISTED in warm-up: the operator makes three passes
    # over its input by design (count / recount / window feed), and timing
    # the URL-derivation regex chain three times would measure the
    # fixture's synthesis, not the operator — url_dedup_docs already
    # times that chain once.
    from tamer_spark.functions.text import registrable_domain_col
    from tamer_spark.operators.mixing import cap_per_group
    from tamer_spark.queries import _DOMCAP_CAP, _DOMCAP_SLACK, _derived_domain_url_col

    key = ("domain_cap_input", sf_dir)
    if key not in _MEMO:
        d = Q._t(spark, sf_dir, "documents").select(
            "doc_id", _derived_domain_url_col().alias("url")
        )
        dom = d.select(
            "doc_id", registrable_domain_col(F.col("url")).alias("domain")
        ).persist()
        dom.count()
        _MEMO[key] = dom
    return cap_per_group(
        _MEMO[key], "domain", cap=_DOMCAP_CAP, prefilter_slack=_DOMCAP_SLACK
    )


def _rp_project_embeddings(spark, sf_dir):
    # JL projection 64→16 under frozen signs — map-only, the pre-step that
    # cuts downstream per-pair arithmetic 4×
    from tamer_spark.operators.rp import random_projection, rp_signs

    key = ("rp_signs",)
    if key not in _MEMO:
        _MEMO[key] = rp_signs(out_dim=16, dim=64, seed=42)
    return random_projection(Q._t(spark, sf_dir, "embeddings"), _MEMO[key])


def _event_anomaly_daily(spark, sf_dir):
    # median/MAD outlier flagging over per-type daily counts: one
    # partial-agg collapse + two key-partitioned median windows
    from tamer_spark.operators.anomaly import daily_counts, mad_anomalies

    return mad_anomalies(
        daily_counts(Q._t(spark, sf_dir, "events")), keys=("k",), value_col="n"
    )


def _quality_ppl_bucket(spark, sf_dir):
    # CCNet tercile bucketing hot path: self-trained bigram LM scoring +
    # per-language ntile. Timed COLD like dedup_minhash_lsh (the internal
    # bigram-stream cache is dropped between iterations — _NO_WARM_KEEP)
    from tamer_spark.operators.lm import bigram_lm_score

    d = Q._t(spark, sf_dir, "documents")
    scores = bigram_lm_score(d)
    return (
        scores.join(d.select("doc_id", "lang"), "doc_id")
        .selectExpr(
            "*",
            "CAST(ntile(3) OVER (PARTITION BY lang"
            " ORDER BY avg_p_scaled DESC, doc_id ASC) AS BIGINT) AS bucket",
        )
        .selectExpr("doc_id", "bucket", "avg_p_scaled")
    )


def _gopher_signals_all(spark, sf_dir):
    # the Gopher subset (word/symbol/alpha/stopword rules + the top-2-gram
    # repetition term) via the full operator's subset flags. NOT identical
    # work to the r4 entry: r5 added the ASCII-'...' symbol term, the
    # 8-word STOP_GOPHER intersect, and the paper's stopword keep rule —
    # hence the new series tag (r4 numbers are not comparable)
    from tamer_spark.operators.gopher import gopher_signals

    return gopher_signals(
        Q._t(spark, sf_dir, "documents"),
        top_ngrams=((2, 0.2),),
        dup_ngrams=(),
        line_signals=False,
    )


def _gopher_signals_full(spark, sf_dir):
    # the FULL §A1.1 rule set (round 5): adds top-3/4-gram champions,
    # duplicated-5..10-gram coverage (one (doc_id, n, gram) shuffle for all
    # n + the bounded coverage legs), and the map-only line/paragraph family
    from tamer_spark.operators.gopher import gopher_signals

    return gopher_signals(Q._t(spark, sf_dir, "documents"))


def _ivfadc_search_hot(spark, sf_dir):
    # the COMPOSED serving path (probe -> ADC shortlist -> exact rerank) over
    # a PERSISTED IVFADC index (inverted file ⋈ PQ codes, built in warm-up
    # under the frozen models): times what a steady-state retrieval deployment
    # pays per query batch — the 100 TB serving shape SCALING.md documents
    from tamer_spark.operators.pq import ivfadc_search, pq_encode
    from tamer_spark.operators.similarity import ivf_append

    centroids = _ivf_model(spark, sf_dir)
    cb = _pq_model(spark, sf_dir)
    key = ("ivfadc_index", sf_dir)
    if key not in _MEMO:
        emb = Q._t(spark, sf_dir, "embeddings")
        idx = (
            ivf_append(emb, centroids)
            .join(pq_encode(emb, cb).select("vec_id", "codes"), "vec_id")
            .persist()
        )
        idx.count()
        _MEMO[key] = idx
    qs = Q._t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return ivfadc_search(_MEMO[key], centroids, cb, qs, k=5, nprobe=2, shortlist=20)


def _semdedup_incremental_epoch(spark, sf_dir):
    # the per-epoch semantic dedup cost: a 10 % "new epoch" batch pruned
    # against the other 90 % persisted as an assigned inverted file (built
    # once in warm-up under the frozen quantizer) — history is never
    # re-compared to itself, so this times O(batch × matching clusters).
    # Timed COLD (_NO_WARM_KEEP): the operator persists its union internally
    # with a GC-tied release, like semdedup.
    from tamer_spark.operators.similarity import ivf_append, semdedup_incremental

    centroids = _ivf_model(spark, sf_dir)
    key = ("semdedup_hist", sf_dir)
    if key not in _MEMO:
        emb = Q._t(spark, sf_dir, "embeddings")
        hist = ivf_append(emb.filter(F.col("vec_id") % 10 != 0), centroids).persist()
        hist.count()
        _MEMO[key] = hist
    batch = Q._t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return semdedup_incremental(batch, _MEMO[key], centroids, threshold=0.3)


def _dedup_exact_incremental_epoch(spark, sf_dir):
    # the 100 TB curation loop: a 10 % "new epoch" batch deduped against the
    # other 90 % of the corpus persisted as a BUCKETED key index (built once
    # in warm-up). The merge hint pins the sort-merge path — at real scale
    # the index outgrows broadcast, and SMJ against a bucketed index is the
    # zero-index-exchange plan whose timing we want to track.
    from tamer_spark.operators.dedup_incremental import (
        dedup_exact_incremental,
        exact_index,
    )
    from tamer_spark.sinks.bucketed import write_bucketed

    key = ("dedup_idx", sf_dir)
    if key not in _MEMO:
        # each bench process gets a fresh in-memory catalog, but the warehouse
        # DIRECTORY persists across processes — drop both or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS on a stale leftover
        import shutil
        from urllib.parse import urlparse

        spark.sql("DROP TABLE IF EXISTS bench_dedup_idx")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(os.path.join(wh, "bench_dedup_idx"), ignore_errors=True)
        docs = Q._t(spark, sf_dir, "documents")
        write_bucketed(
            exact_index(docs.filter(F.col("doc_id") % 10 != 0)),
            "bench_dedup_idx", ["content_hash"], num_buckets=32,
        )
        _MEMO[key] = True
    batch = Q._t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return dedup_exact_incremental(batch, spark.table("bench_dedup_idx").hint("merge"))


def _exsub_incremental_epoch(spark, sf_dir):
    # r13: the ExactSubstr steady-state epoch — a 10 % "new epoch" batch
    # spliced against the other 90 %'s window-hash index (built once in
    # warm-up, persisted). Times the per-epoch semi/anti joins + keeper
    # election + interval/rebuild tail — the O(batch) loop the probe pins
    # flat; the batch-shape sibling (exsub_dedup_docs) times the full-corpus
    # operator instead.
    from tamer_spark.operators.runs import exsub_dedup_incremental, exsub_window_index
    from tamer_spark.queries import _RUN_L

    key = ("exsub_idx", sf_dir)
    if key not in _MEMO:
        hist = Q._t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
        idx = exsub_window_index(hist, length=_RUN_L).persist()
        idx.count()
        _MEMO[key] = idx
    batch = Q._t(spark, sf_dir, "documents", floor=True).filter(F.col("doc_id") % 10 == 0)
    return exsub_dedup_incremental(batch, _MEMO[key], length=_RUN_L)


def _exsub_bloom_incremental_epoch(spark, sf_dir):
    # r13 counterpart: same epoch batch through the WINDOW-HASH bloom
    # sidecar (probabilistic mode — zero index access; the verify mode is
    # graded in the dedup_incremental gate). Sidecar built once in warm-up;
    # a real loop advances it by bloom_merge_df, never rebuilds.
    from tamer_spark.operators.runs import (
        exsub_bloom_index_df,
        exsub_dedup_incremental_bloom,
        exsub_window_index,
    )
    from tamer_spark.queries import _RUN_L

    m = 1 << 22
    key = ("exsub_bloom_words", sf_dir)
    if key not in _MEMO:
        hist = Q._t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
        words = exsub_bloom_index_df(
            exsub_window_index(hist, length=_RUN_L), m_bits=m
        ).persist()
        words.count()
        _MEMO[key] = words
    batch = Q._t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return exsub_dedup_incremental_bloom(batch, _MEMO[key], length=_RUN_L)


def _dedup_bloom_incremental_epoch(spark, sf_dir):
    # r11 counterpart of _dedup_exact_incremental_epoch: the same 10 % epoch
    # batch deduped against a DISTRIBUTED bloom sidecar of the other 90 %
    # (built once in warm-up, persisted — a real loop advances it by
    # bloom_merge_df, never rebuilds). Probabilistic mode: the flat-vs-index
    # path whose whole point is touching NO exact index — what this entry
    # times is the k-broadcast-join probe cost per epoch.
    from tamer_spark.operators.dedup_incremental import (
        dedup_exact_incremental_bloom,
        exact_bloom_index_df,
        exact_index,
    )

    m = 1 << 22
    key = ("dedup_bloom_words", sf_dir)
    if key not in _MEMO:
        hist = Q._t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
        words = exact_bloom_index_df(exact_index(hist), m_bits=m).persist()
        words.count()
        _MEMO[key] = words
    batch = Q._t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return dedup_exact_incremental_bloom(batch, _MEMO[key], m_bits=m)


# Headline set: mix of heavy relational (scan/join/agg/window), ingestion-
# shaped, and LLM-data operators — the queries whose 100 TB behavior matters.
# Values: None → run the registry entry; callable → a hot-path subset of a
# merged registry entry (or an operator with memoized input setup), timed for
# round-over-round comparability.
HEADLINE = {
    "q1_pricing_summary": None,
    "q3_top_revenue": None,
    "q5_region_revenue": None,
    "window_topk_quartile": None,
    "sessionize_events": None,
    "asof_join_events_orders": None,
    "dedup_exact": _dedup_exact_raw_only,
    "dedup_minhash_lsh": _minhash_lsh_pairs_only,
    "dedup_embedding_cosine": Q._embedding_neardup_pairs,
    "text_profile": None,
    "similarity_knn": None,
    "ingest_tumbling_events": None,
    # scale tier (round 3+): the operators whose behavior at 100 TB the
    # north star cares most about, tracked round-over-round
    "connected_components": _cc_clusters_only,
    "dedup_exact_incremental": _dedup_exact_incremental_epoch,
    "dedup_bloom_incremental": _dedup_bloom_incremental_epoch,
    "pack_sequences": None,
    # semantic tier (round 4+): SemDeDup / PQ / ADC search / CCNet buckets
    # under frozen models (training happens once in warm-up — the
    # steady-state epoch posture), so the numbers track the per-epoch cost
    "semdedup": _semdedup_frozen,
    "pq_encode": _pq_encode_frozen,
    "pq_search_adc": _pq_search_adc_hot,
    "quality_ppl_bucket": _quality_ppl_bucket,
    "gopher_quality": _gopher_signals_all,
    "gopher_full": _gopher_signals_full,
    # C4 cleaning (round 5): line filter + cross-doc 3-sentence-span dedup
    # over the gate's punctuation-structured text (raw fixture docs carry no
    # punctuation, so the registry query IS the meaningful timed surface)
    "c4_clean_docs": None,
    # PII scrubbing (round 5): map-only email/IP redaction over structured
    # text — times the regexp_replace scan path
    "scrub_pii_docs": None,
    # markup stripping (r11): WET-style tag-soup strip over markup-wrapped
    # text — the other map-only regexp scan path (9-step chain + entities)
    "strip_markup_docs": None,
    # encoding repair (r11): ftfy-lite mojibake/debris chain over
    # damage-derived text — times the replace+regexp scan path
    "fix_encoding_docs": None,
    # url-level dedup (r11): canonicalize (map-only regexp/array chain over
    # a doc_id-derived URL) + one digest shuffle — the text-free dedup stage
    "url_dedup_docs": None,
    # cross-doc boilerplate-line removal (r12): count-distinct doc-freq agg,
    # tiny post-threshold set broadcast onto the un-shuffled probe stream,
    # one doc_id rebuild regroup
    "line_dedup_docs": None,
    # BM25 retrieval (round 5): map-only tokenize + vocab-filtered tf shuffle
    # + broadcast folds + TakeOrdered top-k — the lexical retrieval scan path
    "bm25_topk_docs": None,
    # serving/epoch tier (round 5+): the composed IVFADC retrieval path and
    # the incremental semantic-dedup epoch — the operators the steady-state
    # story rests on, now tracked round-over-round
    # SQ8 search (r12): the third quantization leg — asymmetric search over
    # persisted int8 codes with frozen bounds (near-exact at 4× compression;
    # pq_search_adc is the 128× / lower-recall sibling)
    "sq8_search": _sq_search_hot,
    # CMS build (r12): fixed-size-shuffle token counting (d=4 × w=1024)
    "cms_sketch_docs": _cms_sketch_docs,
    # RP 64→16 (r12): map-only JL projection under frozen signs
    "rp_project_embeddings": _rp_project_embeddings,
    # median/MAD anomaly flagging (r12): series collapse + 2 key windows
    "event_anomaly_daily": _event_anomaly_daily,
    "ivfadc_search": _ivfadc_search_hot,
    "semdedup_incremental": _semdedup_incremental_epoch,
    # hybrid retrieval (round 5): exact-kNN + BM25 fused by RRF — the
    # composed lexical+semantic serving path, timed cold via the registry
    "hybrid_retrieval_rrf": None,
    # hard-negative mining (r11): LSH-bucket self-join with label-mismatch
    # riding the join + per-anchor top-k — the contrastive-data serving
    # path. hard_positives is deliberately NOT a separate entry: same
    # physical shape (shared _mined_pairs core), differing only in label
    # predicate + sort direction — timing it would double-count.
    "hard_negatives": None,
    # contrastive_pairs (r12): the one-join both-sides triple miner that now
    # PRODUCES the gate's hardneg+hardpos variants — timed separately from
    # hard_negatives because its physical shape differs (no label predicate
    # in the join, ONE (anchor, side) window ranks both tiers)
    "contrastive_pairs": None,
    # analytics/curation tier (round 6): the r5 extension operators the
    # judge asked to bench — each timed as its STANDALONE shape (the
    # registry unions them into tagged gates, which would blur the numbers)
    "winnow_overlap_pairs_docs": None,
    "budget_cap_sources": None,
    "temperature_mix_langs": None,
    "pagerank_cust_supp": None,
    "funnel_view_click_purchase": None,
    "cohort_retention_weekly": None,
    # r6 additions: exact substring-run dedup (cold, incl. its grid persist)
    # and fractional contamination scoring (scan-shaped, broadcast lookup)
    "substring_run_pairs": None,
    "contamination_score_docs": None,
    # ExactSubstr REMOVAL (r12): the policy half of the Lee et al. pipeline —
    # window-hash pass, keeper groupBy+join on h, duplicate-only interval
    # assembly, O(n_tokens) splice rebuild (two map-only corpus scans)
    "exsub_dedup_docs": None,
    # r13: the ExactSubstr steady-state loop entries — per-epoch splice vs a
    # persisted window-hash index, and the same epoch through the bloom
    # sidecar (probabilistic; zero index access)
    "exsub_incremental_epoch": _exsub_incremental_epoch,
    "exsub_bloom_epoch": _exsub_bloom_incremental_epoch,
    # seeded shuffle (r11): deterministic training-order materialization —
    # one shard hash-exchange + per-shard sort (the product itself)
    "seeded_shuffle_docs": None,
    # r11: DSIR importance-resampling selection — hashed n-gram featurize
    # (both corpora) + broadcast ratio join + weight agg + TakeOrdered,
    # timed cold via the standalone shape (its raw-feature persist is
    # plan-lifetime, released by the GC finalizer like semdedup's)
    "dsir_select_docs": None,
    # exact heavy hitters (r12): CMS-prefilter two-pass — sketch build,
    # map-side estimate vs 4 broadcast sides, exact recount of candidates
    "heavy_hitters_docs": None,
    # exact global percentile (r12): bounded histogram + target-bucket
    # refine — the no-global-sort percentile path
    "global_percentiles_orders": None,
    # per-domain cap (r12): count + threshold cut + survivor recount +
    # rank window over ~cap·slack rows per group (mega-group posture),
    # over a persisted (doc_id, domain) input
    "domain_cap_docs": _domain_cap_docs,
    # skip-gram pairs (r12): one (doc_id, pos) window exchange with stacked
    # leads, map-side transpose, vocab²-bounded count + TakeOrdered
    "skipgram_top_pairs": None,
    # grouped two-pass percentile (r12): per-group grids, driver targets
    # bounded by groups·buckets, one (group, bucket) rank window
    "grouped_percentiles_orders": None,
    # vocabulary-growth monitor (r12): one vocabulary-bounded debut agg +
    # per-bucket occurrence counts + a <= #buckets-row cumulative window
    "vocab_growth_docs": None,
}

# HEAP-ISOLATED GROUPS (round 5): each group warms up, times, and tears down
# its own memoized setup (unpersist + drop warm plans + System.gc) before the
# next group starts. Round 4 warmed EVERY entry's memo up front and pinned
# them for the whole process, so early simple-SQL entries were timed under
# the semantic tier's steady old-gen pressure — q3/q5 drifted +29 % with no
# code change and semdedup's spread spanned [3.3, 5.4]. What each entry
# measures is unchanged (same fn, same warm-up-then-time discipline), so
# SERIES tags carry over; only the ambient heap during timing is cleaned.
GROUPS: list[tuple[str, list[str]]] = [
    ("relational", [
        "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
        "window_topk_quartile", "sessionize_events", "asof_join_events_orders",
        "text_profile", "similarity_knn", "ingest_tumbling_events",
        "pack_sequences",
    ]),
    ("dedup", [
        "dedup_exact", "dedup_minhash_lsh", "dedup_embedding_cosine",
        "connected_components", "dedup_exact_incremental",
        "dedup_bloom_incremental", "url_dedup_docs", "line_dedup_docs",
    ]),
    ("semantic", [
        "semdedup", "pq_encode", "pq_search_adc", "sq8_search", "cms_sketch_docs",
        "rp_project_embeddings", "quality_ppl_bucket",
        "gopher_quality", "gopher_full", "c4_clean_docs", "scrub_pii_docs",
        "strip_markup_docs", "fix_encoding_docs", "bm25_topk_docs",
    ]),
    ("serving", ["ivfadc_search", "semdedup_incremental", "hybrid_retrieval_rrf", "hard_negatives", "contrastive_pairs"]),
    ("analytics", [
        "winnow_overlap_pairs_docs", "budget_cap_sources",
        "temperature_mix_langs", "pagerank_cust_supp",
        "funnel_view_click_purchase", "cohort_retention_weekly",
        "substring_run_pairs", "contamination_score_docs", "exsub_dedup_docs",
        "exsub_incremental_epoch", "exsub_bloom_epoch",
        "dsir_select_docs", "seeded_shuffle_docs", "event_anomaly_daily",
        "heavy_hitters_docs", "global_percentiles_orders", "domain_cap_docs",
        "skipgram_top_pairs", "grouped_percentiles_orders", "vocab_growth_docs",
    ]),
]

# Entries whose warm-up plan must NOT be retained: their operator persists an
# internal intermediate tied to the plan's lifetime, and a retained warm copy
# makes timed iterations alternate between warm- and cold-cache executions
# depending on GC order. Dropping the warm plan (finalizer unpersists) makes
# every timed iteration deterministically cold.
_NO_WARM_KEEP = {"dedup_minhash_lsh", "semdedup", "quality_ppl_bucket", "semdedup_incremental", "substring_run_pairs", "exsub_dedup_docs", "vocab_growth_docs", "contrastive_pairs", "hard_negatives"}

# FROZEN timing definitions, by the round that (re)defined them. A number is
# comparable across rounds only within its series; redefining what an entry
# times requires a dual-reported transition round and a new series tag here
# (the dedup_minhash_lsh r2→r3 warm→cold redefinition is the precedent and
# the last allowed silent one).
SERIES = {
    "default": "r1",
    "dedup_minhash_lsh": "r3-cold-path",
    "connected_components": "r3",
    "dedup_exact_incremental": "r3",
    "dedup_bloom_incremental": "r11-prob-sidecar",
    "pack_sequences": "r3",
    "semdedup": "r4-frozen-model",
    "pq_encode": "r4-frozen-model",
    "pq_search_adc": "r4-hot-codes",
    "quality_ppl_bucket": "r4-cold-path",
    "gopher_quality": "r5-subset",  # r4 series closed: subset gained the
    # ASCII-ellipsis symbol term + the 8-word stopword rule (real plan change)
    "gopher_full": "r5-full-a11",
    "c4_clean_docs": "r5",
    "scrub_pii_docs": "r5",
    "bm25_topk_docs": "r5",
    "ivfadc_search": "r5-hot-index",
    "semdedup_incremental": "r5-frozen-model",
    "hybrid_retrieval_rrf": "r5",
    "winnow_overlap_pairs_docs": "r6",
    "budget_cap_sources": "r6",
    "temperature_mix_langs": "r6",
    "pagerank_cust_supp": "r6",  # 3 unrolled integer-exact rounds
    "funnel_view_click_purchase": "r6",
    "cohort_retention_weekly": "r6",
    "substring_run_pairs": "r6-cold",  # internal grid persist released per iter
    "contamination_score_docs": "r6",
    "exsub_dedup_docs": "r12",
    "exsub_incremental_epoch": "r13-hot-index",
    "exsub_bloom_epoch": "r13-hot-sidecar",
    # r14: dsir_select dropped its internal raw-feature persist for the
    # occurrence-level pipeline (map-only featurize straight into bounded
    # partial aggs — no (doc, bucket) count materialization, nothing
    # cached, so the entry also leaves _NO_WARM_KEEP: there is no
    # plan-lifetime state left to alternate on). Timed shape changed →
    # new series.
    "dsir_select_docs": "r14-occurrence",
    "strip_markup_docs": "r11",
    "url_dedup_docs": "r11",
    "fix_encoding_docs": "r11",
    "seeded_shuffle_docs": "r11",
    "line_dedup_docs": "r12",
    "sq8_search": "r12-hot-codes",
    "cms_sketch_docs": "r12",
    "rp_project_embeddings": "r12-frozen-signs",
    "event_anomaly_daily": "r12",
    "heavy_hitters_docs": "r12",
    "global_percentiles_orders": "r12",
    "domain_cap_docs": "r12",
    "skipgram_top_pairs": "r12",
    "grouped_percentiles_orders": "r12",
    # r13: the n_window guard now persists the bucket frame and the
    # returned plan reads the cache (one corpus execution, not two — the
    # r12 ADVICE fix), so the entry times a DIFFERENT shape and joins
    # _NO_WARM_KEEP (iterations otherwise alternate riding the previous
    # iteration's plan-equal cache until its finalizer fires mid-iteration)
    "vocab_growth_docs": "r13-cached-guard",
    # r14: the miners persist the bucketed LSH projection internally (it
    # feeds BOTH self-join sides; without the persist the quantize+LSH
    # chain runs twice per corpus) with a GC-tied release — same class as
    # vocab_growth_docs above: the timed shape changed, so both join
    # _NO_WARM_KEEP and start a new series.
    "contrastive_pairs": "r14-cached-bucket",
    "hard_negatives": "r14-cached-bucket",
}


def _teardown_group(spark) -> None:
    """Release a finished group's pinned state: unpersist every DataFrame-
    valued memo (tuples included), clear the memo table, and force a full GC
    so the next group's timings start from a clean old gen."""
    for key in list(_MEMO):
        val = _MEMO.pop(key)
        for o in val if isinstance(val, tuple) else (val,):
            if hasattr(o, "unpersist"):
                try:
                    o.unpersist(blocking=True)
                except Exception:  # noqa: BLE001 — teardown must not kill the bench
                    pass
    spark.sparkContext._jvm.System.gc()


def select_groups(only: str | None) -> list[tuple[str, list[str]]]:
    """Resolve the SPARK_GRAFT_BENCH_GROUPS bisect knob (comma-separated
    group names; None/empty-var = all). Raises SystemExit on an unknown
    name: a silently-empty run list would emit a plausible-looking but
    empty bench result. Session-free so a typo fails in milliseconds."""
    if not only:
        return GROUPS
    wanted = {s.strip() for s in only.split(",") if s.strip()}
    known = {g for g, _ in GROUPS}
    if not wanted or wanted - known:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_GROUPS: unknown group(s) {sorted(wanted - known)}; "
            f"valid: {sorted(known)}"
        )
    return [(g, n) for g, n in GROUPS if g in wanted]


def host_calibration() -> float:
    """Seconds for a FIXED pure-CPU loop (md5 chain + int sum) — a Spark-free
    host-speed reference emitted with every bench so round-over-round query
    deltas can be attributed: if host_calib moved by the same factor as the
    queries, it's the machine (the r7/r8/r10 pattern — whole-bench ~1.5×
    shifts with untouched code), not a plan change. Single-threaded by
    design: it tracks per-core speed (clock/steal/shares), which is what
    uniformly scales every query's task time."""
    import hashlib

    md5 = hashlib.md5
    t0 = time.perf_counter()
    h = b"x" * 64
    for _ in range(120_000):
        h = md5(h).digest()
    s = 0
    for i in range(6_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def load_avg_1m() -> float | None:
    """1-minute load average at call time (None where unsupported). Emitted
    with every bench (start/end/max-between-groups) so the record ITSELF
    carries co-tenant-load attribution: the r12 verdict's calib-decoupling
    finding was that single-threaded host_calib_s does not track 32-thread
    query load — a high load average next to a flagged entry says "host
    window", without a separate same-code A/B rerun."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover — getloadavg exists on this platform
        return None


def shuffle_calibration(spark) -> float:
    """Seconds (median of 3) for a FIXED all-core Spark shuffle job —
    16M rows in 32 partitions hashed to ~1M keys, partial-agg + exchange +
    final count. The CONCURRENT twin of host_calibration: single-thread
    calib tracks per-core speed, this tracks 32-thread shuffle throughput,
    and the two decouple under co-tenant load (r12 verdict: calib fell
    0.335→0.281 while six entries rose). When a round's query ratios move
    with shuffle_calib but not host_calib, the shift is ambient parallel
    contention, not a plan change. The job is code-frozen (series r13);
    changing it requires a dual-reported transition round like SERIES."""
    samples = []
    for _ in range(3):
        t0 = time.monotonic()
        (
            spark.range(0, 16_000_000, 1, 32)
            .select((F.col("id") * 2654435761 % 1_000_003).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum("n"))
            .collect()
        )
        samples.append(time.monotonic() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_iter = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    grouped = {n for _, names in GROUPS for n in names}
    assert grouped == set(HEADLINE), f"GROUPS/HEADLINE drift: {grouped ^ set(HEADLINE)}"
    # Bisect knob, validated BEFORE the session spins up. Running a group
    # alone vs in the full sequence is the prescribed first step when a
    # driver number moves outside its spread with no code change (r6
    # pq_encode) — it separates host/ambient-heap effects from plan changes.
    run_groups = select_groups(os.environ.get("SPARK_GRAFT_BENCH_GROUPS"))

    spark = tamer_spark.get_spark("tamer-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    load_samples = [load_avg_1m()]

    for gname, names in run_groups:
        # per-group warm-up pass: JIT-compile the generated code, prime
        # parquet footers, and run THIS group's memoized setup (persisted
        # pairs, index tables) so the timed iterations measure steady-state
        # operator throughput. Warm plans are kept referenced until their
        # entry is timed: operators that cache an intermediate release it
        # when the plan is dropped, and steady-state means that cache is
        # warm — but only for the entry's OWN iterations, so each is
        # released as soon as its entry finishes.
        warm: dict[str, object] = {}
        for name in names:
            fn = HEADLINE[name]
            try:
                df = (fn or resolve_query(name))(spark, sf_dir)
                df.count()
                if name not in _NO_WARM_KEEP:
                    warm[name] = df
            except Exception:  # noqa: BLE001 — the timed pass reports the error
                pass

        for name in names:
            fn = HEADLINE[name]
            samples: list[float] = []
            try:
                # settle the JVM before each entry: late entries otherwise
                # time other entries' old-gen garbage — observed as a
                # [1.7, 6.0] spread on an operator that runs in ~1.1 s
                # standalone. Does not change what any entry measures.
                spark.sparkContext._jvm.System.gc()
                for _ in range(n_iter):
                    t0 = time.monotonic()
                    df = (fn or resolve_query(name))(spark, sf_dir)
                    n = df.count()
                    samples.append(time.monotonic() - t0)
                    if name in _NO_WARM_KEEP:
                        # cold-path entries persist an internal intermediate
                        # released by a GC finalizer; without an explicit GC
                        # here iteration 1 can ride the PREVIOUS plan's
                        # not-yet-finalized cache while later ones run cold —
                        # semdedup's r4 spread ([3.3, 5.4] around a cold ~5.3
                        # median) was exactly this alternation. GC between
                        # iterations makes every iteration cold from t0; the
                        # GC itself runs outside the timed window.
                        del df
                        spark.sparkContext._jvm.System.gc()
                times[name] = round(statistics.median(samples), 3)
                spread[name] = [round(min(samples), 3), round(max(samples), 3)]
                print(
                    f"# [{gname}] {name}: median={times[name]}s "
                    f"spread=[{spread[name][0]}, {spread[name][1]}] rows={n}",
                    file=sys.stderr,
                )
            except Exception as e:  # noqa: BLE001 — one bad query must not kill the bench
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                print(f"# [{gname}] {name}: ERROR {errors[name]}", file=sys.stderr)
            warm.pop(name, None)
        warm.clear()
        _teardown_group(spark)
        load_samples.append(load_avg_1m())

    total = round(sum(times.values()), 3)
    # DETAIL line (spread/series/iteration count) goes to STDERR: the driver
    # captures only a 2000-char tail of stdout, and the full detail dict
    # outgrew it in round 5 ("parsed": null — the r5 headline number was
    # unrecoverable). The single stdout line below stays ~1 KB: medians only.
    detail = {"spread": spread, "n": n_iter, "series": SERIES}
    if errors:
        detail["errors"] = errors
    print(f"# detail: {json.dumps(detail)}", file=sys.stderr)
    out = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Spark-free single-core host-speed reference (see host_calibration):
        # divide round-over-round query ratios by the calib ratio before
        # reading anything as a plan regression. Measured AFTER the queries
        # (same ambient conditions); BENCH_r10 recorded 0.244 s and the
        # shipped loop measures ~0.24-0.26 s on the r10 reference host
        # (SCALING.md host-calibration note) — that is the r11 anchor.
        "host_calib_s": host_calibration(),
        # 32-thread shuffle-throughput reference (see shuffle_calibration):
        # the concurrent twin of host_calib_s, measured after it under the
        # same ambient conditions. r13 series anchor.
        "shuffle_calib_s": shuffle_calibration(spark),
        # 1-min load average sampled at start, after every group, at end —
        # the in-record co-tenant-load attribution (see load_avg_1m).
        "load_avg_1m": {
            "start": load_samples[0],
            "end": load_samples[-1],
            "max": max((s for s in load_samples if s is not None), default=None),
        },
    }
    if errors:
        out["errors"] = {k: v[:60] for k, v in errors.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
