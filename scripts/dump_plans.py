#!/usr/bin/env python
"""Regenerate docs/PLANS.md: formatted physical plans of the headline
queries at sf0.1, with the properties tests/test_plans.py enforces."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from tamer_spark.plans import explain_str, pushed_filters, read_schema_columns, shuffle_count
from tamer_spark.queries import resolve_query

SHOW = [
    ("q5_region_revenue", "Star join: every dim broadcast; the only shuffles are lineitem⋈orders and the final agg."),
    ("q3_top_revenue", "Filter pushdown: c_mktsegment reaches the customer parquet scan; top-k via TakeOrderedAndProject."),
    ("q1_pricing_summary", "Column pruning: 6 of 11 lineitem columns read; partial agg before the 2-key shuffle."),
    ("dedup_exact", "Minimum-possible dedup: one shuffle on the md5 digest, map-side combine."),
    ("minhash_signatures", "Explode → hash-once → window-combined shingles → partial-agg mins (inlining-trap-free shape)."),
    ("asof_join_events_orders", "As-of via union-sort-window: no join node, single key shuffle, no range explosion."),
    ("similarity_knn", "Query set broadcast, corpus streamed; rank inside one window."),
    ("ann_search", "IVFADC retrieval: ivf probe joins cluster ids (BroadcastHashJoin, corpus streamed); ADC ranks via per-query distance tables over a broadcast nested loop of the tiny query table — no per-candidate vector math, never a corpus cross product."),
    ("bm25_topk_docs", "BM25: explode filtered to the query vocabulary before the (doc, term) shuffle; df/(N, avgdl) broadcast back; top-k is TakeOrderedAndProject, never a global window sort."),
    ("budget_cap_sources", "Two-phase prefix sum: every corpus-side window partitions by (source, bucket) — the group-only window exists solely over the tiny groups×buckets totals frame."),
    ("substring_run_pairs", "Exact substring runs: posting-list equi-join on the rolling window hash (never doc×doc), grid persisted so the corpus is scanned exactly twice, run lengths via keyed diagonal windows."),
    ("contamination_score_docs", "Contamination scoring: benchmark n-gram set broadcast against the corpus shingle stream; one per-doc aggregation — scan-dominated."),
    ("dsir_select_docs", "DSIR selection: one (doc, bucket) count shuffle per corpus; the ≤buckets-row ratio table broadcast (LeftOuter BuildRight); weight agg partial; the sample is TakeOrderedAndProject — never a corpus sort."),
    ("strip_markup_docs", "Markup stripping: pure map — zero exchanges, the whole 9-step regexp chain inside one WholeStageCodegen span at parquet-scan rate."),
    ("url_dedup_docs", "URL-level dedup: map-only canonicalizer over a doc_id-derived URL, then ONE digest shuffle; the documents scan reads doc_id only — text never touched."),
    ("fix_encoding_docs", "Encoding repair: table-driven replace + regexp chain, zero exchanges — mojibake fixed before the NBSP/control passes that would orphan it."),
    ("seeded_shuffle_docs", "Seeded shuffle: one hash exchange on shard + per-shard sort (the training-order product itself); no SinglePartition window anywhere."),
    ("hard_negatives", "Hard-negative mining: LSH-bucket self-equi-join (never a cross product), label filter riding the join, per-anchor top-k window."),
    ("hard_positives", "Hard-positive mining: same candidate join as the negatives (shared _mined_pairs core), label equality + cosine-ASC ranking."),
    ("contrastive_pairs", "The graded production triple miner (r12): ONE LSH-bucket candidate join and ONE (anchor, side) window rank BOTH contrastive tiers — the sort key flips sign per side, so no second exchange exists."),
    ("line_dedup_docs", "Cross-document boilerplate-line removal (r12): the post-threshold set broadcasts onto the UN-shuffled probe stream (BroadcastHashJoin LeftOuter); three shuffles total — count-distinct dedup, freq agg, one doc_id rebuild regroup."),
    ("domain_rollup_docs", "Registrable-domain rollup (r12): map-only PSL-heuristic extraction over a doc_id-derived URL, ONE md5-digest shuffle; the documents scan reads doc_id only."),
    ("sq8_search", "SQ8 asymmetric search (r12): corpus reconstructs map-side at ×255 integer scale, joins the BROADCAST query set, and the only shuffle is the per-query rank window — the corpus never exchanges."),
    ("cms_sketch_docs", "Count-Min build (r12): token explode to d cells map-side; the ONE exchange carries ≤ partitions × d·w rows regardless of vocabulary — the fixed-size-shuffle property."),
    ("rp_project_embeddings", "JL random projection (r12): pure map under the frozen ±1 sign literal — zero exchanges; new epochs project without history."),
    ("event_anomaly_daily", "Median/MAD anomaly flagging (r12): raw events collapse to the per-key daily series in one partial agg BEFORE the two key-partitioned median windows; med/MAD broadcast back."),
    ("heavy_hitters_docs", "Exact heavy hitters (r12): CMS prefilter / exact verify — d broadcast sketch sides estimate each occurrence MAP-SIDE; only candidate occurrences reach the exact count's exchange (the vocabulary tail never shuffles); output independent of the sketch."),
    ("global_percentiles_orders", "Exact global percentile (r12): pass-1 histogram bounded at ≤ B rows (CMS property); pass-2 ranks ONLY the target buckets — the isin filter sits under the window sort, so no global sort exists at any scale."),
    ("domain_cap_docs", "Per-domain cap (r12): group counts broadcast back, mega-groups threshold-cut map-side to ~cap·slack rows, survivor recount folds into per-group metadata via a bounded agg — exactly ONE rank window, fed by the skew-splittable join."),
    ("skipgram_top_pairs", "Skip-gram pairs (r12): all ±offsets ride ONE (doc_id, pos) exchange as stacked leads; both directions emitted map-side (struct explode, no self-union); vocab²-bounded partial-agg count; top-k via TakeOrderedAndProject."),
    ("grouped_percentiles_orders", "Grouped two-pass percentile (r12): per-group grids broadcast back; pass-2 semi-joins to ONLY the target (group, bucket) cells before the rank window — no per-group sort of full groups anywhere."),
    ("exsub_dedup_docs", "ExactSubstr removal (r12): keeper election = groupBy(h) partial aggs + one posting⋈keeper equi-join (never a window-over-h — hot boilerplate hashes shrink map-side); duplicate-only interval assembly; O(n_tokens) splice rebuild; the corpus scans exactly twice (hash pass + rebuild pass, plan-pinned)."),
    ("vocab_growth_docs", "Vocabulary-growth monitor (r12): one vocabulary-bounded debut agg (min bucket, partial-aggregable) + per-bucket occurrence counts; the ONLY window runs over ≤ #buckets rows — nothing data-sized sorts."),
]

def main() -> None:
    spark = tamer_spark.get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    out = ["# PLANS — physical-plan snapshots (sf0.1)", "",
           "Regenerate with `python scripts/dump_plans.py`. These are the plans",
           "tests/test_plans.py pins; commentary notes the property that matters at 100 TB.", ""]
    for name, note in SHOW:
        df = resolve_query(name)(spark, sf)
        out.append(f"## {name}")
        out.append("")
        out.append(f"{note}")
        out.append("")
        out.append(f"- shuffle exchanges: {shuffle_count(df)}")
        pf = pushed_filters(df)
        if pf:
            out.append(f"- pushed filters: {pf}")
        scans = read_schema_columns(df)
        if scans:
            out.append(f"- scan column sets: {[sorted(s) for s in scans]}")
        out.append("")
        out.append("```")
        out.append(explain_str(df, "formatted").strip())
        out.append("```")
        out.append("")
    Path("docs/PLANS.md").write_text("\n".join(out))
    print("wrote docs/PLANS.md")

if __name__ == "__main__":
    main()
