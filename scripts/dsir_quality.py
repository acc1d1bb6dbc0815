#!/usr/bin/env python
"""Publish the DSIR selection-quality table: planted-target recovery of the
importance-resampling selector (operators/dsir.py) against a random-sampling
baseline, across feature-space resolutions.

The hash gate pins determinism — dsir_select computes exactly what it says.
This script answers the user's other question: "does the selection actually
FIND target-like data, and how does the hashed-bucket resolution trade
off?" — the numbers needed to pick `buckets`, published like the ANN recall
curve (scripts/ann_recall.py) and the near-dup table
(scripts/dedup_quality.py).

Protocol (deterministic, no RNG state):
- target = the `src0` slice of documents (the gate's convention);
- plants = one derived doc per target doc — every 5th word dropped, id
  offset by 10^6 — distributionally target-like but not verbatim copies
  (exact dedup would NOT catch them; DSIR should rank them high);
- pool  = all non-src0 docs + the plants, k = |plants| · 3;
- recall = fraction of plants inside the DSIR sample, vs the
  random-sampling expectation k/|pool|, at several `buckets` settings,
  for both the sampled (DLT) and the weight-top-k (paper's "top-k"
  ablation) selectors.

Usage: python scripts/dsir_quality.py [sf_dir] (default /root/testdata/sf0.01)
Prints one JSON line per configuration plus a ready-to-paste markdown table.
tests/test_dsir.py pins the sf0.001 floor.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from pyspark.sql import functions as F

from tamer_spark.operators.dsir import (
    dsir_importance_weights,
    dsir_priority_sample,
    dsir_ratio_table,
    hashed_ngram_buckets,
)

BUCKET_SWEEP = (64, 256, 1024, 4096)
PLANT_OFFSET = 1_000_000


def planted_pool(spark, sf_dir: str):
    """(pool_df, target_df, plant_ids): non-src0 docs + derived plants."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    target = d.filter(F.col("source") == "src0").select("doc_id", "text")
    # plant: drop every 5th word (1-based positions divisible by 5) — same
    # vocabulary/bigram mass, not a verbatim copy
    plants = target.select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.array_join(
            F.filter(
                F.split(F.col("text"), " "),
                lambda w, i: (i + 1) % 5 != 0,
            ),
            " ",
        ).alias("text"),
    )
    pool = d.filter(F.col("source") != "src0").select("doc_id", "text").unionByName(
        plants
    )
    return pool, target, plants


def recall_at(selected_ids: set[int], plant_ids: set[int]) -> float:
    return round(len(selected_ids & plant_ids) / max(len(plant_ids), 1), 3)


def kl_to_target(tgt_counts: dict[int, int], other: dict[int, int], buckets: int) -> float:
    """KL(target ‖ other) over the hashed-bucket space, add-one smoothed —
    the paper's distributional-alignment metric (diagnostic only: floats
    are fine in a script, never in a gate)."""
    import math

    nt = sum(tgt_counts.values()) + buckets
    no = sum(other.values()) + buckets
    kl = 0.0
    for b in range(buckets):
        pt = (tgt_counts.get(b, 0) + 1) / nt
        po = (other.get(b, 0) + 1) / no
        kl += pt * math.log(pt / po)
    return round(kl, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = tamer_spark.get_spark("dsir-quality")
    spark.sparkContext.setLogLevel("ERROR")

    pool, target, plants = planted_pool(spark, sf_dir)
    plant_ids = {r.doc_id for r in plants.select("doc_id").collect()}
    n_pool = pool.count()
    k = len(plant_ids) * 3
    random_baseline = round(k / n_pool, 3)

    rows = []
    for buckets in BUCKET_SWEEP:
        # one featurize pass per corpus per setting, shared by BOTH
        # selectors (dsir_select would re-featurize internally — drive the
        # exported building blocks instead)
        pc = hashed_ngram_buckets(pool, buckets=buckets).persist()
        tc = hashed_ngram_buckets(target, buckets=buckets)
        wts = dsir_importance_weights(
            pc, dsir_ratio_table(tc, pc, buckets)
        ).persist()
        sampled = dsir_priority_sample(wts, k=k)
        got = {r.doc_id for r in sampled.select("doc_id").collect()}
        # the paper's top-k ablation: same weights, no priority draw
        topk = {
            r.doc_id
            for r in wts.orderBy(F.col("weight").desc(), F.col("doc_id"))
            .limit(k)
            .collect()
        }
        # the paper's alignment metric: KL(target ‖ selected) must drop vs
        # KL(target ‖ pool) — selection moved the bucket distribution
        # toward the target, not just recovered plants
        tgt_d = {r.b: r.s for r in tc.groupBy("b").agg(F.sum("c").alias("s")).collect()}
        pool_d = {r.b: r.s for r in pc.groupBy("b").agg(F.sum("c").alias("s")).collect()}
        sel_rows = pc.join(
            pc.sparkSession.createDataFrame(
                [(i,) for i in got], "doc_id long"
            ),
            "doc_id",
            "left_semi",
        ).groupBy("b").agg(F.sum("c").alias("s")).collect()
        sel_d = {r.b: r.s for r in sel_rows}
        wts.unpersist()
        pc.unpersist()
        row = {
            "buckets": buckets,
            "k": k,
            "pool": n_pool,
            "recall_sampled": recall_at(got, plant_ids),
            "recall_topk": recall_at(topk, plant_ids),
            "random_baseline": random_baseline,
            "kl_selected": kl_to_target(tgt_d, sel_d, buckets),
            "kl_pool": kl_to_target(tgt_d, pool_d, buckets),
        }
        rows.append(row)
        print(json.dumps(row))

    print("\n| buckets | planted recall (DLT sample) | planted recall (top-k) | random | KL(t‖sel) | KL(t‖pool) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['buckets']} | {r['recall_sampled']} | {r['recall_topk']} "
            f"| {r['random_baseline']} | {r['kl_selected']} | {r['kl_pool']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
