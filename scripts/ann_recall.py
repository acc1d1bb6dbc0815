#!/usr/bin/env python
"""Publish the ANN recall curve: recall@k of ivf / adc / ivfadc vs the exact
brute-force cosine baseline, across nprobe ∈ {1,2,4} and shortlist ∈
{10,20,50}.

The hash gates pin determinism; this script answers "is the index any good"
— the number a user reads to pick nprobe/shortlist. Run it after touching
the ANN tier; the table goes into docs/SCALING.md and
tests/test_ann_recall.py pins floors at sf0.01.

Usage: python scripts/ann_recall.py [sf_dir] (default /root/testdata/sf0.1)
Prints one JSON line per configuration plus a ready-to-paste markdown table.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from pyspark.sql import functions as F

from tamer_spark.operators.ann_eval import recall_value
from tamer_spark.operators.pq import ivfadc_search, pq_encode, pq_search_adc, pq_train
from tamer_spark.operators.similarity import cosine_knn, ivf_build, ivf_search

K = 5
N_QUERIES = 100
NPROBES = (1, 2, 4)
SHORTLISTS = (10, 20, 50)
# (m, k) PQ configs: the hash-gate setting (2 B/vector — cheapest storage,
# coarsest) and the quality setting the r5 sweep picked (6-bit × 8 subspaces,
# packed code still fits int64; ~2.3× the composed recall of the gate config)
PQ_CONFIGS = ((4, 16), (8, 64))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = tamer_spark.get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    qs = emb.filter(F.col("vec_id") < N_QUERIES)

    # ground truth: exact brute-force cosine top-k (the already-gated baseline)
    truth = cosine_knn(emb, qs, k=K).persist()
    truth.count()

    # frozen coarse quantizer — same hyperparameters as the hash gates
    assigned, centroids = ivf_build(emb, n_centroids=8, iters=3)
    assigned = assigned.persist()
    assigned.count()

    rows: list[dict] = []

    def record(method: str, pq, nprobe, shortlist, df) -> None:
        r = recall_value(df, truth)
        rows.append({"method": method, "pq": pq, "nprobe": nprobe,
                     "shortlist": shortlist, "recall": r})
        print(json.dumps(rows[-1]), flush=True)

    for np_ in NPROBES:
        record("ivf", None, np_, None, ivf_search(assigned, centroids, qs, k=K, nprobe=np_))
    for m, kk in PQ_CONFIGS:
        codebooks = pq_train(emb, m=m, k=kk, iters=3)
        coded = pq_encode(emb, codebooks).persist()
        coded.count()
        index = assigned.join(coded.select("vec_id", "codes"), "vec_id").persist()
        index.count()
        tag = f"m{m}k{kk}"
        record("adc", tag, None, None, pq_search_adc(coded, codebooks, qs, topk=K))
        for np_ in NPROBES:
            for sl in SHORTLISTS:
                record(
                    "ivfadc", tag, np_, sl,
                    ivfadc_search(index, centroids, codebooks, qs, k=K,
                                  nprobe=np_, shortlist=sl),
                )
        coded.unpersist()
        index.unpersist()

    print(f"\n## ANN recall@{K} vs brute-force cosine "
          f"({n_corpus} vectors, {N_QUERIES} queries, {sf_dir})\n")
    print("| method | pq | nprobe | shortlist | recall@5 |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['method']} | {r['pq'] or '—'} | {r['nprobe'] or '—'} "
              f"| {r['shortlist'] or '—'} | {r['recall']:.4f} |")
    spark.stop()


if __name__ == "__main__":
    main()
