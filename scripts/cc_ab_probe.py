#!/usr/bin/env python
"""A/B probe: connected_components round-cost variants (round-9, VERDICT item 5).

Per round the shipped loop (operators/cc.py) pays 1 eager localCheckpoint
materialization + 1 exact fixed-point job (two exceptAll legs unioned into
one isEmpty). Candidates measured here, all exact (no false convergence):

  v0_baseline    — shipped r8 loop, reference point.
  v1_count_gate  — cache |cur|; per round ONE cheap count(nxt) job; the
                   exact set test runs ONLY when |nxt| == |cur| (star
                   contraction strictly shrinks the edge set until the
                   fixed point, so mid-run rounds skip the heavy job).
                   Exact confirm is count-equality + ONE exceptAll leg:
                   |nxt|==|cur| and nxt\\cur==∅ over two distinct sets
                   implies equality — half the shipped test's legs.
  v2_fused2      — two star rounds per materialization + test: checkpoint
                   and test every 2nd round (may run up to 2 extra star
                   rounds past the fixed point, but halves jobs).
  v3_combined    — v2 pacing with v1's count-gated cheap test.

Run AFTER the bench-contaminating background work is done, on a quiet host:
  python scripts/cc_ab_probe.py [sf_dir]
Prints per-variant median-of-3 seconds + rounds; asserts all variants
produce the identical (node, component) set before timing counts.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tamer_spark
from pyspark.sql import functions as F
from tamer_spark import queries as Q
from tamer_spark.operators.cc import _large_star, _small_star


def _finish(cur):
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    reps = cur.select(F.col("dst").alias("node")).withColumn("component", F.col("node"))
    return members.union(reps).distinct()


def _init(edges):
    return (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )


def v0_baseline(edges, max_iter=25, stats=None):
    cur = _init(edges)
    for rounds in range(1, max_iter + 1):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        if stats is not None:
            stats["rounds"] = rounds
        if nxt.exceptAll(cur).union(cur.exceptAll(nxt)).isEmpty():
            return _finish(nxt)
        cur = nxt
    raise RuntimeError("no converge")


def v1_count_gate(edges, max_iter=25, stats=None):
    cur = _init(edges)
    cur_n = cur.count()
    for rounds in range(1, max_iter + 1):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        if stats is not None:
            stats["rounds"] = rounds
        nxt_n = nxt.count()
        if nxt_n == cur_n and nxt.exceptAll(cur).isEmpty():
            return _finish(nxt)
        cur, cur_n = nxt, nxt_n
    raise RuntimeError("no converge")


def v2_fused2(edges, max_iter=26, stats=None):
    cur = _init(edges)
    for rounds in range(2, max_iter + 1, 2):
        mid = _small_star(_large_star(cur))
        nxt = _small_star(_large_star(mid)).localCheckpoint()
        if stats is not None:
            stats["rounds"] = rounds
        if nxt.exceptAll(cur).union(cur.exceptAll(nxt)).isEmpty():
            return _finish(nxt)
        cur = nxt
    raise RuntimeError("no converge")


def v3_combined(edges, max_iter=26, stats=None):
    cur = _init(edges)
    cur_n = cur.count()
    for rounds in range(2, max_iter + 1, 2):
        mid = _small_star(_large_star(cur))
        nxt = _small_star(_large_star(mid)).localCheckpoint()
        if stats is not None:
            stats["rounds"] = rounds
        nxt_n = nxt.count()
        if nxt_n == cur_n and nxt.exceptAll(cur).isEmpty():
            return _finish(nxt)
        cur, cur_n = nxt, nxt_n
    raise RuntimeError("no converge")


VARIANTS = [
    ("v0_baseline", v0_baseline),
    ("v1_count_gate", v1_count_gate),
    ("v2_fused2", v2_fused2),
    ("v3_combined", v3_combined),
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = tamer_spark.get_spark("cc-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = Q._t(spark, sf_dir, "documents")
    pairs = (
        Q.minhash_lsh_pairs(
            d, k=Q._K, bands=Q._BANDS, n=Q._N, seed=42, max_bucket=Q._MAX_BUCKET
        )
        .repartition("doc_a")
        .persist()
    )
    n_pairs = pairs.count()
    print(f"# pairs={n_pairs} sf_dir={sf_dir}", file=sys.stderr)

    # correctness first: every variant must emit the identical component set
    def fingerprint(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("node", "component")).alias("h"),
        ).collect()[0]
        return (r.n, r.h)

    fps = {}
    for name, fn in VARIANTS:
        fps[name] = fingerprint(fn(pairs))
    assert len(set(fps.values())) == 1, f"variant mismatch: {fps}"
    print(f"# all variants identical: {fps['v0_baseline']}", file=sys.stderr)

    out = {}
    for name, fn in VARIANTS:
        ts, stats = [], {}
        for _ in range(3):
            t0 = time.perf_counter()
            fn(pairs, stats=stats).count()
            ts.append(time.perf_counter() - t0)
        out[name] = (statistics.median(ts), stats["rounds"], [round(t, 3) for t in ts])
    for name, (med, rounds, ts) in out.items():
        print(f"{name}: median={med:.3f}s rounds={rounds} runs={ts}")


if __name__ == "__main__":
    main()
