#!/usr/bin/env python
"""A/B probe: connected_components round-cost variants (round-9, VERDICT item 5).

Per round a CC loop pays 1 eager localCheckpoint materialization + a
fixed-point test. Candidates measured here, all exact (no false
convergence). NOTE: as of round 10 the SHIPPED loop (operators/cc.py) is
v1_count_gate — the volume-mode A/B below separated the test-cost models
(−12 % at 6.5M edges; docs/SCALING.md) and the gate won. v0 is the r8/r9
per-round symmetric-difference loop, kept as the reference point:

  v0_baseline    — r8/r9 loop: per round, symmetric difference via two
                   exceptAll legs unioned into ONE isEmpty job.
  v1_count_gate  — SHIPPED (r10). Cache |cur|; per round ONE cheap count(nxt) job; the
                   exact set test runs ONLY when |nxt| == |cur|. Rounds
                   that SHRINK the count (early rounds of real pair
                   graphs, m edges contracting toward one parent edge per
                   non-root node) skip the heavy job entirely; rounds that
                   RELABEL at constant count (a k-node tree keeps k-1
                   edges — a pure path collides EVERY round) fire the
                   confirm but pay ONE exceptAll leg, not v0's two:
                   |nxt|==|cur| and nxt\\cur==∅ over two distinct sets
                   implies equality. ≤ v0's cost in both regimes.
  v2_fused2      — two star rounds per materialization + test: checkpoint
                   and test every 2nd round (may run up to 2 extra star
                   rounds past the fixed point, but halves jobs).
  v3_combined    — v2 pacing with v1's count-gated cheap test.

Run AFTER the bench-contaminating background work is done, on a quiet host:
  python scripts/cc_ab_probe.py [sf_dir]   # LSH-pair graph (shallow: 2 rounds at sf0.1)
  python scripts/cc_ab_probe.py --deep [log2_n [n_chains]] [--only v0_baseline,v1_count_gate]
                                           # synthetic path graph(s): ~log2_n rounds deep,
                                           # n_chains scales EDGE VOLUME at fixed depth
Prints per-variant median-of-3 seconds + rounds; asserts all variants
produce the identical (node, component) set before timing counts.

The --deep mode (round 10) answers what the LSH graph cannot: the sf0.1
candidate-pair graph (256 pairs) converges in 2 star rounds — too few
rounds to expose any per-round test-cost difference. A path graph of 2^k
nodes (diameter 2^k - 1) forces ~k alternating star rounds — the regime a
100 TB boilerplate-chain component actually occupies (cc.py claims ~20
rounds for 1M-doc chains; --deep 16 tests the shape of that claim at 65k).
Note a path is also the count gate's WORST case: a tree of k nodes holds
exactly k-1 edges, so every round is a count collision and the gate pays
count + one-leg confirm each round (its −12 % volume-mode win is therefore
a lower bound — real graphs' shrinking early rounds skip the confirm).
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


def _path_graph(spark, log2_n: int, n_chains: int = 1):
    """Edges of ``n_chains`` disjoint paths of 2^log2_n nodes each (chain c
    occupies ids [c·2^log2_n, (c+1)·2^log2_n)) — diameter 2^log2_n - 1 per
    chain, ``n_chains`` components. One chain probes ROUND DEPTH at minimal
    volume; many chains keep the same depth while scaling EDGE VOLUME, the
    regime where the per-round fixed-point test's cost model (count = map-side
    partial agg vs symmetric difference = full shuffle) actually separates."""
    n = 1 << log2_n
    chains = spark.range(n_chains).select(F.col("id").alias("c"))
    return (
        spark.range(n - 1)
        .crossJoin(F.broadcast(chains))
        .select(
            (F.col("c") * n + F.col("id")).alias("doc_a"),
            (F.col("c") * n + F.col("id") + 1).alias("doc_b"),
        )
    )


def main():
    argv = [a for a in sys.argv[1:]]
    deep = "--deep" in argv
    if deep:
        argv.remove("--deep")
    variants = VARIANTS
    for i, a in enumerate(argv):
        if a == "--only":
            if i + 1 >= len(argv):
                sys.exit("--only needs a comma-separated variant list")
            keep = set(argv[i + 1].split(","))
            unknown = keep - {n for n, _ in VARIANTS}
            if unknown:
                # reject misspellings outright: silently dropping a name would
                # time a one-variant "A/B" that reads as a completed comparison
                sys.exit(f"--only unknown variants {sorted(unknown)}; valid: {[n for n, _ in VARIANTS]}")
            variants = [(n, f) for n, f in VARIANTS if n in keep]
            argv = argv[:i] + argv[i + 2 :]
            break
    spark = tamer_spark.get_spark("cc-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if deep:
        log2_n = int(argv[0]) if argv else 16
        n_chains = int(argv[1]) if len(argv) > 1 else 1
        pairs = _path_graph(spark, log2_n, n_chains).repartition(32, "doc_a").persist()
        n_pairs = pairs.count()
        print(
            f"# DEEP path graph: nodes=2^{log2_n} chains={n_chains} edges={n_pairs}",
            file=sys.stderr,
        )
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
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
    for name, fn in variants:
        fps[name] = fingerprint(fn(pairs))
    assert len(set(fps.values())) == 1, f"variant mismatch: {fps}"
    print(f"# all variants identical: {next(iter(fps.values()))}", file=sys.stderr)

    out = {}
    for name, fn in variants:
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
