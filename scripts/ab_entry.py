#!/usr/bin/env python
"""A/B timing harness for ONE bench entry in the CURRENT code tree.

Usage (r13 winnow re-attribution — VERDICT r12 item 1):
    # arm A: parent of the refactor        arm B: the refactor
    git worktree add .ab/parent e593ebb^ && git worktree add .ab/refactor e593ebb
    SPARK_GRAFT_AB_TREE=.ab/parent   python scripts/ab_entry.py winnow_overlap_pairs_docs
    SPARK_GRAFT_AB_TREE=.ab/refactor python scripts/ab_entry.py winnow_overlap_pairs_docs

Times the named entry exactly like bench.py does (warm-up pass, GC before
the timed block, count() per iteration, cold-path GC for _NO_WARM_KEEP
entries) but STANDALONE — no group sequence, no other entries' heap — so
two runs of this script differ only by the code tree PYTHONPATH points at.
Emits ONE JSON line with every sample (not just the median): an A/B verdict
needs the two sample distributions, and overlap between them IS the
host-noise attribution.

The entry is resolved from the tree under test: its bench.HEADLINE callable
if one exists there, else queries.resolve_query. tamer_spark/bench must
therefore import from PYTHONPATH — the script takes care to strip its own
directory so a stale sibling checkout can't shadow the arm.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

def main() -> None:
    # resolve the arm tree explicitly ($SPARK_GRAFT_AB_TREE, default cwd),
    # never from this script's location: the scripts/ dir of the MAIN
    # checkout must not shadow the arm under test. Remove it by VALUE —
    # sys.path[0] is only this directory under direct `python scripts/...`
    # invocation; under `python -m` or embedded use popping by position
    # would drop an unrelated entry. Done INSIDE main() so merely importing
    # this script (the scripts-smoke guard) does not mutate the importing
    # process's sys.path.
    _here = os.path.dirname(os.path.abspath(__file__))
    for _p in list(sys.path):
        if _p and os.path.abspath(_p) == _here:
            sys.path.remove(_p)
    sys.path.insert(
        0, os.path.abspath(os.environ.get("SPARK_GRAFT_AB_TREE", os.getcwd()))
    )
    entry = sys.argv[1] if len(sys.argv) > 1 else "winnow_overlap_pairs_docs"
    n_iter = int(os.environ.get("SPARK_GRAFT_AB_ITERS", "7"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    import tamer_spark
    from tamer_spark.queries import resolve_query

    fn = bench.HEADLINE.get(entry) or resolve_query(entry)
    cold = entry in bench._NO_WARM_KEEP

    spark = tamer_spark.get_spark("tamer-spark-ab")
    spark.sparkContext.setLogLevel("ERROR")

    warm = fn(spark, sf_dir)
    warm.count()
    if cold:
        del warm
        spark.sparkContext._jvm.System.gc()

    samples: list[float] = []
    spark.sparkContext._jvm.System.gc()
    for _ in range(n_iter):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.count()
        samples.append(round(time.monotonic() - t0, 3))
        if cold:
            del df
            spark.sparkContext._jvm.System.gc()

    src = sys.modules["tamer_spark"].__file__
    print(
        json.dumps(
            {
                "entry": entry,
                "tree": os.path.dirname(os.path.dirname(src)),
                "sf_dir": sf_dir,
                "n": n_iter,
                "samples": samples,
                "median_s": round(statistics.median(samples), 3),
                "min_s": min(samples),
                "max_s": max(samples),
                "load_avg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
