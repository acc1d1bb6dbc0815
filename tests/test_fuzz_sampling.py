"""Seeded-random differentials for the r12 sampling/percentile operators:
full pure-python replays over randomized inputs (sizes, skew, duplicates,
NULLs) — the 3-engine-differential discipline, python as the third engine.
Seeded (not hypothesis-driven) because each example is a Spark job; three
seeds × adversarial shape knobs cover the space the fixed fixtures miss."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.mixing import bottomk_sample, cap_per_group
from tamer_spark.operators.percentiles import grouped_percentile_bucketed


def _h(x, salt):
    return int(hashlib.md5(f"{salt}{x}".encode()).hexdigest()[:15], 16)


@pytest.mark.parametrize("seed", [3, 17, 92])
def test_cap_per_group_differential(spark, seed):
    rng = random.Random(seed)
    groups = ["a", "b", "hot", "", None]
    rows = []
    for i in range(rng.randint(50, 300)):
        g = rng.choice(groups) if rng.random() > 0.6 else "hot"
        rows.append((i, g))
    if rng.random() < 0.5:
        rows.append((None, "hot"))  # NULL id must drop
    cap = rng.randint(1, 6)
    df = spark.createDataFrame(rows, "doc_id long, g string")

    from collections import defaultdict

    by_g = defaultdict(list)
    for i, g in rows:
        if i is None:
            continue
        k = g if g else f"nullgroup-{i}"
        by_g[k].append(i)
    want = set()
    for k, ids in by_g.items():
        for rank, i in enumerate(sorted(ids, key=lambda x: (_h(x, "domcap-"), x))[:cap], 1):
            want.add((i, k, rank, len(ids)))

    for kwargs in ({}, {"prefilter_slack": rng.randint(1, 5)}):
        got = {
            (r.doc_id, r.g, r.keep_rank, r.n_group)
            for r in cap_per_group(df, "g", cap=cap, **kwargs).collect()
        }
        assert got == want, (seed, cap, kwargs)


@pytest.mark.parametrize("seed", [5, 41])
def test_bottomk_differential_with_overlapping_epochs(spark, seed):
    from tamer_spark.operators.mixing import bottomk_merge

    rng = random.Random(seed)
    n = rng.randint(30, 400)
    ids = rng.sample(range(10_000), n)
    k = rng.randint(1, 50)
    cut = rng.randint(0, n)
    overlap = rng.randint(0, cut)
    ep_a, ep_b = ids[:cut], ids[cut - overlap :]  # overlapping epochs
    df_a = spark.createDataFrame([(i,) for i in ep_a] or [(None,)], "doc_id long")
    df_b = spark.createDataFrame([(i,) for i in ep_b] or [(None,)], "doc_id long")
    folded = {
        (r.doc_id, r.sample_rank)
        for r in bottomk_merge([bottomk_sample(df_a, k), bottomk_sample(df_b, k)], k).collect()
    }
    want = {
        (i, rank)
        for rank, i in enumerate(
            sorted(set(ep_a) | set(ep_b), key=lambda x: (_h(x, "sample-"), x))[:k], 1
        )
    }
    assert folded == want, (seed, k, cut, overlap)


@pytest.mark.parametrize("seed", [7, 23])
def test_grouped_percentile_differential(spark, seed):
    rng = random.Random(seed)
    langs = ["en", "de", None]
    rows = []
    for _ in range(rng.randint(40, 500)):
        v = rng.choice([rng.randint(-100, 100), rng.randint(0, 10**6), 5, None])
        rows.append((rng.choice(langs), v))
    df = spark.createDataFrame(rows, "lang string, val long")
    ps = [(1, 20), (1, 2), (1, 1)]
    got = {
        (r.lang, r.p): (r.value, r.rank, r.n)
        for r in grouped_percentile_bucketed(
            df, "val", ("lang",), ps, n_buckets=rng.choice([1, 7, 64])
        ).collect()
    }
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v in rows:
        if v is not None:
            by_g[g].append(v)
    want = {}
    for g, vals in by_g.items():
        vals.sort()
        for num, den in ps:
            k = (num * len(vals) + den - 1) // den
            want[(g, f"{num}/{den}")] = (vals[k - 1], k, len(vals))
    assert got == want, seed
