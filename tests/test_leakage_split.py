"""Leakage-safe cluster-aware splitting (operators/mixing.leakage_safe_split)
— near-duplicate clusters never straddle train/val/test. Pins the
no-straddle invariant, the singleton == per-doc-rule degeneration, split
proportions, and determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tamer_spark.operators.mixing import leakage_safe_split


def _split_of(rep: int, salt: str = "csplit-") -> str:
    h = int(hashlib.md5(f"{salt}{rep}".encode()).hexdigest()[:15], 16) % 100
    return "train" if h < 80 else ("val" if h < 90 else "test")


def test_no_cluster_straddles_splits(spark):
    # two chained clusters {1,2,3} (transitive via 1-2, 2-3) and {10, 11},
    # plus singletons
    docs = spark.range(20).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 20
    assert out[1].split == out[2].split == out[3].split
    assert out[1].cluster_rep == out[2].cluster_rep == out[3].cluster_rep == 1
    assert out[1].cluster_size == 3
    assert out[10].split == out[11].split and out[10].cluster_rep == 10


def test_split_is_hash_of_representative(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(4, 6)], "doc_a long, doc_b long")
    out = {r.doc_id: r.split for r in leakage_safe_split(docs, pairs).collect()}
    for d in range(8):
        rep = 4 if d in (4, 6) else d
        assert out[d] == _split_of(rep), (d, rep)


def test_singletons_degenerate_to_per_doc_rule(spark):
    # with no pairs at all, every doc is its own rep — the split is exactly
    # the per-doc hash rule over the same salt
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in leakage_safe_split(docs, empty).collect()}
    assert all(r.cluster_rep == d and r.cluster_size == 1 for d, r in out.items())
    counts = {"train": 0, "val": 0, "test": 0}
    for d, r in out.items():
        assert r.split == _split_of(d)
        counts[r.split] += 1
    # ~80/10/10 with hash noise on 200 ids
    assert counts["train"] > 130 and counts["val"] > 5 and counts["test"] > 5


def test_deterministic_across_invocations(spark):
    docs = spark.range(50).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(0, 7), (7, 14)], "doc_a long, doc_b long")
    a = sorted(map(tuple, leakage_safe_split(docs, pairs).collect()))
    b = sorted(map(tuple, leakage_safe_split(docs, pairs).collect()))
    assert a == b


def test_gate_variant_no_lsh_pair_straddles(spark):
    """The end-to-end property on the real fixture: every MinHash-LSH
    candidate pair lands in one split."""
    from tamer_spark.operators.dedup import minhash_lsh_pairs
    from tamer_spark.queries import _BANDS, _K, _MAX_BUCKET, _N, _t

    d = _t(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_lsh_pairs(d, k=_K, bands=_BANDS, n=_N, seed=42, max_bucket=_MAX_BUCKET)
    split = leakage_safe_split(d.select("doc_id"), pairs)
    straddle = (
        pairs.join(split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")), "doc_a")
        .join(split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0
    # and clusters actually exist in the fixture (the invariant is live)
    assert split.filter(F.col("cluster_size") > 1).count() > 0
