"""PageRank semantics: authority concentrates on in-link-heavy nodes,
mass stays bounded, determinism across runs, star-graph sanity."""

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.pagerank import SCALE, pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_star_graph_hub_dominates(spark):
    # everyone links to node 0; node 0 links back to 1 only
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    r = _ranks(spark, edges, iters=3)
    assert r[0] == max(r.values())
    assert r[0] > r[1] > r[2]  # 1 gets the hub's whole outflow, 2 only base
    assert r[2] == r[3] == r[4] == r[5]  # symmetric leaves


def test_mass_bounded_and_positive(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    r = _ranks(spark, edges, iters=3)
    assert all(v > 0 for v in r.values())
    assert sum(r.values()) <= SCALE  # div truncation only leaks, never creates


def test_symmetric_cycle_is_uniform(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    r = _ranks(spark, edges, iters=3)
    assert len(set(r.values())) == 1  # perfect symmetry -> identical ranks


def test_deterministic_and_integer(spark):
    edges = [(i, (i * 7) % 11) for i in range(11) if i != (i * 7) % 11]
    a = _ranks(spark, edges, iters=3)
    b = _ranks(spark, edges, iters=3)
    assert a == b
    assert all(isinstance(v, int) for v in a.values())


def test_invalid_iters_rejected(spark):
    with pytest.raises(ValueError):
        _ranks(spark, [(0, 1)], iters=0)


def test_dedup_edges_false_equals_default_on_distinct_input(spark):
    # r14: dedup_edges=False skips the O(|E|) distinct for callers whose
    # edges are distinct by construction — pin that on such input the
    # ranks are identical to the default path, and that the default path
    # really does dedup (duplicated edges with dedup on == distinct input)
    edges = [(i, (i * 7) % 11) for i in range(11) if i != (i * 7) % 11]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    b = {r.node: r.rank for r in pagerank(df, iters=3, dedup_edges=False).collect()}
    assert a == b
    dup = spark.createDataFrame(edges + edges[::2], "src long, dst long")
    c = {r.node: r.rank for r in pagerank(dup, iters=3).collect()}
    assert c == a
