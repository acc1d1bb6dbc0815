"""Count-Min Sketch: overestimate bound, mergeability, sparse-cell zero
semantics, bounded sketch size, deterministic replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.operators.cms import cms_build, cms_merge, cms_query
from tests.conftest import SF_DIR

D, W, SEED = 4, 256, 42


def _tokens(spark):
    from tamer_spark.operators.dedup import normalize_text
    from tamer_spark.queries import _t

    return (
        _t(spark, SF_DIR, "documents")
        .select(F.explode_outer(F.split(normalize_text(F.col("text")), " ")).alias("word"))
        .filter(F.col("word").isNotNull())
    )


def test_cms_overestimates_never_underestimates(spark):
    """est ≥ true for EVERY distinct token in the corpus (the one-sided CMS
    guarantee), and the total overestimate is bounded by the classical
    ε·N·d mass argument (ε = e/w)."""
    toks = _tokens(spark)
    sk = cms_build(toks, d=D, w=W, seed=SEED)
    truth = toks.groupBy("word").agg(F.count(F.lit(1)).alias("tru"))
    est = cms_query(sk, truth.select("word"), token_col="word", d=D, w=W, seed=SEED)
    joined = est.join(truth, est.token == truth.word).select("token", "est", "tru").collect()
    assert joined
    n_stream = toks.count()
    import math

    eps_bound = math.e / W * n_stream
    for r in joined:
        assert r.est >= r.tru, r
        # per-item bound holds in expectation; assert the generous hard cap
        assert r.est - r.tru <= 3 * eps_bound, (r, eps_bound)


def test_cms_sketch_size_bounded_and_counts_conserved(spark):
    """The sparse sketch has ≤ d·w rows, every row's cnt ≥ 1, and each of
    the d rows conserves the stream length exactly (Σ_b cnt[r][b] = N)."""
    toks = _tokens(spark)
    sk = cms_build(toks, d=D, w=W, seed=SEED).collect()
    assert len(sk) <= D * W
    assert all(0 <= c.b < W and 0 <= c.r < D and c.cnt >= 1 for c in sk)
    n_stream = _tokens(spark).count()
    per_row = {}
    for c in sk:
        per_row[c.r] = per_row.get(c.r, 0) + c.cnt
    assert per_row == {r: n_stream for r in range(D)}


def test_cms_merge_equals_build_on_union(spark):
    """Per-epoch sketches merged cell-wise equal the sketch of the union —
    the linearity that makes the incremental story O(sketch) per epoch."""
    toks = _tokens(spark).withColumn("h", F.crc32("word") % 2)
    a = cms_build(toks.filter("h = 0").drop("h"), d=D, w=W, seed=SEED)
    b = cms_build(toks.filter("h = 1").drop("h"), d=D, w=W, seed=SEED)
    merged = {(r.r, r.b): r.cnt for r in cms_merge(a, b).collect()}
    full = {(r.r, r.b): r.cnt for r in cms_build(toks.drop("h"), d=D, w=W, seed=SEED).collect()}
    assert merged == full


def test_cms_missing_cell_is_exact_zero(spark):
    """A probe token whose cells were never touched estimates exactly 0 —
    the LEFT-join + coalesce rule (an inner join would silently drop the
    row or overestimate from the surviving cells)."""
    tiny = spark.createDataFrame([("alpha",), ("alpha",), ("beta",)], "word string")
    sk = cms_build(tiny, d=D, w=W, seed=SEED)
    probes = spark.createDataFrame([("alpha",), ("gamma-absent",)], "word string")
    est = {r.token: r.est for r in cms_query(sk, probes, d=D, w=W, seed=SEED).collect()}
    assert est["alpha"] >= 2
    # with 3 occupied cells out of 256 per row, 4 independent rows all
    # colliding is ~ (3/256)^4 — and with this fixed seed they don't
    assert est["gamma-absent"] == 0


def test_cms_deterministic_across_builds(spark):
    toks = _tokens(spark)
    a = sorted(map(tuple, cms_build(toks, d=D, w=W, seed=SEED).collect()))
    b = sorted(map(tuple, cms_build(toks, d=D, w=W, seed=SEED).collect()))
    assert a == b
    c = sorted(map(tuple, cms_build(toks, d=D, w=W, seed=7).collect()))
    assert a != c  # the seed actually reaches the hashes


def test_cms_build_single_bounded_exchange(spark):
    """The build plan has exactly ONE shuffle — the (r, b) groupBy whose
    partial aggregation bounds map output at d·w rows per partition (the
    fixed-size-shuffle property; vocabulary size never appears)."""
    plan = (
        cms_build(_tokens(spark), d=D, w=W, seed=SEED)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(shuffles) == 1 and "r#" in shuffles[0] and "b#" in shuffles[0], plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan
