"""RRF fusion semantics: consensus wins, single-source items still rank,
rank-only (score-scale-free), tie-break stability."""

import pytest

from tamer_spark.operators.fusion import rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id long, neighbor_id long, rank long")


def test_consensus_item_outranks_single_source_tops(spark):
    # item 7 is rank 2 in BOTH sources; items 1 and 9 are rank 1 in one each
    a = _ranking(spark, [(0, 1, 1), (0, 7, 2), (0, 3, 3)])
    b = _ranking(spark, [(0, 9, 1), (0, 7, 2), (0, 4, 3)])
    out = rrf_fuse([a, b], k0=60, k=10).collect()
    by_rank = {r.rank: r.neighbor_id for r in out}
    assert by_rank[1] == 7  # 2/62 > 1/61
    assert set(by_rank.values()) == {7, 1, 9, 3, 4}


def test_scores_ignore_source_score_scales(spark):
    # identical ranks -> identical fusion regardless of any score columns
    a = _ranking(spark, [(0, 1, 1), (0, 2, 2)])
    out = {r.neighbor_id: r.rrf_score for r in rrf_fuse([a, a], k=5).collect()}
    assert out[1] == round(2 / 61, 6) and out[2] == round(2 / 62, 6)


def test_per_query_isolation_and_topk(spark):
    a = _ranking(spark, [(q, i, i) for q in (0, 1) for i in range(1, 8)])
    out = rrf_fuse([a], k=3).collect()
    assert sorted((r.query_id, r.rank) for r in out) == [
        (q, r) for q in (0, 1) for r in (1, 2, 3)
    ]


def test_equal_score_ties_break_by_item_id(spark):
    a = _ranking(spark, [(0, 5, 1), (0, 2, 1)])  # same rank from one source
    out = rrf_fuse([a], k=5).collect()
    assert [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        (2, 1), (5, 2)
    ]


def test_empty_rankings_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
