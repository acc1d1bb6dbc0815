"""Bigram-LM quality scoring (operators/lm.py): hand-computed tiny corpus,
external-model smoothing for unseen n-grams, and ranking sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.lm import bigram_counts, bigram_lm_score


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
    )


def test_self_trained_scores_match_hand_computation(corpus):
    # unigrams: a=3, b=3 -> V=2; bigram counts: "a b"=3, "b a"=1
    # p(a b) = 1e6*(3+1) div (3+2) = 800000 ; p(b a) = 1e6*(1+1) div (3+2) = 400000
    rows = {r["doc_id"]: r for r in bigram_lm_score(corpus).collect()}
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["sum_p_scaled"] == 800000 + 400000 + 800000
    assert rows[1]["avg_p_scaled"] == pytest.approx(2_000_000 / 3)
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["sum_p_scaled"] == 800000


def test_external_model_smooths_unseen_bigrams(spark, corpus):
    # model trained on `corpus` (V=2); a fully-unseen doc scores through
    # add-one smoothing with zero counts: p = 1e6*(0+1) div (0+2) = 500000
    model = bigram_counts(corpus)
    unseen = spark.createDataFrame([(9, "c d")], ["doc_id", "text"])
    row = bigram_lm_score(unseen, model=model).collect()[0]
    assert row["n_bigrams"] == 1
    assert row["sum_p_scaled"] == 500_000


def test_repetitive_text_ranks_above_shuffled_text(spark):
    # the canonical use: within same-length docs, predictable text scores higher
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat " * 5), (2, "mat the on sat the cat " * 5)],
        ["doc_id", "text"],
    )
    # train on a corpus dominated by the natural order
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)], ["doc_id", "text"]
    )
    scores = {
        r["doc_id"]: r["avg_p_scaled"]
        for r in bigram_lm_score(docs, model=bigram_counts(train)).collect()
    }
    assert scores[1] > scores[2]


def test_short_docs_contribute_no_bigrams(spark):
    one_word = spark.createDataFrame([(1, "hello"), (2, "a b")], ["doc_id", "text"])
    out = bigram_lm_score(one_word)
    assert [r["doc_id"] for r in out.collect()] == [2]
