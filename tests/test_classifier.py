"""Linear odds scorer: discriminates reference-like from crawl-like text,
unseen-word floor, integer determinism, vocabulary-bounded weight table."""

import pytest
from pyspark.sql import functions as F

from tamer_spark.operators.classifier import odds_score, odds_train

POS = [(1, "clean prose reads well and flows"), (2, "prose flows with clean structure")]
NEG = [(11, "click here buy now cheap"), (12, "buy cheap click now here now")]


@pytest.fixture(scope="module")
def weights(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    return odds_train(pos, neg).cache()


def test_discriminates_held_out_docs(spark, weights):
    docs = spark.createDataFrame(
        [(100, "clean prose flows"), (200, "buy cheap now")],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.score for r in odds_score(docs, weights).collect()}
    assert s[100] > 0 > s[200], s


def test_reference_words_weigh_positive_crawl_negative(spark, weights):
    w = {r.w: r.weight for r in weights.collect()}
    assert w["prose"] > 0 and w["clean"] > 0
    assert w["cheap"] < 0 and w["buy"] < 0


def test_unseen_words_take_the_floor(spark, weights):
    base = weights.select(F.max("base")).first()[0]
    docs = spark.createDataFrame([(300, "zzz qqq")], "doc_id long, text string")
    s = odds_score(docs, weights).first().score
    assert s == 2 * base


def test_deterministic_and_integer(spark, weights):
    docs = spark.createDataFrame(
        [(i, "clean cheap prose now") for i in range(50)], "doc_id long, text string"
    )
    a = sorted((r.doc_id, r.score) for r in odds_score(docs, weights).collect())
    b = sorted((r.doc_id, r.score) for r in odds_score(docs, weights).collect())
    assert a == b
    assert all(isinstance(s, int) for _, s in a)


def test_weight_table_is_vocab_sized(spark, weights):
    vocab = {w for _, t in POS + NEG for w in t.split()}
    assert weights.count() == len(vocab)
