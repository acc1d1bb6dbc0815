"""Gopher quality rules: each rule fires on a crafted violating document
and the combined keep verdict composes them."""

from __future__ import annotations

from tamer_spark.operators.gopher import gopher_signals

CLEAN = (
    "the quick brown fox jumps over a lazy dog while many other animals "
    "watch from the tall grass and wonder what it means for them today "
    "because every one of them has seen this same game play out before "
    "and it never ends well for anyone involved in that kind of chase"
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_signals(df, **kw).collect()[0]


def test_clean_doc_passes(spark):
    r = _one(spark, CLEAN)
    assert r.keep == 1, r
    assert r.alpha_word_frac == 1.0 and r.symbol_word_ratio == 0.0
    assert r.n_stopwords >= 2


def test_short_doc_fails_word_floor(spark):
    r = _one(spark, "the cat sat on a mat")
    assert r.keep == 0 and r.n_words == 6


def test_repetition_fails_top_bigram_rule(spark):
    # one bigram dominates: "buy now buy now ..." — the repetition signal
    # is exactly what Gopher's dup-n-gram family exists to catch
    r = _one(spark, "the stuff is here for it " + "buy now " * 40)
    assert r.top_bigram_char_frac > 0.2
    assert r.keep == 0


def test_symbol_ratio_fails(spark):
    r = _one(spark, CLEAN + " " + "# " * 20)
    assert r.symbol_word_ratio >= 0.1 and r.keep == 0


def test_stopword_floor_fails(spark):
    # long alphabetic doc with no stopwords at all
    r = _one(spark, "lorem ipsum dolor amet consectetur adipiscing elit sed " * 8)
    assert r.n_stopwords < 2 and r.keep == 0


def test_one_row_per_doc_and_empty_doc_safe(spark):
    df = spark.createDataFrame(
        [(1, CLEAN), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_signals(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].n_words == 0 and rows[2].keep == 0
    assert rows[3].mean_word_len == 0.0 and rows[3].top_bigram_char_frac == 0.0
