"""BM25 semantics: saturation, idf ordering, length normalization, exact
parity with an independent pure-Python scorer on a crafted corpus."""

import math

import pytest

from tamer_spark.operators.bm25 import bm25_topk

K1, B = 1.2, 0.75


def _py_bm25(corpus: dict[int, str], terms: list[str], k1=K1, b=B) -> dict[int, float]:
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(w) / avgdl))
        if s > 0:
            out[i] = round(s, 6)
    return out


CORPUS = {
    1: "spark shuffles data across the cluster",
    2: "spark spark spark spark tuning guide",
    3: "a very long document about nothing in particular that mentions spark once "
       "and then rambles on and on about other things entirely for a while",
    4: "broadcast joins avoid the shuffle",
    5: "rare gem of a document",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in CORPUS.items()], "doc_id long, text string"
    )


def _scores(df):
    return {r.doc_id: r.score for r in df.collect()}


def test_matches_independent_python_scorer(spark, docs):
    terms = ["spark", "shuffle", "gem"]
    got = _scores(bm25_topk(docs, terms, k=10))
    assert got == _py_bm25(CORPUS, terms)


def test_rank_is_dense_and_tie_broken_by_id(spark, docs):
    out = bm25_topk(docs, ["spark"], k=10).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    scores = [(r.score, r.doc_id) for r in out]
    assert scores == sorted(scores, key=lambda x: (-x[0], x[1]))


def test_tf_saturation_not_linear(spark, docs):
    # doc 2 has tf=4 for 'spark', doc 1 has tf=1 — the saturated score must
    # be higher but far less than 4x (k1 bounds the tf contribution)
    got = _scores(bm25_topk(docs, ["spark"], k=10))
    assert got[2] > got[1]
    assert got[2] < 4 * got[1]


def test_length_normalization(spark, docs):
    # docs 1 and 3 both contain 'spark' once; 3 is much longer -> lower score
    got = _scores(bm25_topk(docs, ["spark"], k=10))
    assert got[3] < got[1]


def test_rare_term_outscores_common(spark, docs):
    # 'gem' (df=1) in doc 5 outweighs 'spark' (df=3) at tf=1 in doc 1
    got = _scores(bm25_topk(docs, ["spark", "gem"], k=10))
    assert got[5] > got[1]


def test_topk_truncates(spark, docs):
    assert bm25_topk(docs, ["spark"], k=2).count() == 2


def test_empty_terms_rejected(spark, docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
