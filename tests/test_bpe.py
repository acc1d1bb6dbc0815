"""BPE tokenizer: merge learning on known corpora, lossless detokenization,
determinism across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.functions.bpe import END, apply_bpe, learn_merges, train_bpe
from tests.conftest import SF_DIR


def test_learn_merges_prefers_frequent_pairs():
    # "low" x5, "lower" x2: ('l','o') and ('o','w') both appear 7 times;
    # lexicographic tie-break picks ('l','o') first, then ('lo','w')
    merges = learn_merges([("low", 5), ("lower", 2)], n_merges=2)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")


def test_apply_roundtrips_text(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    merges = train_bpe(docs, n_merges=50)
    toks = apply_bpe(docs, merges)
    joined = toks.join(docs.select("doc_id", "text"), "doc_id")
    for r in joined.collect():
        from tamer_spark.functions.bpe import END as _END

        detok = "".join(r.tokens).replace(_END, " ").strip()
        norm = " ".join(r.text.lower().split())
        assert detok == norm, f"doc {r.doc_id} not lossless"


def test_train_deterministic_across_partitioning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    m1 = train_bpe(docs.repartition(1), n_merges=30)
    m2 = train_bpe(docs.repartition(13), n_merges=30)
    assert m1 == m2


def test_tokens_shrink_with_merges(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    n0 = apply_bpe(docs, train_bpe(docs, n_merges=0)).agg(F.sum("n_tokens")).collect()[0][0]
    n200 = apply_bpe(docs, train_bpe(docs, n_merges=200)).agg(F.sum("n_tokens")).collect()[0][0]
    assert n200 < n0  # merges compress the token stream
