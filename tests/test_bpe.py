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


def test_max_vocab_identical_when_not_binding(spark):
    """The driver-memory bound: train_bpe collects only the top-max_vocab
    words. A cap at/above the true vocabulary must not change the learned
    merges (the truncation is exact, not approximate)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    from tamer_spark.functions.bpe import word_frequencies

    vocab_n = word_frequencies(docs).count()
    assert vocab_n < (1 << 16), "fixture outgrew the default cap; adjust test"
    assert train_bpe(docs, n_merges=30, max_vocab=1 << 20) == train_bpe(docs, n_merges=30)


def test_max_vocab_binding_cap_stays_deterministic(spark):
    """A BINDING cap still learns a full merge table, deterministically
    under any partitioning — (freq DESC, word) is a total order, so the
    distributed top-K retains the same words every run."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    m1 = train_bpe(docs, n_merges=10, max_vocab=50)
    m2 = train_bpe(docs.repartition(7), n_merges=10, max_vocab=50)
    assert m1 == m2
    assert len(m1) == 10


def test_gate_merges_equal_independent_replace_all():
    """The chunk_documents 'bpe' gate rests on this: for the fixed
    non-interacting merge table, greedy rank-priority encoding equals
    independent replace-all (what the DuckDB oracle computes)."""
    from tamer_spark.functions.bpe import GATE_MERGES, _encoder

    enc = _encoder(GATE_MERGES)
    for word, want in [
        ("the", ("th", "e</w>")),
        ("thin", ("th", "in", END)),
        ("tthe", ("t", "th", "e</w>")),
        ("ththt", ("th", "th", "t", END)),
        ("inine", ("in", "in", "e</w>")),
        ("e", ("e</w>",)),
        ("x", ("x", END)),
    ]:
        assert enc(word) == want, (word, enc(word))


def test_tokens_shrink_with_merges(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    n0 = apply_bpe(docs, train_bpe(docs, n_merges=0)).agg(F.sum("n_tokens")).collect()[0][0]
    n200 = apply_bpe(docs, train_bpe(docs, n_merges=200)).agg(F.sum("n_tokens")).collect()[0][0]
    assert n200 < n0  # merges compress the token stream
