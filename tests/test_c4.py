"""C4 cleaning rules (Raffel et al. 2020 §2.2): each line/document rule
fires on a crafted violator, and the cross-document span dedup keeps
exactly the global first occurrence."""

from __future__ import annotations

from tamer_spark.operators.c4 import c4_line_filter, c4_span_dedup

GOOD = "This line has plenty of words and ends properly."


def _lines(spark, *texts, **kw):
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in c4_line_filter(df, **kw).collect()}


def _spans(spark, *texts, **kw):
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in c4_span_dedup(df, **kw).collect()}


def test_clean_doc_passes_line_filter(spark):
    r = _lines(spark, "\n".join([GOOD] * 5))[1]
    assert r.n_lines == 5 and r.n_lines_kept == 5
    assert r.n_sentences == 5 and r.keep == 1
    assert r.text_clean == "\n".join([GOOD] * 5)


def test_line_without_terminal_punctuation_dropped(spark):
    r = _lines(spark, "\n".join([GOOD] * 5 + ["no terminal punctuation here"]))[1]
    assert r.n_lines == 6 and r.n_lines_kept == 5 and r.keep == 1


def test_terminal_quote_and_bang_and_question_kept(spark):
    text = 'He said "stop right there!"\nIs that really so?\nYes it surely is!\n' + "\n".join([GOOD] * 2)
    r = _lines(spark, text)[1]
    assert r.n_lines_kept == 5, r


def test_short_line_dropped(spark):
    r = _lines(spark, "\n".join([GOOD] * 5 + ["Too short."]))[1]
    assert r.n_lines_kept == 5  # "Too short." has 2 words < 3


def test_javascript_line_dropped(spark):
    r = _lines(spark, "\n".join([GOOD] * 5 + ["Please enable JavaScript to continue."]))[1]
    assert r.n_lines_kept == 5


def test_too_few_sentences_fails_doc(spark):
    r = _lines(spark, "\n".join([GOOD] * 4))[1]
    assert r.n_sentences == 4 and r.keep == 0


def test_lorem_ipsum_and_brace_fail_doc(spark):
    rs = _lines(
        spark,
        "\n".join([GOOD] * 5) + "\nSome Lorem Ipsum filler stays here today.",
        "\n".join([GOOD] * 5) + "\nfunction() { return here with words. }",
    )
    # both docs keep >= 5 clean sentences but die on the page-level markers
    assert rs[1].n_sentences >= 5 and rs[1].keep == 0
    assert rs[2].n_sentences >= 5 and rs[2].keep == 0


def test_badwords_parameter_fails_doc(spark):
    text = "\n".join([GOOD] * 5)
    assert _lines(spark, text)[1].keep == 1
    assert _lines(spark, text, badwords=("plenty",))[1].keep == 0


def test_span_dedup_keeps_global_first(spark):
    shared = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    rs = _spans(
        spark,
        shared + " unique one closes here.",
        shared + " different two closes here.",
    )
    # doc 1 (smaller id) keeps everything; doc 2 loses the 3-sentence span
    assert rs[1].n_dropped == 0 and rs[1].n_sentences == 4
    assert rs[2].n_dropped == 3 and rs[2].n_sentences == 4
    assert rs[2].text_dedup == "different two closes here"
    assert rs[1].text_dedup.startswith("alpha beta gamma. delta epsilon zeta")


def test_span_dedup_within_document(spark):
    # the same 3-sentence run twice INSIDE one document: the second
    # occurrence (larger start index) is removed
    text = (
        "one alpha here. two beta here. three gamma here. filler in the middle. "
        "one alpha here. two beta here. three gamma here. closing words now."
    )
    r = _spans(spark, text)[1]
    assert r.n_sentences == 8 and r.n_dropped == 3
    assert r.text_dedup == (
        "one alpha here. two beta here. three gamma here. "
        "filler in the middle. closing words now"
    )


def test_short_docs_pass_through(spark):
    rs = _spans(spark, "only two sentences. right here.", "")
    assert rs[1].n_dropped == 0 and rs[1].text_dedup == "only two sentences. right here"
    assert rs[2].n_sentences == 0 and rs[2].text_dedup == ""


def test_span_dedup_is_idempotent(spark):
    shared = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    texts = [
        shared + " unique one closes here.",
        shared + " different two closes here.",
        "totally unrelated text. with its own sentences. three of them here.",
    ]
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = c4_span_dedup(df)
    twice = c4_span_dedup(
        once.select("doc_id", once.text_dedup.alias("text"))
    )
    a = {(r.doc_id, r.text_dedup) for r in once.collect()}
    b = {(r.doc_id, r.text_dedup) for r in twice.collect()}
    assert a == b
    assert all(r.n_dropped == 0 for r in twice.collect())


def test_dedup_lines_in_doc_keep_first(spark):
    from tamer_spark.operators.dedup import dedup_lines_in_doc

    text = "banner here\nreal content one\nbanner here\nreal content two\n  banner here  \nend"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = dedup_lines_in_doc(df).collect()[0]
    # the padded third copy trims to the same value and is dropped too
    assert r.n_lines == 6 and r.n_dropped == 2
    assert r.text_clean == "banner here\nreal content one\nreal content two\nend"


def test_dedup_lines_in_doc_is_idempotent_and_order_preserving(spark):
    from tamer_spark.operators.dedup import dedup_lines_in_doc

    import random

    rng = random.Random(3)
    pool = ["alpha", "beta", "gamma", "delta", "alpha", "beta"]
    docs = [
        (i, "\n".join(rng.choice(pool) for _ in range(rng.randint(0, 12))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = dedup_lines_in_doc(df)
    twice = dedup_lines_in_doc(once.select("doc_id", once.text_clean.alias("text")))
    assert all(r.n_dropped == 0 for r in twice.collect())
    a = {r.doc_id: r.text_clean for r in once.collect()}
    b = {r.doc_id: r.text_clean for r in twice.collect()}
    assert a == b
    # order preservation: survivors appear in first-occurrence order
    for i, text in docs:
        lines = [x.strip() for x in text.split("\n") if x.strip()]
        seen, expect = set(), []
        for x in lines:
            if x not in seen:
                seen.add(x)
                expect.append(x)
        assert a[i] == "\n".join(expect), (i, text)


def test_span_dedup_idempotent_on_random_corpus(spark):
    """Seeded randomized batch: on ANY corpus, a second span-dedup pass over
    the first pass's output finds nothing to drop (the survivors contain at
    most one occurrence of every 3-sentence span), and sentence accounting
    balances (0 <= n_dropped <= n_sentences)."""
    import random

    rng = random.Random(7)
    vocab = ["red", "blue", "green", "tall", "wide", "fast", "slow"]
    shared_sents = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 5))) for _ in range(10)
    ]
    docs = []
    for i in range(120):
        k = rng.randint(0, 8)
        sents = [rng.choice(shared_sents) for _ in range(k)]
        if rng.random() < 0.3:
            sents += sents[: rng.randint(0, len(sents))]
        docs.append((i, ". ".join(sents) + ("." if sents else "")))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = c4_span_dedup(df)
    rows1 = once.collect()
    for r in rows1:
        assert 0 <= r.n_dropped <= r.n_sentences, r
    twice = c4_span_dedup(once.select("doc_id", once.text_dedup.alias("text")))
    assert all(r.n_dropped == 0 for r in twice.collect())


def test_overlapping_duplicate_spans_drop_union_of_positions(spark):
    # doc 2 repeats FOUR consecutive sentences of doc 1 → two overlapping
    # duplicated 3-spans; the drop set is the union (all 4 sentences), not 6
    run = "s one here. s two here. s three here. s four here."
    rs = _spans(spark, run + " doc one tail closes.", run + " doc two tail closes.")
    assert rs[2].n_dropped == 4
    assert rs[2].text_dedup == "doc two tail closes"
