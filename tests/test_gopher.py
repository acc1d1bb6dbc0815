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


def test_ascii_ellipsis_counts_as_symbol(spark):
    # §A1.1 names '#' OR '...' — each non-overlapping ASCII '...' is one
    # symbol occurrence (ADVICE r4: only '#' and '…' were counted)
    words = CLEAN.split()
    text = " ".join(w + "..." if i % 9 == 0 else w for i, w in enumerate(words))
    r = _one(spark, text)
    assert r.symbol_word_ratio >= 0.1 and r.keep == 0
    # control: same doc without the ellipses passes
    assert _one(spark, CLEAN).keep == 1


def test_gopher_stopword_set_not_generic(spark):
    # plenty of GENERIC stopwords (a, in, is, it, for) but <2 of the paper's
    # 8-word set {the, be, to, of, and, that, have, with} — the keep rule
    # must use the paper's set
    text = (
        "a cat is in a box for fun it seems a dog is in a yard for play "
        "many animals gather around while children watch games unfold "
        "slowly because nothing ever happens quickly around here anyway "
        "a bird is in a tree for rest it sings a song morning comes soon "
        "people walk past without looking up at anything unusual today"
    )
    r = _one(spark, text)
    assert r.n_stopwords >= 2 and r.n_gopher_stopwords < 2
    assert r.keep == 0


def test_top3gram_rule_fires_alone(spark):
    # a 3-gram repeated non-adjacently: top3 coverage = 1.5x top2 coverage,
    # so there is a band where only the 3-gram rule trips
    fillers = ["oak", "elm", "fir", "ash", "yew"]
    inject = " ".join(f"crimson velvet curtain {f}" for f in fillers)
    r = _one(spark, CLEAN + " " + inject)
    assert r.top_3gram_char_frac >= 0.18, r
    assert r.top_bigram_char_frac < 0.20, r
    assert r.keep == 0
    # loosening ONLY the accused rule flips the verdict
    loose = _one(
        spark, CLEAN + " " + inject, top_ngrams=((2, 0.20), (3, 1.1), (4, 0.16))
    )
    assert loose.keep == 1, loose


def test_top4gram_rule_fires_alone(spark):
    # long outer words, short inner words: the 4-gram's char mass is far
    # larger than either embedded 3-gram's, so only the 4-gram rule trips
    fillers = ["oak", "elm"]
    inject = " ".join(f"supercalifragilistic ab cd expialidocious {f}" for f in fillers)
    r = _one(spark, CLEAN + " " + inject)
    assert r.top_4gram_char_frac >= 0.16, r
    assert r.top_3gram_char_frac < 0.18, r
    assert r.top_bigram_char_frac < 0.20, r
    assert r.keep == 0
    loose = _one(
        spark, CLEAN + " " + inject, top_ngrams=((2, 0.20), (3, 0.18), (4, 1.1))
    )
    assert loose.keep == 1, loose


def test_dup5gram_rule_fires_alone(spark):
    # a 5-word phrase repeated twice, non-adjacent: every 6-gram spanning it
    # is unique, so only the 5-gram coverage rule trips
    phrase = "silver hammer strikes golden anvil"
    # enough distinct filler that the repeated phrase's embedded top-4-gram
    # (coverage 50/60 of the dup-5 coverage) stays under ITS threshold
    filler = "meanwhile nothing much happened here"
    text = CLEAN + f" {phrase} interlude {filler} {phrase} finale"
    r = _one(spark, text)
    assert r.dup_5gram_char_frac >= 0.15, r
    assert r.dup_6gram_char_frac == 0.0, r
    assert r.keep == 0
    loose = _one(
        spark,
        text,
        dup_ngrams=((5, 1.1), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10)),
    )
    assert loose.keep == 1, loose


def test_dup10gram_band_fires_only_longest(spark):
    # a repeated 10-word phrase covers the SAME positions for every n<=10,
    # so with coverage in [0.10, 0.11) only the n=10 threshold trips
    phrase = "ten small grey mice ran over nine warm flat stones"  # 41 chars
    pad = " ".join(
        f"pad{c}{d}" for c in "abcdefghijklmnopqrst" for d in "vwxyz"
    )  # 100 distinct 5-char words = 500 chars → coverage 82/794 ≈ 0.103
    text = CLEAN + " " + phrase + " " + pad + " " + phrase
    r = _one(spark, text)
    assert 0.10 <= r.dup_10gram_char_frac < 0.11, r
    assert r.dup_10gram_char_frac == r.dup_5gram_char_frac  # same coverage
    assert r.keep == 0
    loose = _one(
        spark,
        text,
        dup_ngrams=((5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 1.1)),
    )
    assert loose.keep == 1, loose


def test_dup_line_fraction_fires(spark):
    # duplicated SHORT lines: element fraction trips, char fraction does not
    text = CLEAN + "\nok go\nok go\nok go\nok go"
    r = _one(spark, text)
    assert r.n_lines == 5 and r.n_dup_lines == 3
    assert r.dup_line_frac > 0.30 and r.dup_line_char_frac < 0.20
    assert r.keep == 0
    loose = _one(spark, text, max_dup_line_frac=1.1)
    assert loose.keep == 1, loose


def test_dup_line_char_fraction_fires(spark):
    # ONE long duplicated line among several: char fraction trips, element
    # fraction (1/5) does not
    half = " ".join(CLEAN.split()[:28])
    rest = " ".join(CLEAN.split()[28:])
    long_line = (
        "every single word here repeats exactly once more later on and the "
        "repeated span is long enough to dominate character mass"
    )
    text = f"{half}\n{rest}\n{long_line}\nshort tail\n{long_line}"
    r = _one(spark, text)
    assert r.dup_line_char_frac > 0.20 and r.dup_line_frac <= 0.30, r
    assert r.keep == 0
    # a duplicated 20-word line necessarily duplicates its n-grams too, so
    # prove the char-frac rule holds the verdict down with the n-gram dup
    # family disabled, then loosening it flips the verdict
    sub = dict(dup_ngrams=(), top_ngrams=((2, 0.2),))
    assert _one(spark, text, **sub).keep == 0
    assert _one(spark, text, max_dup_line_char_frac=1.1, **sub).keep == 1


def test_dup_paragraph_rules_fire(spark):
    # duplicated paragraphs necessarily duplicate their lines too — prove the
    # paragraph rules hold the verdict down on their own by loosening the
    # line rules first, then loosening the paragraph rules flips it
    para = "repeated paragraph body with several words inside"
    text = f"{CLEAN}\n\n{para}\n\n{para}\n\n{para}"
    r = _one(spark, text)
    assert r.n_paragraphs == 4 and r.n_dup_paragraphs == 2
    assert r.dup_para_frac > 0.30 and r.dup_para_char_frac > 0.20
    assert r.keep == 0
    # the repeated paragraph also repeats its lines and its n-grams —
    # disable those families and show the PARA rules still hold it down
    sub = dict(dup_ngrams=(), top_ngrams=((2, 0.2),))
    line_loose = _one(
        spark, text, max_dup_line_frac=1.1, max_dup_line_char_frac=1.1, **sub
    )
    assert line_loose.keep == 0  # para rules still hold it down
    all_loose = _one(
        spark, text,
        max_dup_line_frac=1.1, max_dup_line_char_frac=1.1,
        max_dup_para_frac=1.1, max_dup_para_char_frac=1.1, **sub,
    )
    assert all_loose.keep == 1, all_loose


def test_ellipsis_line_ratio_fires(spark):
    words = CLEAN.split()
    chunks = [" ".join(words[i:i + 8]) for i in range(0, 56, 8)]  # 7 lines
    text = "\n".join(c + "..." if i < 3 else c for i, c in enumerate(chunks))
    r = _one(spark, text)
    assert r.n_ellipsis_lines == 3 and r.ellipsis_line_ratio > 0.30
    assert r.symbol_word_ratio < 0.1  # only the line rule trips
    assert r.keep == 0
    loose = _one(spark, text, max_ellipsis_line_ratio=1.1)
    assert loose.keep == 1, loose


def test_ellipsis_unicode_variant_counts(spark):
    words = CLEAN.split()
    chunks = [" ".join(words[i:i + 8]) for i in range(0, 56, 8)]
    text = "\n".join(c + "…" if i < 3 else c for i, c in enumerate(chunks))
    r = _one(spark, text)
    assert r.n_ellipsis_lines == 3 and r.keep == 0


def test_bullet_line_ratio_fires(spark):
    words = CLEAN.split()
    chunks = [" ".join(words[i:i + 7]) for i in range(0, 56, 7)]  # 8 lines
    text = "\n".join("- " + c for c in chunks)  # 100% bulleted
    r = _one(spark, text)
    assert r.n_bullet_lines == 8 and r.bullet_line_ratio > 0.90
    assert r.keep == 0
    loose = _one(spark, text, max_bullet_line_ratio=1.1)
    assert loose.keep == 1, loose


def test_r4_subset_mode_drops_columns_and_rules(spark):
    # the round-4 signal subset: same columns as r4, line/dup rules absent
    r = _one(
        spark,
        CLEAN + "\nok go\nok go\nok go\nok go",  # would fail dup_line_frac
        top_ngrams=((2, 0.2),),
        dup_ngrams=(),
        line_signals=False,
    )
    assert "dup_line_frac" not in r.asDict()
    assert "top_3gram_char_frac" not in r.asDict()
    assert r.keep == 1  # line rule not part of the subset verdict


def test_invariants_on_random_corpus(spark):
    """Seeded randomized batch (200 docs, one Spark job): the signal family
    invariants that must hold on ANY input — duplicated-n-gram coverage is
    monotone non-increasing in n (a duplicated (n+1)-gram's constituent
    n-grams are duplicated over the same positions), every fraction lives
    in [0, 1], and keep is exactly the conjunction of its rules recomputed
    from the emitted signals."""
    import random

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "the",
             "to", "of", "and", "-", "x"]
    docs = []
    for i in range(200):
        n = rng.randint(0, 120)
        words = [rng.choice(vocab) for _ in range(n)]
        # inject occasional repeated runs and line/paragraph structure
        if n > 20 and rng.random() < 0.5:
            run = words[: rng.randint(3, 12)]
            words = words + run + words[: rng.randint(0, 5)] + run
        text = " ".join(words)
        if rng.random() < 0.5:
            text = text.replace(" zeta ", "\nzeta ").replace(" eta ", "\n\neta ")
        if rng.random() < 0.3:
            text = text.replace(" gamma ", "... gamma ")
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = gopher_signals(df).collect()
    assert len(rows) == 200
    fracs = [
        "top_bigram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
        "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
        "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac",
        "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac", "ellipsis_line_ratio", "bullet_line_ratio",
        "alpha_word_frac",
    ]
    for r in rows:
        for c in fracs:
            assert 0.0 <= r[c] <= 1.0, (r.doc_id, c, r[c])
        cov = [r[f"dup_{n}gram_char_frac"] for n in range(5, 11)]
        assert all(a >= b for a, b in zip(cov, cov[1:])), (r.doc_id, cov)
        expect = int(
            50 <= r.n_words <= 100_000
            and 3.0 <= r.mean_word_len <= 10.0
            and r.symbol_word_ratio < 0.1
            and r.alpha_word_frac > 0.8
            and r.n_gopher_stopwords >= 2
            and r.top_bigram_char_frac < 0.20
            and r.top_3gram_char_frac < 0.18
            and r.top_4gram_char_frac < 0.16
            and r.dup_5gram_char_frac < 0.15
            and r.dup_6gram_char_frac < 0.14
            and r.dup_7gram_char_frac < 0.13
            and r.dup_8gram_char_frac < 0.12
            and r.dup_9gram_char_frac < 0.11
            and r.dup_10gram_char_frac < 0.10
            and r.dup_line_frac < 0.30
            and r.dup_line_char_frac < 0.20
            and r.dup_para_frac < 0.30
            and r.dup_para_char_frac < 0.20
            and r.ellipsis_line_ratio < 0.30
            and r.bullet_line_ratio < 0.90
        )
        assert r.keep == expect, (r.doc_id, r)


def test_one_row_per_doc_and_empty_doc_safe(spark):
    df = spark.createDataFrame(
        [(1, CLEAN), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_signals(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].n_words == 0 and rows[2].keep == 0
    assert rows[3].mean_word_len == 0.0 and rows[3].top_bigram_char_frac == 0.0
