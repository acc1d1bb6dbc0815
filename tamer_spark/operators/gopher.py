"""Gopher-style document quality rules — the FULL §A1.1 set — as one
distributed DataFrame pass.

Implements the repetition + composition filters of Rae et al., "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher"
(arXiv 2112.11446, §A1.1 — public literature):

- word-count bounds, mean word length bounds, symbol-to-word ratio
  (counting '#', the Unicode ellipsis '…', AND the ASCII '...' the paper
  names), alphabetic-word fraction, and the paper's "must contain at least
  2 of {the, be, to, of, and, that, have, with}" stop-word rule (the
  generic distinct-stopword count over functions/text.py STOPWORDS is
  still reported alongside);
- the most-frequent-{2,3,4}-gram character fractions (thresholds
  0.20/0.18/0.16) and the duplicated-{5..10}-gram character fractions
  (0.15/0.14/0.13/0.12/0.11/0.10);
- line/paragraph repetition and composition: duplicate-line and
  duplicate-paragraph fractions (0.30) and character fractions (0.20),
  the fraction of lines ending in an ellipsis (0.30), and the fraction of
  lines starting with a bullet (0.90).

These are the standard pre-LM curation gates between cheap per-doc stats
(functions/text.py) and expensive model-based scoring (operators/lm.py).

Definitions are pinned EXACTLY (the repo's cross-engine determinism
convention) rather than paraphrased from the paper where the paper is
loose; in particular:

- top-n-gram char fraction = top_count * (len(top_gram) - (n-1)) /
  total_chars — the characters covered by every occurrence of the doc's
  most frequent word n-gram (spaces excluded; total_chars counts word
  chars only), champion chosen by (count DESC, gram ASC) — a total order,
  so the selection cannot drift between engines;
- dup-n-gram char fraction = (word chars at word positions covered by ANY
  occurrence of an n-gram whose in-doc count is >= 2, overlaps counted
  once) / total_chars — the character-mask definition, realized as a
  distinct-(doc, word-index) set rather than a per-doc mask array;
- lines = the raw (un-normalized, case-preserved) text split on '\\n',
  each trimmed of spaces, empties dropped; paragraphs = the same split on
  '\\n\\n'. duplicate elements/chars follow the occurrences-beyond-first
  convention: n - distinct(n) elements, sum(len) - sum(len over distinct)
  chars; char fractions divide by the total chars of the kept
  lines/paragraphs (pinned — the paper does not say which denominator);
- every keep rule is strict ('signal < threshold' keeps, '>= ' drops),
  matching the round-4 convention for the top-bigram rule; bound rules
  (word count, mean word length) are inclusive as in round 4;
- all ratios are IEEE divisions of exact integers.

Shuffle profile at 100 TB: every composition signal and ALL line/paragraph
signals are map-only over staged arrays (scan-bound, codegen — duplicate
detection within a document is size(arr) - size(array_distinct(arr)), no
explode). The n-gram repetition family shuffles once on (doc_id, n, gram)
with map-side partial counts — rows ≈ |enabled n| × words per doc, payload
≈ the text itself — then the champion window re-uses the same key and the
dup-coverage leg re-shuffles the bounded (doc_id, n, word_index) set. No
driver-side state of any kind; per-doc cost is linear in document length
for every signal (never the O(words²) per-row-HOF formulation).

No analog in the reference engine (tamer has no text operators); part of
the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tamer_spark.functions.text import STOPWORDS
from tamer_spark.operators.dedup import normalize_text

__all__ = ["gopher_signals", "STOP_GOPHER", "TOP_NGRAMS_DEFAULT", "DUP_NGRAMS_DEFAULT"]

# Gopher §A1.1: "contains at least two of the following English words"
STOP_GOPHER = ["the", "be", "to", "of", "and", "that", "have", "with"]

# (n, keep-threshold) pairs, §A1.1 table values
TOP_NGRAMS_DEFAULT = ((2, 0.20), (3, 0.18), (4, 0.16))
DUP_NGRAMS_DEFAULT = ((5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10))

_BULLETS = ("•", "-", "*")


def _arr_chars(col):
    """Exact character count of a string array (spaces excluded)."""
    return F.aggregate(col, F.lit(0).cast("long"), lambda a, x: a + F.length(x))


def _frac(num, den):
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def _top_col(n: int) -> str:
    return "top_bigram_char_frac" if n == 2 else f"top_{n}gram_char_frac"


def gopher_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    top_ngrams: tuple = TOP_NGRAMS_DEFAULT,
    dup_ngrams: tuple = DUP_NGRAMS_DEFAULT,
    line_signals: bool = True,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_ellipsis_line_ratio: float = 0.30,
    max_bullet_line_ratio: float = 0.90,
) -> DataFrame:
    """Per-document Gopher §A1.1 quality signals + the combined ``keep``.

    One row per input document. Always returns (doc_id, n_words,
    mean_word_len, symbol_word_ratio, alpha_word_frac, n_stopwords,
    n_gopher_stopwords); each ``(n, thr)`` in ``top_ngrams`` adds a
    ``top_{n}gram_char_frac`` column (n=2 keeps the historical name
    ``top_bigram_char_frac``), each in ``dup_ngrams`` adds
    ``dup_{n}gram_char_frac``, and ``line_signals=True`` adds the
    line/paragraph family (counts + ratios). ``keep`` = 1 iff every
    ENABLED rule passes (thresholds default to the paper's values); the
    stop-word rule uses the paper's 8-word set (``n_gopher_stopwords >=
    min_stopwords``). Disabling a signal family removes both its columns
    and its keep terms (the round-4 subset is ``top_ngrams=((2, 0.2),),
    dup_ngrams=(), line_signals=False``).
    """
    raw = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_raw"))
    base = raw.select("doc_id", "_raw", normalize_text(F.col("_raw")).alias("_t"))
    # staged word array: multiply-referenced, so CollapseProject keeps it
    # materialized (the dedup.py inlining-trap discipline)
    ws = base.select(
        "doc_id",
        "_raw",
        "_t",
        F.filter(F.split(F.col("_t"), " "), lambda x: F.length(x) > 0).alias("_ws"),
    )

    def occurrences(sym: str):
        removed = F.length(F.col("_t")) - F.length(
            F.replace(F.col("_t"), F.lit(sym), F.lit(""))
        )
        return removed / len(sym) if len(sym) > 1 else removed

    # §A1.1 symbols: '#' or '...' — the Unicode ellipsis counts too (ADVICE
    # r4: the ASCII form was missing; each non-overlapping '...' is ONE symbol)
    symbols = occurrences("#") + occurrences("…") + occurrences("...")

    line_cols = []
    if line_signals:
        from tamer_spark.functions.text import trim_nonempty

        lines = trim_nonempty(F.split(F.col("_raw"), "\n"))
        paras = trim_nonempty(F.split(F.col("_raw"), "\n\n"))
        is_ellipsis = lambda x: x.endswith("...") | x.endswith("…")  # noqa: E731
        is_bullet = lambda x: reduce_or([x.startswith(b) for b in _BULLETS])
        line_cols = [
            F.size(lines).cast("long").alias("n_lines"),
            F.size(paras).cast("long").alias("n_paragraphs"),
            (F.size(lines) - F.size(F.array_distinct(lines))).cast("long").alias("n_dup_lines"),
            (F.size(paras) - F.size(F.array_distinct(paras))).cast("long").alias("n_dup_paragraphs"),
            (_arr_chars(lines) - _arr_chars(F.array_distinct(lines))).alias("dup_line_chars"),
            (_arr_chars(paras) - _arr_chars(F.array_distinct(paras))).alias("dup_para_chars"),
            F.size(F.filter(lines, is_ellipsis)).cast("long").alias("n_ellipsis_lines"),
            F.size(F.filter(lines, is_bullet)).cast("long").alias("n_bullet_lines"),
            _arr_chars(lines).alias("_line_chars"),
            _arr_chars(paras).alias("_para_chars"),
        ]

    sig = ws.select(
        "doc_id",
        "_ws",
        F.size("_ws").cast("long").alias("n_words"),
        _arr_chars(F.col("_ws")).alias("total_chars"),
        symbols.cast("long").alias("_symbols"),
        F.size(
            F.array_intersect("_ws", F.array(*[F.lit(w) for w in STOPWORDS]))
        ).cast("long").alias("n_stopwords"),
        F.size(
            F.array_intersect("_ws", F.array(*[F.lit(w) for w in STOP_GOPHER]))
        ).cast("long").alias("n_gopher_stopwords"),
        *line_cols,
    ).select(
        "*",
        _frac(F.col("total_chars"), F.col("n_words")).alias("mean_word_len"),
        _frac(F.col("_symbols"), F.col("n_words")).alias("symbol_word_ratio"),
    )
    # alpha fraction needs _ws again — separate select so the staged array
    # is still a plain reference (CollapseProject discipline as above)
    sig = sig.withColumn(
        "alpha_word_frac",
        F.when(
            F.col("n_words") > 0,
            F.size(F.filter("_ws", lambda x: x.rlike("[a-z]"))) / F.col("n_words"),
        ).otherwise(F.lit(0.0)),
    )

    # ---- n-gram repetition family: ONE (doc_id, n, gram) shuffle for all
    # enabled n, champion window + dup-coverage legs share the counts ----
    ns_top = [n for n, _ in top_ngrams]
    ns_dup = [n for n, _ in dup_ngrams]
    all_ns = sorted(set(ns_top) | set(ns_dup))
    out = sig
    if all_ns:
        wn = sig.select(
            "doc_id", "_ws", F.explode(F.array(*[F.lit(n) for n in all_ns])).alias("n")
        )
        # grams with their 0-based start position; a doc shorter than n
        # contributes none. slice is 1-based, length n.
        grams = wn.select(
            "doc_id",
            "n",
            F.when(
                F.size("_ws") >= F.col("n"),
                F.transform(
                    F.sequence(F.lit(0), F.size("_ws") - F.col("n")),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(
                            F.slice(F.col("_ws"), i + 1, F.col("n")), " "
                        ).alias("g"),
                    ),
                ),
            )
            .otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
            .alias("_gs"),
        )
        occ = grams.select(
            "doc_id", "n", F.explode("_gs").alias("s")
        ).select("doc_id", "n", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
        # ONE shuffle of the gram stream: counts for every n, plus the
        # occurrence-position lists (dup ns only — the conditional collect
        # keeps top-only ns payload-free) so the dup-coverage leg never
        # re-explodes or re-shuffles the 9x-text occurrence stream
        cnts = occ.groupBy("doc_id", "n", "g").agg(
            F.count(F.lit(1)).alias("c"),
            F.collect_list(
                F.when(F.col("n").isin(ns_dup) if ns_dup else F.lit(False), F.col("pos"))
            ).alias("ps"),
        )
        if ns_top:
            w = Window.partitionBy("doc_id", "n").orderBy(F.col("c").desc(), "g")
            top = (
                cnts.filter(F.col("n").isin(ns_top))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(
                    "doc_id",
                    "n",
                    (F.col("c") * (F.length("g") - (F.col("n") - 1)))
                    .cast("long")
                    .alias("topchars"),
                )
            )
            topw = top.groupBy("doc_id").agg(
                *[
                    F.max(F.when(F.col("n") == n, F.col("topchars"))).alias(f"_top{n}")
                    for n in ns_top
                ]
            )
            out = out.join(topw, "doc_id", "left")
        if ns_dup:
            # word positions covered by any duplicated n-gram, overlaps
            # counted once (the character-mask definition, set form) —
            # re-derived from the carried position lists, grams-side
            # cardinality (already grouped), never the raw occurrence stream
            cov = (
                cnts.filter(F.col("n").isin(ns_dup) & (F.col("c") >= 2))
                .select("doc_id", "n", F.explode("ps").alias("pos"))
                .select(
                    "doc_id",
                    "n",
                    F.explode(
                        F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
                    ).alias("widx"),
                )
                .distinct()
            )
            wl = sig.select(
                "doc_id", F.posexplode("_ws").alias("widx", "_w")
            ).select("doc_id", "widx", F.length("_w").cast("long").alias("wlen"))
            covc = cov.join(wl, ["doc_id", "widx"]).groupBy("doc_id", "n").agg(
                F.sum("wlen").alias("cov")
            )
            covw = covc.groupBy("doc_id").agg(
                *[
                    F.max(F.when(F.col("n") == n, F.col("cov"))).alias(f"_cov{n}")
                    for n in ns_dup
                ]
            )
            out = out.join(covw, "doc_id", "left")
    for n in ns_top:
        out = out.withColumn(
            _top_col(n),
            _frac(F.coalesce(F.col(f"_top{n}"), F.lit(0)), F.col("total_chars")),
        )
    for n in ns_dup:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            _frac(F.coalesce(F.col(f"_cov{n}"), F.lit(0)), F.col("total_chars")),
        )

    rules = [
        F.col("n_words").between(min_words, max_words),
        F.col("mean_word_len") >= min_mean_word_len,
        F.col("mean_word_len") <= max_mean_word_len,
        F.col("symbol_word_ratio") < max_symbol_ratio,
        F.col("alpha_word_frac") > min_alpha_frac,
        F.col("n_gopher_stopwords") >= min_stopwords,
        *[F.col(_top_col(n)) < thr for n, thr in top_ngrams],
        *[F.col(f"dup_{n}gram_char_frac") < thr for n, thr in dup_ngrams],
    ]
    ratio_cols = []
    if line_signals:
        ratio_cols = [
            _frac(F.col("n_dup_lines"), F.col("n_lines")).alias("dup_line_frac"),
            _frac(F.col("dup_line_chars"), F.col("_line_chars")).alias("dup_line_char_frac"),
            _frac(F.col("n_dup_paragraphs"), F.col("n_paragraphs")).alias("dup_para_frac"),
            _frac(F.col("dup_para_chars"), F.col("_para_chars")).alias("dup_para_char_frac"),
            _frac(F.col("n_ellipsis_lines"), F.col("n_lines")).alias("ellipsis_line_ratio"),
            _frac(F.col("n_bullet_lines"), F.col("n_lines")).alias("bullet_line_ratio"),
        ]
    out = out.select("*", *ratio_cols)
    if line_signals:
        rules += [
            F.col("dup_line_frac") < max_dup_line_frac,
            F.col("dup_line_char_frac") < max_dup_line_char_frac,
            F.col("dup_para_frac") < max_dup_para_frac,
            F.col("dup_para_char_frac") < max_dup_para_char_frac,
            F.col("ellipsis_line_ratio") < max_ellipsis_line_ratio,
            F.col("bullet_line_ratio") < max_bullet_line_ratio,
        ]
    keep = rules[0]
    for r in rules[1:]:
        keep = keep & r
    out = out.withColumn("keep", keep.cast("long"))

    cols = [
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "alpha_word_frac",
        "n_stopwords",
        "n_gopher_stopwords",
        *[_top_col(n) for n in ns_top],
        *[f"dup_{n}gram_char_frac" for n in ns_dup],
    ]
    if line_signals:
        cols += [
            "n_lines",
            "n_paragraphs",
            "n_dup_lines",
            "n_dup_paragraphs",
            "dup_line_chars",
            "dup_para_chars",
            "n_ellipsis_lines",
            "n_bullet_lines",
            "dup_line_frac",
            "dup_line_char_frac",
            "dup_para_frac",
            "dup_para_char_frac",
            "ellipsis_line_ratio",
            "bullet_line_ratio",
        ]
    return out.select(*cols, "keep")


def reduce_or(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out
