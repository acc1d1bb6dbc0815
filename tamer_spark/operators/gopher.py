"""Gopher-style document quality rules as one distributed DataFrame pass.

Implements the repetition + composition filters of Rae et al., "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher"
(arXiv 2112.11446, §A1.1 — public literature): word-count bounds, mean
word length bounds, symbol-to-word ratio, alphabetic-word fraction,
minimum distinct stopwords, and a most-frequent-2-gram repetition signal.
These are the standard pre-LM curation gates between cheap per-doc stats
(functions/text.py) and expensive model-based scoring (operators/lm.py).

Definitions are pinned EXACTLY (the repo's cross-engine determinism
convention) rather than paraphrased from the paper where the paper is
loose; in particular the repetition signal here is

    top_bigram_char_frac = top_count * (len(top_bigram) - 1) / total_chars

— the characters covered by every occurrence of the doc's most frequent
word 2-gram (space excluded; total_chars counts word chars only), with the
top 2-gram chosen by (count DESC, bigram ASC) — a total order, so the
selection cannot drift between engines. All ratios are IEEE divisions of
exact integers.

Shuffle profile at 100 TB: every signal except the repetition term is
map-only over the staged word array (scan-bound, codegen). The repetition
term shuffles (doc_id, bigram) with map-side partial counts — rows =
per-doc distinct bigrams, payload ≈ the text itself — then one row_number
window per doc on the SAME doc_id key, so the exchange is reused. No
driver-side state of any kind.

No analog in the reference engine (tamer has no text operators); part of
the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tamer_spark.functions.text import STOPWORDS
from tamer_spark.operators.dedup import normalize_text

__all__ = ["gopher_signals"]


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
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Per-document Gopher quality signals + the combined ``keep`` verdict.

    Returns (doc_id, n_words, mean_word_len, symbol_word_ratio,
    alpha_word_frac, n_stopwords, top_bigram_char_frac, keep) — one row per
    input document, ``keep`` = 1 iff every rule passes (thresholds default
    to the paper's §A1.1 values).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("_t")
    )
    # staged word array: multiply-referenced, so CollapseProject keeps it
    # materialized (the dedup.py inlining-trap discipline)
    ws = base.select(
        "doc_id",
        "_t",
        F.filter(F.split(F.col("_t"), " "), lambda x: F.length(x) > 0).alias("_ws"),
    )
    symbols = (
        F.length(F.col("_t")) - F.length(F.replace(F.col("_t"), F.lit("#"), F.lit("")))
    ) + (
        F.length(F.col("_t")) - F.length(F.replace(F.col("_t"), F.lit("…"), F.lit("")))
    )
    sig = ws.select(
        "doc_id",
        "_ws",
        F.size("_ws").cast("long").alias("n_words"),
        F.aggregate("_ws", F.lit(0).cast("long"), lambda a, x: a + F.length(x)).alias(
            "total_chars"
        ),
        symbols.cast("long").alias("_symbols"),
    ).select(
        "doc_id",
        "_ws",
        "n_words",
        "total_chars",
        F.when(F.col("n_words") > 0, F.col("total_chars") / F.col("n_words"))
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(F.col("n_words") > 0, F.col("_symbols") / F.col("n_words"))
        .otherwise(F.lit(0.0))
        .alias("symbol_word_ratio"),
        F.when(
            F.col("n_words") > 0,
            F.size(F.filter("_ws", lambda x: x.rlike("[a-z]"))) / F.col("n_words"),
        )
        .otherwise(F.lit(0.0))
        .alias("alpha_word_frac"),
        F.size(
            F.array_intersect("_ws", F.array(*[F.lit(w) for w in STOPWORDS]))
        ).cast("long").alias("n_stopwords"),
    )
    # repetition term: per-doc bigram counts (the staged-array + _outer
    # discipline from operators/lm.py — no inferred-filter re-inlining),
    # then the (count DESC, bigram ASC) champion per doc
    bgs = sig.select(
        "doc_id",
        F.when(
            F.size("_ws") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("_ws") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("_ws"), i), F.element_at(F.col("_ws"), i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_bgs"),
    )
    cnts = (
        bgs.select("doc_id", F.explode_outer("_bgs").alias("bg"))
        .filter(F.col("bg").isNotNull())
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "bg")
    top = (
        cnts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("bg").alias("_top_bg"), F.col("c").alias("_top_c"))
    )
    out = (
        sig.join(top, "doc_id", "left")
        .withColumn(
            "top_bigram_char_frac",
            F.when(
                F.col("_top_c").isNotNull() & (F.col("total_chars") > 0),
                (F.col("_top_c") * (F.length("_top_bg") - 1)) / F.col("total_chars"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "keep",
            (
                F.col("n_words").between(min_words, max_words)
                & (F.col("mean_word_len") >= min_mean_word_len)
                & (F.col("mean_word_len") <= max_mean_word_len)
                & (F.col("symbol_word_ratio") < max_symbol_ratio)
                & (F.col("alpha_word_frac") > min_alpha_frac)
                & (F.col("n_stopwords") >= min_stopwords)
                & (F.col("top_bigram_char_frac") < max_top_bigram_frac)
            ).cast("long"),
        )
    )
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "alpha_word_frac",
        "n_stopwords",
        "top_bigram_char_frac",
        "keep",
    )
