"""Distributed n-gram language-model quality scoring (CCNet-style).

The standard pretraining-curation signal after cheap per-document stats: train
a statistical LM on (a reference slice of) the corpus, score every document by
how predictable its text is under that model, and filter/bucket on the score
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data", LREC 2020 — public literature; production CCNet uses a KenLM
5-gram, this module implements the same shape with a bigram model whose
training AND scoring are both distributed DataFrame plans).

Everything stays in exact integer arithmetic (the repo's cross-engine
determinism convention): the per-bigram score is the add-one-smoothed
conditional probability scaled to parts-per-``scale`` and floored —

    p_scaled(w2 | w1) = (scale * (c(w1 w2) + 1)) div (c(w1) + V)

— an int64, so the per-document sum is order-independent and bit-identical on
any engine/partitioning. A log-space score (true log-likelihood) would hinge
on last-ulp ``ln`` agreement between libm implementations; linear space keeps
the gate exact, and the MONOTONE ranking of documents — all filtering uses —
is preserved for any fixed document length.

Shuffle profile (docs/SCALING.md):
* unigram + bigram count tables: explode → partial-agg — shuffle rows =
  distinct types (Zipf-bounded vocabulary), not corpus tokens;
* scoring: the exploded bigram stream joins the two count tables; Catalyst/
  AQE broadcasts them when the vocabulary fits (the common case — even a
  100 TB web corpus has a few hundred million bigram types after min-count
  pruning), else falls back to a hash join keyed by the bigram string;
* final per-doc reduce: one partial-aggregated groupBy(doc_id).

No analog in the reference engine (tamer has no text operators); part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tamer_spark.operators.dedup import normalize_text

__all__ = ["bigram_counts", "bigram_lm_score"]


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, bg) — one row per bigram INSTANCE, bigrams built row-locally
    (the staged-array pattern: no exploded self-join, no O(words²)
    re-inlining; docs with fewer than 2 words contribute nothing)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_ws"),
    )
    # when-guard is load-bearing: sequence(1, size-1) for a 1-word doc is
    # sequence(1, 0) == DESCENDING [1, 0], whose transform would read
    # element_at(ws, 2) out of bounds; CaseWhen evaluates lazily, so the
    # sequence never runs for short docs
    bgs = words.select(
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
    # plain explode drops empty arrays on its own; an explicit size filter
    # would only re-inline the bigram transform on predicate pushdown
    return bgs.select("doc_id", F.explode("_bgs").alias("bg"))


def bigram_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model: returns ``(bigram_lm, unigram_counts, vocab)`` —
    (bg, c2), (w, c1), and a 1-row (V) table. All three are count aggregates
    with map-side combine; the vocabulary size is folded into the plan as a
    1-row cross join at score time (never a driver-side ``count()``)."""
    bg = _doc_bigrams(docs, text_col, id_col)
    lm = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    uni = (
        docs.select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("V"))
    return lm, uni, vocab


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Score every document under the (self- or externally-) trained bigram
    model: ``(doc_id, n_bigrams, sum_p_scaled, avg_p_scaled)`` where higher =
    more predictable text. ``model`` defaults to training on ``docs`` itself
    (decontamination pipelines pass a clean reference slice instead). Unseen
    bigrams/unigrams (external model) score through the same smoothing via
    left joins with zero fills."""
    lm, uni, vocab = model if model is not None else bigram_counts(docs, text_col, id_col)
    bg = _doc_bigrams(docs, text_col, id_col).withColumn(
        "w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
    )
    scored = (
        bg.join(lm, "bg", "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "p_scaled",
            F.expr(f"({scale} * (coalesce(c2, 0) + 1)) div (coalesce(c1, 0) + V)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_scaled").alias("sum_p_scaled"),
        (F.sum("p_scaled") / F.count(F.lit(1))).alias("avg_p_scaled"),
    )
