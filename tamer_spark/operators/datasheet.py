"""Corpus datasheet: the per-slice summary a dataset card publishes
("Datasheets for Datasets", Gebru et al. 2021) — doc counts, char/token
volume, and exact-duplicate incidence per (source, language) slice, in
ONE logical pass.

100 TB shape: token/char stats are map-only expressions riding the scan;
duplicate incidence needs the content-digest cardinality, so the pass
shuffles (digest ≈ 16 B/doc) once to count copies, then aggregates to the
slice keys (tiny: |sources| × |langs| rows, partial-aggregated map-side).
No driver-side state; the result IS the datasheet table.
No analog in the reference engine (tamer has no text/retrieval
operators); part of the training-data-pipeline extension surface.

"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_datasheet(
    docs: DataFrame,
    text_col: str = "text",
    keys: tuple[str, ...] = ("source", "lang"),
) -> DataFrame:
    """Per-``keys`` slice: n_docs, total_chars, total_tokens (whitespace
    tokens over normalized text), dup_docs (docs whose normalized content
    digest occurs more than once CORPUS-WIDE — a doc duplicated across
    slices counts in each slice holding a copy)."""
    from tamer_spark.operators.dedup import normalize_text

    d = docs.select(
        *keys,
        F.length(F.col(text_col)).cast("long").alias("_nc"),
        F.size(F.split(normalize_text(F.col(text_col)), " ")).cast("long").alias("_nt"),
        F.md5(normalize_text(F.col(text_col))).alias("_dg"),
    )
    copies = d.groupBy("_dg").agg(F.count(F.lit(1)).alias("_copies"))
    return (
        d.join(copies, "_dg")
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nc").alias("total_chars"),
            F.sum("_nt").alias("total_tokens"),
            F.sum(F.when(F.col("_copies") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_docs"),
        )
    )


def datasheet_delta(
    before: DataFrame,
    after: DataFrame,
    keys: tuple[str, ...] = ("source", "lang"),
) -> DataFrame:
    """The curation report: per-slice deltas between the raw corpus's
    datasheet and the curated output's (run :func:`corpus_datasheet` on
    each). Full-outer on the slice keys — slices created or emptied by
    curation still appear, with zeros on the missing side. Every column
    is an exact int64 (after − before, so drops are negative).

    Both inputs are slice-sized frames (|sources| × |langs|), so this is
    driver-trivial at any corpus scale — the heavy passes already
    happened inside the two datasheets."""
    metrics = ("n_docs", "total_chars", "total_tokens", "dup_docs")
    b = before.select(*keys, *[F.col(m).alias(f"_b_{m}") for m in metrics])
    a = after.select(*keys, *[F.col(m).alias(f"_a_{m}") for m in metrics])
    joined = b.join(a, list(keys), "full_outer")
    out_cols = [F.col(k) for k in keys]
    for m in metrics:
        bb = F.coalesce(F.col(f"_b_{m}"), F.lit(0))
        aa = F.coalesce(F.col(f"_a_{m}"), F.lit(0))
        out_cols += [
            bb.alias(f"{m}_before"),
            aa.alias(f"{m}_after"),
            (aa - bb).alias(f"{m}_delta"),
        ]
    return joined.select(*out_cols)
