"""C4-style corpus cleaning (Raffel et al., "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", arXiv
1910.10683 §2.2 — public literature) as distributed DataFrame passes:

- **line-level filtering** (`c4_line_filter`): keep only lines that end in
  terminal punctuation, have at least 3 words, and don't mention
  "javascript"; drop whole documents that contain "lorem ipsum", a curly
  brace, any configured badword, or fewer than 5 sentences after cleaning.
- **cross-document span dedup** (`c4_span_dedup`): C4's signature dedup —
  "we removed all but one of any three-sentence span occurring more than
  once in the data set"; every later occurrence's sentences are removed
  and the document is re-assembled from the survivors.

These are TRANSFORM operators (they rewrite the text), complementing the
Gopher rules (operators/gopher.py), which only score/drop documents.

Pinned definitions (the repo's cross-engine determinism convention —
exact, never "roughly the paper"):

- lines = raw text split on '\\n', each trimmed of spaces, empties
  dropped (same convention as gopher_signals);
- a line's word count = space-split segments of nonzero length; terminal
  punctuation = one of ``. ! ? "``; the javascript test is a lowercase
  substring match;
- cleaned text = kept lines joined with '\\n';
- sentences = the CLEANED text split on the regex class ``[.!?]``, each
  trimmed of spaces, empties dropped; n_sentences for the 5-sentence rule
  is the count of ``.``/``!``/``?`` characters in the cleaned text (a
  terminator count, NOT a linguistic segmenter — documented deviation;
  the paper does not specify its segmenter);
- a span = ``span_n`` CONSECUTIVE sentences joined with chr(31) (unit
  separator — it cannot appear in the joined parts because it is STRIPPED
  from the text before sentence splitting, so a stray 0x1F in web text
  can never make two different sentence sequences collide into one span
  value); the kept occurrence of a span value is the one with the
  globally smallest ``(doc_id, start_index)`` struct — lexicographic
  struct MIN in both engines, a total order with no packed-integer
  range limits on either component;
- a sentence is removed iff ANY duplicated-span occurrence covering it is
  a non-first occurrence; the deduped text re-joins survivors with '. '
  (terminators are not reconstructed per-sentence — pinned).

Shuffle profile at 100 TB: line filtering and document verdicts are
entirely map-only (array HOFs over the line split — scan-bound, codegen).
Span dedup shuffles the span stream once — (span, (doc_id, start) struct)
with map-side partial MIN aggregation, payload ≈ span_n × the text, the
same cost class as the n-gram dedup family — then the drop set (a bounded
(doc_id, sentence_idx) key set, never text) joins back and the rebuild is
one ordered groupBy(doc_id). The global-first rule is a partial-aggregable
MIN, deliberately NOT a row_number window: a hot span value (boilerplate
repeated millions of times) would funnel into a single window task, while
MIN combines map-side (measured 3.8-5.3x faster on the hot-span probe).
No driver-side state of any kind.

No analog in the reference engine (tamer has no text operators); part of
the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tamer_spark.functions.text import trim_nonempty as _trim_nonempty

__all__ = ["c4_line_filter", "c4_span_dedup"]

_TERMINALS = (".", "!", "?", '"')
_SPAN_SEP = "\x1f"


def _count_occurrences(col, sym: str):
    return F.length(col) - F.length(F.replace(col, F.lit(sym), F.lit("")))


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_sentences: int = 5,
    drop_line_markers: tuple = ("javascript",),
    drop_doc_markers: tuple = ("lorem ipsum", "{"),
    badwords: tuple = (),
) -> DataFrame:
    """C4 §2.2 line filter + document verdict, one map-only pass.

    Returns (doc_id, text_clean, n_lines, n_lines_kept, n_sentences, keep):
    ``text_clean`` is the kept lines re-joined with newlines, ``keep`` = 1
    iff the CLEANED document still has >= ``min_sentences`` terminator
    characters and the ORIGINAL text contains none of ``drop_doc_markers``
    or ``badwords`` (both lowercase substring matches — C4's badword list
    is a parameter here, empty by default; ship your own).
    """
    raw = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_raw"))
    lines = _trim_nonempty(F.split(F.col("_raw"), "\n"))

    def line_ok(x):
        ok_term = x.endswith(_TERMINALS[0])
        for t in _TERMINALS[1:]:
            ok_term = ok_term | x.endswith(t)
        ok_words = (
            F.size(F.filter(F.split(x, " "), lambda w: F.length(w) > 0))
            >= min_line_words
        )
        ok_marker = F.lit(True)
        for m in drop_line_markers:
            ok_marker = ok_marker & ~F.contains(F.lower(x), F.lit(m))
        return ok_term & ok_words & ok_marker

    staged = raw.select(
        "doc_id",
        "_raw",
        lines.alias("_lines"),
        F.filter(lines, line_ok).alias("_kept"),
    )
    doc_ok = F.lit(True)
    for m in tuple(drop_doc_markers) + tuple(badwords):
        doc_ok = doc_ok & ~F.contains(F.lower(F.col("_raw")), F.lit(m))
    out = staged.select(
        "doc_id",
        F.array_join(F.col("_kept"), "\n").alias("text_clean"),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_lines_kept"),
        doc_ok.alias("_doc_ok"),
    ).select(
        "doc_id",
        "text_clean",
        "n_lines",
        "n_lines_kept",
        (
            _count_occurrences(F.col("text_clean"), ".")
            + _count_occurrences(F.col("text_clean"), "!")
            + _count_occurrences(F.col("text_clean"), "?")
        ).cast("long").alias("n_sentences"),
        "_doc_ok",
    )
    return out.select(
        "doc_id",
        "text_clean",
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        ((F.col("n_sentences") >= min_sentences) & F.col("_doc_ok"))
        .cast("long")
        .alias("keep"),
    )


def c4_span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_n: int = 3,
) -> DataFrame:
    """C4's cross-document three-sentence-span dedup, keep-global-first.

    Returns (doc_id, text_dedup, n_sentences, n_dropped): every occurrence
    of a ``span_n``-consecutive-sentence span other than the globally first
    (smallest ``(doc_id, start)``) has its sentences removed; the
    document is re-assembled from the survivors, joined with '. '.
    Documents with fewer than ``span_n`` sentences pass through untouched
    (they produce no spans). Idempotent: a second pass finds no duplicated
    spans among survivors of the first.
    """
    sarr = docs.select(
        F.col(id_col).alias("doc_id"),
        # strip the span separator from the text BEFORE splitting — a stray
        # 0x1F in web text must never alias two different sentence runs
        _trim_nonempty(
            F.split(F.replace(F.col(text_col), F.lit(_SPAN_SEP), F.lit("")), "[.!?]")
        ).alias("_ss"),
    )
    # the sentence array feeds the span stream AND the rebuild — stage it
    # (multiply-referenced, CollapseProject keeps it materialized)
    sents = sarr.select(
        "doc_id", F.posexplode("_ss").alias("idx", "s")
    )
    spans = sarr.select(
        "doc_id",
        F.when(
            F.size("_ss") >= span_n,
            F.transform(
                F.sequence(F.lit(0), F.size("_ss") - span_n),
                lambda i: F.struct(
                    i.alias("start"),
                    F.array_join(F.slice(F.col("_ss"), i + 1, span_n), _SPAN_SEP).alias(
                        "sp"
                    ),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<start:int,sp:string>>"))
        .alias("_sps"),
    ).select("doc_id", F.explode("_sps").alias("o")).select(
        "doc_id", F.col("o.start").alias("start"), F.col("o.sp").alias("sp")
    )
    # global first occurrence per span value: a partial-aggregable MIN over
    # the (doc_id, start) struct (lexicographic — no packed-integer range
    # limits) — NOT a row_number window, which would funnel a hot
    # boilerplate span into one task
    occ = spans.withColumn("_key", F.struct(F.col("doc_id"), F.col("start")))
    firsts = occ.groupBy("sp").agg(F.min("_key").alias("_first"))
    dropped_idx = (
        occ.join(firsts, "sp")
        .filter(F.col("_key") != F.col("_first"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + span_n - 1)
            ).alias("idx"),
        )
        .distinct()
    )
    kept = sents.join(dropped_idx, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "s"))), lambda r: r["s"]
            ),
            ". ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    base = sarr.select("doc_id", F.size("_ss").cast("long").alias("n_sentences"))
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            "n_sentences",
            (F.col("n_sentences") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )
