"""Context-window text chunking as a Python UDTF.

Training-data pipelines chunk documents into fixed token budgets before
tokenization; this is the 1→N row shape Python UDTFs model (one doc in,
many chunks out). Registered as a lateral table function so it composes in
SQL; words-per-chunk is the budget knob.

Scale: UDTFs run row-at-a-time in Python workers — acceptable here because
chunking is string slicing (cheap) and the row explosion dominates cost; a
hot-path alternative is the pure-JVM `chunk_text_expr` below (same
semantics, codegen'd), which is what the 100 TB path should use. Both are
exposed so the correctness gate can pin them against each other and the SQL
oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_py(text: str) -> str:
    """Python twin of operators.dedup.normalize_text (ASCII-safe inputs)."""
    return re.sub(r"\s+", " ", text.lower()).strip()


class ChunkText:
    """UDTF: (doc_id, text, words_per_chunk) → (doc_id, chunk_id, chunk, n_words)."""

    def eval(self, doc_id: int, text: str, words_per_chunk: int = 50):  # noqa: D102
        words = normalize_py(text or "").split(" ")
        for cid, start in enumerate(range(0, len(words), words_per_chunk)):
            piece = words[start : start + words_per_chunk]
            yield doc_id, cid, " ".join(piece), len(piece)


def register_chunk_text(spark, name: str = "chunk_text"):
    from pyspark.sql.functions import udtf

    wrapped = udtf(ChunkText, returnType="doc_id bigint, chunk_id bigint, chunk string, n_words bigint")
    spark.udtf.register(name, wrapped)
    return wrapped


def chunk_text_expr(text: Column, words_per_chunk: int = 50) -> Column:
    """JVM-side chunking: array of space-joined word slices (codegen hot path).

    Returns array<string>; pair with posexplode for (chunk_id, chunk) rows.
    """
    from tamer_spark.operators.dedup import normalize_text

    ws = F.split(normalize_text(text), " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(float(words_per_chunk))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i * words_per_chunk + 1, words_per_chunk)),
    )


def chunk_text_overlap_expr(
    text: Column, words_per_chunk: int = 50, overlap: int = 10
) -> Column:
    """Sliding-window chunking with overlap — the RAG-ingestion shape
    (retrieval chunks overlap so a fact straddling a boundary is whole in
    at least one chunk; LangChain/LlamaIndex-style splitters default to
    10-20% overlap). Chunk ``i`` covers words
    ``[i·stride + 1, i·stride + words_per_chunk]`` with
    ``stride = words_per_chunk − overlap``; the last chunk may be short;
    a doc of ≤ words_per_chunk words is one chunk.

    Chunk count is ``(n − wpc + stride − 1) div stride + 1`` — the
    double-division-then-truncate below is exact because the numerator is
    a word count (< 2^53, exactly representable, and IEEE division of
    exact operands rounds an integer-valued quotient to itself). The
    whole expression is codegen'd JVM array math (zero shuffles), and
    ``overlap = 0`` degrades to ``chunk_text_expr`` (pinned in tests)."""
    if not 0 <= overlap < words_per_chunk:
        raise ValueError(
            f"overlap must be in [0, words_per_chunk): got {overlap} vs {words_per_chunk}"
        )
    from tamer_spark.operators.dedup import normalize_text

    stride = words_per_chunk - overlap
    ws = F.split(normalize_text(text), " ")
    n = F.size(ws).cast("long")
    # integer ceil-div: (n - wpc + stride - 1) div stride — positive in
    # the branch where it's used, so truncation == floor (exactness per
    # the docstring note)
    extra = ((n - F.lit(words_per_chunk) + F.lit(stride - 1)) / F.lit(stride)).cast(
        "long"
    )
    n_chunks = F.when(n <= words_per_chunk, F.lit(1).cast("long")).otherwise(extra + 1)
    return F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(ws, (i * stride + 1).cast("int"), words_per_chunk)
        ),
    )
