"""Broadcast bloom-filter prefilters — JVM-side bit arithmetic, no UDFs.

The 100 TB decontamination problem: the benchmark side's shingle set can
grow past broadcast range (billions of n-grams across eval suites), at
which point the exact semi-join degrades to a corpus-scale SortMergeJoin
shuffle. A bloom filter over the benchmark hashes stays KB-MB at any
benchmark size, broadcasts as a plan literal, and drops ~(1 - fp_rate) of
the corpus MAP-SIDE before any exchange; the exact join then verifies only
the survivors, so false positives never reach the result — output is
bit-identical to the plain anti-join at a fraction of the shuffle.

Both the build and the probe hash with the SAME Spark-side expression
(``xxhash64(lit(i), col)``), so there is no cross-implementation hash to
keep in sync: the filter is built by a Spark job (positions explode +
distinct, collected driver-side — bounded by k x |values|, the same scale
class as broadcasting the set itself would be at build time) and probed by
whole-stage-codegen bit tests (``shiftrightunsigned`` with a column shift
amount via F.expr — the SQL form accepts non-literal shifts).
No analog in the reference engine (tamer has no text/retrieval
operators); part of the training-data-pipeline extension surface.

"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK64 = (1 << 64) - 1


def _to_signed(word: int) -> int:
    word &= _MASK64
    return word - (1 << 64) if word >= (1 << 63) else word


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 14, k: int = 5) -> list[int]:
    """Build bloom bit words (list of int64) over the values of ``col``.

    One distributed pass: per-value probe positions, distinct, collect —
    at most ``m_bits`` distinct positions come back regardless of input
    size, so the driver transfer is bounded by the filter size itself.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    probes = F.array(
        *[F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m_bits)) for i in range(k)]
    )
    positions = [
        r.pos for r in df.select(F.explode(probes).alias("pos")).distinct().collect()
    ]
    words = [0] * (m_bits // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    return [_to_signed(w) for w in words]


def bloom_might_contain(
    df: DataFrame, col: str, words: list[int], m_bits: int, k: int = 5, out: str = "bloom_hit"
) -> DataFrame:
    """Attach boolean ``out``: bloom membership test of ``col``.

    All-JVM: the words array is a foldable literal; each probe is an
    xxhash64 + pmod + element_at + variable-amount shiftrightunsigned.
    Guaranteed no false negatives (build and probe share the hash exprs).
    """
    d = df.withColumn("_bw", F.array(*[F.lit(w).cast("long") for w in words]))
    cond: Column | None = None
    for i in range(k):
        d = d.withColumn(
            f"_bp{i}", F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m_bits))
        )
        c = F.expr(
            f"(shiftrightunsigned(element_at(_bw, CAST(_bp{i} DIV 64 AS INT) + 1),"
            f" CAST(_bp{i} % 64 AS INT)) & 1) = 1"
        )
        cond = c if cond is None else (cond & c)
    return d.withColumn(out, cond).drop("_bw", *[f"_bp{i}" for i in range(k)])


def decontaminate_with_bloom(
    corpus_shingled: DataFrame,
    bench_shingles: DataFrame,
    corpus_docs: DataFrame,
    shingle_col: str = "s",
    id_col: str = "doc_id",
    m_bits: int = 1 << 14,
    k: int = 5,
) -> DataFrame:
    """Drop corpus docs sharing any shingle with the benchmark set,
    bloom-prefiltered: bit-identical to the plain exact anti-join, but the
    exact (non-broadcast at scale) verify join sees only bloom survivors.

    Returns the surviving ``corpus_docs`` ids.
    """
    words = bloom_build(bench_shingles, shingle_col, m_bits=m_bits, k=k)
    candidates = bloom_might_contain(
        corpus_shingled, shingle_col, words, m_bits, k=k
    ).filter(F.col("bloom_hit"))
    tainted = (
        candidates.join(bench_shingles, shingle_col)  # exact verify, survivors only
        .select(id_col)
        .distinct()
    )
    return corpus_docs.join(tainted, id_col, "left_anti").select(id_col)
