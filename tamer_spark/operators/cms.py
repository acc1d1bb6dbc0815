"""Count-Min Sketch term frequencies (Cormode & Muthukrishnan 2005, public
literature) — approximate counts with a FIXED-SIZE shuffle.

The exact term-count path (term_stats_docs 'ngram') shuffles one partial
count per distinct term per partition — fine while the vocabulary is small,
but a 100 TB web corpus has an effectively unbounded vocabulary (typo-space,
URLs, code identifiers), and the shuffle grows with it. The CMS collapses
the stream into a ``d × w`` counter table: the shuffle carries at most
``partitions × d·w`` rows NO MATTER the vocabulary, and the finished sketch
(d·w int64s — a few KB) broadcasts anywhere.

Guarantees (classical): ``est ≥ true`` always (counters only overcount on
collisions), and ``est ≤ true + ε·N`` with probability ``1 − δ`` for
``w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉`` where N is the stream length.

Determinism: row ``r``'s hash is ``stable_hash64('cms-{seed}-{r}-' ‖ token)
% w`` — the repo's md5-prefix convention, bit-identical in any engine, so
estimates are exactly reproducible and the DuckDB oracle replays the whole
sketch. Everything is int64 counts; no floats anywhere.

Epoch posture: sketches are mergeable (cell-wise sum) — ``cms_merge`` makes
the incremental story O(sketch) per epoch: build a per-epoch sketch from the
new batch only, merge into the persisted one. Merge-then-query equals
build-on-the-union exactly (both are the same per-cell sums; pinned).

No analog in the reference engine; training-data extension surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from tamer_spark.functions.hashing import stable_hash64

__all__ = ["cms_build", "cms_merge", "cms_query"]


def _bucket(token, r: int, w: int, seed: int):
    return stable_hash64(F.concat(F.lit(f"cms-{seed}-{r}-"), token)) % F.lit(w)


def cms_build(
    tokens: DataFrame, token_col: str = "word", d: int = 4, w: int = 1024, seed: int = 42
) -> DataFrame:
    """One row per token OCCURRENCE in → sparse sketch ``(r, b, cnt)`` out
    (zero cells omitted; readers must treat absence as 0 — cms_query does).

    Each occurrence contributes to ``d`` cells; the explode is map-side and
    the groupBy partial-aggregates to ≤ d·w rows per partition before the
    one bounded shuffle — the fixed-size-shuffle property that is the whole
    point at 100 TB."""
    cells = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        _bucket(F.col(token_col), r, w, seed).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.b")
    return cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with identical (d, w, seed) — the
    linearity of CMS counters. Sparse cells union then partial-agg; output
    stays ≤ d·w rows."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    return (
        reduce(DataFrame.unionByName, sketches)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "word",
    d: int = 4,
    w: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Point queries: ``(token, est)`` where ``est = min_r cnt[r][h_r(token)]``.

    The sketch (≤ d·w rows) broadcasts onto the probe set; a missing sparse
    cell is an exact 0 (LEFT join + coalesce — dropping it would turn the
    min into a min-over-present-rows and silently overestimate absent
    tokens). (d, w, seed) must match the build — the sketch cannot verify
    that itself, which is why the gate derives both sides from the same
    constants."""
    pr = probes.select(F.col(token_col).alias("token")).distinct()
    cells = pr.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        _bucket(F.col("token"), r, w, seed).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell"),
    ).select("token", "cell.r", "cell.b")
    joined = cells.join(F.broadcast(sketch), ["r", "b"], "left").select(
        "token", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cell_cnt")
    )
    return joined.groupBy("token").agg(F.min("cell_cnt").alias("est"))
