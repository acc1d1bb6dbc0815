"""Canonical-member selection for dedup clusters: keep the BEST document
per near-dup cluster, not the smallest id.

``attach_cluster_ids`` (operators/cc.py) labels every row with its
transitive cluster; the min-id keep rule is the cheap default, but real
curation keeps the highest-QUALITY member (longest, best LM score, best
odds-classifier score — any per-doc signal the scoring tier already
produced). This is one partial-aggregable max_by per cluster — exactly
the dedup_exact cost shape, no window, no second shuffle.

Determinism: the argmax key is the struct (score, -id), so equal scores
break toward the SMALLEST id — a total order, same answer in any engine
at any partitioning (exact-int scores recommended; the repo's scoring
tier emits them). The negation runs in DECIMAL(20,0): every int64 id
negates exactly (including Long.MIN_VALUE, which would overflow an int64
negation under ANSI), and NUMERIC ids are a validated requirement — a
string id raises TypeError at plan time instead of failing in analysis.

No analog in the reference engine; training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_canonical(
    clustered: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_rep",
) -> DataFrame:
    """(cluster, keep_id, keep_score): the argmax-score member per cluster,
    ties to the smallest id. Input is ``attach_cluster_ids`` output joined
    with a per-doc score. Join the result back on ``keep_id`` (left_semi)
    to materialize the curated survivors."""
    id_type = dict(clustered.dtypes)[id_col]
    ok = id_type in {"tinyint", "smallint", "int", "bigint"}
    if not ok and id_type.startswith("decimal("):
        # only scale-0 decimals that round-trip through decimal(20,0): a
        # scaled decimal (1.50) would be ROUNDED by the cast (silent wrong
        # keep_id) and precision > 20 fails the ANSI cast at runtime —
        # both are exactly the failure classes this check exists to stop
        p, s = (int(x) for x in id_type[8:-1].split(","))
        ok = s == 0 and p <= 20
    if not ok:
        raise TypeError(
            f"select_canonical requires an integral id column (or decimal(p<=20,0)) "
            f"for the smallest-id tie-break ({id_col} is {id_type}); map string or "
            "scaled-decimal ids to a numeric surrogate (e.g. stable_hash64) or "
            "pre-rank upstream"
        )
    # negate in DECIMAL(20,0): exact for every int64 (Long.MIN_VALUE
    # included — an int64 negation of it overflows under ANSI)
    pick = F.max(
        F.struct(
            F.col(score_col).alias("s"),
            (-F.col(id_col).cast("decimal(20,0)")).alias("negid"),
        )
    )
    return (
        clustered.groupBy(F.col(cluster_col).alias("cluster"))
        .agg(pick.alias("_best"))
        .select(
            "cluster",
            (-F.col("_best.negid")).cast(id_type).alias("keep_id"),
            F.col("_best.s").alias("keep_score"),
        )
    )
