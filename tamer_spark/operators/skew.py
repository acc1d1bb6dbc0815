"""Skew-aware join: salting for pathological key distributions.

AQE's skew-join split handles most cases at runtime; salting is the
explicit tool when one key dominates so badly that even split partitions
overwhelm an executor (the classic null-key / megauser problem at 100 TB).

``salted_join``: the skewed (large) side gets a deterministic salt derived
from a row fingerprint; the small side is replicated ``salt``× (one copy per
salt value). The join key becomes (key, salt) → the hot key's rows spread
over ``salt`` partitions. Results are identical to the plain join; only the
physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    salt_by: Column | None = None,
) -> DataFrame:
    """Join with the large side salted and the small side replicated.

    ``salt_by``: expression whose md5 spreads the hot key's rows (default: a
    fingerprint of all large-side columns — deterministic, no rand()).
    """
    if salt_by is None:
        salt_by = F.concat_ws("\x00", *[F.col(c).cast("string") for c in large.columns])
    lg = large.withColumn(
        "_salt",
        F.pmod(F.conv(F.substring(F.md5(salt_by), 1, 15), 16, 10).cast("long"), F.lit(salt)),
    )
    sm = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))
    )
    out = lg.join(sm, [on, "_salt"], how)
    return out.drop("_salt")
