from tamer_spark.functions.hashing import stable_hash64, perm_hash
from tamer_spark.functions.text import (
    words,
    word_count,
    text_stats_cols,
    token_count_col,
    lang_id_col,
    doc_fingerprint_col,
    scrub_pii_col,
    pii_count_cols,
    trim_nonempty,
)

__all__ = [
    "stable_hash64",
    "perm_hash",
    "words",
    "word_count",
    "text_stats_cols",
    "token_count_col",
    "lang_id_col",
    "doc_fingerprint_col",
    "scrub_pii_col",
    "pii_count_cols",
    "trim_nonempty",
]
