from tamer_spark.operators.asof import asof_join
from tamer_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_normalized,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_string_rows,
    simhash_signatures,
)
from tamer_spark.operators.dedup_incremental import (
    append_keys,
    dedup_exact_incremental,
    dedup_minhash_incremental,
    exact_index,
    minhash_band_index,
)
from tamer_spark.operators.mixing import stratified_mix
from tamer_spark.operators.packing import pack_greedy, pack_offsets, with_pack_group
from tamer_spark.operators.similarity import cosine_knn, quantize_embedding

__all__ = [
    "stratified_mix",
    "pack_greedy",
    "pack_offsets",
    "with_pack_group",
    "asof_join",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_exact_incremental",
    "dedup_minhash_incremental",
    "exact_index",
    "minhash_band_index",
    "append_keys",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "shingle_string_rows",
    "simhash_signatures",
    "cosine_knn",
    "quantize_embedding",
]
