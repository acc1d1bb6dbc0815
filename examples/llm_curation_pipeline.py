"""End-to-end LLM training-data curation pipeline over the documents table:

    quality gate → exact dedup → MinHash-LSH near-dup removal →
    context-window chunking → token counting

Every stage is a Catalyst plan from tamer_spark's operator library — the
composition stays lazy until the final write, so Catalyst prunes/pushes
across stage boundaries. Run: ``python examples/llm_curation_pipeline.py``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from _common import session, workspace
from tamer_spark.functions.chunking import chunk_text_expr
from tamer_spark.functions.text import text_stats_cols, token_count_col
from tamer_spark.operators.dedup import dedup_exact, minhash_lsh_pairs

SF_DIR = "/root/testdata/sf0.01"

spark = session("llm-curation")
ws = workspace()
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
n0 = docs.count()

# 1. quality gate: cheap map-side features, filter before anything expensive
stats = docs.select("doc_id", "text", *text_stats_cols(F.col("text")))
quality = stats.filter(
    (F.col("n_words") >= 30) & (F.col("avg_word_len") >= 3.0) & (F.col("punct_ratio") < 0.1)
).select("doc_id", "text")
n1 = quality.count()

# 2. exact dedup: keep min-id representative per content hash
keep_exact = dedup_exact(quality).select(F.col("keep_id").alias("doc_id"))
deduped = quality.join(keep_exact, "doc_id", "left_semi")
n2 = deduped.count()

# 3. near-dup removal: drop the higher-id member of each LSH candidate pair
pairs = minhash_lsh_pairs(deduped, k=16, bands=4)
drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
kept = deduped.join(drop, "doc_id", "left_anti")
n3 = kept.count()

# 4. chunk to 50-word context windows + 5. count tokens per chunk
chunks = kept.select(
    "doc_id", F.posexplode(chunk_text_expr(F.col("text"), 50)).alias("chunk_id", "chunk")
).withColumn("n_tokens", token_count_col(F.col("chunk")))
chunks.write.mode("overwrite").parquet(str(ws / "curated_chunks"))

out = spark.read.parquet(str(ws / "curated_chunks"))
print(f"documents: {n0} → quality {n1} → exact-dedup {n2} → near-dedup {n3}")
print(f"chunks: {out.count()}, tokens: {out.agg(F.sum('n_tokens')).collect()[0][0]}")
assert n0 >= n1 >= n2 >= n3 > 0
