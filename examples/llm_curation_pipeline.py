"""End-to-end LLM training-data curation pipeline over the documents table:

    URL-level dedup (text never read) → per-domain quota cap → encoding repair →
    C4 line cleaning + cross-doc span dedup → quality gate → exact dedup →
    MinHash-LSH near-dup removal → exact substring-run dedup →
    stratified source mixing → token-budget capping →
    graded decontamination (dirty-fraction threshold) →
    DSIR domain selection → train/val/test split →
    context-window chunking → token counting →
    sequence packing → incremental next-epoch dedup →
    SemDeDup + IVFADC semantic index → hard-negative mining →
    hybrid BM25+ANN retrieval (RRF) →
    seeded-shuffle training order → verified training-shard export

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
raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
n0 = raw_docs.count()

# -1. URL-level dedup FIRST — the only stage that needs no text at all
#     (CCNet/RefinedWeb run it before extraction for exactly that reason).
#     The fixture carries no url column, so derive one with re-crawl-shaped
#     variation (scheme/www/port/tracking-param noise over a shared
#     canonical target); production reads its real url column. Keep the
#     min-id member of each canonical group.
from tamer_spark.operators.dedup import url_dedup_counts

_d = F.col("doc_id")
_url = F.concat(
    F.when(_d % 2 == 0, F.lit("http://www.")).otherwise(F.lit("HTTPS://")),
    F.lit("crawl"), (_d % 100).cast("string"),
    F.lit(".example"), (_d % 5).cast("string"), F.lit(".com"),
    F.when(_d % 8 == 3, F.lit(":443")).otherwise(F.lit("")),
    F.lit("/page/"), (_d % 200).cast("string"),
    F.when(_d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
    F.when(_d % 5 == 0, F.lit("?utm_source=feed&v=1")).otherwise(F.lit("?v=1")),
)
url_keep = url_dedup_counts(raw_docs.select("doc_id", _url.alias("url"))).select(
    F.col("keep_id").alias("doc_id")
)
raw_docs = raw_docs.join(url_keep, "doc_id", "left_semi").localCheckpoint()
n_url = raw_docs.count()

# -0.9. per-domain quota (RefinedWeb/CCNet): no single registrable domain
#       may dominate the mixture — cap each at 32 docs by salted-hash rank
#       (the derivation yields 5 registrable domains of ~40 url-surviving
#       docs each, so the cap genuinely binds without starving downstream).
#       Run through the mega-group posture (prefilter_slack): the threshold
#       cut happens at the skew-splittable join, so a link-farm domain never
#       serializes through one task's window sort.
from tamer_spark.functions.text import registrable_domain_col
from tamer_spark.operators.mixing import cap_per_group

_dom = raw_docs.select(
    "doc_id", registrable_domain_col(_url).alias("domain")
)
_cap_keep = cap_per_group(_dom, "domain", cap=32, prefilter_slack=4).select("doc_id")
raw_docs = raw_docs.join(_cap_keep, "doc_id", "left_semi").localCheckpoint()
n_domcap = raw_docs.count()

# -0.85. winsorized length feature: clamp per-source n_chars at exact
#        discrete p5/p95 before any length-derived threshold downstream —
#        a handful of outlier documents must not drag a source's length
#        statistics (bounds pivot to one row per source and BROADCAST;
#        the clamp itself is map-side).
from tamer_spark.operators.percentiles import winsorize

_wz = winsorize(
    raw_docs.withColumn("len_chars", F.length("text").cast("long")),
    "len_chars",
    keys=("source",),
    # quartile clamp: at this fixture's ~16 docs/source the p5/p95 default
    # degenerates to min/max (ceil-rank lands on the extremes) — IQR-style
    # bounds actually bind; production at real group sizes uses p5/p95
    p_lo=(1, 4),
    p_hi=(3, 4),
)
n_clamped = _wz.filter(F.col("value_winsor") != F.col("len_chars")).count()

# -0.75. template-collapse AUDIT (r12) — machine-generated pages differ
#        only in volatile tokens (order ids, recipient emails, tracking
#        links); exact dedup misses them, template masking catches them at
#        exact-dedup cost. Plant a volatile suffix on every doc (each raw
#        string becomes globally unique), then verify masking collapses the
#        corpus back to exactly its normalized-text group count — i.e. the
#        volatile tokens contribute NOTHING to identity under the mask.
from tamer_spark.operators.dedup import dedup_exact_normalized, template_dedup_counts

_volatile = F.concat(
    F.col("text"),
    F.lit(" order #"), (_d % 1000000).cast("string"),  # ≥8-digit ids would mask <H>, not 0
    F.lit(" to user"), (_d % 9).cast("string"), F.lit("@mail-"),
    (_d % 4).cast("string"), F.lit(".example via https://t.example/"),
    _d.cast("string"),
)
_td = raw_docs.select("doc_id", _volatile.alias("vtext"))
n_template_groups = template_dedup_counts(_td, text_col="vtext").count()
n_vtext_distinct = _td.select("vtext").distinct().count()
n_norm_groups = dedup_exact_normalized(raw_docs).count()
assert n_vtext_distinct == n_domcap  # the suffix made every raw string unique
assert n_template_groups == n_norm_groups  # ...and the mask erased it all

# -0.5. encoding repair BEFORE any text processing — quality scores over
#       mojibake are themselves mojibake. The fixture is clean ASCII, so
#       plant transport damage first (BOM + a mojibake word + a CRLF);
#       production text arrives pre-damaged.
from tamer_spark.functions.text import _mojibake, fix_encoding_col

damaged = raw_docs.withColumn(
    "text",
    F.concat(
        F.lit("﻿"),
        F.replace(F.col("text"), F.lit(" value"), F.lit(" v" + _mojibake("ä") + "lue")),
        F.lit("\r\n"),
    ),
)
repaired = damaged.withColumn("text", fix_encoding_col(F.col("text")))
n_damage_chars = (
    damaged.select(F.sum(F.length("text")).alias("s")).collect()[0].s
    - repaired.select(F.sum(F.length("text")).alias("s")).collect()[0].s
)
raw_docs = repaired

# 0. C4 cleaning (Raffel et al. 2020 §2.2): line-level filter, then the
#    cross-document 3-sentence-span dedup, BEFORE any scoring — cleaning is
#    a transform, so everything downstream sees the cleaned text. The
#    synthetic fixture ships punctuation-free single-line texts, so (like
#    the correctness gate) we first derive line/sentence structure with
#    pinned replaces — real web text arrives already structured.
from tamer_spark.operators.c4 import c4_line_filter, c4_span_dedup

_structure = (
    (" merge", ". merge"),
    (" order", "! order"),
    (" batch", "? batch"),
    (" window", ".\nwindow"),
    # every ' sort' plants the IDENTICAL standalone banner line across
    # many documents — live cross-document boilerplate for stage 0b.
    # (' value' would never match here: the encoding stage above turned it
    # into ' välue' — the repair restores the INTENDED char, not ASCII.)
    (" sort", ".\nsubscribe to our newsletter today.\nsort"),
)
text = F.col("text")
for search, repl in _structure:
    text = F.replace(text, F.lit(search), F.lit(repl))
structured = raw_docs.withColumn("text", text)
# plant a WITHIN-document verbatim repeat into every 37th doc for stage 3c:
# a doc-unique 13-token block, twice in one line (doc-unique so no PAIR
# stage can see it — cross-doc dup machinery is structurally blind to
# intra-doc repetition, which is exactly the gap ExactSubstr removal
# covers). 13 tokens, not 12: downstream rebuilds glue a '.' onto the
# line's last token, so only a >L block still contains an intact
# duplicated 12-window. The trailing ' .' keeps the line past the C4
# terminal-punctuation rule.
_rpt_block = F.concat_ws(
    " ", *[F.concat(F.lit(f"rpt{j}x"), F.col("doc_id").cast("string")) for j in range(13)]
)
structured = structured.withColumn(
    "text",
    F.when(
        F.col("doc_id") % 37 == 0,
        F.concat(
            F.col("text"), F.lit("\n"), _rpt_block, F.lit(" "), _rpt_block, F.lit(" .")
        ),
    ).otherwise(F.col("text")),
)
cleaned = c4_line_filter(structured, min_sentences=2)

# 0b. cross-document boilerplate-line removal (Dolma §4.1 / RefinedWeb
#     §3.2, remove-ALL by doc frequency) — BETWEEN the line filter and the
#     span dedup, while line structure still exists (span dedup rebuilds
#     text with '. ' joins, erasing newlines): the planted newsletter
#     banner appears verbatim across many documents — template chrome,
#     content in NONE of them — and must vanish from every host while
#     each doc's own content lines survive. Steady-state epochs would
#     broadcast a frozen boilerplate_lines set instead of re-counting
#     (CURATION.md §1).
from tamer_spark.operators.dedup import dedup_lines_across_docs

lined = dedup_lines_across_docs(
    cleaned.filter(F.col("keep") == 1).select("doc_id", F.col("text_clean").alias("text")),
    min_doc_freq=5,
)
n_bp_lines = lined.agg(F.sum("n_dropped")).collect()[0][0]
assert n_bp_lines and n_bp_lines > 0, "planted banner must be live boilerplate"

span_deduped = c4_span_dedup(lined.select("doc_id", F.col("text_clean").alias("text")))
n_spans_dropped = span_deduped.agg(F.sum("n_dropped")).collect()[0][0]
docs = span_deduped.select("doc_id", F.col("text_dedup").alias("text"))
n_c4 = docs.count()

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

# 3b. exact substring-run dedup (Lee et al. ExactSubstr class): pairs
#     sharing a verbatim 12-token run that the probabilistic tiers may
#     rank below threshold; the measured run length is the policy signal
#     (here: drop the higher id of any pair overlapping >= 12 tokens).
#     `kept` is lineage-truncated first (localCheckpoint, the connected-
#     components convention): it feeds the run-pair SELF-join and every
#     downstream stage, and Spark's logical plan otherwise nests the whole
#     clean→quality→dedup→LSH chain once per reference — multiplicative
#     plan growth that OOMs the driver's analyzer long before the data
#     does. A production pipeline writes survivors to parquet at this
#     boundary; localCheckpoint is the in-process equivalent.
from tamer_spark.operators.runs import substring_run_pairs

kept = kept.localCheckpoint()
run_pairs = substring_run_pairs(kept, length=12, min_windows=1)
run_drop = run_pairs.select(F.col("id_b").alias("doc_id")).distinct()
kept = kept.join(run_drop, "doc_id", "left_anti").localCheckpoint()
n3b = kept.count()

# 3c. ExactSubstr REMOVAL (Lee et al. 2022 §4.1, the policy half): stage
#     3b's whole-doc drop is the blunt policy for documents that share a
#     run with another doc; what it cannot touch is WITHIN-document
#     verbatim repetition (no (a < b) pair exists), and a drop policy
#     wastes the unique remainder of lightly-contaminated docs. This
#     stage cuts every surviving duplicated 12-token window surgically —
#     canonical first occurrence kept, doc survives with its unique
#     content (row-preserving). The planted every-37th-doc repeat block
#     from stage 0 must lose exactly its second occurrence here.
from tamer_spark.operators.runs import exact_substring_dedup

cut = exact_substring_dedup(kept, length=12)
n_tok_removed = cut.agg(F.sum("n_removed")).collect()[0][0]
assert n_tok_removed and n_tok_removed >= 12, "planted intra-doc repeat must be cut"
kept = cut.select("doc_id", F.col("text_dedup").alias("text")).localCheckpoint()
n3c = kept.count()
assert n3c == n3b, "removal is row-preserving — no document is dropped"

# 4. stratified mixing: rebalance to 3:1 curated-vs-web target weights
from tamer_spark.functions.hashing import stable_hash64
from tamer_spark.operators.mixing import stratified_mix
from tamer_spark.operators.packing import pack_greedy, with_pack_group

heavy = ("src0", "src1", "src2", "src3", "src4")
mix_w = F.when(F.col("source").isin(*heavy), 3).otherwise(1)
mixed_ids = stratified_mix(
    kept.join(raw_docs.select("doc_id", "source"), "doc_id"), mix_w
).select("doc_id")
mixed = kept.join(mixed_ids, "doc_id", "left_semi")
n4 = mixed.count()

# 4b. absolute token budgets: after ratio mixing, cap each source at a
#     hard char budget — the maximal stable-hash-priority prefix per
#     source (two-phase distributed prefix sum, never a per-source
#     global window).
from tamer_spark.operators.budget import take_token_budget

capped = take_token_budget(
    mixed.join(raw_docs.select("doc_id", "source"), "doc_id").withColumn(
        "n_chars", F.length("text").cast("long")
    ),
    id_col="doc_id",
    weight_col="n_chars",
    budget=600,
    group_col="source",
).select("doc_id", "text")
n4b = capped.count()

# 4c. graded decontamination: score every doc's exact 3-gram dirty
#     fraction against the benchmark slice (synthetic: every 50th raw
#     doc) and drop docs quoting >= 20% of their content — the threshold
#     form of the binary anti-join, keeping docs that merely brush a
#     common phrase
from tamer_spark.operators.contamination import contamination_score

bench_docs = raw_docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
# lineage truncation again: capped feeds the scorer, the anti-join, the
# splits, chunking, packing, AND the BM25 serving stage below
capped = capped.localCheckpoint()
scored_con = contamination_score(capped, bench_docs, n=3)
capped = capped.join(
    scored_con.filter(F.col("contamination_ppm") >= 200_000).select("doc_id"),
    "doc_id",
    "left_anti",
).localCheckpoint()
n4c = capped.count()

# 4d. DSIR domain selection: from the curated pool, keep the 400 docs most
#     distributionally similar to the 'src0' target domain — hashed n-gram
#     bucket ratios (broadcast), integer importance weights, and a
#     priority sample ∝ weight (never top-k: that over-selects
#     near-duplicates of the target).
from tamer_spark.operators.dsir import dsir_select

dsir_target = raw_docs.filter(F.col("source") == "src0").select("doc_id", "text")
picked = dsir_select(capped, dsir_target, k=400)
capped = capped.join(picked.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
n4d = capped.count()

# 5. stable train/val/test split (hash-range membership — never reshuffles
#    docs between splits as the corpus grows)
h = stable_hash64(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100
split = capped.withColumn(
    "split", F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
)

# 6. chunk to 50-word context windows + count tokens per chunk
chunks = split.select(
    "doc_id", "split",
    F.posexplode(chunk_text_expr(F.col("text"), 50)).alias("chunk_id", "chunk"),
).withColumn("n_tokens", token_count_col(F.col("chunk")))
chunks.write.mode("overwrite").parquet(str(ws / "curated_chunks"))

# 7. pack the train split's docs into 512-token training rows
train_tokens = split.filter(F.col("split") == "train").select(
    "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
)
packed = pack_greedy(with_pack_group(train_tokens, groups=8), budget=512)
n_bins = packed.select("pack_group", "bin_id").distinct().count()

# 8. next epoch: the curated corpus is now a persisted dedup INDEX; a new
#    day's batch folds in at O(batch) cost — history is never re-hashed.
#    (Simulated batch: up to 50 re-sent docs under fresh ids + as many
#    genuinely new. localCheckpoint freezes each limit()'s row choice —
#    an unordered limit re-evaluates nondeterministically otherwise.)
from tamer_spark.operators.dedup_incremental import dedup_exact_incremental, exact_index

idx = exact_index(mixed)
resent = (
    mixed.limit(50)
    .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    .localCheckpoint()
)
fresh = (
    mixed.limit(50)
    .select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("day2 update: "), F.col("text")).alias("text"),
    )
    .localCheckpoint()
)
n_fresh, n_batch = fresh.count(), resent.count() + fresh.count()
batch = resent.unionByName(fresh)
survivors = dedup_exact_incremental(batch, idx)
n_new = survivors.count()

# 9. semantic tier over the embedding corpus: SemDeDup prunes semantic
#    near-copies within k-means clusters, then the survivors get IVFADC
#    index entries — coarse cluster id + 2-byte PQ code per vector, the
#    memory-bounded ANN layout for retrieval over the curated corpus.
from tamer_spark.operators.pq import pq_encode, pq_train
from tamer_spark.operators.similarity import ivf_build, semdedup

emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
_assigned, centroids = ivf_build(emb, n_centroids=8, iters=2)
sem_kept = semdedup(emb, threshold=0.3, model=centroids)
codebooks = pq_train(emb, m=4, k=16, iters=2)
index = pq_encode(
    emb.join(sem_kept.select("vec_id"), "vec_id", "left_semi"), codebooks
).join(sem_kept, "vec_id")
n_vec, n_sem = emb.count(), sem_kept.count()

# 10. next-epoch semantic tier: centroids + codebooks are FROZEN models —
#     the new embedding batch is semantically pruned against the persisted
#     inverted file (semdedup_incremental: history never re-compared to
#     itself), then the survivors are assigned + PQ-encoded map-only.
#     Same O(batch) epoch posture as stage 8's exact-dedup index.
from tamer_spark.operators.similarity import ivf_append, semdedup_incremental

# Simulated batch (mirrors stage 8): 50 re-sent embeddings under fresh
# ids — semantic copies of history, must be pruned — plus 50 negated
# vectors (cosine −1 to their source: genuinely novel directions).
resent_emb = emb.limit(50).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
novel_emb = emb.limit(50).select(
    (F.col("vec_id") + 2_000_000).alias("vec_id"),
    F.transform("embedding", lambda x: -x).alias("embedding"),
)
new_emb = resent_emb.unionByName(novel_emb)
inv_file = ivf_append(emb, centroids)  # the persisted inverted file (all members)
epoch_kept = semdedup_incremental(new_emb, inv_file, centroids, threshold=0.3)
epoch_survivors = new_emb.join(epoch_kept.select("vec_id"), "vec_id", "left_semi")
epoch_assigned = ivf_append(epoch_survivors, centroids)
epoch_codes = pq_encode(epoch_survivors, codebooks)
epoch_index = epoch_assigned.select("vec_id", "cluster").join(
    epoch_codes.select("vec_id", "code"), "vec_id"
)
n_epoch = epoch_index.count()
n_resent_survived = epoch_index.filter(F.col("vec_id") < 2_000_000).count()

# 10b. contrastive pair mining: per anchor, the top-3 most-similar
#      DIFFERENT-label vectors (hard negatives) and the top-3
#      LEAST-similar SAME-label bucket-mates (hard positives) — both
#      sides of a metric-learning triple off ONE candidate join
#      (contrastive_pairs: one LSH bucket self-join, one (anchor, side)
#      window — a bucket-missed negative is a less-hard negative, which
#      is the point).
from tamer_spark.operators.similarity import contrastive_pairs

triples = contrastive_pairs(emb, k=3).localCheckpoint()
n_neg_anchors = triples.filter(F.col("side") == "neg").select("query_id").distinct().count()
n_pos_anchors = triples.filter(F.col("side") == "pos").select("query_id").distinct().count()

# 11. serving: hybrid retrieval over the curated corpus — BM25 lexical
#     top-20 fused with exact-cosine ANN top-20 by reciprocal-rank fusion.
#     At 100 TB swap cosine_knn for ivfadc_search over stage 9's index:
#     rrf_fuse only reads the (query, item, rank) contract.
from tamer_spark.operators.bm25 import bm25_topk
from tamer_spark.operators.fusion import rrf_fuse
from tamer_spark.operators.similarity import cosine_knn

lex = bm25_topk(capped, ["merge", "window", "batch"], k=20)
query_vecs = emb.filter(F.col("vec_id") < 3)
sem_rank = cosine_knn(emb, query_vecs, k=20)
lex_per_q = F.broadcast(
    query_vecs.select(F.col("vec_id").alias("query_id"))
).crossJoin(lex.select(F.col("doc_id").alias("neighbor_id"), "rank"))
hybrid = rrf_fuse([sem_rank, lex_per_q], k0=60, k=5)
n_hybrid = hybrid.count()

# 11b. training order: the epoch's global shuffle is a SEED, not a rand()
#      — same seed reproduces the order bit-for-bit; the total order is
#      (shard, pos), per-shard and parallel (never a single-partition
#      window). A dataloader reads shards in id order, rows in pos order.
from tamer_spark.operators.mixing import seeded_shuffle

train_order = seeded_shuffle(
    split.filter(F.col("split") == "train").select("doc_id"),
    seed="epoch-0",
    n_shards=4,
)
order_a = train_order.orderBy("shard", "pos").collect()
order_b = (
    seeded_shuffle(
        split.filter(F.col("split") == "train").select("doc_id"),
        seed="epoch-0",
        n_shards=4,
    )
    .orderBy("shard", "pos")
    .collect()
)

# 12. export: the curated split ships as deterministic parquet shards +
#     an integrity manifest a dataloader can verify in isolation —
#     membership and in-shard order are both stable hashes, so
#     re-exports are byte-identical and incremental appends never
#     re-route history
from tamer_spark.sinks.shards import verify_shards, write_training_shards

manifest = write_training_shards(
    split.filter(F.col("split") == "train"), str(ws / "train_shards"), n_shards=4
)
verify_shards(spark, str(ws / "train_shards"))

out = spark.read.parquet(str(ws / "curated_chunks"))
print(
    f"documents: {n0} → url-dedup {n_url} → domain-cap {n_domcap} (encoding repair: "
    f"{n_damage_chars} damage chars removed) "
    f"→ c4-clean {n_c4} (spans dropped: {n_spans_dropped}, "
    f"boilerplate lines stripped: {n_bp_lines}) "
    f"→ quality {n1} → exact-dedup {n2} → near-dedup {n3} "
    f"→ substring-run-dedup {n3b} → exsub-cut {n_tok_removed} tokens → mixed {n4} "
    f"→ budget-capped {n4b} → decontaminated {n4c}"
)
print(
    f"contrastive pairs: {n_neg_anchors} anchors with hard negatives, "
    f"{n_pos_anchors} with hard positives; "
    f"training order: {len(order_a)} rows, seed-reproducible: {order_a == order_b}"
)
print(
    f"train shards: {manifest['n_shards']} verified, "
    f"{manifest['total_rows']} rows"
)
print(f"chunks: {out.count()}, tokens: {out.agg(F.sum('n_tokens')).collect()[0][0]}")
print(f"train sequences (512-token greedy bins): {n_bins}")
print(f"next-epoch batch: {n_batch} docs → {n_new} survive the corpus index")
print(f"embeddings: {n_vec} → semdedup {n_sem}; IVFADC entries: {index.count()} (cluster + 2 B PQ code)")
print(
    f"next-epoch vectors: 100 in → {n_epoch} survive semantic prune vs the "
    f"inverted file ({n_resent_survived} re-sent copies slipped through); "
    f"survivors assigned+encoded under frozen models (map-only)"
)
print(
    f"hybrid retrieval (3 queries): {n_hybrid} fused results "
    f"(BM25 top-20 + cosine top-20 → RRF top-5 per query)"
)
# post-pipeline composition drift (r12): did curation skew the language
# mix? TVD between the raw corpus's lang distribution and the curated
# output's, in exact ppm — the number a mix-weight owner watches per epoch.
from tamer_spark.operators.drift import category_drift, total_tvd_ppm

_curated_ids = spark.read.parquet(str(ws / "curated_chunks")).select("doc_id").distinct()
_raw_langs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
_drift = total_tvd_ppm(
    category_drift(_raw_langs, _raw_langs.join(_curated_ids, "doc_id", "left_semi"), ("lang",))
).collect()[0]
print(
    f"template audit: {n_vtext_distinct} volatile-unique raw strings → "
    f"{n_template_groups} masked families (== {n_norm_groups} normalized groups); "
    f"curation lang drift: {_drift.tvd_ppm} ppm over {_drift.n_a}→{_drift.n_b} docs"
)
assert 0 <= _drift.tvd_ppm <= 1_000_000

# numeric drift + audit sample (r12 continuation): the length DISTRIBUTION
# shift curation induced (frozen-grid TVD over n_chars buckets — mass
# moving between length buckets shows even when the mean barely moves),
# and a deterministic 50-doc bottom-k audit sample of the curated corpus
# (the mergeable reservoir: next epoch folds its own 50 rows in O(k)).
from tamer_spark.operators.drift import numeric_drift
from tamer_spark.operators.mixing import bottomk_sample

_raw_len = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "n_chars")
_cur_len = _raw_len.join(_curated_ids, "doc_id", "left_semi")
_ndrift = total_tvd_ppm(
    numeric_drift(_raw_len, _cur_len, "n_chars", lo=0, width=64, n_buckets=64)
).collect()[0]
_audit = bottomk_sample(_curated_ids, 50, salt="audit-0")
n_audit = _audit.count()
print(
    f"curation length drift: {_ndrift.tvd_ppm} ppm (frozen 64x64 grid); "
    f"audit sample: {n_audit} docs (bottom-k, epoch-mergeable); "
    f"winsorized length outliers clamped: {n_clamped}"
)
assert 0 <= _ndrift.tvd_ppm <= 1_000_000
assert n_audit == min(50, _curated_ids.count())
assert n_clamped > 0  # discrete p5/p95 over real sources always clamps the tails

assert n0 >= n_url >= n_domcap >= n_c4 >= n1 >= n2 >= n3 >= n3b >= n4 >= n4b >= n4c >= n4d > 0 and n_bins > 0
assert n_url < n0  # the derived re-crawl noise guarantees url-level groups
assert n_damage_chars > 0  # BOM/CRLF/mojibake all removed or shrunk
assert n_neg_anchors > 0 and n_pos_anchors > 0
assert order_a == order_b and len(order_a) > 0  # same seed, same order
assert n4d == min(400, n4c)  # DLT sample: exactly k docs (or all, if fewer)
assert manifest["total_rows"] > 0
assert n_hybrid == 15  # 3 queries x top-5
assert n_spans_dropped > 0  # the tiny shared vocabulary guarantees cross-doc spans
assert n_new == n_fresh > 0  # every re-sent duplicate caught, every novel doc kept
assert 0 < n_sem <= n_vec and index.count() == n_sem
assert n_resent_survived == 0  # semantic copies of history all pruned
assert n_epoch > 0  # novel directions survive
