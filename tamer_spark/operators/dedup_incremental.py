"""Incremental dedup: new batches against a persisted corpus index.

Batch dedup (operators/dedup.py) re-reads the whole corpus per run. At
100 TB that is the wrong loop: a curation pipeline ingests a few TB of NEW
documents per epoch against a PB-scale historical corpus, and re-hashing
history every epoch would dominate all other work. The scalable shape is an
*index* — the historical corpus reduced to its dedup keys (16-byte content
digests for exact dedup, (band_id, band_sig) bucket keys for MinHash LSH) —
stored once, and each new batch joined against it:

- index build: one pass over history, emitting only keys (≈24 B/doc exact,
  ≈40 B × bands/doc for LSH) — 3-4 orders of magnitude smaller than the text.
- per-epoch cost: hash the NEW batch only, then one join whose shuffle
  volume is the new batch's keys. Stored bucketed on the key
  (sinks/bucketed.write_bucketed), the index side joins with ZERO exchange —
  only the small new-batch side shuffles, and the epoch cost is independent
  of corpus size.
- index update: append the surviving batch's keys (same bucketing). No
  rewrite of history, ever.

This mirrors the reference engine's incremental-ingest posture (tamer's
whole design is "fold new data into persistent state", core Tamer.scala run
loop) applied to the dedup domain; the reference itself has no dedup
operators, so the semantics here follow the batch operators in
operators/dedup.py, which the driver oracle pins.

All plans are pure DataFrame ops — no Python UDFs, whole-stage codegen end
to end, same md5-derived hashing as the batch path so an index built by one
engine is usable by the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tamer_spark.operators.dedup import (
    minhash_signatures,
    normalize_text,
)


def exact_index(
    df: DataFrame, text_col: str = "text", normalize: bool = False
) -> DataFrame:
    """Distinct content digests of a corpus: the exact-dedup index.

    One column ``content_hash`` (hex md5). Distinct is a single digest
    shuffle with map-side combine — the same cost shape as dedup_exact.
    Persist with ``write_bucketed(idx, "dedup_idx", ["content_hash"])`` so
    future anti-joins need no exchange on the index side.
    """
    text = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    return df.select(F.md5(text).alias("content_hash")).distinct()


def dedup_exact_incremental(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Rows of ``new_df`` that survive exact dedup against ``index`` AND
    within the batch (min-id representative per digest, matching
    dedup_exact's keep rule).

    Plan: digest the new batch → in-batch min-id representative via a
    ``row_number`` window partitioned by digest — ONE shuffle over the
    BATCH only, and the anti-join against the index reuses that exact
    partitioning (same key), so no further batch exchange is needed. (The
    groupBy-min + self-join formulation costs three batch exchanges: the
    agg plus both sides of a (digest, id) equi-join — pinned in
    tests/test_dedup_incremental.py.) With the index bucketed on
    content_hash the index side needs zero exchange; a small index
    broadcasts instead. The anti join never widens rows (semi-join
    family), so the output is bounded by the batch.

    Returns the surviving rows of ``new_df`` (original columns) plus their
    ``content_hash`` — feed ``.select("content_hash")`` back through an
    append write to advance the index (see ``append_keys``).
    """
    from pyspark.sql import Window

    text = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    hashed = new_df.withColumn("content_hash", F.md5(text))
    w = Window.partitionBy("content_hash").orderBy(id_col)
    survivors = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return survivors.join(index, "content_hash", "left_anti")


def _banded_sigs(
    df: DataFrame, text_col: str, id_col: str, k: int, bands: int, n: int, seed: int
) -> DataFrame:
    """(doc_id, band_id, band_sig) for every doc × band — THE banding
    expression, in exactly one place: the index build, the exact
    incremental probe, and the bloom-sidecar probe must produce
    bit-identical band keys or the no-false-negative guarantee silently
    breaks, so they all call this instead of carrying copies (same
    banding as minhash_lsh_pairs: k minhashes, ``bands`` bands of k/bands
    rows, '-'-joined string signature). Map-only (row-local staged
    arrays, see minhash_signatures)."""
    if k % bands:
        raise ValueError("k must divide into equal bands")
    r = k // bands
    sigs = minhash_signatures(df, text_col, id_col, k, n, seed)
    return sigs.select(
        "doc_id",
        F.posexplode_outer(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(
                    "-",
                    F.transform(
                        F.slice(F.col("signature"), b * r + 1, r),
                        lambda x: x.cast("string"),
                    ),
                ),
            )
        ).alias("band_id", "band_sig"),
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Distinct (band_id, band_sig) bucket keys of a corpus: the LSH index.

    Banding via ``_banded_sigs`` (shared with both incremental probes so
    index and batch agree bit-for-bit); distinct is one shuffle of
    docs × bands short rows. Persist bucketed on (band_id, band_sig).
    """
    return (
        _banded_sigs(df, text_col, id_col, k, bands, n, seed)
        .select("band_id", "band_sig")
        .distinct()
    )


def dedup_minhash_incremental(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Rows of ``new_df`` with no LSH band collision against ``index`` —
    i.e. not a near-duplicate of anything already in the corpus.

    A doc is dropped when ANY of its band signatures appears in the index
    (the same "share any full band" candidate rule as minhash_lsh_pairs;
    being index-vs-batch there is no pair verification step — at the
    reference thresholds a single full-band match at k/bands rows per band
    is the accept rule, and a stricter pipeline can re-verify survivors'
    candidates with ngram_jaccard_pairs on the tiny collision set).

    Plan: band the new batch (map-only) → LEFT SEMI join against the index
    to find collided doc_ids → LEFT ANTI join the batch against those ids.
    Both joins shuffle only batch-derived rows (docs × bands keys, then
    doc_ids); the index side is exchange-free when bucketed. Within-batch
    near-dups are NOT collapsed here (two novel near-dup docs both survive)
    — run minhash_lsh_pairs on the surviving batch for that, which is cheap
    because the batch is epoch-sized, then append the final survivors'
    bands to the index.
    """
    banded = _banded_sigs(new_df, text_col, id_col, k, bands, n, seed)
    collided = (
        banded.join(index, ["band_id", "band_sig"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return new_df.join(
        collided, new_df[id_col] == collided["doc_id"], "left_anti"
    )


def exact_bloom_index(
    index_or_df: DataFrame,
    col: str = "content_hash",
    m_bits: int = 1 << 16,
    k: int = 5,
) -> list[int]:
    """Bloom words (plan-literal form, small filters — ≤1024 words) over
    an exact-dedup index's digests: the sidecar that frees later epochs
    from scanning the exact index at all (probabilistic mode) or from
    shuffling more than the batch's bloom-positive sliver (verify mode) —
    see ``dedup_exact_incremental_bloom``.

    Maintain it incrementally: ``bloom_merge(words,
    exact_bloom_index(surviving_batch_keys))`` per epoch — bloom union is
    exact, so the sidecar never needs rebuilding over history. Size
    ``m_bits`` at ~10-14 bits/key for ~1-0.1 % FP. Past the plan-literal
    budget (~6k keys at 10 bits/key) use ``exact_bloom_index_df`` — the
    distributed form that never round-trips the words through the driver
    and scales to ~1e9 index keys (the broadcast-join build side,
    ~1-10 GB, is the binding constraint; beyond that shard the bloom by
    digest prefix or fall back to the exact bucketed path).
    """
    from tamer_spark.operators.bloom import bloom_build

    return bloom_build(index_or_df, col, m_bits=m_bits, k=k)


def exact_bloom_index_df(
    index_or_df: DataFrame,
    col: str = "content_hash",
    m_bits: int = 1 << 27,
    k: int = 5,
) -> DataFrame:
    """Distributed bloom sidecar: ``(w, word_m{m_bits}k{k})`` rows (the
    column name encodes the sizing — see bloom._word_col), never collected —
    the index-scale form (see ``exact_bloom_index``). Persist as parquet
    (m_bits/64 rows); advance per epoch with ``bloom_merge_df(words_df,
    exact_bloom_index_df(surviving_batch_keys, m_bits=...))``. Probe-side
    it feeds ``dedup_exact_incremental_bloom`` directly — k broadcast
    hash joins, no shuffle of the batch, no driver transfer (a 2M-word
    filter routed through a Python list costs ~25 s PER ACTION in
    local-relation re-serialization, measured r11).
    """
    from tamer_spark.operators.bloom import bloom_words_df

    return bloom_words_df(index_or_df, col, m_bits=m_bits, k=k)


def dedup_exact_incremental_bloom(
    new_df: DataFrame,
    words: list[int] | DataFrame,
    m_bits: int | None = None,
    k: int | None = None,
    index: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Incremental exact dedup against a bloom sidecar of the index.

    The exact path (``dedup_exact_incremental``) shuffles only the batch,
    but its anti-join still SCANS the whole digest index every epoch —
    ~24 B/doc, which at a 1e12-doc corpus is a 24 TB read per epoch that
    dwarfs any real batch (measured: scripts/incremental_scale_probe.py).
    The bloom sidecar removes it:

    - ``index=None`` (probabilistic): keep only bloom-NEGATIVE rows.
      A bloom has no false negatives, so every true duplicate is
      guaranteed dropped (zero false keeps — the dedup-critical
      direction); the cost is dropping novel docs at the bloom's FP rate
      (~0.1-1 % when sized, acceptable loss for corpus curation — the
      same stance bloom.py's decontamination takes). Per-epoch cost is
      O(batch) with NO index access of any kind.
    - ``index`` given (verify): bloom-positive rows get the exact
      anti-join; output is bit-identical to ``dedup_exact_incremental``
      but the verify join's batch side is only the positive sliver
      (true dups + FP·novel). The index scan returns, so this mode buys
      shuffle reduction, not scan elimination.

    In-batch dedup (min-id representative) is identical to the exact
    path, so the two modes differ only in cross-epoch membership.

    ``words``: the plan-literal list (small sidecars,
    ``exact_bloom_index``) or the distributed ``bloom_words_df`` frame
    (index scale, ``exact_bloom_index_df``) — ``bloom_might_contain``
    dispatches on the type; semantics are identical. For a frame,
    ``m_bits``/``k`` default to the values encoded in its schema (pass
    them only to ASSERT a sizing — a mismatch raises); for a list they
    are REQUIRED, since a bare word list cannot carry its modulus.
    """
    from pyspark.sql import Window

    from tamer_spark.operators.bloom import _parse_word_col, bloom_might_contain

    if isinstance(words, DataFrame):
        _, frame_m, frame_k = _parse_word_col(words)
        m_bits = frame_m if m_bits is None else m_bits
        k = frame_k if k is None else k
    else:
        if m_bits is None:
            raise ValueError(
                "dedup_exact_incremental_bloom: m_bits is required with a "
                "plan-literal word list — a bare list cannot carry its "
                "modulus (the DataFrame form from exact_bloom_index_df "
                "encodes both m_bits and k)"
            )
        k = 5 if k is None else k  # exact_bloom_index's default
    text = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    hashed = new_df.withColumn("content_hash", F.md5(text))
    w = Window.partitionBy("content_hash").orderBy(id_col)
    batch = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    probed = bloom_might_contain(batch, "content_hash", words, m_bits, k=k)
    # column order pinned to dedup_exact_incremental's output (its key join
    # leads with content_hash) so the two paths are drop-in interchangeable
    # — including when new_df ALREADY carries a content_hash column (e.g. a
    # previous survivor frame), which must not be listed twice
    cols = ["content_hash", *[c for c in new_df.columns if c != "content_hash"]]
    negatives = probed.filter(~F.col("bloom_hit")).select(cols)
    if index is None:
        return negatives
    positives = probed.filter(F.col("bloom_hit")).drop("bloom_hit")
    verified = positives.join(index, "content_hash", "left_anti").select(cols)
    return negatives.unionByName(verified)


def _band_key(df: DataFrame) -> DataFrame:
    """(band_id, band_sig) → one string probe key. NULL-free by
    construction (band_sig is a concat_ws product, band_id a posexplode
    ordinal), so concat never nulls out a key."""
    return df.withColumn(
        "_bk", F.concat(F.col("band_id").cast("string"), F.lit(":"), F.col("band_sig"))
    )


def minhash_bloom_index(
    index: DataFrame, m_bits: int = 1 << 27, k: int = 5
) -> DataFrame:
    """Distributed bloom sidecar over an LSH band index's (band_id,
    band_sig) bucket keys — the near-dup analog of
    ``exact_bloom_index_df``. Build once over the persisted index, advance
    per epoch with ``bloom_merge_df`` over the surviving batch's bands.
    MATERIALIZE the result (parquet / persist) before probing: a lazy
    words frame embeds the index-banding plan and re-executes it inside
    every probe, silently restoring the per-epoch index cost the sidecar
    exists to remove (same rule for ``exact_bloom_index_df``).
    """
    from tamer_spark.operators.bloom import bloom_words_df

    return bloom_words_df(_band_key(index), "_bk", m_bits=m_bits, k=k)


def dedup_minhash_incremental_bloom(
    new_df: DataFrame,
    words: DataFrame,
    m_bits: int | None = None,
    bloom_k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup incremental dedup against a bloom sidecar of the LSH band
    index: drop a doc when ANY of its band keys bloom-hits.

    Same decision rule as ``dedup_minhash_incremental`` (any-full-band
    collision), same error direction as the exact-dedup sidecar: a bloom
    has no false negatives, so every doc that WOULD have collided with the
    index is guaranteed dropped (zero false keeps of near-dups); bloom FPs
    drop novel docs at the sized FP rate — and since a doc is dropped on
    ANY of its ``bands`` keys hitting, the per-doc false-drop rate is
    ≤ bands × the per-key rate (size ``m_bits`` accordingly). The index
    itself is never touched: per-epoch cost is banding the batch
    (map-only) + k broadcast-join probes + one batch-keyed anti join.

    ``m_bits``/``bloom_k`` default to the values encoded in ``words``'s
    schema (the ``bloom_words_df`` contract) — pass them explicitly only
    to ASSERT a particular sizing; a mismatch raises.
    """
    from tamer_spark.operators.bloom import _parse_word_col, bloom_might_contain

    _, frame_m, frame_k = _parse_word_col(words)
    m_bits = frame_m if m_bits is None else m_bits
    bloom_k = frame_k if bloom_k is None else bloom_k
    banded = _banded_sigs(new_df, text_col, id_col, k, bands, n, seed)
    probed = bloom_might_contain(_band_key(banded), "_bk", words, m_bits, k=bloom_k)
    collided = probed.filter(F.col("bloom_hit")).select("doc_id").distinct()
    return new_df.join(
        collided, new_df[id_col] == collided["doc_id"], "left_anti"
    )


def append_keys(index: DataFrame, new_keys: DataFrame) -> DataFrame:
    """Advance an index by a surviving batch's keys (plan form).

    For a catalog-table index the physical form is
    ``new_keys.write.mode("append")`` with the SAME bucketing as the
    original ``write_bucketed`` call — append preserves bucket layout, so
    the zero-exchange join property survives every epoch. This helper is
    the logical equivalent for in-session composition and tests.
    """
    return index.unionByName(new_keys).distinct()


def minhash_band_posting_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """ID-CARRYING LSH index: ``(doc_id, band_id, band_sig)`` — the posting
    form of ``minhash_band_index`` for pipelines that need the collided
    PAIRS (cluster maintenance via cc_incremental), not just the batch's
    survivors. Same ``_banded_sigs`` banding (bit-identical keys), one
    distinct; persist bucketed on (band_id, band_sig). Per epoch, append
    the surviving batch's postings (append_keys works unchanged — the
    union key set just carries doc_id along)."""
    return _banded_sigs(df, text_col, id_col, k, bands, n, seed).distinct()


def minhash_epoch_pairs(
    new_df: DataFrame,
    posting_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Every near-dup candidate pair TOUCHING this epoch's batch:
    batch × history collisions (band equi-join against the posting index)
    ∪ within-batch pairs (minhash_lsh_pairs over the batch alone). Returns
    ``(doc_a, doc_b)`` with doc_a < doc_b, distinct.

    This is exactly the pair set cc_incremental needs: the full corpus
    pair graph = history-history pairs (already inside the previous
    assignment's star forest, connectivity-wise) ∪ pairs touching the
    batch — so ``cc_incremental(prev, minhash_epoch_pairs(batch, index))``
    equals full-corpus clustering (pinned in tests) while deriving pairs
    only for the batch.

    Plan: the batch bands map-only and both joins shuffle batch-derived
    rows only (the index side is exchange-free when bucketed on the band
    key); within-batch pairs are epoch-sized. ``max_bucket`` is the
    standard hot-bucket guard for the WITHIN-batch half; the cross half
    joins the index directly (bound it by bucketing/compaction policy —
    an index bucket is history-sized, not batch-sized).
    """
    # ONE banding pass feeds BOTH halves — the k-minhash signature map is
    # the epoch's dominant cost and computing it once is the point of the
    # O(batch) story (review r12: the first cut called minhash_lsh_pairs
    # for the within half, silently re-deriving identical signatures).
    banded = _banded_sigs(new_df, text_col, id_col, k, bands, n, seed).persist()
    hist = posting_index.select(
        F.col("doc_id").alias("_hist_id"), "band_id", "band_sig"
    )
    cross = (
        banded.join(hist, ["band_id", "band_sig"])
        .filter(F.col("doc_id") != F.col("_hist_id"))
        .select(
            F.least("doc_id", "_hist_id").alias("doc_a"),
            F.greatest("doc_id", "_hist_id").alias("doc_b"),
        )
        .distinct()
    )
    wb = banded
    if max_bucket is not None:
        # the same hot-bucket guard (and the same None-=-uncapped contract)
        # as minhash_lsh_pairs, applied to the shared banded frame
        sizes = wb.groupBy("band_id", "band_sig").count()
        small = sizes.filter(F.col("count") <= max_bucket).drop("count")
        wb = wb.join(small, ["band_id", "band_sig"])
    a, b = wb.alias("a"), wb.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    from tamer_spark.operators.dedup import _release_on_gc

    return _release_on_gc(cross.unionByName(within).distinct(), banded)
