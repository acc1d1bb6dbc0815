"""Training-shard export: the last stage of a curation pipeline — write the
curated corpus as N deterministic shards plus an integrity manifest, the
layout a training dataloader consumes.

Design constraints (and how each is met):

- **Stable membership**: a document's shard must not depend on corpus size,
  partitioning, or run order — shard = stable_hash64(id) % n_shards, so
  re-exports and incremental appends route every doc identically (the
  split/sample convention from split_sample_docs, not round-robin or
  monotonically_increasing_id, both of which reshuffle membership on every
  run).
- **Byte-stable files**: rows sort within each shard by (salted hash, id) —
  a deterministic pseudo-random order (so shards are well-mixed for
  training, not sorted by ingest time) that is identical across runs and
  input partitionings.
- **Verifiable**: manifest.json records per-shard row counts and an
  order-independent content digest (bit_xor of row-level md5-derived
  int64s — commutative, associative, overflow-free) — a reader can
  validate any shard in isolation, and two exports of the same data
  produce byte-identical manifests.
- **Scale shape**: ONE shuffle (repartition on the shard id) + in-partition
  sort + parquet write; the manifest aggregate is |shards| rows. No driver
  collect beyond the manifest frame.

No analog in the reference engine (tamer's sink is Kafka); training-data
extension surface.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add a ``shard`` column: stable_hash64(id) % n_shards — content- and
    corpus-size-independent, so membership never shifts across exports."""
    from tamer_spark.functions.hashing import stable_hash64

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column — assign_shard would silently "
            "overwrite it; rename or drop it first"
        )
    return df.withColumn(
        "shard",
        (stable_hash64(F.concat(F.lit("shard-"), F.col(id_col).cast("string"))) % n_shards).cast(
            "int"
        ),
    )


def shard_manifest(df: DataFrame) -> DataFrame:
    """(shard, n_rows, content_digest): order-independent per-shard digest —
    XOR of per-row digests of the FULL row (all columns, canonical JSON).
    Commutative + associative + overflow-free under ANSI mode (a wrapping
    SUM of 60-bit hashes throws ARITHMETIC_OVERFLOW), so it
    partial-aggregates map-side and never depends on row order or
    partitioning. XOR cancels duplicate rows pairwise — safe because
    ``write_training_shards`` REJECTS duplicate/NULL ids at export time
    (see its ValueError contract), and n_rows is checked alongside."""
    from tamer_spark.functions.hashing import stable_hash64

    # NAME-sorted struct fields: the write side and the verify side see
    # different column orders (partitionBy appends the partition column on
    # read-back), and to_json field order follows struct order — sorting by
    # name makes the digest independent of both
    row_digest = stable_hash64(
        F.to_json(F.struct(*sorted(c for c in df.columns if c != "shard")))
    )
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(row_digest).alias("content_digest"),
        )
        .orderBy("shard")
    )


def _persistent_rdd_ids(sc) -> set[int]:
    """Ids of RDDs currently registered as persisted with the context —
    localCheckpoint registers its block-backed RDD here, and (unlike a
    CacheManager entry) ``DataFrame.unpersist()`` can NOT release it.
    (Kept for tests/diagnostics; the sink itself targets its own RDD —
    see ``_checkpointed_jrdd``.)"""
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _checkpointed_jrdd(checkpointed_df: DataFrame):
    """The java RDD backing a just-``localCheckpoint()``-ed frame — its
    analyzed plan is a ``LogicalRDD`` wrapping exactly the RDD that
    ``localCheckpoint`` persisted. Targeting THIS RDD (instead of diffing
    the context's persistent-RDD registry, the pre-r10 approach) cannot
    touch anything the caller owns: a caller frame built over a
    cached-but-not-yet-materialized DataFrame registers its
    InMemoryRelation's backing RDD during the export's materialization,
    and a registry diff would have silently evicted that cache. Returns
    None if the plan shape ever changes (release then falls back to the
    JVM ContextCleaner — correct, just not deterministic)."""
    try:
        plan = checkpointed_df._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return None
        return plan.rdd()
    except Exception:  # pragma: no cover - defensive against plan changes
        return None


def _restore_checkpoint_dir(sc, jsc, prev) -> None:
    """Write the saved scala ``Option`` checkpoint dir back via the bytecode
    var setter ``checkpointDir_$eq`` (exact restore, no re-resolution).

    The setter is ``private[spark]``: if a Spark upgrade ever renames it, an
    exception raised from the caller's ``finally`` would MASK the original
    error and leave the session's checkpoint dir pointed at the export
    directory the caller is told to delete — so fall back to the public
    ``setCheckpointDir`` (accepting one re-resolved UUID nesting level,
    which only widens the path, never dangles it) and warn."""
    try:
        getattr(jsc, "checkpointDir_$eq")(prev)
    except Exception as restore_err:  # noqa: BLE001
        import warnings

        # the fallback must ALSO not raise — this helper runs in the
        # caller's finally, where any exception replaces the original one
        # (e.g. setCheckpointDir mkdirs against a now-unreachable fs)
        if prev.isDefined():
            try:
                sc.setCheckpointDir(prev.get())
                detail = "restored via setCheckpointDir (re-resolved — one extra UUID nesting level)"
            except Exception as fallback_err:  # noqa: BLE001
                detail = (
                    f"fallback setCheckpointDir ALSO failed ({fallback_err!r}) — "
                    "the session checkpoint dir remains the export dir; set it "
                    "manually before the next checkpoint"
                )
        else:
            detail = (
                "prior dir was unset and could not be cleared — the "
                "session checkpoint dir remains the export dir"
            )
        warnings.warn(
            "write_training_shards: exact checkpoint-dir restore via "
            f"checkpointDir_$eq failed ({restore_err!r}); " + detail,
            RuntimeWarning,
            stacklevel=3,
        )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> dict:
    """Export ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (hive-partitioned ``shard=K/`` directories) and write
    ``_manifest.json`` (underscore-prefixed so parquet directory listings skip it, like _SUCCESS) next to them. Returns the manifest dict.

    Rows are sorted within each shard by a salted hash of the id — a fixed
    pseudo-random training order, identical across runs. The write and the
    manifest are two actions, but both read the sharded frame hard-
    materialized after its one shuffle: unlike ``persist``, a checkpoint
    cannot be evicted and recomputed from a nondeterministic upstream, so
    the manifest provably cannot drift from the written files.

    ``checkpoint_dir`` picks the materialization:

    - ``None`` (default): ``localCheckpoint`` — blocks live in executor
      storage, zero external dependencies. CAVEAT at cluster scale: an
      executor loss (incl. dynamic-allocation decommission) makes the
      checkpointed blocks unrecoverable and ABORTS the export job — the
      retry is deterministic (same manifest), but for a 100 TB export on
      preemptible hardware prefer the reliable mode.
    - a path: reliable ``checkpoint()`` to that directory (HDFS/S3 on a
      cluster) — survives executor loss; the export job itself becomes
      fault-tolerant. The caller owns the directory's lifecycle (Spark
      only auto-deletes it with spark.cleaner.referenceTracking.
      cleanCheckpoints=true); delete it after the export returns. The
      context's checkpoint dir is saved and RESTORED around the call
      (including the unset state and every error path), so an export
      never redirects the session's other ``.checkpoint()`` call sites
      — e.g. the cc.py reliable-checkpoint seam — into a directory the
      caller is about to delete. The plan is ``persist()``-ed across the
      eager checkpoint so its second pass (the checkpoint file write)
      reads cached blocks instead of recomputing the post-shuffle stage
      — one data pass, not two, in exactly the 100 TB preemptible
      scenario this mode exists for.

    In the local mode the checkpoint blocks are released DETERMINISTICALLY
    before return (the sink unpersists ITS OWN LogicalRDD, extracted from
    the checkpointed frame's plan — back-to-back exports never pin
    multiple corpus copies waiting for the JVM ContextCleaner, and caller
    caches that happen to materialize during the export are untouched).

    Raises ValueError when ``id_col`` has duplicate or NULL values: the
    manifest's XOR digest cancels duplicate rows pairwise, so two
    divergent shards with duplicated rows could otherwise verify as equal
    — pre-dedup corpora must be deduplicated (or given a surrogate unique
    id) before export.
    """
    from tamer_spark.functions.hashing import stable_hash64

    sc = df.sparkSession.sparkContext
    # the checkpoint sits above the repartition: all three actions
    # (uniqueness gate, file write, manifest) then share the one shuffled
    # materialization instead of re-running the upstream plan
    plan = assign_shard(df, id_col, n_shards).repartition(n_shards, "shard")
    ckpt_jrdd = None
    if checkpoint_dir is not None:
        # setCheckpointDir mutates process-global SparkContext state: save
        # the prior value (a scala Option — the UUID-suffixed resolved dir)
        # and restore it the moment the checkpoint exists, unset included.
        # The restore writes the Option back through the var setter
        # (checkpointDir_$eq — Scala private[spark] is public in bytecode)
        # rather than re-calling setCheckpointDir(resolved), which would
        # RESOLVE AGAIN: mkdirs a fresh UUID subdir UNDER the already-
        # resolved path, so looped exports would nest one level per call.
        jsc = sc._jsc.sc()
        prev = jsc.getCheckpointDir()
        sc.setCheckpointDir(checkpoint_dir)
        try:
            # persist across the eager checkpoint: checkpoint() runs the
            # action AND a checkpoint-write job that would otherwise
            # recompute the post-shuffle stage from shuffle files — the
            # cache turns the second pass into a block read
            plan.persist()
            try:
                sharded = plan.checkpoint()
            finally:
                plan.unpersist()
        finally:
            _restore_checkpoint_dir(sc, jsc, prev)
    else:
        sharded = plan.localCheckpoint()
        ckpt_jrdd = _checkpointed_jrdd(sharded)
    try:
        # uniqueness gate: one tiny 1-row agg over the checkpointed frame.
        # count(lit(1)) counts every row while count_distinct skips NULLs, so
        # this single comparison catches both duplicate and NULL ids.
        chk = sharded.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct(F.col(id_col)).alias("d")
        ).collect()[0]
        if chk.n != chk.d:
            raise ValueError(
                f"write_training_shards requires unique non-NULL {id_col!r} values "
                f"({chk.n} rows, {chk.d} distinct non-NULL ids): the XOR content "
                "digest cancels duplicate rows pairwise, which would blind "
                "verify_shards — dedup or add a surrogate id before export"
            )
        # "shard" leads the sort: the partitioned-file writer requires its
        # input ordered by the partition columns and INSERTS ITS OWN sort
        # otherwise, which does not preserve the secondary order — leading
        # with shard satisfies the requirement so the (salted hash, id)
        # order survives into the files byte-stably
        ordered = sharded.sortWithinPartitions(
            "shard",
            stable_hash64(F.concat(F.lit("order-"), F.col(id_col).cast("string"))),
            id_col,
        )
        ordered.write.mode("overwrite").partitionBy("shard").parquet(path)
        manifest_rows = shard_manifest(sharded).collect()
    finally:
        if ckpt_jrdd is not None:
            # release the localCheckpoint blocks NOW (also on the ValueError
            # path) — DataFrame.unpersist() cannot reach an RDD-level
            # persist. Only the sink's OWN checkpointed RDD is touched;
            # caller caches (even ones first materialized inside this call)
            # are never at risk.
            ckpt_jrdd.unpersist(False)
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "total_rows": int(sum(r.n_rows for r in manifest_rows)),
        "shards": {
            int(r.shard): {"n_rows": int(r.n_rows), "content_digest": int(r.content_digest)}
            for r in manifest_rows
        },
    }
    Path(path, "_manifest.json").write_text(json.dumps(manifest, sort_keys=True, indent=1))
    return manifest


def verify_shards(spark, path: str, shard: int | None = None) -> bool:
    """Re-derive the manifest from the written shards and compare — the
    reader-side integrity check. Raises ValueError on any mismatch.

    ``shard``: verify ONE shard only — the partition filter prunes the
    read to that directory, so a dataloader can validate just the shards
    it is about to consume without scanning the export."""
    manifest = json.loads(Path(path, "_manifest.json").read_text())
    df = spark.read.parquet(path)
    want = {int(k): v for k, v in manifest["shards"].items()}
    if shard is not None:
        if shard not in want:
            raise ValueError(f"shard {shard} not in manifest")
        df = df.filter(F.col("shard") == shard)
        want = {shard: want[shard]}
    got = {
        int(r.shard): {"n_rows": int(r.n_rows), "content_digest": int(r.content_digest)}
        for r in shard_manifest(df).collect()
    }
    if got != want:
        bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
        raise ValueError(f"shard integrity mismatch in shards {sorted(bad)}")
    return True


def shard_diff(path_a: str, path_b: str) -> dict:
    """Manifest-level diff of two exports: which shards changed, appeared,
    or vanished — the incremental re-publish planner (only changed shards
    need re-uploading; stable id-hash membership means an append-only
    corpus change touches only the shards holding new docs). Pure
    manifest arithmetic — no data read."""
    ma = json.loads(Path(path_a, "_manifest.json").read_text())["shards"]
    mb = json.loads(Path(path_b, "_manifest.json").read_text())["shards"]
    a, b = {int(k): v for k, v in ma.items()}, {int(k): v for k, v in mb.items()}
    return {
        "changed": sorted(k for k in a.keys() & b.keys() if a[k] != b[k]),
        "unchanged": sorted(k for k in a.keys() & b.keys() if a[k] == b[k]),
        "only_a": sorted(a.keys() - b.keys()),
        "only_b": sorted(b.keys() - a.keys()),
    }
