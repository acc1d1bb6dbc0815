"""Training-shard export sink (sinks/shards.py): deterministic membership,
byte-stable ordering, manifest integrity."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from tamer_spark.sinks.shards import (
    assign_shard,
    shard_manifest,
    verify_shards,
    write_training_shards,
)


def _corpus(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 7).alias("score"),
    )


def test_roundtrip_and_manifest_counts(spark, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(_corpus(spark), path, n_shards=8)
    assert manifest["total_rows"] == 200
    assert set(manifest["shards"]) == set(range(8))
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == 200
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(200))
    # manifest.json on disk matches the returned dict
    disk = json.loads(Path(path, "_manifest.json").read_text())
    assert disk["total_rows"] == 200
    assert verify_shards(spark, path)


def test_export_is_deterministic_across_runs(spark, tmp_path):
    # same data, different input partitioning -> identical manifests
    m1 = write_training_shards(_corpus(spark).repartition(13), str(tmp_path / "a"), 4)
    m2 = write_training_shards(_corpus(spark).repartition(3), str(tmp_path / "b"), 4)
    assert m1 == m2
    # and byte-stable in-shard order: first rows of shard 0 agree
    r1 = spark.read.parquet(str(tmp_path / "a")).filter("shard = 0").collect()
    r2 = spark.read.parquet(str(tmp_path / "b")).filter("shard = 0").collect()
    assert [r.doc_id for r in r1] == [r.doc_id for r in r2]


def test_shard_membership_stable_under_corpus_growth(spark, tmp_path):
    # a doc's shard must not change when the corpus doubles (incremental
    # exports route history identically)
    small = assign_shard(_corpus(spark, 100), "doc_id", 8)
    big = assign_shard(_corpus(spark, 200), "doc_id", 8)
    s = {r.doc_id: r.shard for r in small.collect()}
    b = {r.doc_id: r.shard for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_verify_detects_corruption(spark, tmp_path):
    import pytest

    path = str(tmp_path / "shards")
    write_training_shards(_corpus(spark), path, n_shards=2)
    manifest = json.loads(Path(path, "_manifest.json").read_text())
    manifest["shards"]["0"]["content_digest"] += 1
    Path(path, "_manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="integrity mismatch"):
        verify_shards(spark, path)


def test_manifest_digest_is_order_independent(spark):
    d1 = shard_manifest(assign_shard(_corpus(spark).orderBy("doc_id"), "doc_id", 4))
    d2 = shard_manifest(
        assign_shard(_corpus(spark).orderBy(F.col("doc_id").desc()), "doc_id", 4)
    )
    assert {tuple(r) for r in d1.collect()} == {tuple(r) for r in d2.collect()}


def test_single_shard_verification_and_diff(spark, tmp_path):
    import pytest

    from tamer_spark.sinks.shards import shard_diff

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(_corpus(spark, 100), a, n_shards=4)
    # b: same corpus plus 30 appended docs — stable membership means only
    # the shards holding new docs change
    write_training_shards(_corpus(spark, 130), b, n_shards=4)
    assert verify_shards(spark, a, shard=0)
    with pytest.raises(ValueError, match="not in manifest"):
        verify_shards(spark, a, shard=99)
    d = shard_diff(a, b)
    assert not d["only_a"] and not d["only_b"]
    assert set(d["changed"]) | set(d["unchanged"]) == set(range(4))
    # every doc of the smaller corpus kept its shard, so any UNCHANGED
    # shard received no new docs — count check per manifest
    import json
    from pathlib import Path

    mb = json.loads(Path(b, "_manifest.json").read_text())["shards"]
    ma = json.loads(Path(a, "_manifest.json").read_text())["shards"]
    for k in d["unchanged"]:
        assert ma[str(k)] == mb[str(k)]
    assert sum(mb[str(k)]["n_rows"] for k in range(4)) == 130


def test_export_rejects_duplicate_and_null_ids(spark, tmp_path):
    # r8 guard: the XOR manifest digest cancels duplicate rows pairwise, so
    # the sink must refuse non-unique ids — and the error must name the
    # count mismatch so the contract text is load-bearing
    import pytest

    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    with pytest.raises(
        ValueError, match=r"unique non-NULL 'doc_id' values \(3 rows, 2 distinct"
    ):
        write_training_shards(dup, str(tmp_path / "d"), 2)
    # the gate fires BEFORE the file write: nothing lands under the path
    assert not (tmp_path / "d").exists()

    nulls = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id long, text string"
    )
    # count_distinct skips NULLs, so the same single comparison catches them
    with pytest.raises(ValueError, match=r"\(2 rows, 1 distinct"):
        write_training_shards(nulls, str(tmp_path / "n"), 2)


def test_reliable_checkpoint_mode_manifest_identical(spark, tmp_path):
    # checkpoint_dir=None (localCheckpoint) and a reliable checkpoint dir
    # must be observationally identical exports — byte-identical manifests,
    # verifiable files; only the fault-tolerance story differs
    m_local = write_training_shards(_corpus(spark), str(tmp_path / "local"), 4)
    m_rel = write_training_shards(
        _corpus(spark), str(tmp_path / "rel"), 4, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert m_local == m_rel
    assert verify_shards(spark, str(tmp_path / "rel"))
    assert Path(tmp_path / "local", "_manifest.json").read_bytes() == Path(
        tmp_path / "rel", "_manifest.json"
    ).read_bytes()
    # the reliable checkpoint actually materialized in the caller-owned dir
    assert any((tmp_path / "ckpt").rglob("rdd-*")), "no reliable checkpoint written"


def test_localcheckpoint_blocks_released_deterministically(spark, tmp_path):
    # back-to-back exports must not pin multiple corpus copies waiting for
    # the JVM ContextCleaner — the sink diffs the persistent-RDD registry
    # and unpersists its own blocks before returning, on success AND on the
    # ValueError gate path
    import pytest

    from tamer_spark.sinks.shards import _persistent_rdd_ids

    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    write_training_shards(_corpus(spark), str(tmp_path / "s"), 4)
    assert _persistent_rdd_ids(sc) - before == set()

    dup = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id long, text string")
    before = _persistent_rdd_ids(sc)
    with pytest.raises(ValueError):
        write_training_shards(dup, str(tmp_path / "d"), 2)
    assert _persistent_rdd_ids(sc) - before == set()


def test_export_preserves_caller_cache(spark, tmp_path):
    # r10 (ADVICE): a caller frame cached but NOT yet materialized registers
    # its InMemoryRelation's backing RDD only during the export's
    # materialization — the pre-r10 registry-diff release would have
    # silently unpersisted it. The targeted release must leave it alone.
    from tamer_spark.sinks.shards import _persistent_rdd_ids

    sc = spark.sparkContext
    base = _corpus(spark).persist()
    try:
        before = _persistent_rdd_ids(sc)
        write_training_shards(base, str(tmp_path / "s"), 4)
        new_ids = _persistent_rdd_ids(sc) - before
        # exactly the caller's cache RDD survives (the sink's own
        # localCheckpoint blocks were released before return) and its
        # storage level is still real, not NONE
        assert len(new_ids) == 1, new_ids
        lvl = sc._jsc.getPersistentRDDs().get(next(iter(new_ids))).getStorageLevel()
        assert lvl.useMemory() or lvl.useDisk()
        # and the cache is actually usable afterwards
        assert base.count() == 200
    finally:
        base.unpersist()


def test_checkpoint_dir_saved_and_restored(spark, tmp_path):
    # r10 (VERDICT item 2): reliable-mode export must not clobber the
    # session's checkpoint dir — restore a caller sentinel, restore the
    # UNSET state, and restore on the ValueError gate path too
    import pytest

    jsc = spark.sparkContext._jsc.sc()
    assert not jsc.getCheckpointDir().isDefined(), "test requires unset start state"

    # 1) unset before -> unset after
    write_training_shards(
        _corpus(spark), str(tmp_path / "a"), 2, checkpoint_dir=str(tmp_path / "ck_a")
    )
    assert not jsc.getCheckpointDir().isDefined()

    # 2) caller sentinel before -> the EXACT resolved dir after. Byte
    # identity matters: a restore that re-called setCheckpointDir(resolved)
    # would resolve AGAIN and nest a fresh UUID subdir per export — looped
    # exports would grow the path one level per call.
    sentinel = str(tmp_path / "sentinel_ckpt")
    spark.sparkContext.setCheckpointDir(sentinel)
    try:
        resolved_before = jsc.getCheckpointDir().get()
        write_training_shards(
            _corpus(spark), str(tmp_path / "b"), 2, checkpoint_dir=str(tmp_path / "ck_b")
        )
        restored = jsc.getCheckpointDir()
        assert restored.isDefined() and restored.get() == resolved_before
        # a later unrelated checkpoint goes back under the caller's tree,
        # not the export's directory
        spark.range(5).checkpoint()
        assert any((tmp_path / "sentinel_ckpt").rglob("rdd-*"))

        # 3) error path: the gate ValueError must not leak the export dir
        dup = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            write_training_shards(
                dup, str(tmp_path / "c"), 2, checkpoint_dir=str(tmp_path / "ck_c")
            )
        restored = jsc.getCheckpointDir()
        assert restored.isDefined() and restored.get() == resolved_before
    finally:
        jsc.setCheckpointDir(None)


def test_checkpoint_dir_restore_falls_back_when_setter_missing():
    # r11 (ADVICE): if a Spark upgrade renames the private bytecode setter,
    # the restore must NOT raise from the caller's finally (masking the real
    # error + leaving the checkpoint dir pointed at the export dir) — it
    # falls back to the public setCheckpointDir and warns. Pure-fake test:
    # the helper only delegates, so no JVM objects are needed.
    import warnings

    from tamer_spark.sinks.shards import _restore_checkpoint_dir

    class FakeOpt:
        def __init__(self, val):
            self._val = val

        def isDefined(self):
            return self._val is not None

        def get(self):
            return self._val

    class FakeSC:
        def __init__(self):
            self.set_calls = []

        def setCheckpointDir(self, d):
            self.set_calls.append(d)

    class GoodJsc:
        def __init__(self):
            self.restored = None

        def checkpointDir_(self):  # pragma: no cover - name mangled below
            pass

    # happy path: setter exists -> exact restore, no warning, no fallback
    good = GoodJsc()
    setattr(good, "checkpointDir_$eq", lambda prev: setattr(good, "restored", prev))
    sc = FakeSC()
    prev = FakeOpt("/ckpt/base-uuid")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _restore_checkpoint_dir(sc, good, prev)
    assert good.restored is prev and sc.set_calls == []

    class BrokenJsc:
        pass  # no checkpointDir_$eq attribute at all -> getattr raises

    # defined prev: falls back to the public API with the unwrapped value
    sc = FakeSC()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _restore_checkpoint_dir(sc, BrokenJsc(), FakeOpt("/ckpt/base-uuid"))
    assert sc.set_calls == ["/ckpt/base-uuid"]
    assert len(w) == 1 and issubclass(w[0].category, RuntimeWarning)
    assert "re-resolved" in str(w[0].message)

    # unset prev: nothing to restore through the public API; warn only
    sc = FakeSC()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _restore_checkpoint_dir(sc, BrokenJsc(), FakeOpt(None))
    assert sc.set_calls == []
    assert len(w) == 1 and "could not be cleared" in str(w[0].message)


def test_checkpoint_dir_restore_survives_fallback_failure():
    # r11 review: the fallback setCheckpointDir can itself fail (fs down) —
    # nothing may raise out of the caller's finally; the warning carries
    # both failures instead
    import warnings

    from tamer_spark.sinks.shards import _restore_checkpoint_dir

    class FakeOpt:
        def isDefined(self):
            return True

        def get(self):
            return "/ckpt/base"

    class BrokenJsc:
        pass

    class BrokenSC:
        def setCheckpointDir(self, d):
            raise RuntimeError("fs unreachable")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _restore_checkpoint_dir(BrokenSC(), BrokenJsc(), FakeOpt())  # must not raise
    assert len(w) == 1 and "ALSO failed" in str(w[0].message)
