"""Pins for the ADVICE r10 findings + the VERDICT r10 #4 lease
heartbeat:

1. give-back rename failure cleans the orphaned steal file and still
   yields (no second concurrent lease);
2. NULL ``__bucket`` rows survive the per-bucket sizing join
   (eqNullSafe, not a name-list inner join);
3. the PIL luma path computes the same channel-sum luminance as the
   PNM path, so hashes compare across codec paths;
4. an in-stream CompactionAborted warn-skips instead of failing the
   ingest epoch;
5. the lock-mtime heartbeat keeps a long compaction's lease fresh past
   lease_ttl_sec (concurrent acquire refused), and a genuinely stolen
   lease aborts BEFORE the commit rename.
"""

import glob
import os
import time as _real_time

import pytest
from pyspark.sql import functions as F

from scalding_spark import streaming
import scalding_spark.streaming._compact as _c


def _store_with_epochs(spark, store, tag="beefbeefbeef", epochs=3,
                       rows_per_epoch=50, bucket=None):
    for e in range(epochs):
        base = spark.range(e * rows_per_epoch, (e + 1) * rows_per_epoch)
        cols = [F.md5(F.col("id").cast("string")).alias("fp"),
                F.lit(f"{tag}-{e}").alias("__batch")]
        parts = ["__batch"]
        if bucket is not None:
            cols.append(bucket.alias("__bucket"))
            parts.append("__bucket")
        base.select(*cols).write.mode("append") \
            .partitionBy(*parts).parquet(store)
    return tag


# -- 1. ADVICE r10 #1: give-back rename failure ---------------------------

def test_giveback_rename_failure_cleans_steal_and_yields(spark, tmp_path,
                                                         monkeypatch):
    """Third-caller race on the stale-steal give-back: the lock looked
    stale at the first stat, fresh at the re-check (someone replaced it
    mid-steal), and by the time we rename our steal file back a THIRD
    caller has recreated the lock. The give-back rename then fails; the
    fix deletes the orphaned steal file and still raises CompactionBusy
    — exactly one lease (the third caller's) survives."""
    store = str(tmp_path / "store")
    os.makedirs(store)
    lock_path = os.path.join(store, "_COMPACT_LOCK")
    with open(lock_path, "w") as f:
        f.write("victim\n")
    mtime = os.path.getmtime(lock_path)
    fs, root, jvm = _c._fs_for(spark, store)

    calls = []

    class _FakeTime:
        @staticmethod
        def time():
            calls.append(1)
            if len(calls) == 1:
                return mtime + 1000.0  # first stat: looks stale
            # Between our steal-rename and the give-back, the third
            # caller recreates the lock. POSIX rename() would silently
            # OVERWRITE a plain file (local-fs quirk — HDFS/object
            # stores return false), so the recreated lock is a
            # non-empty directory here, the portable way to make the
            # give-back rename actually FAIL like it does on HDFS.
            os.makedirs(lock_path)
            with open(os.path.join(lock_path, "owner"), "w") as f:
                f.write("third-caller\n")
            return mtime  # ...and the re-check sees a FRESH steal

    monkeypatch.setattr(_c, "time", _FakeTime)
    with pytest.raises(_c.CompactionBusy, match="refreshed concurrently"):
        _c._acquire_lease(fs, jvm, root, ttl_sec=60)
    monkeypatch.setattr(_c, "time", _real_time)
    # the orphaned steal file is cleaned up, the third caller's lease
    # survives untouched
    assert not glob.glob(os.path.join(store, "*steal*"))
    assert os.path.isdir(lock_path)
    assert open(os.path.join(lock_path, "owner")).read().strip() \
        == "third-caller"


# -- 2. ADVICE r10 #2: NULL __bucket rows survive sizing ------------------

def test_null_bucket_rows_survive_per_bucket_sizing(spark, tmp_path):
    """compact_store is generic over any __bucket-carrying dataset; a
    NULL bucket partition (__HIVE_DEFAULT_PARTITION__) must be rewritten
    like any other, not silently dropped by the sizing join while its
    source partitions are deleted after commit."""
    store = str(tmp_path / "bstore")
    tag = _store_with_epochs(
        spark, store, epochs=3, rows_per_epoch=300,
        bucket=F.when(F.col("id") % 3 == 0, F.lit(None).cast("int"))
               .otherwise((F.col("id") % 3).cast("int")))
    before = sorted(
        r.fp for r in spark.read.parquet(store)
        .where(F.col("__batch") != f"{tag}-2").collect())
    n_null_before = (spark.read.parquet(store)
                     .where(F.col("__batch") != f"{tag}-2")
                     .where(F.col("__bucket").isNull()).count())
    assert n_null_before > 0
    got = streaming.compact_store(spark, store, rows_per_file=100)
    assert got[tag]["rows"] == 600
    cpart = spark.read.parquet(store).where(F.col("__batch") == f"{tag}-c1")
    assert sorted(r.fp for r in cpart.collect()) == before
    assert cpart.where(F.col("__bucket").isNull()).count() == n_null_before


# -- 3. ADVICE r10 #3: cross-codec luma consistency -----------------------

def test_pil_path_hashes_match_pnm_path(spark, monkeypatch):
    """The same pixels through the PNM parser and through the (faked)
    PIL path must produce the SAME dHash: both compute channel-SUM
    luminance, so a re-encode across codec paths cannot flip hash bits.
    PIL isn't installed in this container; the fake exercises the exact
    convert('RGB')→sum code path _luma_grid runs when it is."""
    import numpy as np
    from scalding_spark.functions import multimodal as mm

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(10, 12, 3), dtype=np.uint8)
    ppm = b"P6\n12 10\n255\n" + px.tobytes()
    fake_png = b"\x89PNG-fake:" + px.tobytes()

    class _FakeImg:
        def convert(self, mode):
            assert mode == "RGB", (
                "the cross-codec contract requires the channel-sum path "
                "(convert('RGB') then sum), not convert('L') ITU-R luma")
            return px

    class _FakePIL:
        @staticmethod
        def open(buf):
            assert buf.read() == fake_png
            return _FakeImg()

    monkeypatch.setattr(mm, "_HAS_PIL", True)
    monkeypatch.setattr(mm, "_PILImage", _FakePIL)
    via_pnm = mm._luma_grid(ppm, 8, 9)
    via_pil = mm._luma_grid(fake_png, 8, 9)
    assert (via_pnm == via_pil).all()


# -- 4. ADVICE r10 #4: in-stream abort is warn-skipped --------------------

def test_maybe_compact_warn_skips_aborted(spark, tmp_path, monkeypatch):
    """CompactionAborted inside the foreachBatch compaction hook leaves
    the dataset consistent (temp deleted, sources kept) — it must warn
    and skip like CompactionBusy, never fail the ingest epoch (which
    would lose the .partial run-tag ledger)."""
    def boom(spark_, p, **kw):
        raise _c.CompactionAborted("live writer detected", partial={})

    monkeypatch.setattr(_c, "compact_store", boom)
    with pytest.warns(UserWarning, match="compaction skipped"):
        streaming._maybe_compact(spark, 1, 2, str(tmp_path / "s"))

    def crash(spark_, p, **kw):
        raise ValueError("genuinely unexpected")

    monkeypatch.setattr(_c, "compact_store", crash)
    with pytest.raises(ValueError):
        streaming._maybe_compact(spark, 1, 2, str(tmp_path / "s"))


# -- 5. VERDICT r10 #4: lease heartbeat -----------------------------------

def test_heartbeat_keeps_long_compaction_unstolen(spark, tmp_path,
                                                  monkeypatch):
    """A compaction outliving lease_ttl_sec must NOT be stealable while
    its process lives: the heartbeat keeps the lock mtime moving, so a
    concurrent acquire past the TTL still sees a live lease and yields."""
    store = str(tmp_path / "store")
    _store_with_epochs(spark, store, epochs=3)
    fs, root, jvm = _c._fs_for(spark, store)
    orig = _c._write_manifest
    seen = {}

    def slow_writer(fs_, jvm_, mpath, names):
        _real_time.sleep(4.0)  # outlive lease_ttl_sec=3
        with pytest.raises(_c.CompactionBusy) as exc:
            _c._acquire_lease(fs, jvm, root, ttl_sec=3)
        seen["msg"] = str(exc.value)
        return orig(fs_, jvm_, mpath, names)

    monkeypatch.setattr(_c, "_write_manifest", slow_writer)
    got = streaming.compact_store(spark, store, lease_ttl_sec=3)
    assert got and "msg" in seen
    # refused as LIVE (mtime fresh), not stolen-then-given-back
    assert "refusing to run concurrently" in seen["msg"]
    assert not os.path.exists(os.path.join(store, "_COMPACT_LOCK"))


def test_stolen_lease_aborts_before_commit(spark, tmp_path, monkeypatch):
    """If the lease IS lost mid-run (lock replaced by a thief), the
    commit-point ownership re-proof must abort: temp cleaned, sources
    untouched, no c-partition, and the thief's lock left in place."""
    store = str(tmp_path / "store")
    tag = _store_with_epochs(spark, store, epochs=3)
    lock_path = os.path.join(store, "_COMPACT_LOCK")
    orig = _c._write_manifest

    def thief_writer(fs_, jvm_, mpath, names):
        with open(lock_path, "w") as f:
            f.write("thief\n")
        return orig(fs_, jvm_, mpath, names)

    monkeypatch.setattr(_c, "_write_manifest", thief_writer)
    with pytest.raises(_c.CompactionAborted, match="lease lost"):
        streaming.compact_store(spark, store)
    monkeypatch.setattr(_c, "_write_manifest", orig)
    batches = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(store, "__batch=*")))
    assert batches == [f"__batch={tag}-{e}" for e in range(3)]
    assert not glob.glob(str(tmp_path) + "/*__compact_tmp*")
    assert open(lock_path).read().strip() == "thief"
    # the thief's (fresh) lease still refuses a new compaction
    with pytest.raises(_c.CompactionBusy):
        streaming.compact_store(spark, store)


# -- 6. self-review r11: transient read failures vs real steals -----------

def test_token_matches_retries_transient_failures(monkeypatch):
    """_token_matches must retry _READ_FAILED (proves nothing) and only
    answer from a successful read; persistent failure answers False
    conservatively (don't publish / don't delete), never 'stolen'."""
    seq = [_c._READ_FAILED, _c._READ_FAILED, "tok"]
    monkeypatch.setattr(_c, "_read_lock_token",
                        lambda fs, jvm, lock: seq.pop(0))
    monkeypatch.setattr(_c.time, "sleep", lambda s: None)
    assert _c._token_matches(None, None, None, "tok") is True
    seq = [_c._READ_FAILED] * 3
    assert _c._token_matches(None, None, None, "tok") is False
    seq = ["thief"]
    assert _c._token_matches(None, None, None, "tok") is False


def test_heartbeat_transient_read_does_not_latch_stolen(spark, tmp_path,
                                                        monkeypatch):
    """One throttled/failed token read inside the heartbeat must SKIP
    the beat, not latch stolen=True (which would spuriously abort a
    multi-hour compaction); a later positive mismatch still detects a
    real steal."""
    store = str(tmp_path / "store")
    os.makedirs(store)
    lock_path = os.path.join(store, "_COMPACT_LOCK")
    with open(lock_path, "w") as f:
        f.write("tok\n")
    fs, root, jvm = _c._fs_for(spark, store)
    Path = jvm.org.apache.hadoop.fs.Path
    lock = Path(store, "_COMPACT_LOCK")
    real = _c._read_lock_token
    fails = {"n": 2}

    def flaky(fs_, jvm_, lock_):
        if fails["n"] > 0:
            fails["n"] -= 1
            return _c._READ_FAILED
        return real(fs_, jvm_, lock_)

    monkeypatch.setattr(_c, "_read_lock_token", flaky)
    hb = _c._LeaseHeartbeat(fs, jvm, lock, "tok", interval_sec=0.25).start()
    try:
        _real_time.sleep(1.2)
        assert hb.stolen is False          # failures skipped, not latched
        assert hb.owned() is True
        with open(lock_path, "w") as f:    # a REAL steal
            f.write("thief\n")
        _real_time.sleep(0.8)
        assert hb.stolen is True
        assert hb.owned() is False
    finally:
        hb.stop()
