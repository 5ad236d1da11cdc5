"""compact_store (streaming/_compact.py): consolidating closed
``__batch`` epoch partitions without breaking the ingest tiers'
replay-hole idempotency, batch≡stream parity, or (for the bucketed
semantic store) partition pruning."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from scalding_spark import streaming

DOC_SCHEMA = "doc_id long, text string"
VEC_SCHEMA = "vec_id long, embedding array<double>"


def _paths(tmp_path, *names):
    return tuple(str(tmp_path / n) for n in names)


def _ingest_epoch(spark, src, corpus, store, ckpt, rows):
    """Append ``rows`` to the source dir and drain one availableNow
    epoch through the exact-dedup tier."""
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("append").parquet(src)
    q = streaming.stream_ingest_dedup(
        streaming.stream_from_parquet_dir(spark, src, DOC_SCHEMA),
        corpus_path=corpus, store_path=store, checkpoint=ckpt,
        text_col="text", id_col="doc_id")
    q.awaitTermination(120)


def _parquet_files(root):
    return [p for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                                 recursive=True)]


def _batch_dirs(root):
    return sorted(os.path.basename(p) for p in
                  glob.glob(os.path.join(root, "__batch=*")))


def test_compact_consolidates_closed_epochs_only(spark, tmp_path):
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    _ingest_epoch(spark, src, corpus, store, ckpt, [(0, "aa"), (1, "bb")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(2, "cc")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(3, "dd"), (4, "ee")])
    before_fps = sorted(r.fp for r in spark.read.parquet(store).collect())
    files_before = len(_parquet_files(store))
    got = streaming.compact_store(spark, store)
    assert run_tag in got and got[run_tag]["rows"] == 3  # epochs 0+1
    # newest epoch untouched, closed epochs replaced by ONE c-partition
    assert _batch_dirs(store) == [f"__batch={run_tag}-2",
                                  f"__batch={run_tag}-c1"]
    after_fps = sorted(r.fp for r in spark.read.parquet(store).collect())
    assert after_fps == before_fps  # content bit-identical
    assert len(_parquet_files(store)) < files_before  # the point


def test_compact_noop_below_min_batches(spark, tmp_path):
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    _ingest_epoch(spark, src, corpus, store, ckpt, [(0, "aa")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(1, "bb")])
    # one closed epoch < min_batches=2 → no-op
    assert streaming.compact_store(spark, store) == {}
    assert len(_batch_dirs(store)) == 2
    # nonexistent path → no-op, not an error
    assert streaming.compact_store(spark, str(tmp_path / "nope")) == {}


def test_ingest_parity_across_compaction(spark, tmp_path):
    """batch≡stream across a mid-stream compaction: the compacted store
    must keep deduplicating exactly as the uncompacted one would."""
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    b1 = [(0, "alpha"), (1, "beta")]
    b2 = [(2, "gamma"), (3, "alpha")]      # 3 dups 0 cross-epoch
    b3 = [(4, "delta")]
    _ingest_epoch(spark, src, corpus, store, ckpt, b1)
    _ingest_epoch(spark, src, corpus, store, ckpt, b2)
    _ingest_epoch(spark, src, corpus, store, ckpt, b3)
    assert streaming.compact_store(spark, store)
    # post-compaction epochs: duplicates of COMPACTED history must still
    # be caught, novelty must still pass
    b4 = [(5, "beta"), (6, "epsilon"), (7, "gamma")]
    _ingest_epoch(spark, src, corpus, store, ckpt, b4)
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    # batch oracle: first doc_id per distinct text across all batches
    texts = {}
    for i, t in b1 + b2 + b3 + b4:
        texts.setdefault(t, i)
    assert got == sorted(texts.values())


def test_replay_idempotent_after_compaction(spark, tmp_path):
    """The test_advice_r04 crash simulation, run AGAINST a compacted
    store: the next epoch's store partition is pre-committed (crash
    between store write and checkpoint commit), then the epoch replays —
    its docs must survive, and the compacted history must still dedupe
    everything it holds."""
    from scalding_spark.functions.text import normalize_for_fingerprint
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    _ingest_epoch(spark, src, corpus, store, ckpt, [(0, "aa"), (1, "bb")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(2, "cc")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(3, "dd")])
    assert streaming.compact_store(spark, store)  # epochs 0,1 → c1
    # pre-commit epoch 3's partition: what a crash after the store write
    # leaves behind; 'ff' is novel, 'aa' duplicates COMPACTED history
    replay = [(8, "ff"), (9, "aa")]
    (spark.createDataFrame(replay, DOC_SCHEMA)
     .select(F.md5(normalize_for_fingerprint(F.col("text"))).alias("fp"),
             F.lit(f"{run_tag}-3").alias("__batch"))
     .write.mode("append").partitionBy("__batch").parquet(store))
    _ingest_epoch(spark, src, corpus, store, ckpt, replay)
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    # 8 survives its own replayed partition (the hole filter), 9 is a
    # dup of compacted 'aa' and must NOT land
    assert got == [0, 1, 2, 3, 8], got
    # the replayed partition was rewritten, not duplicated
    assert spark.read.parquet(store).where(
        F.col("__batch") == f"{run_tag}-3").count() == 1


def test_crash_between_rename_and_delete_is_recovered(spark, tmp_path):
    """Simulate a crash after the c-partition rename but before the
    source deletion: re-create a compacted source partition, then call
    compact_store again — the _SOURCES manifest must finish the deletion
    (and the store must hold no duplicate rows afterward)."""
    import shutil
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    _ingest_epoch(spark, src, corpus, store, ckpt, [(0, "aa"), (1, "bb")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(2, "cc")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(3, "dd")])
    stash = str(tmp_path / "stash")
    shutil.copytree(os.path.join(store, f"__batch={run_tag}-0"), stash)
    assert streaming.compact_store(spark, store)
    n_clean = spark.read.parquet(store).count()
    # resurrect the deleted source: the crash-window state (duplicates
    # transiently present — correctness-safe set semantics)
    shutil.copytree(stash, os.path.join(store, f"__batch={run_tag}-0"))
    assert spark.read.parquet(store).count() > n_clean
    streaming.compact_store(spark, store)  # recovery pass runs first
    assert not os.path.exists(os.path.join(store, f"__batch={run_tag}-0"))
    assert spark.read.parquet(store).count() == n_clean


def test_compact_semantic_bucketed_store_preserves_pruning(spark, tmp_path):
    """The semantic store's __bucket sub-partitioning must survive
    compaction (the multi-probe pruning contract) and the layout check
    plus dedup behavior must be unchanged afterward."""
    src, corpus, store, ckpt = _paths(tmp_path, "srcS", "corpusS", "storeS",
                                      "ckptS")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]

    def ingest_vec_epoch(rows):
        spark.createDataFrame(rows, VEC_SCHEMA) \
            .write.mode("append").parquet(src)
        q = streaming.stream_ingest_semantic(
            streaming.stream_from_parquet_dir(spark, src, VEC_SCHEMA),
            corpus_path=corpus, store_path=store, checkpoint=ckpt,
            threshold=0.95, store_buckets=3)
        q.awaitTermination(120)

    ingest_vec_epoch([(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])])
    ingest_vec_epoch([(2, [0.0, 0.0, 1.0])])
    ingest_vec_epoch([(3, [0.5, 0.5, 0.0])])
    assert streaming.compact_store(spark, store)
    cpart = os.path.join(store, f"__batch={run_tag}-c1")
    buckets = glob.glob(os.path.join(cpart, "__bucket=*"))
    assert buckets, "bucket sub-partitions lost in compaction"
    # near-dup of compacted vec 0 must still be dropped; novel passes
    ingest_vec_epoch([(4, [0.999, 0.01, 0.0]), (5, [-1.0, 0.2, 0.3])])
    got = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert got == [0, 1, 2, 3, 5], got


def test_compact_every_n_epochs_in_stream(spark, tmp_path):
    """The in-stream hook: every N epochs the tier compacts store AND
    corpus at the end of its own ingest — the just-written epoch is the
    newest, so it survives; dedup across the compaction boundary keeps
    working; the knob validates at builder time."""
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]

    def epoch(rows):
        spark.createDataFrame(rows, DOC_SCHEMA) \
            .write.mode("append").parquet(src)
        q = streaming.stream_ingest_dedup(
            streaming.stream_from_parquet_dir(spark, src, DOC_SCHEMA),
            corpus_path=corpus, store_path=store, checkpoint=ckpt,
            text_col="text", id_col="doc_id", compact_every_n_epochs=2)
        q.awaitTermination(120)

    epoch([(0, "aa"), (1, "bb")])          # epoch 0
    epoch([(2, "cc"), (3, "aa")])          # epoch 1 → compaction fires:
    # eligible = {epoch 0} only (epoch 1 is newest) < min_batches → no-op
    assert _batch_dirs(store) == [f"__batch={run_tag}-0",
                                  f"__batch={run_tag}-1"]
    epoch([(4, "dd")])                     # epoch 2
    epoch([(5, "bb"), (6, "ee")])          # epoch 3 → compacts 0,1,2
    assert _batch_dirs(store) == [f"__batch={run_tag}-3",
                                  f"__batch={run_tag}-c1"]
    assert _batch_dirs(corpus) == [f"__batch={run_tag}-3",
                                   f"__batch={run_tag}-c1"]
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [0, 1, 2, 4, 6]          # 3 dup of 0, 5 dup of 1
    # dups of compacted history still caught after the in-stream pass
    epoch([(7, "cc"), (8, "ff")])          # epoch 4
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [0, 1, 2, 4, 6, 8]


def test_compact_every_n_epochs_validates(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], DOC_SCHEMA).write.parquet(src)
    stream = streaming.stream_from_parquet_dir(spark, src, DOC_SCHEMA)
    with pytest.raises(ValueError, match="compact_every_n_epochs"):
        streaming.stream_ingest_dedup(
            stream, corpus_path=str(tmp_path / "c"),
            store_path=str(tmp_path / "s"), checkpoint=str(tmp_path / "k"),
            text_col="text", id_col="doc_id", compact_every_n_epochs=0)


def test_compact_keeps_scan_parallelism_floor(spark, tmp_path):
    """Sub-cluster-scale stores must not collapse into one unsplittable
    file: the default sizing floors the compacted file count at
    defaultParallelism (unless files would drop under ~64k rows)."""
    store = str(tmp_path / "bigstore")
    tag = "cafecafecafe"
    for e in range(3):
        (spark.range(e * 400_000, (e + 1) * 400_000)
         .select(F.md5(F.col("id").cast("string")).alias("fp"),
                 F.lit(f"{tag}-{e}").alias("__batch"))
         .repartition(8)
         .write.mode("append").partitionBy("__batch").parquet(store))
    got = streaming.compact_store(spark, store)
    assert got[tag]["rows"] == 800_000
    cpart = os.path.join(store, f"__batch={tag}-c1")
    n = len(glob.glob(os.path.join(cpart, "*.parquet")))
    floor = min(spark.sparkContext.defaultParallelism, 800_000 // 65_536)
    assert n >= floor, (n, floor)
    # and a genuinely tiny store still compacts to ONE file
    small = str(tmp_path / "smallstore")
    for e in range(3):
        (spark.createDataFrame([(f"fp{e}",)], "fp string")
         .withColumn("__batch", F.lit(f"{tag}-{e}"))
         .write.mode("append").partitionBy("__batch").parquet(small))
    streaming.compact_store(spark, small)
    n_small = len(glob.glob(os.path.join(
        small, f"__batch={tag}-c1", "*.parquet")))
    assert n_small == 1


def test_compact_aborts_when_epoch_lands_mid_compaction(spark, tmp_path,
                                                        monkeypatch):
    """VERDICT r09 #5: the live-writer contract is enforced, not
    advisory — an epoch landing between planning and the commit rename
    (simulated inside _write_manifest, the last pre-commit step) must
    ABORT the compaction: loud error, sources untouched, no c-partition,
    temp gone, lease released (so a retry after stopping the writer
    succeeds)."""
    import scalding_spark.streaming._compact as _c
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    _ingest_epoch(spark, src, corpus, store, ckpt, [(0, "aa"), (1, "bb")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(2, "cc")])
    _ingest_epoch(spark, src, corpus, store, ckpt, [(3, "dd")])
    orig = _c._write_manifest

    def landing_writer(fs, jvm, mpath, names):
        (spark.createDataFrame([("zz",)], "fp string")
         .withColumn("__batch", F.lit(f"{run_tag}-3"))
         .write.mode("append").partitionBy("__batch").parquet(store))
        return orig(fs, jvm, mpath, names)

    monkeypatch.setattr(_c, "_write_manifest", landing_writer)
    with pytest.raises(RuntimeError, match="mid-compaction"):
        streaming.compact_store(spark, store)
    monkeypatch.setattr(_c, "_write_manifest", orig)
    # sources untouched, nothing published, lease released
    assert _batch_dirs(store) == [f"__batch={run_tag}-{e}"
                                  for e in range(4)]
    assert not glob.glob(os.path.join(str(tmp_path), "*__compact_tmp*"))
    assert not os.path.exists(os.path.join(store, "_COMPACT_LOCK"))
    # writer stopped → the retry compacts epochs 0-2 (3 now newest)
    got = streaming.compact_store(spark, store)
    assert got[run_tag]["rows"] == 4
    assert _batch_dirs(store) == [f"__batch={run_tag}-3",
                                  f"__batch={run_tag}-c1"]


def test_compact_lease_refuses_concurrent_then_steals_stale(spark, tmp_path):
    """A live _COMPACT_LOCK (younger than lease_ttl_sec) refuses a second
    compaction; a stale one (crashed run) is stolen and compaction
    proceeds."""
    src, corpus, store, ckpt = _paths(tmp_path, "src", "corpus", "store",
                                      "ckpt")
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    for rows in ([(0, "aa")], [(1, "bb")], [(2, "cc")]):
        _ingest_epoch(spark, src, corpus, store, ckpt, rows)
    lock = os.path.join(store, "_COMPACT_LOCK")
    with open(lock, "w") as f:
        f.write("123\n")
    with pytest.raises(RuntimeError, match="another compaction"):
        streaming.compact_store(spark, store)
    assert os.path.exists(lock), "a refused call must not steal the lease"
    # age the lock past the TTL → stale leftover of a crashed run
    os.utime(lock, (1, 1))
    got = streaming.compact_store(spark, store)
    assert got[run_tag]["rows"] == 2
    assert not os.path.exists(lock)


def test_compact_bucketed_store_respects_per_bucket_file_target(spark,
                                                                tmp_path):
    """ADVICE r09 #3: repartition(n, '__bucket') collapsed every bucket
    into one task/file regardless of rows_per_file. The salted layout
    must give each bucket a file count ~proportional to its rows while
    preserving the __bucket dirs and the content."""
    store = str(tmp_path / "bstore")
    tag = "beefbeefbeef"
    for e in range(3):
        (spark.range(e * 40_000, (e + 1) * 40_000)
         .select(F.md5(F.col("id").cast("string")).alias("fp"),
                 (F.col("id") % 2).cast("int").alias("__bucket"),
                 F.lit(f"{tag}-{e}").alias("__batch"))
         .write.mode("append")
         .partitionBy("__batch", "__bucket").parquet(store))
    before = sorted(r.fp for r in spark.read.parquet(store)
                    .where(F.col("__batch") != f"{tag}-2").collect())
    got = streaming.compact_store(spark, store, rows_per_file=10_000)
    assert got[tag]["rows"] == 80_000
    cpart = os.path.join(store, f"__batch={tag}-c1")
    for b in (0, 1):
        bdir = os.path.join(cpart, f"__bucket={b}")
        n = len(glob.glob(os.path.join(bdir, "*.parquet")))
        # 40k rows / 10k rows_per_file → ~4 slots; hash collisions can
        # merge a couple, but one-file-per-bucket is the pinned bug
        assert n >= 2, (b, n)
    after = sorted(r.fp for r in spark.read.parquet(store)
                   .where(F.col("__batch") == f"{tag}-c1").collect())
    assert after == before
