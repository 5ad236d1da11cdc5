"""examples/streaming_ingest_job.py end-to-end: each --mode tier drains a
source dir, dedups within+against the store, and appends only novel docs."""

import pytest

from scalding_spark.job import Args


def _run(spark, tmp_path, mode, rows, schema, **extra):
    from examples.streaming_ingest_job import StreamingIngestJob
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    argv = ["--src", src, "--corpus", str(tmp_path / "corpus"),
            "--store", str(tmp_path / "store"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--mode", mode, "--schema", schema]
    for k, v in extra.items():
        argv += [f"--{k}", v]
    StreamingIngestJob(Args(argv), spark).run()
    return spark.read.parquet(str(tmp_path / "corpus"))


def test_exact_mode(spark, tmp_path):
    out = _run(spark, tmp_path, "exact",
               [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
               "doc_id long, text string")
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_neardup_mode(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog while seven "
            "wizards quietly brew hex elixirs beneath the ancient stone "
            "bridge at dawn watching pale mist curl across the silent "
            "river toward the sleeping village and its flickering lamps")
    out = _run(spark, tmp_path, "neardup",
               [(1, base), (2, base.replace("lazy", "sleepy")),
                (3, "entirely different content about columnar engines "
                    "with adaptive shuffles and broadcast joins tonight")],
               "doc_id long, text string")
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_semantic_mode(spark, tmp_path):
    out = _run(spark, tmp_path, "semantic",
               [(1, [1.0, 0.0]), (2, [0.99, 0.05]), (3, [0.0, 1.0])],
               "vec_id long, embedding array<double>", threshold="0.95")
    assert sorted(r.vec_id for r in out.collect()) == [1, 3]


def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="exact|neardup|semantic"):
        _run(spark, tmp_path, "bogus", [(1, "x")],
             "doc_id long, text string")


def test_image_mode(spark, tmp_path):
    import random
    rng = random.Random(9)
    base = [rng.randrange(256) for _ in range(256)]
    near = list(base); near[0] = (near[0] + 60) % 256
    other = [rng.randrange(256) for _ in range(256)]
    def p5(px): return b"P5\n16 16\n255\n" + bytes(px)
    out = _run(spark, tmp_path, "image",
               [(1, p5(base)), (2, p5(near)), (3, p5(other))],
               "media_id long, content binary")
    assert sorted(r.media_id for r in out.collect()) == [1, 3]
