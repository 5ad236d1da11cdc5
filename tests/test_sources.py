"""Source/sink round-trip tests (the reference's FileSourceTest/SourceSpec
strategy), on tmp dirs."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions.dates import DateRange
from scalding_spark.sources import extras, files, time_pathed


@pytest.fixture()
def df3(spark):
    return spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", 2.5), (3, "z", 3.5)], "id long, s string, v double")


def test_tsv_with_header_roundtrip(spark, df3, tmp_path):
    p = str(tmp_path / "data.tsv")
    extras.write_tsv_with_header(df3, p)
    assert os.path.exists(p + ".HEADER")
    back = extras.read_tsv_with_header(spark, p, schema="id long, s string, v double")
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in df3.collect())
    assert back.columns == ["id", "s", "v"]


def test_codec_source_budget(spark, tmp_path):
    raw = spark.createDataFrame(
        [(b"1:a",), (b"2:b",), (b"garbage",), (b"3:c",)], "bytes binary")

    def decode(b: bytes) -> dict:
        k, v = b.decode().split(":")
        return {"k": int(k), "v": v}

    out, check = extras.read_codec(spark, raw, decode, "k long, v string",
                                   max_failures=1)
    rows = sorted((r.k, r.v) for r in out.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    assert check() == 1

    out2, check2 = extras.read_codec(spark, raw, decode, "k long, v string",
                                     max_failures=0)
    out2.count()
    with pytest.raises(extras.DecodeBudgetExceeded):
        check2()


def test_distributed_cache_file(spark, tmp_path):
    f = tmp_path / "lookup.txt"
    f.write_text("hello")
    name = extras.distributed_cache_file(spark, str(f))

    def use_cache(it):
        import pandas as pd
        from scalding_spark.sources.extras import cached_path
        with open(cached_path(name), encoding="utf-8") as fh:
            content = fh.read()
        for pdf in it:
            pdf = pdf.copy()
            pdf["tag"] = content
            yield pdf

    df = spark.range(2).mapInPandas(use_cache, "id long, tag string")
    assert {r.tag for r in df.collect()} == {"hello"}


def test_pail_partitioned_store(spark, df3, tmp_path):
    root = str(tmp_path / "pail")
    extras.write_pail(df3, root, ["s"])
    assert os.path.isdir(os.path.join(root, "s=x"))
    pruned = extras.read_pail(spark, root, where=F.col("s") == "y")
    assert [r.id for r in pruned.collect()] == [2]


def test_daily_prefab_write_read(spark, df3, tmp_path):
    src = extras.daily_suffix_source(str(tmp_path / "daily"))
    rng = DateRange(datetime(2026, 8, 10), datetime(2026, 8, 12))
    src.write(df3, rng)                       # writes to the END date dir
    assert os.path.isdir(str(tmp_path / "daily/2026/08/12"))
    back = src.read(spark, rng, strict=False)
    assert back.count() == 3
    latest = time_pathed.most_recent_good(spark, src, rng)
    assert latest.count() == 3


def test_text_line_strict_validation(spark, tmp_path):
    with pytest.raises(files.InvalidSourceException):
        files.text_line(spark, str(tmp_path / "nope.txt"))


def test_versioned_keyval_incremental(spark, tmp_path):
    from pyspark.sql import functions as F
    src = time_pathed.VersionedKeyValSource(str(tmp_path / "vkv"))
    base = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "key string, val double")
    v0 = src.write(base)
    assert v0 == 0 and src.versions() == [0]
    delta = spark.createDataFrame([("a", 5.0), ("c", 7.0)], "key string, val double")
    v1 = src.write_incremental(spark, delta)
    assert v1 == 1
    merged = {r.key: r.val for r in src.read(spark).collect()}
    assert merged == {"a": 6.0, "b": 2.0, "c": 7.0}  # monoid sum merge
    # older version still readable
    assert {r.key for r in src.read(spark, version=0).collect()} == {"a", "b"}


def test_checkpoint_memoizes(spark, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(1,)], "x long")

    a = time_pathed.checkpoint(spark, "memo", str(tmp_path), build)
    b = time_pathed.checkpoint(spark, "memo", str(tmp_path), build)
    assert a.collect() == b.collect()
    assert len(calls) == 1  # second call read the memo


def test_multiple_text_line_files(spark, tmp_path):
    """Multiple*Files (FileSource.scala:412-427): one source, many paths."""
    p1, p2 = tmp_path / "a.txt", tmp_path / "b.txt"
    p1.write_text("x\ny\n")
    p2.write_text("z\n")
    df = files.text_line(spark, str(p1), str(p2))
    assert sorted(r["line"] for r in df.collect()) == ["x", "y", "z"]


# -- r03: parquet/orc sources ------------------------------------------------

def test_parquet_source_strict_missing_raises(spark):
    from scalding_spark.sources import files as fs
    with pytest.raises(fs.InvalidSourceException):
        fs.parquet(spark, "/nonexistent/p.parquet")


def test_orc_roundtrip_and_validation(spark, tmp_path):
    from scalding_spark.sources import files as fs
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = str(tmp_path / "orc_out")
    fs.write_orc(src, out)
    back = fs.orc(spark, out)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
    with pytest.raises(fs.InvalidSourceException):
        fs.orc(spark, str(tmp_path / "missing_orc"))


def test_orc_filter_pushdown_reaches_scan(spark, tmp_path):
    from scalding_spark.sources import files as fs
    src = spark.range(0, 1000).selectExpr("id AS k", "id % 7 AS v")
    out = str(tmp_path / "orc_push")
    fs.write_orc(src, out)
    q = fs.orc(spark, out).where("k > 990").select("k")
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in p and "GreaterThan(k,990" in p


def test_from_json_column_roundtrip_and_permissive(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": "x"}'), (2, 'not json')], "id long, raw string")
    out = (Pipe(df).from_json("raw", "a int, b string", out="rec")
           .to_df().select("id", "rec.a", "rec.b").collect())
    rows = {r["id"]: (r["a"], r["b"]) for r in out}
    assert rows[1] == (5, "x")
    assert rows[2] == (None, None)  # malformed -> null struct, row kept


def test_to_json_column_inverse(spark):
    from scalding_spark.pipe import Pipe
    import json
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    row = Pipe(df).to_json("j", "a", "b").to_df().first()
    assert json.loads(row["j"]) == {"a": 1, "b": "x"}


def test_from_csv_column(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([("5|hi",)], "raw string")
    row = (Pipe(df).from_csv("raw", "a int, b string", out="rec", sep="|")
           .to_df().select("rec.a", "rec.b").first())
    assert (row["a"], row["b"]) == (5, "hi")
