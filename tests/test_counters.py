"""Flow counters (Pipe.observe/counters) and output-file sizing."""

import glob
import os

from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe, counters


def test_observe_counters_one_pass(spark):
    p = Pipe.from_iterable(
        spark, [(i, i % 3) for i in range(100)], "id long, m long")
    staged = (p.observe("c_in", n=F.count(F.lit(1)))
              .filter(F.col("m") == 0)
              .observe("c_kept", n=F.count(F.lit(1)), s=F.sum("id")))
    got = staged.df.count()           # ONE action computes both observations
    assert got == 34
    assert counters("c_in") == {"n": 100}
    kept = counters("c_kept")
    assert kept["n"] == 34 and kept["s"] == sum(i for i in range(100) if i % 3 == 0)


def test_observe_reregister_replaces(spark):
    p = Pipe.from_iterable(spark, [(1,), (2,)], "id long")
    p.observe("c_re", n=F.count(F.lit(1))).df.count()
    assert counters("c_re") == {"n": 2}
    p2 = Pipe.from_iterable(spark, [(1,), (2,), (3,)], "id long")
    p2.observe("c_re", n=F.count(F.lit(1))).df.count()
    assert counters("c_re") == {"n": 3}


def test_max_records_per_file(spark, tmp_path):
    out = str(tmp_path / "sized")
    (Pipe(spark.range(100).coalesce(1))
     .write_parquet(out, max_records_per_file=30))
    files = glob.glob(os.path.join(out, "*.parquet"))
    # 100 rows / 30-cap / 1 task -> 4 rolled files
    assert len(files) == 4
    assert spark.read.parquet(out).count() == 100
