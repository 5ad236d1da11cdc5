"""Time individual declared queries with the bench session/protocol.

Usage: python scripts/ab_time.py q_name [q_name ...]   (min-of-N noop-sink)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, AB_RUNS (default 3).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("AB_RUNS", "3"))

from pyspark.sql import SparkSession, functions as F

import __spark_entry__ as entry_mod

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("ab_time")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).agg(F.sum("id")).write.mode("overwrite").format("noop").save()

qs = entry_mod.queries()
for name in sys.argv[1:]:
    fn = qs[name]
    runs = []
    for _ in range(RUNS):
        t0 = time.time()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t0)
        from scalding_spark.session import release_materialized
        release_materialized(spark)
    print(f"{name}: min={min(runs):.3f}  runs={[round(r,3) for r in runs]}",
          flush=True)
spark.stop()
