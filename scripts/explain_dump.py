"""Dump .explain("formatted") for headline queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/explain_dump.py <out_dir> <suffix> [query ...]
Defaults: all bench.HEADLINE queries. Uses the same session confs as bench.py
so the captured plans are the ones the bench actually runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

out_dir = sys.argv[1]
suffix = sys.argv[2]
only = sys.argv[3:]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
import bench

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("explain_dump")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

os.makedirs(out_dir, exist_ok=True)
qs = entry_mod.queries()
names = only or bench.HEADLINE
for name in names:
    df = qs[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
spark.stop()
