"""Measured hot-key join-skew evidence (SCALING.md "Skew joins" section).

Workload: a fact table where ONE key owns half the rows (the hot-partition
regime AQE's docs and the reference's skewJoin both target) dim-joined to
a right side too large to broadcast at real scale (broadcast is disabled
to model that). Three strategies over identical inputs:

- plain:     shuffle sort-merge join, AQE off — the naive baseline;
- aqe:       the same plan, stock AQE (session default). At this toy scale
  the hot partition (~1 MB of compressed map output) is far below the
  256 MB skewedPartitionThresholdInBytes, so stock AQE only COALESCES —
  the row isolates what coalescing alone buys;
- aqe_tuned: thresholds scaled down by the same ratio the data is scaled
  down (256k/factor 2), so the skew SPLIT actually engages — the behavior
  the defaults produce once the hot key is GBs at real scale;
- salted:    joins.salted_skew_join (static replicate-fragment, salt=16),
  AQE off — the non-AQE deployment path, and the per-KEY lever (AQE splits
  by map-output ranges of a partition; salting splits the key itself at
  write time, which also works for the aggregation side of a groupBy).

Reported per strategy: wall secs, shuffle write bytes, and the join
output's per-partition row distribution (max / median / partitions) —
the direct print of the mechanism: unsalted, the hot key's entire output
sits in ONE task; salted, it spreads over `salt` tasks.

Usage:
    python scripts/skew_bench.py [n_fact] [n_keys]   # default 2_000_000 100_000
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scalding_spark.session import get_spark  # noqa: E402
from scalding_spark import joins  # noqa: E402

N_FACT = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_KEYS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000


def build(spark):
    # half the fact rows on key 0, the rest uniform over N_KEYS — built
    # from spark.range so the experiment is self-contained and exactly
    # reproducible
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
         .otherwise(F.col("id") % N_KEYS).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"))
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w"))
    return fact, dim


def part_distribution(df):
    rows = (df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("n").collect())
    ns = [r.n for r in rows]
    return {"partitions": len(ns), "max_rows": ns[-1] if ns else 0,
            "p50_rows": ns[len(ns) // 2] if ns else 0}


def run(spark, name, joinf):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling import _shuffle_totals
    w0, _ = _shuffle_totals(spark)
    t0 = time.time()
    joined = joinf()
    # the agg below consumes the join output IN the join's partitioning,
    # so pid counts reflect the join stage's actual task layout
    dist = part_distribution(joined)
    secs = round(time.time() - t0, 2)
    w1, _ = _shuffle_totals(spark)
    out = {"strategy": name, "secs": secs, "shuffle_w": w1 - w0, **dist}
    print(json.dumps(out))
    return out


def main():
    results = []
    for name, aqe in (("plain", "false"), ("aqe", "true"),
                      ("aqe_tuned", "true"), ("salted", "false")):
        # fresh session per strategy: AQE flags are bound at session level
        # and statusStore deltas stay attributable
        conf = {
            "spark.sql.adaptive.enabled": aqe,
            "spark.sql.adaptive.skewJoin.enabled": aqe,
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        if name == "aqe_tuned":
            # default skewedPartitionThresholdInBytes is 256 MB — the hot
            # partition here is ~1 MB of compressed map output (half the
            # rows, but a constant key/value pair compresses away), so
            # stock AQE never splits it and the `aqe` row measures
            # coalescing only. Thresholds scaled to the data make the
            # split engage — what the defaults do at real scale.
            conf.update({
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
                "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
            })
        spark = get_spark(app_name=f"skew_{name}", shuffle_partitions=32,
                          extra_conf=conf)
        fact, dim = build(spark)
        if name == "salted":
            jf = lambda: joins.salted_skew_join(fact, dim, ["k"], salt=16).df
        else:
            jf = lambda: fact.join(dim, "k")
        results.append(run(spark, name, jf))
        spark.stop()
    print(json.dumps({"n_fact": N_FACT, "n_keys": N_KEYS,
                      "results": results}))


if __name__ == "__main__":
    main()
