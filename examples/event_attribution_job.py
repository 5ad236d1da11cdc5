"""Event attribution as a Job: every conversion ('click') is attributed to
the latest preceding error (as-of join) and to every campaign window that
covers it (range join) — the canonical temporal-join pair for event logs.

Run:
    python -m scalding_spark.tool examples.event_attribution_job.EventAttributionJob \
        --input /root/testdata/sf0.001/events.parquet --output /tmp/attrib
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.joins import as_of_join, range_join


class EventAttributionJob(Job):
    def build(self) -> None:
        # events.parquet carries TIMESTAMP(NANOS) — read nanos as long and
        # truncate to Spark's microsecond timestamps.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = self.spark.read.parquet(self.args("input"))
        if dict(ev.dtypes).get("ts") == "bigint":
            ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        clicks = ev.where(F.col("event_type") == "click") \
            .select("user_id", "ts", "event_id", "value")
        errors = ev.where(F.col("event_type") == "error").select(
            "user_id", "ts",
            F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id"))

        # 1. as-of: latest error at-or-before each click, per user
        #    (one shuffle on user_id; union+window, no nested-loop join)
        attributed = as_of_join(clicks, errors, on=["user_id"],
                                left_ts="ts", right_ts="ts")

        # 2. range: campaign windows — here, 1h after each error — matched
        #    via bucketed equi-join (replication = window/bucket + 1)
        windows = ev.where(F.col("event_type") == "error").select(
            "user_id", F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 60 MINUTES")).alias("w_end"),
            F.col("event_id").alias("window_id"))
        in_window = range_join(clicks, windows, point_ts="ts",
                               start_ts="w_start", end_ts="w_end",
                               on=["user_id"], bucket_seconds=3600)

        summary = (in_window.df.groupBy("user_id")
                   .agg(F.count(F.lit(1)).alias("n_windowed_clicks"),
                        F.round(F.sum("value"), 2).alias("windowed_value")))

        attributed.df.write.mode("overwrite") \
            .parquet(self.args("output") + "/attributed")
        summary.write.mode("overwrite") \
            .parquet(self.args("output") + "/window_summary")
