"""Time-partitioned & versioned sources — parity with TimePathedSource /
MostRecentGoodSource (FileSource.scala:328-403), VersionedKeyValSource
(commons/source/VersionedKeyValSource.scala:40-209) and Checkpoint
(commons/extensions/Checkpoint.scala:66-177).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scalding_spark.functions.dates import DateRange, Duration, days, globify
from scalding_spark.sources.files import InvalidSourceException


class TimePathedSource:
    """Date-templated paths selected by DateRange (FileSource.scala:328-384).

    The reference's Globifier computes minimal FS globs; here the explicit
    per-period path list is handed to the parquet reader, which gives exact
    partition selection (the 100 TB-critical property: only the requested
    days are ever scanned). Writes go to the END-date's directory, matching
    ``TimePathedSource.hdfsWritePath``."""

    def __init__(self, template: str, span: Duration | None = None, fmt: str = "parquet"):
        self.template = template
        self.span = span or days(1)
        self.fmt = fmt

    def paths_for(self, date_range: DateRange) -> list[str]:
        return globify(self.template, date_range, self.span)

    def existing_paths(self, date_range: DateRange) -> list[str]:
        return [p for p in self.paths_for(date_range) if os.path.exists(p)]

    def read(self, spark: SparkSession, date_range: DateRange, strict: bool = True) -> DataFrame:
        paths = self.paths_for(date_range)
        existing = [p for p in paths if os.path.exists(p)]
        if strict and len(existing) != len(paths):
            raise InvalidSourceException(f"missing periods: {sorted(set(paths) - set(existing))}")
        if not existing:
            raise InvalidSourceException(f"no periods exist in {date_range}")
        # format().load(list) takes a path LIST uniformly; the per-format
        # reader methods don't — csv/json take (path, schema, ...)
        # positionally, so *existing would feed the second period's path
        # into the schema slot, and parquet is varargs-only.
        return spark.read.format(self.fmt).load(existing)

    def write(self, df: DataFrame, date_range: DateRange, mode: str = "overwrite") -> str:
        out = date_range.end.strftime(self.template)
        getattr(df.write.mode(mode), self.fmt)(out)
        return out


def most_recent_good(spark: SparkSession, source: TimePathedSource,
                     date_range: DateRange) -> DataFrame:
    """Latest existing period in the range (FileSource.scala:389-403)."""
    existing = source.existing_paths(date_range)
    if not existing:
        raise InvalidSourceException(f"no good paths in {date_range}")
    return getattr(spark.read, source.fmt)(existing[-1])


class VersionedKeyValSource:
    """Versioned K/V store with monoid-merge incremental updates
    (commons/source/VersionedKeyValSource.scala:40-209).

    Layout: ``root/version=N/`` parquet dirs. ``write_incremental`` reads the
    latest version, unions the delta, groupBy(key).agg(merge) — one shuffle
    on the key — and writes version N+1. The merge expression must be a
    commutative aggregate (the reference requires a Monoid)."""

    VERSION_RE = re.compile(r"^version=(\d+)$")

    def __init__(self, root: str, key_col: str = "key", val_col: str = "val"):
        self.root = root
        self.key_col = key_col
        self.val_col = val_col

    def versions(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            m = self.VERSION_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def path(self, version: int) -> str:
        return os.path.join(self.root, f"version={version}")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        vs = self.versions()
        if not vs:
            raise InvalidSourceException(f"no versions under {self.root}")
        v = version if version is not None else vs[-1]
        return spark.read.parquet(self.path(v))

    def write(self, df: DataFrame, version: int | None = None) -> int:
        vs = self.versions()
        v = version if version is not None else (vs[-1] + 1 if vs else 0)
        df.write.mode("overwrite").parquet(self.path(v))
        return v

    def write_incremental(self, spark: SparkSession, delta: DataFrame,
                          merge=None) -> int:
        merge = merge or (lambda c: F.sum(c))
        vs = self.versions()
        if vs:
            base = spark.read.parquet(self.path(vs[-1]))
            merged = (base.unionByName(delta)
                      .groupBy(self.key_col)
                      .agg(merge(F.col(self.val_col)).alias(self.val_col)))
        else:
            merged = (delta.groupBy(self.key_col)
                      .agg(merge(F.col(self.val_col)).alias(self.val_col)))
        return self.write(merged)


def checkpoint(spark: SparkSession, name: str, root: str, build) -> DataFrame:
    """Named memo of a sub-flow (commons/extensions/Checkpoint.scala:66-177):
    read the parquet memo if it exists, else compute ``build()`` and write it.
    Cuts lineage AND survives across jobs (unlike df.persist)."""
    path = os.path.join(root, name)
    if os.path.exists(path):
        return spark.read.parquet(path)
    df = build()
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
