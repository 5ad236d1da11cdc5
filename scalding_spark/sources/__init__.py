"""Sources & sinks (reference: Source.scala, FileSource.scala, commons module).

Parquet is the canonical columnar format (predicate pushdown + column
pruning); TextLine/Tsv/Csv/Json are kept for parity I/O. Time-partitioned and
versioned sources live in ``time_pathed``.
"""

from scalding_spark.sources.files import (
    text_line, tsv, csv, json_line, iterable_source, null_sink,
)
from scalding_spark.sources.time_pathed import (
    TimePathedSource, most_recent_good, VersionedKeyValSource, checkpoint,
)

__all__ = [
    "text_line", "tsv", "csv", "json_line", "iterable_source", "null_sink",
    "TimePathedSource", "most_recent_good", "VersionedKeyValSource", "checkpoint",
]
