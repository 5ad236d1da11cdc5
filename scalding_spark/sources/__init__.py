"""Sources & sinks (reference: Source.scala, FileSource.scala, commons module).

Parquet is the canonical columnar format (predicate pushdown + column
pruning); TextLine/Tsv/Csv/Json are kept for parity I/O. Time-partitioned and
versioned sources live in ``time_pathed``.
"""

from scalding_spark.sources.bucketed import (
    bucketed_join, read_bucketed, write_bucketed,
)
from scalding_spark.sources.extras import (
    daily_suffix_source, distributed_cache_file, cached_path,
    hourly_suffix_source, read_codec, read_pail, read_tsv_with_header,
    write_pail, write_tsv_with_header,
)
from scalding_spark.sources.files import (
    text_line, tsv, csv, json_line, iterable_source, null_sink,
)
from scalding_spark.sources.time_pathed import (
    TimePathedSource, most_recent_good, VersionedKeyValSource, checkpoint,
)

__all__ = [
    "text_line", "tsv", "csv", "json_line", "iterable_source", "null_sink",
    "TimePathedSource", "most_recent_good", "VersionedKeyValSource", "checkpoint",
    "daily_suffix_source", "hourly_suffix_source", "read_codec",
    "distributed_cache_file", "cached_path", "write_pail", "read_pail",
    "write_tsv_with_header", "read_tsv_with_header",
    "write_bucketed", "read_bucketed", "bucketed_join",
]
