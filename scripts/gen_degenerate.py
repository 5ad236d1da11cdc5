"""Generate the two DEGENERATE data-shape axes for the oracle gate:

- ``.scaling/empty``  — every table has its real schema and ZERO rows.
  The "empty date partition" scenario: a pipeline stage fed an empty
  upstream slice must produce empty (or empty-aggregate) output, not
  crash in centroid init, range partitioning, or a driver-side collect.
- ``.scaling/single`` — every table cut to exactly ONE row (LIMIT 1 in
  storage order). Degenerate range partitioning, windows over one row,
  self-joins with no possible pair, percentiles of a single value.

Both axes run the same side-by-side Spark-vs-DuckDB gate, so surviving
them is a verified behavior, not a hope.

Usage:
    python scripts/gen_degenerate.py [src_dir]
    # default src: /root/testdata/sf0.001; writes .scaling/{empty,single}
Then:
    python scripts/driver_check.py .scaling/empty
    python scripts/driver_check.py .scaling/single
"""

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for mode, limit in (("empty", 0), ("single", 1)):
        out = os.path.join(HERE, ".scaling", mode)
        os.makedirs(out, exist_ok=True)
        for t in TABLES:
            sp = os.path.join(src, f"{t}.parquet")
            op = os.path.join(out, f"{t}.parquet")
            con.execute(f"copy (select * from '{sp}' limit {limit})"
                        f" to '{op}' (format parquet)")
        print(f"{mode}: {len(TABLES)} tables -> {out}")


if __name__ == "__main__":
    main()
