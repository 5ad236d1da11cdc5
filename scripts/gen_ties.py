"""Generate the TIES corpus — a determinism axis for the oracle gate.

Every ranked/limited query must break ties deterministically: at cluster
scale partition order varies run to run, so a top-k cut ordered by a
non-unique key silently returns DIFFERENT row sets on identical input.
This corpus makes every orderable VALUE maximally tied while keeping ids
unique, so any missing tie-break shows up as a Spark-vs-DuckDB
membership mismatch (the driver's compare is order-insensitive — only
the SELECTED rows matter):

- documents: text cycles over THREE distinct strings (n_chars
  consistent), lang/source keep the driver's domains;
- embeddings: vectors cycle over three distinct directions (cosine
  scores tie in large groups);
- lineitem: constant quantity/extendedprice/discount/tax;
- orders: constant totalprice; customer: constant acctbal;
- events: constant value.

Keys, dates, and categorical columns are preserved (joins, date-range
filters, and group-bys behave as at sf0.001).

Usage:
    python scripts/gen_ties.py [src_dir] [out_dir]
    # defaults: /root/testdata/sf0.001  <repo>/.scaling/ties
Then:
    python scripts/driver_check.py .scaling/ties
"""

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "spark window merge table column vector stream value group index",
    "data line customer part hash the agg key query a scan batch dup",
]

SELECTS = {
    "documents": f"""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN '{TEXTS[0]}'
                               WHEN 1 THEN '{TEXTS[1]}'
                               ELSE '{TEXTS[2]}' END AS text,
               lang, source,
               CASE doc_id % 3 WHEN 0 THEN {len(TEXTS[0])}
                               WHEN 1 THEN {len(TEXTS[1])}
                               ELSE {len(TEXTS[2])} END::BIGINT AS n_chars
        FROM src
    """,
    "embeddings": """
        SELECT vec_id,
               CASE vec_id % 3
                 WHEN 0 THEN [0.6, 0.8] || [0.0 FOR _ IN range(62)]
                 WHEN 1 THEN [0.8, 0.6] || [0.0 FOR _ IN range(62)]
                 ELSE [0.0, 1.0] || [0.0 FOR _ IN range(62)]
               END::FLOAT[] AS embedding,
               label
        FROM src
    """,
    "lineitem": """
        -- explicit ::DOUBLE casts: a bare 25.0 literal is DECIMAL(3,1) in
        -- DuckDB and REPLACE would silently change the parquet column type
        SELECT * REPLACE (25.0::DOUBLE AS l_quantity,
                          1000.0::DOUBLE AS l_extendedprice,
                          0.05::DOUBLE AS l_discount, 0.02::DOUBLE AS l_tax)
        FROM src
    """,
    "orders": "SELECT * REPLACE (1000.0::DOUBLE AS o_totalprice) FROM src",
    "customer": "SELECT * REPLACE (500.0::DOUBLE AS c_acctbal) FROM src",
    "events": "SELECT * REPLACE (10.0::DOUBLE AS value) FROM src",
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, ".scaling", "ties")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create or replace view src as"
                    f" select * from '{os.path.join(src, t)}.parquet'")
        sel = SELECTS.get(t, "SELECT * FROM src")
        con.execute(f"copy ({sel}) to '{os.path.join(out, t)}.parquet'"
                    f" (format parquet)")
        n = con.execute(
            f"select count(*) from '{os.path.join(out, t)}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
