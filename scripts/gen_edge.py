"""Generate the EDGE corpus — a data-shape adversarial axis for the full
oracle gate (the config axes live in SCALING.md §configuration-axis).

Construction: every table from a small driver dir (default sf0.001) is
copied verbatim, then ``documents`` / ``embeddings`` / ``events`` get a
block of hostile rows appended at ids >= 900000:

- documents: empty text, whitespace-only, single char, newline/tab
  structure, CJK + emoji + combining-accent unicode, a 5000-char single
  token, punctuation-only, regex metacharacters, digit-only, case
  variants, one exact-duplicate pair, one single-token-edit near-dup
  pair, a 200x repeated-word doc, and ONE NULL text row. lang/source
  stay inside the driver's domains (the mixing oracles pin that set).
- embeddings: the all-zero vector, a huge-magnitude (1e20) and a
  denormal-tiny (1e-30) vector, an exact-duplicate pair, and a verbatim
  copy of vec 0 under a new id. No NaN/Inf — cross-engine NaN ordering
  is an engine property, not an operator bug.
- events: two events on the SAME microsecond for the same user (window
  ties), one at an exact midnight boundary, zero and negative values,
  an empty-json props row.

The point: the oracle gate compares Spark vs DuckDB on the SAME parquet,
so any mismatch on this corpus is a genuine robustness finding (empty
input to an agg, null text in a tokenizer, tie-sensitive window, zero
vector in a normalizer), not a distribution drift.

Usage:
    python scripts/gen_edge.py [src_dir] [out_dir]
    # defaults: /root/testdata/sf0.001  <repo>/.scaling/edge
Then:
    python scripts/driver_check.py .scaling/edge
"""

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

B = 900_000  # hostile-id base: far above any driver id


def hostile_documents():
    texts = [
        (B + 0, "", "en", "src0"),
        (B + 1, "   ", "en", "src1"),
        (B + 2, "a", "de", "src2"),
        (B + 3, "line one\nline two\nline one\nline two", "en", "src3"),
        (B + 4, "col1\tcol2\tcol1\tcol2", "fr", "src4"),
        (B + 5, "こんにちは 世界 🌍 café naïve düsseldorf", "zh", "src5"),
        (B + 6, "é é é combining accents", "fr", "src6"),
        (B + 7, "x" * 5000, "en", "src7"),
        (B + 8, "!!! ??? ... ;;; ,,, ---", "es", "src8"),
        (B + 9, "a.b (c) [d] e* f+ g? h| i\\ ^j k$", "en", "src9"),
        (B + 10, "123 456 789 0 00 000", "en", "src10"),
        (B + 11, "The THE the tHe thE THe", "en", "src11"),
        # exact-duplicate pair (distinct ids, identical text)
        (B + 12, "spark window merge table column vector stream", "en", "src12"),
        (B + 13, "spark window merge table column vector stream", "en", "src13"),
        # near-duplicate pair (one token differs)
        (B + 14, "the quick brown fox jumps over the lazy dog today", "en", "src14"),
        (B + 15, "the quick brown fox leaps over the lazy dog today", "en", "src15"),
        (B + 16, ("dup " * 200).strip(), "en", "src16"),
        (B + 17, None, "en", "src17"),  # NULL text
    ]
    return [(i, t, lang, src, len(t) if t is not None else None)
            for i, t, lang, src in texts]


def hostile_embeddings(dim=64):
    import random
    rnd = random.Random(2026)
    base = [round(rnd.gauss(0, 0.12), 6) for _ in range(dim)]
    return [
        (B + 0, [0.0] * dim, 0),                       # zero vector
        (B + 1, [1e20] * dim, 1),                      # huge magnitude
        (B + 2, [1e-30] * dim, 2),                     # denormal-tiny
        (B + 3, base, 3),                              # exact-dup pair ...
        (B + 4, base, 4),                              # ... distinct ids
    ]


def hostile_events():
    return [
        # same-microsecond tie, same user
        (B + 0, "2024-01-15 12:00:00.000000", 13, "click", 1.0, '{"k": 1}'),
        (B + 1, "2024-01-15 12:00:00.000000", 13, "click", 2.0, '{"k": 2}'),
        # exact midnight boundary (date-bucket edge)
        (B + 2, "2024-01-16 00:00:00.000000", 14, "view", 0.0, "{}"),
        (B + 3, "2024-01-16 23:59:59.999999", 14, "error", -5.5, "{}"),
    ]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, ".scaling", "edge")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        op = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            con.execute("create or replace table h(doc_id bigint, text varchar,"
                        " lang varchar, source varchar, n_chars bigint)")
            con.executemany("insert into h values (?,?,?,?,?)", hostile_documents())
            con.execute(f"copy (select * from '{sp}' union all by name"
                        f" select * from h) to '{op}' (format parquet)")
        elif t == "embeddings":
            con.execute("create or replace table h(vec_id bigint,"
                        " embedding float[], label integer)")
            con.executemany("insert into h values (?,?,?)", hostile_embeddings())
            con.execute(f"copy (select * from '{sp}' union all by name"
                        f" select * from h) to '{op}' (format parquet)")
        elif t == "events":
            con.execute("create or replace table h(event_id bigint, ts timestamp,"
                        " user_id bigint, event_type varchar, value double,"
                        " props varchar)")
            con.executemany("insert into h values (?,?,?,?,?,?)", hostile_events())
            con.execute(f"copy (select * from '{sp}' union all by name"
                        f" select * from h) to '{op}' (format parquet)")
        else:
            con.execute(f"copy (select * from '{sp}') to '{op}' (format parquet)")
        n = con.execute(f"select count(*) from '{op}'").fetchone()[0]
        print(f"{t}: {n} rows -> {op}")


if __name__ == "__main__":
    main()
