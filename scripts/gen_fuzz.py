"""Seeded random-corpus fuzzing for the oracle gate.

Regenerates the text/vector/event tables from a seeded random
distribution DIFFERENT from the driver generator's (mixed
ascii/unicode/digit vocabulary, variable doc lengths including empty /
whitespace / null texts, zero and duplicate vectors, microsecond event
ties, negative values) and runs nothing itself — each seed's dir feeds
``scripts/driver_check.py``, so every query value-compares against
DuckDB on that corpus. Any mismatch is distribution-dependent behavior
the fixed corpora can't see.

TPC-H relational tables are copied from the source dir unchanged (their
FK topology is what the join queries test; random regeneration would
only break referential integrity, which is a different axis).

Usage:
    python scripts/gen_fuzz.py SEED [src_dir] [out_dir] [scale]
    # default src /root/testdata/sf0.001, out .scaling/fuzz<SEED>,
    # scale 1 (scale multiplies the random table sizes — use 10 to fuzz
    # the sf0.1-like density regime where candidate-pair ops behave
    # differently)
Then:
    python scripts/driver_check.py .scaling/fuzz<SEED>
"""

import os
import random
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]

ASCII_WORDS = ["alpha", "beta", "gamma", "delta", "merge", "spark", "the",
               "of", "and", "query", "batch", "x1", "z9", "data", "key"]
UNICODE_WORDS = ["café", "naïve", "东京", "zürich", "éclair", "ñandú",
                 "🌍", "Ω", "привет"]
PUNCTY = ["a.b", "(c)", "[d]", "e-f", "g_h", "i/j", "k|l", "$", "***"]
LANGS = ["en", "en", "de", "es", "fr", "zh"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def gen_documents(rnd, n):
    vocab = ASCII_WORDS + UNICODE_WORDS + PUNCTY
    rows, texts = [], []
    for i in range(n):
        r = rnd.random()
        if r < 0.02:
            t = None
        elif r < 0.05:
            t = ""
        elif r < 0.07:
            t = " " * rnd.randint(1, 5)
        elif r < 0.12 and texts:
            t = rnd.choice(texts)          # exact duplicate
        else:
            t = " ".join(rnd.choice(vocab)
                         for _ in range(rnd.randint(1, 120)))
            texts.append(t)
        rows.append((i, t, rnd.choice(LANGS), f"src{rnd.randrange(20)}",
                     len(t) if t is not None else None))
    return rows


def gen_embeddings(rnd, n, dim=64):
    rows, pool = [], []
    for i in range(n):
        r = rnd.random()
        if r < 0.01:
            v = None                       # NULL vector (missing embedding)
        elif r < 0.03:
            v = [0.0] * dim
        elif r < 0.06 and pool:
            v = rnd.choice(pool)           # exact duplicate vector
        else:
            v = [round(rnd.gauss(0, 1), 6) for _ in range(dim)]
            pool.append(v)
        rows.append((i, v, rnd.randrange(10)))
    return rows


def gen_events(rnd, n):
    rows, last_us = [], None
    base = 1_704_067_200_000_000  # 2024-01-01 UTC in microseconds
    for i in range(n):
        if last_us is not None and rnd.random() < 0.05:
            us = last_us                   # exact microsecond tie
        else:
            us = base + rnd.randrange(30 * 24 * 3600 * 1_000_000)
        last_us = us
        rows.append((i, us,
                     None if rnd.random() < 0.02 else rnd.randrange(40),
                     None if rnd.random() < 0.02 else rnd.choice(EVENT_TYPES),
                     None if rnd.random() < 0.02
                     else round(rnd.gauss(50, 80), 2),   # NULL fields
                     '{"k": %d}' % rnd.randrange(100)))
    return rows


def main():
    seed = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    out = (sys.argv[3] if len(sys.argv) > 3
           else os.path.join(HERE, ".scaling", f"fuzz{seed}"))
    scale = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(out, exist_ok=True)
    rnd = random.Random(seed)
    con = duckdb.connect()
    for t in COPY_TABLES:
        con.execute(f"copy (select * from '{src}/{t}.parquet')"
                    f" to '{out}/{t}.parquet' (format parquet)")
    con.execute("create or replace table d(doc_id bigint, text varchar,"
                " lang varchar, source varchar, n_chars bigint)")
    con.executemany("insert into d values (?,?,?,?,?)",
                    gen_documents(rnd, rnd.randint(200, 800) * scale))
    con.execute(f"copy d to '{out}/documents.parquet' (format parquet)")
    con.execute("create or replace table e(vec_id bigint,"
                " embedding float[], label integer)")
    con.executemany("insert into e values (?,?,?)",
                    gen_embeddings(rnd, rnd.randint(200, 800) * scale))
    con.execute(f"copy e to '{out}/embeddings.parquet' (format parquet)")
    con.execute("create or replace table ev(event_id bigint, us bigint,"
                " user_id bigint, event_type varchar, value double,"
                " props varchar)")
    con.executemany("insert into ev values (?,?,?,?,?,?)",
                    gen_events(rnd, rnd.randint(500, 2000) * scale))
    con.execute(f"copy (select event_id, make_timestamp(us) as ts, user_id,"
                f" event_type, value, props from ev)"
                f" to '{out}/events.parquet' (format parquet)")
    for t in ["documents", "embeddings", "events"]:
        n = con.execute(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(out)


if __name__ == "__main__":
    main()
