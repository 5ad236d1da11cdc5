"""Generate a FK-consistent FACTOR-x expansion of a driver testdata dir —
the input for the full-gate-at-scale check (SCALING.md): run
``scripts/driver_check.py`` and ``bench.py`` against the expanded dir to
verify every query value-matches its oracle and to measure how each
query's wall time scales, at 10x the largest driver scale.

Construction (seeded, deterministic):

- ``region``/``nation``: copied unchanged (fixed dimensions).
- ``customer``/``supplier``/``part``/``orders``/``lineitem``/``events``:
  FACTOR shifted copies — every key column gets a per-replica offset
  (consistently across referencing tables, so FK joins behave exactly as
  at sf0.1), non-key attributes are copied verbatim. Nation/region keys
  are NOT shifted (all replicas reference the same 25 nations, like TPC-H
  scaling does).
- ``documents``/``embeddings``: replica 0 is the original; replicas >= 1
  are FRESH synthetic rows drawn from the driver generator's observed
  distribution (30-word vocab, 10-100 tokens, 5% near-dup injection with
  'dup' marker splices, lang {en:2, de/es/fr/zh:1}, source src0..src19 /
  i.i.d. Gaussian float32[64], label 0..9). Fresh rows rather than text
  copies: verbatim x10 copies would make every document a 10-way exact
  duplicate, turning the pair-generating dedup queries quadratic in the
  replica count — a corpus shape no real 10x scale-up has.

Usage:
    python scripts/gen_sf.py [src_dir] [out_dir] [factor]
    # defaults: /root/testdata/sf0.1  <repo>/.scaling/sf1  10
"""

import os
import random
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one offset per key family; replica i shifts by i * OFF[key]
OFF = {
    "cust": 1_000_000,
    "supp": 1_000_000,
    "part": 1_000_000,
    "order": 10_000_000,
    "event": 10_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}

# table -> list of (column, key-family); other columns copied verbatim
SHIFTS = {
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"),
                 ("l_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
}

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "group", "index", "join", "row", "slow", "fast", "small",
         "big", "filter", "order", "data", "line", "customer", "part",
         "hash", "the", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "en", "de", "es", "fr", "zh"]


def expand_shifted(con, src, out, factor):
    for t in ("region", "nation"):
        con.execute(f"""
            COPY (SELECT * FROM '{src}/{t}.parquet')
            TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
    for t, shifts in SHIFTS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        shifted = dict(shifts)
        sel = ", ".join(
            f"{c} + i * {OFF[shifted[c]]} AS {c}" if c in shifted else c
            for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM '{src}/{t}.parquet', range({factor}) r(i)
                  ORDER BY i)
            TO '{out}/{t}.parquet' (FORMAT PARQUET)""")


def gen_documents(rng, n, id_base):
    rows = []
    for j in range(n):
        if rows and rng.random() < 0.05:
            base = rows[rng.randrange(len(rows))][1].split(" ")
            for _ in range(rng.randint(0, 3)):
                base.insert(rng.randrange(len(base) + 1), "dup")
            text = " ".join(base)
        else:
            text = " ".join(rng.choices(VOCAB, k=rng.randint(10, 100)))
        rows.append((id_base + j, text, rng.choice(LANGS),
                     f"src{j % 20}", len(text)))
    return rows


def expand_corpus(con, src, out, factor, seed=42):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_docs = con.execute(
        f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()[0]
    rng = random.Random(seed)
    parts = []
    for i in range(1, factor):
        parts.append(gen_documents(rng, n_docs, i * OFF["doc"]))
    flat = [r for p in parts for r in p]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in flat], pa.int64()),
        "text": pa.array([r[1] for r in flat], pa.string()),
        "lang": pa.array([r[2] for r in flat], pa.string()),
        "source": pa.array([r[3] for r in flat], pa.string()),
        "n_chars": pa.array([r[4] for r in flat], pa.int64()),
    })
    tmp = os.path.join(out, "_docs_extra.parquet")
    pq.write_table(tbl, tmp)
    con.execute(f"""
        COPY (SELECT * FROM '{src}/documents.parquet'
              UNION ALL SELECT * FROM '{tmp}')
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    os.remove(tmp)

    n_vec = con.execute(
        f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
    nrng = np.random.default_rng(seed)
    ids, mats, labels = [], [], []
    for i in range(1, factor):
        ids.append(np.arange(n_vec, dtype=np.int64) + i * OFF["vec"])
        mats.append(nrng.standard_normal((n_vec, 64)).astype(np.float32))
        labels.append(nrng.integers(0, 10, n_vec, dtype=np.int32))
    mat = np.concatenate(mats)
    tbl = pa.table({
        "vec_id": pa.array(np.concatenate(ids)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), 64).cast(
            pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(labels)),
    })
    tmp = os.path.join(out, "_emb_extra.parquet")
    pq.write_table(tbl, tmp)
    con.execute(f"""
        COPY (SELECT * FROM '{src}/embeddings.parquet'
              UNION ALL SELECT * FROM '{tmp}')
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    os.remove(tmp)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, ".scaling", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    expand_shifted(con, src, out, factor)
    expand_corpus(con, src, out, factor)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
