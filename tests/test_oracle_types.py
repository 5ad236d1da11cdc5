"""Oracle output-type portability guard (the r02 driver-red root cause):
DuckDB HUGEINT (sum over integers), DECIMAL, and nano-timestamp outputs
convert differently across duckdb client versions, flipping the driver's
value hash while staying green locally. Every oracle must emit only
BIGINT/INTEGER/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP(micros)/lists thereof.

Pure DuckDB (LIMIT-0 planning only) — no Spark session, runs in seconds.
"""

import duckdb
import pytest

import __spark_entry__ as e

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# No exceptions since r05: q_probe_hugeint's deliberate HUGEINT diagnostic
# completed in r03/r04 (driver client conversion confirmed) and its oracle
# is BIGINT-cast like every other.
ALLOWED_RISKY: set = set()

RISKY_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL", "TIMESTAMP_NS",
                  "TIMESTAMP WITH TIME ZONE", "INTERVAL", "TIME ")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def test_no_oracle_emits_version_fragile_types(con):
    bad = {}
    for name, sql in e.oracle_sql().items():
        if name in ALLOWED_RISKY:
            continue
        desc = con.sql(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()
        flagged = [(c, t) for c, t, *_ in desc
                   if any(t.startswith(p) for p in RISKY_PREFIXES)]
        if flagged:
            bad[name] = flagged
    assert not bad, f"version-fragile oracle output types: {bad}"


def test_every_oracle_parses(con):
    for name, sql in e.oracle_sql().items():
        con.sql(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0")


def test_retired_probe_is_no_longer_risky(con):
    sql = e.retired_probes()["q_probe_hugeint"][1]
    desc = con.sql(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()
    assert all(t == "BIGINT" or c == "l_returnflag" for c, t, *_ in desc), \
        f"retired probe regressed to a fragile output type: {desc}"


def test_probes_are_out_of_the_rotation(con):
    """r06 (VERDICT r05 #5): the closed diagnostics must not occupy
    driver-window slots; they live in retired_probes() only."""
    probes = set(e.retired_probes())
    assert not probes & set(e.queries())
    assert not probes & set(e.oracle_sql())
    for _, sql in e.retired_probes().values():
        con.sql(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0")


def test_documents_source_set_matches_mix_oracle_assumptions(con):
    """q_temperature_mix's oracle unrolls the domain normalizer over the
    literal src0..src19 set (sorted-order chained additions — the
    bit-reproducibility contract); q_mix_proportions pins src0..src4. The
    driver REGENERATES testdata between rounds — if the source universe
    ever drifts, fail HERE loudly instead of going silently red in the
    driver's correctness file."""
    got = {r[0] for r in con.sql(
        "SELECT DISTINCT source FROM documents").fetchall()}
    assert got == {f"src{i}" for i in range(20)}, (
        f"documents source set drifted: {sorted(got)} — regenerate "
        f"_temperature_mix_sql's domain list")
