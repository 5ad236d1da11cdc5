"""Edge cases for the PII redaction cascade and repetition stats
(scalding_spark.functions.text). The oracle parity suite covers the
aggregate queries; these pin per-row semantics."""

from pyspark.sql import functions as F

from scalding_spark.functions import text as tx


def _one(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    row = df.select(tx.pii_redact(F.col("text")).alias("r"),
                    tx.pii_counts(F.col("text")).alias("c")).first()
    return row["r"], row["c"].asDict()


def test_pii_email(spark):
    r, c = _one(spark, "write to bob.smith+x@corp.example.org today")
    assert r == "write to <EMAIL> today"
    assert c == {"emails": 1, "ips": 0, "phones": 0}


def test_pii_ip_not_counted_as_phone(spark):
    r, c = _one(spark, "host 192.168.100.250 is up")
    assert r == "host <IP> is up"
    assert c == {"emails": 0, "ips": 1, "phones": 0}


def test_pii_phone_variants(spark):
    r, c = _one(spark, "call +1 (555) 010-7788 or 555-010-9911 now")
    assert r == "call <PHONE> or <PHONE> now"
    assert c["phones"] == 2


def test_pii_empty_and_clean(spark):
    r, c = _one(spark, "no identifiers here")
    assert r == "no identifiers here"
    assert c == {"emails": 0, "ips": 0, "phones": 0}


def test_pii_cascade_all_three(spark):
    r, c = _one(spark, "a@b.co 1.2.3.4 +12 345 6789")
    assert r == "<EMAIL> <IP> <PHONE>"
    assert c == {"emails": 1, "ips": 1, "phones": 1}


def test_top_word_fraction(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y"), (3, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            tx.top_word_fraction(df, "text", "doc_id").collect()}
    assert rows[1]["top_cnt"] == 3 and rows[1]["n_toks"] == 4
    assert abs(rows[1]["top_word_frac"] - 0.75) < 1e-12
    assert rows[2]["top_word_frac"] == 0.5
    assert 3 not in rows  # empty doc contributes no tokens
