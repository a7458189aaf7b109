"""PII redaction kernels (pii.py): golden behavior + cross-engine
equivalence fuzz (Java regex on executors vs RE2 in DuckDB must agree
byte-for-byte, or the oracle twins are lies)."""

import random

import duckdb
from pyspark.sql import functions as F

from cdx_toolkit_spark import pii

GOLDEN = [
    ("mail me at john.doe+x@sub.example.co.uk now",
     "mail me at <EMAIL> now", (1, 0, 0)),
    ("server 192.168.001.1 and 8.8.8.8.",
     "server <IP> and <IP>.", (0, 2, 0)),
    ("call +1 555 0100 or +49-30-1234-5678 ok",
     "call <PHONE> or <PHONE> ok", (0, 0, 2)),
    ("not1.2.3.4x an ip, a@b.c bad tld, +123456789 no separators",
     "not1.2.3.4x an ip, a@b.c bad tld, +123456789 no separators",
     (0, 0, 0)),
    ("weird..dots@x.com", "<EMAIL>", (1, 0, 0)),
    ("", "", (0, 0, 0)),
]


def test_golden_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(GOLDEN)], "i long, text string"
    )
    rows = (
        df.select("i", pii.redact_col("text"), *pii.pii_count_cols("text"))
        .orderBy("i")
        .collect()
    )
    for r, (_, want_red, want_counts) in zip(rows, GOLDEN):
        assert r.redacted == want_red, r.i
        assert (r.n_email, r.n_ipv4, r.n_phone) == want_counts, r.i


def _fuzz_texts(n=250):
    rng = random.Random(20260817)
    frags = [
        "hello", "x@y.io", "a.b@c.d.ee", "10.0.0.1", "256.1.1.1",
        "1.2.3", "+44 20 7946 0958", "+1-555-0100", "+9 1 2", "v2.3.4.5",
        "@nope", "dot.", "a@@b.com", "+12 3456 789 0123 4", "--",
        "u_%+-x@ex-a.mp.le.org", "0.0.0.0", " +33-1-23", "t+1 22 333",
    ]
    return [
        " ".join(rng.choice(frags) for _ in range(rng.randrange(1, 9)))
        for _ in range(n)
    ]


def test_cross_engine_equivalence_fuzz(spark):
    texts = _fuzz_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: (r.redacted, r.n_email, r.n_ipv4, r.n_phone)
        for r in df.select(
            "i", pii.redact_col("text"), *pii.pii_count_cols("text")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = (
        f"SELECT i, {pii.redact_sql('text')}, "
        + ", ".join(pii.pii_count_sql("text"))
        + " FROM t"
    )
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.sql(sql).fetchall()}
    assert got == want


def test_redaction_idempotent(spark):
    df = spark.createDataFrame(
        [(t,) for t, _, _ in GOLDEN], "text string"
    ).select(pii.redact_col("text", alias="r1"))
    twice = df.select(pii.redact_col("r1", alias="r2"), "r1")
    assert all(r.r1 == r.r2 for r in twice.collect())
