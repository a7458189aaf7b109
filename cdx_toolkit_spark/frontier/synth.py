"""Deterministic synthetic candidate frontiers for benchmarks and scaling
runs (no external data; pure function of n).

Shape mirrors a real discovered-URL stream: one CDN-scale hot host holding
~40% of candidates (the .com skew the north_rule calls out), a long tail of
n/50 small hosts, mixed http/https + www. variants so SURT canonicalization
collapses ~10% of rows into duplicate urlkeys, and interleaved priorities /
discovery times so per-host ordering is non-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_candidates(spark: SparkSession, n: int, offset: int = 0) -> DataFrame:
    """Candidate slice [offset, offset+n). The page id (`uid`) is globally
    unique except for two deliberate collision channels:

    - intra-epoch: ids past offset + 0.9n wrap back into this epoch's uid
      range (~10% duplicate urlkeys for the dedup window to collapse);
    - cross-epoch: when offset > 0, ~10% of rows re-reference a uid from
      the PREVIOUS slice, so steady-state epochs exercise the bloom probe
      and exact anti-join against a populated seen store.

    The long-tail host modulus is forced odd/coprime-ish to the uid space
    so hosts don't alias pages into accidental extra duplicates."""
    u = max(n * 9 // 10, 1)
    df = spark.range(offset, offset + n)
    uid = F.lit(offset) + F.pmod(F.col("id") - offset, F.lit(u))
    if offset > 0:
        uid = F.when(
            F.pmod(F.col("id"), F.lit(10)) == 9,
            F.greatest(uid - F.lit(n), F.lit(0)),
        ).otherwise(uid)
    df = df.withColumn("uid", uid)
    host = F.when(
        F.pmod(F.col("uid"), F.lit(10)) < 4, F.lit("hot-cdn.example.com")
    ).otherwise(
        F.concat(
            F.lit("site"),
            F.pmod(F.col("uid") * 2654435761, F.lit(max(n // 50, 1) | 1)),
            F.lit(".example.org"),
        )
    )
    scheme = (
        F.when(F.pmod(F.col("id"), F.lit(17)) == 0, F.lit("https://www."))
        .otherwise(F.lit("http://"))
    )
    url = F.concat(scheme, host, F.lit("/page/"), F.col("uid").cast("string"))
    return df.select(
        url.alias("url"),
        F.pmod(F.col("id"), F.lit(3)).cast("int").alias("priority"),
        (F.col("id") % 1000).cast("long").alias("discovered_ts"),
    )
