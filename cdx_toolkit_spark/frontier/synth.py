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


def synth_candidates(spark: SparkSession, n: int) -> DataFrame:
    df = spark.range(n).withColumn("bucket", F.pmod(F.col("id"), F.lit(10)))
    host = F.when(F.col("bucket") < 4, F.lit("hot-cdn.example.com")).otherwise(
        F.concat(
            F.lit("site"),
            F.pmod(F.col("id") * 2654435761, F.lit(max(n // 50, 1))),
            F.lit(".example.org"),
        )
    )
    scheme = (
        F.when(F.pmod(F.col("id"), F.lit(17)) == 0, F.lit("https://www."))
        .otherwise(F.lit("http://"))
    )
    url = F.concat(
        scheme, host, F.lit("/page/"), (F.col("id") % (n * 9 // 10)).cast("string")
    )
    return df.select(
        url.alias("url"),
        F.pmod(F.col("id"), F.lit(3)).cast("int").alias("priority"),
        (F.col("id") % 1000).cast("long").alias("discovered_ts"),
    )
