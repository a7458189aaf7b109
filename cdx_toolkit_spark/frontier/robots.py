"""robots.txt parsing as a Catalyst plan (closes the north_star loop:
"token-bucket crawl-delay from robots.txt").

The reference never parses robots — its politeness intervals are hardcoded
per endpoint (myrequests.py:23-40) — but a real frontier derives the rules
table (host, crawl_delay_s, disallow_prefixes) from fetched robots.txt
bodies. This parser is pure built-ins:

  posexplode(split(body)) -> per-line rows with positions
  running count of 'User-agent:' lines per host -> block ids (window)
  blocks whose User-agent set contains '*'      -> the applicable groups
  aggregate Disallow / Crawl-delay within them  -> one rules row per host

Scale shape: the window is per HOST over one robots body (tens of lines) —
bounded by body length, never by corpus size; the whole thing is one
shuffle on host. Semantics (documented subset of REP): only `User-agent: *`
groups apply (merged if repeated), keys case-insensitive, `#` comments
stripped, empty Disallow ignored, Crawl-delay = min across groups,
prefixes deduplicated and sorted for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

ROBOTS_RULES_SCHEMA = (
    "host string, crawl_delay_s double, disallow_prefixes array<string>"
)


def parse_robots(bodies: DataFrame, host_col: str = "host",
                 body_col: str = "body",
                 default_delay_s: float = 3.0) -> DataFrame:
    """(host, body) -> (host, crawl_delay_s, disallow_prefixes).

    Hosts whose body has no `User-agent: *` group (or no Crawl-delay in it)
    get default_delay_s and/or an empty prefix list — the same defaults
    politeness.attach_robots applies to entirely unknown hosts.
    """
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), r"#.*$", ""))
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1)).alias("key"),
        F.trim(F.regexp_extract(clean, r"^[A-Za-z-]+\s*:(.*)$", 1)).alias("val"),
    ).where(F.col("key") != "")

    w = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocked = parsed.withColumn(
        "block",
        F.sum(F.when(F.col("key") == "user-agent", 1).otherwise(0)).over(w),
    )
    star_blocks = (
        blocked.where(
            (F.col("key") == "user-agent") & (F.col("val") == "*")
        )
        .select("host", "block")
        .distinct()
    )
    rules = blocked.join(star_blocks, ["host", "block"])

    agg = rules.groupBy("host").agg(
        F.min(
            F.when(
                F.col("key") == "crawl-delay", F.col("val").cast("double")
            )
        ).alias("crawl_delay_s"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        (F.col("key") == "disallow") & (F.col("val") != ""),
                        F.col("val"),
                    )
                )
            )
        ).alias("disallow_prefixes"),
    )
    # hosts with a body but no applicable group still get a rules row
    all_hosts = bodies.select(F.col(host_col).alias("host")).distinct()
    return (
        all_hosts.join(agg, "host", "left")
        .select(
            "host",
            F.coalesce(
                F.col("crawl_delay_s"), F.lit(float(default_delay_s))
            ).alias("crawl_delay_s"),
            F.coalesce(
                F.col("disallow_prefixes"),
                F.array().cast("array<string>"),
            ).alias("disallow_prefixes"),
        )
    )
