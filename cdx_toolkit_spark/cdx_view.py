"""The CDX capture view — deterministic derivation shared by engine & oracle.

The driver's correctness gate registers only the testdata tables
(documents/embeddings/lineitem/...) in DuckDB, so the Common-Crawl-style
capture table is *derived* from `documents` by one deterministic, pure-SQL
transformation (a function of doc_id only — no randomness, no clock).

The SAME expression strings (portable Spark-SQL/ANSI subset: %, CASE, ||,
lpad, md5, CAST) produce the view in both engines, with TWO deliberate
exceptions: `urlkey` and `digest`.

  - Spark computes urlkey with the real SURT kernel over the `url` column
    (cdx_toolkit_spark.surt.surt_col — regex/array built-ins); the DuckDB
    oracle constructs urlkey arithmetically from doc_id.
  - `digest` is CC-CDX-format: 32-char base32 of a 160-bit hash. Real WARC
    ingest uses SHA-1 (textkit.digest_b32_col); this derived view feeds the
    same base32 kernel md5-derived 40-hex input instead, because DuckDB 1.0
    has md5 but not sha1 — Spark runs the pure-built-in kernel
    (b32_from_hex40_col), DuckDB its SQL twin (oracle_b32_from_hex40).

If the SURT kernel mis-canonicalizes anything (or the base32 kernel drops a
bit), every oracle comparison that touches urlkey/digest fails — the
derivation doubles as an end-to-end check of both kernels.

Shape mirrors the reference capture record (pywb-normalized names, string
timestamps — /root/reference/README.md:135, SURVEY.md §1.1): urlkey,
timestamp(14-digit string), url, status('-' for revisits), mime,
mime_detected, digest, length, offset, filename, crawl, languages, redirect.

Design notes for scale: `crawl` is the partition key (partition pruning ==
the reference's endpoint bisect); `timestamp` is a fixed-width digit string
so from/to windows are plain string range predicates that push down to
parquet/Iceberg min-max stats; urlkey is the sort key within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from .surt import host_col, surt_col, url_hash_col
from .textkit import b32_from_hex40_col, oracle_b32_from_hex40

# -- shared subexpressions (strings of doc_id arithmetic) --------------------
_PAGE = "(doc_id % 200)"
# 40% of pages land on host 0 — deliberate skew for salting/politeness tests
_HOST_ID = f"(CASE WHEN {_PAGE} % 10 < 4 THEN 0 ELSE {_PAGE} % 50 END)"
_HOST = f"('example' || CAST({_HOST_ID} AS STRING) || '.com')"
_SCHEME = "(CASE WHEN doc_id % 3 = 0 THEN 'https' ELSE 'http' END)"
_WWW = "(CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)"
_URL = (
    f"({_SCHEME} || '://' || {_WWW} || {_HOST} || '/page/' || "
    f"CAST({_PAGE} AS STRING) || '?id=' || CAST({_PAGE} AS STRING))"
)
_YEAR = "(2015 + doc_id % 4)"
_MONTH = "(1 + (doc_id * 7) % 12)"
_DAY = "(1 + (doc_id * 11) % 28)"
_HOUR = "((doc_id * 5) % 24)"
_MIN = "((doc_id * 3) % 60)"
_SEC = "(doc_id % 60)"
_TS = (
    f"(CAST({_YEAR} AS STRING)"
    f" || lpad(CAST({_MONTH} AS STRING), 2, '0')"
    f" || lpad(CAST({_DAY} AS STRING), 2, '0')"
    f" || lpad(CAST({_HOUR} AS STRING), 2, '0')"
    f" || lpad(CAST({_MIN} AS STRING), 2, '0')"
    f" || lpad(CAST({_SEC} AS STRING), 2, '0'))"
)
# crawl end-markers at week 26 (~end June) / week 52 (~end Dec) so the crawl
# name's implied end time is consistent with the rows it holds
_CRAWL = (
    f"('CC-MAIN-' || CAST({_YEAR} AS STRING) || '-' || "
    f"CASE WHEN {_MONTH} <= 6 THEN '26' ELSE '52' END)"
)
_STATUS = (
    "(CASE WHEN doc_id % 50 = 0 THEN '-' "
    "WHEN doc_id % 10 = 1 THEN '404' "
    "WHEN doc_id % 10 = 7 THEN '301' "
    "ELSE '200' END)"
)
_MIME = (
    "(CASE WHEN doc_id % 50 = 0 THEN 'warc/revisit' "
    "WHEN doc_id % 13 = 0 THEN 'application/pdf' "
    "ELSE 'text/html' END)"
)
_REDIRECT = (
    f"(CASE WHEN {_STATUS} = '301' THEN "
    f"'https://' || {_HOST} || '/page/' || CAST(({_PAGE} + 1) % 200 AS STRING) "
    f"ELSE NULL END)"
)

# Expressions every engine evaluates identically (urlkey handled separately).
BASE_EXPRS = [
    f"{_TS} AS timestamp",
    f"{_URL} AS url",
    f"{_STATUS} AS status",
    f"{_MIME} AS mime",
    f"{_MIME} AS mime_detected",
    "CAST(1000 + n_chars * 3 AS BIGINT) AS length",
    "CAST(doc_id * 100000 AS BIGINT) AS offset",
    f"('crawl-data/' || {_CRAWL} || '/segments/seg-' || "
    f"CAST(doc_id % 10 AS STRING) || '/warc/part-' || "
    f"lpad(CAST(doc_id % 100 AS STRING), 5, '0') || '.warc.gz') AS filename",
    f"{_CRAWL} AS crawl",
    "(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END) AS languages",
    f"{_REDIRECT} AS redirect",
    "doc_id",
]

# 40-hex-char (160-bit) digest input — shared string, evaluated identically
# by both engines (md5 stands in for sha1; see module docstring).
_DIGEST_HEX40 = "(md5(text) || substring(md5('cc' || text), 1, 8))"

# The oracle's arithmetic urlkey (what SURT must agree with).
ORACLE_URLKEY = (
    f"('com,example' || CAST({_HOST_ID} AS STRING) || ')/page/' || "
    f"CAST({_PAGE} AS STRING) || '?id=' || CAST({_PAGE} AS STRING))"
)

CDX_COLUMNS = [
    "urlkey",
    "timestamp",
    "url",
    "status",
    "mime",
    "mime_detected",
    "digest",
    "length",
    "offset",
    "filename",
    "crawl",
    "languages",
    "redirect",
    "doc_id",
]


DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


# analyzed-plan memo for the derived view (r7): the urlkey/digest
# expression trees are large, and EVERY CDX entry re-built and re-analyzed
# them at compose time. DataFrames are immutable, so handing the same
# analyzed frame to every caller is free; no persist() — this caches the
# PLAN, not data.
_VIEW_CACHE: dict = {}


def cdx_captures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the capture view over `{sf_dir}/documents.parquet` (Spark side:
    real SURT over the url column). The explicit schema skips the footer-
    inference job, so composing a CDX query is entirely job-free; the
    analyzed view plan is memoized per (applicationId, sf_dir)."""
    app = spark.sparkContext.applicationId
    for stale in [k for k in _VIEW_CACHE if k[0] != app]:
        _VIEW_CACHE.pop(stale, None)
    key = (app, sf_dir)
    if key in _VIEW_CACHE:
        return _VIEW_CACHE[key]
    docs = spark.read.schema(DOCS_SCHEMA).parquet(
        f"{sf_dir}/documents.parquet"
    )
    base = docs.selectExpr(*BASE_EXPRS, f"{_DIGEST_HEX40} AS _digest_hex40")
    out = (
        base.withColumn("urlkey", surt_col("url"))
        .withColumn("digest", b32_from_hex40_col(F.col("_digest_hex40")))
        .select(*CDX_COLUMNS)
    )
    _VIEW_CACHE[key] = out
    return out


def oracle_cdx_cte() -> str:
    """DuckDB CTE text deriving the identical view (arithmetic urlkey).

    `timestamp` and `offset` are DuckDB reserved words in alias position, so
    aliases get double-quoted (bare references elsewhere parse fine)."""
    exprs = ",\n    ".join(
        e.replace("AS timestamp", 'AS "timestamp"').replace(
            "AS offset", 'AS "offset"'
        )
        for e in [
            f"{ORACLE_URLKEY} AS urlkey",
            f"{oracle_b32_from_hex40(_DIGEST_HEX40)} AS digest",
        ]
        + BASE_EXPRS
    )
    return f"SELECT\n    {exprs}\n  FROM documents"


def with_frontier_keys(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach the frontier key columns (urlkey, url_hash, host) — all
    JVM-side expressions (BASELINE.json north_star: xxhash64 urlkeys)."""
    out = df
    if "urlkey" not in df.columns:
        out = out.withColumn("urlkey", surt_col(url_col))
    return out.withColumn("url_hash", url_hash_col("urlkey")).withColumn(
        "host", host_col(url_col)
    )
