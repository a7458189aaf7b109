"""Synthetic `pages` table — the authoritative input shape from
BASELINE.json input_hint: (url string, warc_ts timestamp, html binary,
text string, lang string).

Deterministic pure function of (seed-free doc_id arithmetic); includes the
byte patterns FIXTURES.md §1 demands: pure ASCII, valid multi-byte UTF-8,
*invalid* UTF-8 sequences (to pin decode('utf-8', errors='replace') parity
with /root/reference/cdx_toolkit/__init__.py:129-134), and one empty-bytes
revisit analogue. `text` is computed from `html` by the real extraction
kernel (textkit.text_from_html_udf), so the invariant is true by
construction AND independently re-checked row-by-row in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textkit import text_from_html_udf

# deterministic byte garnishes cycled by doc_id % 4
_GARNISH = [
    b"",                      # plain ascii only
    "±µ€漢字".encode("utf-8"),  # valid multi-byte utf-8
    b"\xff\xfe\xfa",          # invalid utf-8 -> U+FFFD replacement
    b"\xe2\x82",              # truncated multi-byte sequence
]


def synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive pages from documents: html = utf-8(text) + garnish bytes;
    text recomputed from html by the extraction kernel."""
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    from .cdx_view import DOCS_SCHEMA

    docs = spark.read.schema(DOCS_SCHEMA).parquet(
        f"{sf_dir}/documents.parquet"
    )
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("example"),
        (F.col("doc_id") % 25).cast("string"),
        F.lit(".com/doc/"),
        F.col("doc_id").cast("string"),
    )
    warc_ts = F.to_timestamp(
        F.concat(
            F.lit("2017-"),
            F.lpad((1 + F.col("doc_id") % 12).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((1 + F.col("doc_id") % 28).cast("string"), 2, "0"),
            F.lit(" 00:00:00"),
        )
    )
    garnish = F.element_at(
        F.array(*[F.lit(g) for g in _GARNISH]), (F.col("doc_id") % 4 + 1).cast("int")
    )
    html = F.when(F.col("doc_id") % 50 == 0, F.lit(b"")).otherwise(
        F.concat(F.encode("text", "UTF-8"), garnish)
    )
    base = docs.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("lang"),
        F.col("doc_id"),
    )
    return base.withColumn("text", text_from_html_udf(F.col("html"))).select(
        "url", "warc_ts", "html", "text", "lang", "doc_id"
    )
