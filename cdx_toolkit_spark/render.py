"""Output rendering (SURVEY.md §2.1 S-10, §2.2 P-1) + small scalar parity
kernels that complete the reference's function surface.

The reference CLI prints selected fields as "key: value" lines, CSV, or
JSONL (/root/reference/cdx_toolkit/cli.py:197-221), with keep-if-present
field winnowing (`winnow_fields`, cli.py:197-202). Here the renders are
Column expressions (to_json / concat) so a sink write stays one JVM-side
plan — no driver-side loop over rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def winnow_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """Keep-if-present projection (reference cli.py:197-202): requested
    fields that exist are kept in request order; absent ones are skipped
    (the reference drops them per-row; with a fixed schema that's a
    column-level decision)."""
    keep = [f for f in fields if f in df.columns]
    return df.select(*keep)


def jsonl_col(df: DataFrame) -> Column:
    """One JSON object per row over all columns (cli --jsonl)."""
    return F.to_json(F.struct(*df.columns)).alias("line")


def kv_lines_col(df: DataFrame) -> Column:
    """Default `cdxt iter` render: 'k: v k: v ...' per row (cli.py:205-211
    prints dict-ish lines; stable column order = schema order)."""
    parts = []
    for c in df.columns:
        parts.append(F.concat(F.lit(c + ": "), F.col(c).cast("string")))
    return F.concat_ws("  ", *parts).alias("line")


def write_csv(df: DataFrame, path: str, fields: list[str] | None = None) -> None:
    """cli --csv: header row + selected fields (cli.py:217-221)."""
    out = winnow_fields(df, fields) if fields else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """cli --jsonl sink."""
    df.write.mode("overwrite").json(path)


def wb_redir_to_original_col(location) -> Column:
    """F-9 (reference warc.py:19-20): wayback redirect Location ->
    original URL: 'http' + loc.split('_/http', 1)[1]."""
    c = F.col(location) if isinstance(location, str) else location
    rest = F.try_element_at(F.split(c, "_/http", 2), F.lit(2))
    return F.when(
        rest.isNotNull(), F.concat(F.lit("http"), rest)
    ).alias("original_url")
