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


# reference warc.py:23-31 — reasons for vivified redirect statuses
HTTP_STATUS_TEXT = {
    300: "Multiple Choices",
    301: "Moved Permanently",
    302: "Found",
    303: "See Other",
    304: "Not Modified",
    307: "Temporary Redirect",
    308: "Permanent Redirect",
}

_XAO = "x-archive-orig-"  # 15 chars


def wb_response_headers_col(headers) -> Column:
    """S-8 header reconstruction (reference fake_wb_warc, warc.py:59-77):
    turn a wayback playback's response headers back into the ORIGINAL
    response's headers, order-preserving:

      x-archive-orig-<k>  ->  <k>           (unwrap archived originals)
      content-type        ->  Content-Type  (kept: wayback serves the real one)
      location            ->  rewritten to the original URL (F-9)
      anything else       ->  X-Archive-<k> (mark wayback-added headers)

    `headers`: array<struct<k string, v string>>. Pure higher-order Column
    expression — transform() over the array, no Python in the row path."""
    c = F.col(headers) if isinstance(headers, str) else headers

    def xform(h):
        k, v = h["k"], h["v"]
        kl = F.lower(k)
        loc_rest = F.try_element_at(F.split(v, "_/http", 2), F.lit(2))
        new_k = (
            F.when(kl.startswith(_XAO), F.substring(k, len(_XAO) + 1, 2 ** 30))
            .when(kl == "content-type", F.lit("Content-Type"))
            .when(kl == "location", k)
            .when(kl.startswith("x-archive-"), k)
            .otherwise(F.concat(F.lit("X-Archive-"), k))
        )
        new_v = F.when(
            (kl == "location") & loc_rest.isNotNull(),
            F.concat(F.lit("http"), loc_rest),
        ).otherwise(v)
        return F.struct(new_k.alias("k"), new_v.alias("v"))

    return F.transform(c, xform)


def wb_status_line_col(status_code, reason, capture_status) -> Column:
    """S-8 status fix-up (reference warc.py:40-57): wayback always replays
    redirects as 302 — when the CAPTURE was a 3xx, restore its status and
    the canonical reason phrase; other mismatches keep the playback status
    (the reference only logs them)."""
    sc = F.col(status_code) if isinstance(status_code, str) else status_code
    rs = F.col(reason) if isinstance(reason, str) else reason
    cs = F.col(capture_status) if isinstance(capture_status, str) else capture_status
    reason_map = F.create_map(
        *[x for code, text in HTTP_STATUS_TEXT.items()
          for x in (F.lit(code), F.lit(text))]
    )
    vivified = (
        (sc == 302) & cs.startswith("3") & (cs != sc.cast("string"))
        & F.element_at(reason_map, cs.cast("int")).isNotNull()
    )
    out_code = F.when(vivified, cs.cast("int")).otherwise(sc)
    out_reason = F.when(
        vivified, F.element_at(reason_map, cs.cast("int"))
    ).otherwise(rs)
    return F.concat(out_code.cast("string"), F.lit(" "), out_reason)


def http_date_to_iso_col(http_date) -> Column:
    """F-8 inverse for the WARC-Date stamp (reference fake_wb_warc pulls
    x-archive-orig-date and converts to ISO): RFC-1123 is fixed-width
    ('Tue, 01 Jul 2017 05:03:01 GMT'), so the conversion is pure substring
    arithmetic — timezone-setting-independent by construction."""
    c = F.col(http_date) if isinstance(http_date, str) else http_date
    months = F.create_map(
        *[x for i, m in enumerate(
            ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
             "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"], 1)
          for x in (F.lit(m), F.lit(f"{i:02d}"))]
    )
    return F.concat(
        F.substring(c, 13, 4), F.lit("-"),
        F.element_at(months, F.substring(c, 9, 3)), F.lit("-"),
        F.substring(c, 6, 2), F.lit("T"),
        F.substring(c, 18, 8), F.lit("Z"),
    )
