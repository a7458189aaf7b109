"""CDX API wire-format decoders (SURVEY.md §2 S-4/S-5).

The reference receives CDX query responses in two dialects and normalizes
both to pywb-named capture dicts (/root/reference/cdx_toolkit/__init__.py:
55-85, compat.py:27-38):

  pywb (`output=json`)   JSONL — one JSON object per line, pywb field names,
                         `mime-detected` hyphenated, all values strings,
                         absent keys for nulls; an `{"error": ...}` /
                         `{"message": ...}` object means "no captures".
  IA (`output=json`)     one JSON list-of-lists per response page: first row
                         is the field-name header, remaining rows are values;
                         `[]` for empty; IA names (original/statuscode/
                         mimetype) are renamed to pywb (url/status/mime).

Both decoders are pure Catalyst plans: from_json + higher-order array ops
(element_at / slice / explode / map_from_arrays), zero Python in the row
path. At 100 TB of fetched API pages this is a plain parallel scan —
text lines or response bodies in, typed capture rows out, with the casts
(length/offset -> bigint) and the crawl derived from the filename path the
way the reference's CaptureObject consumers expect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# string-typed wire schema — the CDX APIs serve everything as strings
PYWB_WIRE_FIELDS = [
    "urlkey", "timestamp", "url", "status", "mime", "mime-detected",
    "digest", "length", "offset", "filename", "languages", "encoding",
    "redirect",
]
_PYWB_WIRE_SCHEMA = ", ".join(
    f"`{f}` string" for f in PYWB_WIRE_FIELDS + ["error", "message"]
)

# reference compat.fields_to_pywb
FIELDS_TO_PYWB = {"statuscode": "status", "original": "url", "mimetype": "mime"}

CAPTURE_COLUMNS = [
    "urlkey", "timestamp", "url", "status", "mime", "mime_detected",
    "digest", "length", "offset", "filename", "crawl", "languages",
    "redirect",
]


def crawl_from_filename(filename: Column) -> Column:
    """CC WARC paths embed the crawl: crawl-data/CC-MAIN-YYYY-WW/..."""
    c = F.regexp_extract(filename, r"crawl-data/([^/]+)/", 1)
    return F.when(c != "", c)


def decode_pywb_jsonl(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """pywb JSONL -> capture rows (S-4).

    `lines`: one wire line per row (spark.read.text shape). Error/message
    objects and blank lines decode to no rows — the reference's
    empty-as-empty rule (S-6). length/offset cast to bigint; hyphenated
    `mime-detected` normalized; crawl derived from the filename path.
    """
    j = F.from_json(F.col(value_col), _PYWB_WIRE_SCHEMA).alias("j")
    out = (
        lines.where(F.trim(F.col(value_col)) != "")
        .select(j)
        .where(F.col("j").isNotNull())
        .where(F.col("j.error").isNull() & F.col("j.message").isNull())
        # a capture line always carries urlkey+timestamp; anything else is
        # an unrecognized body -> contributes nothing (reference returns [])
        .where(F.col("j.urlkey").isNotNull() & F.col("j.timestamp").isNotNull())
    )
    return out.select(
        F.col("j.urlkey").alias("urlkey"),
        F.col("j.timestamp").alias("timestamp"),
        F.col("j.url").alias("url"),
        F.col("j.status").alias("status"),
        F.col("j.mime").alias("mime"),
        F.col("j.`mime-detected`").alias("mime_detected"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").cast("long").alias("length"),
        F.col("j.offset").cast("long").alias("offset"),
        F.col("j.filename").alias("filename"),
        crawl_from_filename(F.col("j.filename")).alias("crawl"),
        F.col("j.languages").alias("languages"),
        F.col("j.redirect").alias("redirect"),
    )


def decode_ia_lol(bodies: DataFrame, value_col: str = "body") -> DataFrame:
    """IA list-of-lists -> capture rows (S-5).

    `bodies`: one whole response body per row. The header row travels with
    each body, so differently-shaped responses (IA serves whatever `fl=`
    asked for) decode correctly side by side: each value row becomes a
    fieldname->value map, then IA names are renamed to pywb
    (reference munge_fields, compat.py:27-38).
    """
    arr = F.from_json(F.col(value_col), "array<array<string>>")
    rows = (
        bodies.select(arr.alias("arr"))
        .where(F.col("arr").isNotNull() & (F.size("arr") >= 2))
        .select(
            F.element_at("arr", 1).alias("fields"),
            F.explode(
                F.slice(F.col("arr"), 2, F.size("arr") - 1)
            ).alias("vals"),
        )
        .select(F.map_from_arrays("fields", "vals").alias("m"))
    )

    def pick(pywb_name: str) -> Column:
        ia_names = [k for k, v in FIELDS_TO_PYWB.items() if v == pywb_name]
        cands = [F.col("m").getItem(pywb_name)] + [
            F.col("m").getItem(n) for n in ia_names
        ]
        return F.coalesce(*cands) if len(cands) > 1 else cands[0]

    return rows.select(
        pick("urlkey").alias("urlkey"),
        pick("timestamp").alias("timestamp"),
        pick("url").alias("url"),
        pick("status").alias("status"),
        pick("mime").alias("mime"),
        pick("digest").alias("digest"),
        pick("length").cast("long").alias("length"),
    )


# ---------------------------------------------------------------------------
# wire-format ENCODERS — fixture generators for the decoders above (and the
# building block for serving engine results back out in either dialect)
# ---------------------------------------------------------------------------

def encode_pywb_jsonl(captures: DataFrame) -> DataFrame:
    """Capture rows -> pywb JSONL lines (string values, hyphenated
    mime-detected, null keys omitted — exactly the wire shape)."""
    return captures.select(
        F.to_json(
            F.struct(
                F.col("urlkey"),
                F.col("timestamp"),
                F.col("url"),
                F.col("status"),
                F.col("mime"),
                F.col("mime_detected").alias("mime-detected"),
                F.col("digest"),
                F.col("length").cast("string").alias("length"),
                F.col("offset").cast("string").alias("offset"),
                F.col("filename"),
                F.col("languages"),
                F.col("redirect"),
            )
        ).alias("value")
    )


def encode_ia_lol(captures: DataFrame, pages: int = 4) -> DataFrame:
    """Capture rows -> IA list-of-lists response bodies (one row per page,
    header row first, IA field names, rows ordered by (urlkey, timestamp,
    digest) for determinism)."""
    header = F.array(
        *[F.lit(x) for x in
          ("urlkey", "timestamp", "original", "mimetype", "statuscode",
           "digest", "length")]
    )
    vals = F.array(
        F.col("urlkey"), F.col("timestamp"), F.col("url"), F.col("mime"),
        F.col("status"), F.col("digest"), F.col("length").cast("string"),
    )
    tagged = captures.select(
        F.pmod(F.xxhash64("urlkey", "timestamp", "digest"), F.lit(pages)).alias("page"),
        F.struct(
            F.col("urlkey"), F.col("timestamp"), F.col("digest"),
            vals.alias("v"),
        ).alias("row"),
    )
    return (
        tagged.groupBy("page")
        .agg(F.sort_array(F.collect_list("row")).alias("rows"))
        .select(
            F.to_json(
                F.concat(
                    F.array(header), F.transform("rows", lambda s: s["v"])
                )
            ).alias("body")
        )
    )


def ensure_pywb_wire_fixture(spark, sf_dir: str) -> str:
    """Write (once per sf_dir) the pywb JSONL wire lines for the derived
    capture view to an on-disk fixture; returns its path. Decoding from a
    materialized wire file is both the real deployment shape (API response
    bodies land on storage before decoding) and what keeps the decode plan
    honest: a fused decode(encode(view)) lets filter pushdown substitute
    the whole encode chain (SURT + digest + to_json) into every from_json
    reference, benchmarking the optimizer's expression duplication instead
    of the decoder (measured ~18x at sf0.1)."""
    import hashlib
    import os
    import tempfile

    from .cdx_view import cdx_captures

    tag = hashlib.md5(f"{sf_dir}|pywb-wire|v1".encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"cdxspark_wire_{tag}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    build_dir = f"{out_dir}.build-{os.getpid()}"
    encode_pywb_jsonl(cdx_captures(spark, sf_dir)).write.mode(
        "overwrite"
    ).parquet(build_dir)
    try:
        os.replace(build_dir, out_dir)
    except OSError:
        pass  # a concurrent builder published first — theirs is identical
    return out_dir


def read_pywb_wire(spark, fixture_dir: str):
    return spark.read.schema("value string").parquet(fixture_dir)
