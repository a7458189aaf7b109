"""S-10 output renders + F-9 scalar parity (reference cli.py:197-221,
warc.py:19-20, tests/unit/test_warc.py:4-7)."""

import json

from pyspark.sql import functions as F

from cdx_toolkit_spark import render


def _df(spark):
    return spark.createDataFrame(
        [("http://a/", "200", "20170101000000"), ("http://b/", "404", "20180202000000")],
        "url string, status string, timestamp string",
    )


def test_winnow_fields_keep_if_present(spark):
    df = _df(spark)
    out = render.winnow_fields(df, ["url", "missing", "status"])
    assert out.columns == ["url", "status"]


def test_jsonl_render_round_trips(spark):
    df = _df(spark)
    lines = [r["line"] for r in df.select(render.jsonl_col(df)).collect()]
    objs = sorted(json.loads(l)["url"] for l in lines)
    assert objs == ["http://a/", "http://b/"]


def test_kv_lines_render(spark):
    df = _df(spark)
    lines = sorted(r["line"] for r in df.select(render.kv_lines_col(df)).collect())
    assert lines[0] == "url: http://a/  status: 200  timestamp: 20170101000000"


def test_csv_and_jsonl_sinks(spark, tmp_path):
    df = _df(spark)
    render.write_csv(df, str(tmp_path / "c"), fields=["url", "status"])
    render.write_jsonl(df, str(tmp_path / "j"))
    back = spark.read.option("header", True).csv(str(tmp_path / "c"))
    assert back.columns == ["url", "status"] and back.count() == 2
    assert spark.read.json(str(tmp_path / "j")).count() == 2


def test_wb_redir_to_original(spark):
    # golden vector from reference tests/unit/test_warc.py:4-7
    df = spark.createDataFrame(
        [("https://web.archive.org/web/20170101000000id_/http://example.com/a",),
         ("no-marker-here",)],
        "loc string",
    )
    out = df.select(render.wb_redir_to_original_col("loc")).collect()
    vals = {r["original_url"] for r in out}
    assert "http://example.com/a" in vals
    assert None in vals


def test_wb_response_headers_golden(spark):
    """Reference fake_wb_warc header rules (warc.py:59-77), edge cases:
    unwrap x-archive-orig-*, keep content-type, rewrite location, mark
    everything else X-Archive-, leave existing x-archive-* alone."""
    hdrs = [
        ("X-Archive-Orig-Date", "Tue, 01 Jul 2017 05:03:01 GMT"),
        ("X-Archive-Orig-Content-Length", "123"),
        ("Content-Type", "text/html"),
        ("Location",
         "https://web.archive.org/web/20170101000000id_/https://x.com/y"),
        ("Server", "nginx"),
        ("X-Archive-Src", "seg.warc.gz"),
    ]
    df = spark.createDataFrame(
        [(hdrs,)], "headers array<struct<k string, v string>>"
    )
    out = df.select(
        render.wb_response_headers_col("headers").alias("h")
    ).first()["h"]
    got = [(r["k"], r["v"]) for r in out]
    assert got == [
        ("Date", "Tue, 01 Jul 2017 05:03:01 GMT"),
        ("Content-Length", "123"),
        ("Content-Type", "text/html"),
        ("Location", "https://x.com/y"),
        ("X-Archive-Server", "nginx"),
        ("X-Archive-Src", "seg.warc.gz"),
    ]


def test_wb_status_line_vivified(spark):
    rows = [
        (302, "Found", "301"),   # wayback vivified a permanent redirect
        (302, "Found", "302"),   # genuinely temporary: unchanged
        (200, "OK", "-"),        # revisit vivified as 200: unchanged
        (404, "Not Found", "404"),
        (302, "Found", "399"),   # unknown 3xx: no canonical reason -> keep
    ]
    df = spark.createDataFrame(
        rows, "status_code int, reason string, capture_status string"
    )
    out = [
        r[0]
        for r in df.select(
            render.wb_status_line_col("status_code", "reason", "capture_status")
        ).collect()
    ]
    assert out == [
        "301 Moved Permanently", "302 Found", "200 OK", "404 Not Found",
        "302 Found",
    ]


def test_http_date_to_iso(spark):
    df = spark.createDataFrame(
        [("Tue, 01 Jul 2017 05:03:01 GMT",)], "d string"
    )
    got = df.select(render.http_date_to_iso_col("d")).first()[0]
    assert got == "2017-07-01T05:03:01Z"
