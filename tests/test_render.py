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
