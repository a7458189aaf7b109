"""CLI shim lifecycle parity (reference tests/test_cli.py semantics):
iter field winnowing + csv/jsonl shapes, size counts, warc extraction."""

import glob
import io
import json
import sys

import pytest

from cdx_toolkit_spark import cli


def _run(spark, argv, capsys):
    rc = cli.main(argv, spark=spark)
    assert rc == 0
    return capsys.readouterr().out.splitlines()


def test_iter_default_fields(spark, sf_dir, capsys):
    lines = _run(
        spark,
        ["--sf-dir", sf_dir, "--from", "2017", "--to", "2017",
         "--limit", "5", "iter", "example0.com/*"],
        capsys,
    )
    assert len(lines) == 5
    # default fields url,status,timestamp as 'k: v' segments
    assert all(l.startswith("url: ") and " status: " in l for l in lines)


def test_iter_csv_and_jsonl(spark, sf_dir, capsys):
    csv_lines = _run(
        spark,
        ["--sf-dir", sf_dir, "--from", "2015", "--to", "2018", "--limit", "4",
         "iter", "example0.com/*", "--csv", "--fields", "url,status"],
        capsys,
    )
    assert csv_lines[0] == "url,status"
    assert len(csv_lines) == 5

    jl = _run(
        spark,
        ["--sf-dir", sf_dir, "--from", "2015", "--to", "2018", "--limit", "3",
         "iter", "example0.com/*", "--jsonl", "--all-fields"],
        capsys,
    )
    rows = [json.loads(l) for l in jl]
    assert len(rows) == 3 and all("urlkey" in r for r in rows)


def test_get_closest(spark, sf_dir, capsys):
    lines = _run(
        spark,
        ["--sf-dir", sf_dir, "--get", "--closest", "20170601", "--limit", "3",
         "iter", "example0.com/*", "--fields", "timestamp"],
        capsys,
    )
    assert len(lines) == 3


def test_size_and_details(spark, sf_dir, capsys):
    # note: without --from/--to the engine injects the reference's default
    # recent-year window (empty on the 2015-2018 synthetic data)
    win = ["--from", "2015", "--to", "2018"]
    out = _run(
        spark, ["--sf-dir", sf_dir, *win, "size", "example0.com/*"], capsys
    )
    n = int(out[0])
    assert n > 0
    det = _run(
        spark,
        ["--sf-dir", sf_dir, *win, "size", "--details", "example0.com/*"],
        capsys,
    )
    assert sum(int(l.split(": ")[1]) for l in det) == n
    assert all(l.startswith("CC-MAIN-") for l in det)


def test_crawl_implies_selection(spark, sf_dir, capsys):
    all_lines = _run(
        spark, ["--sf-dir", sf_dir, "--from", "2015", "--to", "2018",
                "iter", "example0.com/*", "--fields", "timestamp"], capsys,
    )
    crawl_lines = _run(
        spark, ["--sf-dir", sf_dir, "--crawl", "CC-MAIN-2017-26,CC-MAIN-2017-52",
                "iter", "example0.com/*", "--fields", "timestamp"], capsys,
    )
    assert 0 < len(crawl_lines) < len(all_lines)
    assert all(l.split(": ")[1].startswith("2017") for l in crawl_lines)


def test_warc_extraction(spark, sf_dir, tmp_path, capsys):
    from cdx_toolkit_spark import warc as W

    src = W.ensure_warc_fixture(spark, sf_dir)
    out_dir = str(tmp_path / "extracted")
    lines = _run(
        spark,
        ["--sf-dir", sf_dir, "warc", "example0.com/*",
         "--warc-download-prefix", src, "--out-dir", out_dir,
         "--prefix", "EXT", "--size", "32768", "--creator", "tests",
         "--url-fgrepv", "id=7"],
        capsys,
    )
    assert lines and all("records=" in l for l in lines)
    segs = glob.glob(out_dir + "/EXT-*.warc.gz")
    assert segs
    back = W.read_warc(spark, out_dir + "/*.warc.gz")
    from pyspark.sql import functions as F

    body = back.where(F.col("warc_type") != "warcinfo")
    uris = [r["target_uri"] for r in body.collect()]
    assert uris and all("example0.com" in u for u in uris)
    assert all("id=7" not in u for u in uris)
    # provenance headers attached by the range fetch survive re-serialization
    assert body.count() == sum(int(l.split("records=")[1].split()[0]) for l in lines)


def test_warc_requires_prefix(spark, sf_dir):
    with pytest.raises(ValueError, match="warc-download-prefix"):
        cli.main(["--sf-dir", sf_dir, "warc", "example0.com/*"], spark=spark)
