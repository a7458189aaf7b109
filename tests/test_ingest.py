"""Wire-format decoders (S-4 pywb JSONL, S-5 IA list-of-lists): golden
vectors from the reference's mock responses, empty-as-empty (S-6), IA field
renames, and the file-read path."""

from pyspark.sql import functions as F

from cdx_toolkit_spark import ingest

# a real pywb wire line shape (reference
# tests/data/mock_responses/test_cli/test_basics.jsonl)
PYWB_LINE = (
    '{"urlkey": "org,commoncrawl)/", "timestamp": "20250804103329", '
    '"url": "https://www.commoncrawl.org/", "mime": "text/html", '
    '"mime-detected": "text/html", "status": "200", '
    '"digest": "FAPYCDZSWJIQ2YPQAYDRLAC25YMUNVTD", "length": "7063", '
    '"offset": "667474763", "filename": '
    '"crawl-data/CC-MAIN-2025-33/segments/1754151279781.29/warc/'
    'CC-MAIN-20250804083340-20250804113340-00340.warc.gz", '
    '"languages": "eng", "encoding": "UTF-8"}'
)


def test_pywb_jsonl_golden(spark):
    lines = spark.createDataFrame(
        [
            (PYWB_LINE,),
            ('{"error": "No Captures found for: www.example.com/*"}',),
            ('{"message": "slow down"}',),
            ("",),
        ],
        "value string",
    )
    out = ingest.decode_pywb_jsonl(lines).collect()
    assert len(out) == 1  # error/message/blank lines decode to nothing
    r = out[0]
    assert r["urlkey"] == "org,commoncrawl)/"
    assert r["mime_detected"] == "text/html"
    assert r["length"] == 7063 and r["offset"] == 667474763
    assert r["crawl"] == "CC-MAIN-2025-33"
    assert r["redirect"] is None


def test_ia_lol_golden_and_renames(spark):
    body = (
        '[["urlkey","timestamp","original","mimetype","statuscode",'
        '"digest","length"],'
        '["org,cc)/","20250101000000","http://cc.org/","text/html","200",'
        '"ABC","100"],'
        '["org,cc)/x","20250102000000","http://cc.org/x","text/html","404",'
        '"DEF","50"]]'
    )
    bodies = spark.createDataFrame([(body,), ("[]",), ("",)], "body string")
    out = ingest.decode_ia_lol(bodies).orderBy("timestamp").collect()
    assert len(out) == 2
    assert out[0]["url"] == "http://cc.org/"       # original -> url
    assert out[0]["status"] == "200"               # statuscode -> status
    assert out[0]["mime"] == "text/html"           # mimetype -> mime
    assert out[1]["length"] == 50


def test_roundtrip_through_files(spark, sf_dir, tmp_path):
    from cdx_toolkit_spark.cdx_view import cdx_captures

    cap = cdx_captures(spark, sf_dir)
    wire_dir = str(tmp_path / "wire")
    ingest.encode_pywb_jsonl(cap).write.mode("overwrite").text(wire_dir)
    decoded = ingest.decode_pywb_jsonl(spark.read.text(wire_dir))
    want = {
        (r["urlkey"], r["timestamp"], r["digest"], r["length"], r["crawl"])
        for r in cap.collect()
    }
    got = {
        (r["urlkey"], r["timestamp"], r["digest"], r["length"], r["crawl"])
        for r in decoded.collect()
    }
    assert got == want


def test_ia_pages_cover_all_rows(spark, sf_dir):
    from cdx_toolkit_spark.cdx_view import cdx_captures

    cap = cdx_captures(spark, sf_dir)
    bodies = ingest.encode_ia_lol(cap, pages=4)
    assert bodies.count() <= 4
    assert ingest.decode_ia_lol(bodies).count() == cap.count()
