"""WARC path: gzip member split (F-11), header parse (F-12), bulk ingest
(S-7), range fetch parity, segmented sink rollover + warcinfo (S-9)."""

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark import warc as W


def _gz_member(data: bytes) -> bytes:
    return gzip.compress(data, 6, mtime=0)


def test_split_gzip_members_golden():
    parts = [b"alpha", b"beta" * 100, b""]
    blob = b"".join(_gz_member(p) for p in parts)
    got = list(W.split_gzip_members(blob))
    assert [g[2] for g in got] == parts
    # extents tile the blob exactly
    assert got[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(got, got[1:]):
        assert o1 + l1 == o2
    assert got[-1][0] + got[-1][1] == len(blob)


def test_parse_warc_record_http_block():
    payload = "héllo wörld".encode()
    raw = W._render_record(
        "response",
        "<urn:uuid:00000000-0000-0000-0000-000000000042>",
        "http://example.com/x",
        "2017-06-01T00:00:00Z",
        payload,
        200,
        "text/html",
    )
    rec = W.parse_warc_record(raw)
    assert rec["warc_type"] == "response"
    assert rec["target_uri"] == "http://example.com/x"
    assert rec["http_status"] == 200
    assert rec["http_content_type"] == "text/html"
    assert rec["payload"] == payload
    assert rec["payload_digest"].startswith("sha1:")
    # round trip through the member splitter too
    (m,) = list(W.split_gzip_members(_gz_member(raw)))
    assert W.parse_warc_record(m[2]) == rec


def test_parse_warc_record_garbage():
    assert W.parse_warc_record(b"not a warc") is None
    assert W.parse_warc_record(b"WARC/1.0\r\nno-terminator") is None


def test_roundtrip_write_read(spark, sf_dir, tmp_path):
    recs = W.synth_warc_records(spark, sf_dir)
    out = str(tmp_path / "segs")
    manifest = W.write_warc_segments(
        recs.repartition(2), out, prefix="RT", target_bytes=1 << 14
    ).collect()
    assert sum(m["n_records"] for m in manifest) == recs.count()
    back = W.read_warc(spark, out + "/*.warc.gz")
    body = back.where(F.col("warc_type") != "warcinfo")
    a = {
        (r["record_id"], r["target_uri"], r["warc_date"], r["http_status"],
         bytes(r["payload"]))
        for r in body.collect()
    }
    b = {
        (r["record_id"], r["target_uri"], r["warc_date"], r["http_status"],
         bytes(r["payload"]))
        for r in recs.collect()
    }
    assert a == b


def test_segment_rollover_and_warcinfo(spark, sf_dir, tmp_path):
    recs = W.synth_warc_records(spark, sf_dir).coalesce(1)
    out = str(tmp_path / "roll")
    manifest = W.write_warc_segments(
        recs, out, prefix="RO", subprefix="sub", target_bytes=1 << 13
    ).collect()
    assert len(manifest) > 1, "tiny target must force rollover"
    # every segment stays close to target (one record of slop, like the
    # reference: rollover happens after the record that crosses the line)
    segs = sorted(glob.glob(out + "/*.warc.gz"))
    assert segs == sorted(m["segment"] for m in manifest)
    assert all("RO-sub-" in s for s in segs)
    for m in manifest:
        assert os.path.getsize(m["segment"]) == m["n_bytes"]
    # first record of every segment is its warcinfo
    for s in segs:
        with open(s, "rb") as fd:
            blob = fd.read()
        first = next(W.split_gzip_members(blob))
        rec = W.parse_warc_record(first[2])
        assert rec["warc_type"] == "warcinfo"
        assert b"software" in first[2]


def test_fetch_warc_records_range_parity(spark, sf_dir):
    fx = W.ensure_warc_fixture(spark, sf_dir)
    full = W.read_warc(spark, fx + "/*.warc.gz").where(
        F.col("warc_type") != "warcinfo"
    )
    idx = full.select(
        "filename",
        F.col("member_offset").alias("offset"),
        F.col("member_length").alias("length"),
    )
    fetched = W.fetch_warc_records(spark, idx)
    a = {(r["record_id"], bytes(r["payload"])) for r in fetched.collect()}
    b = {(r["record_id"], bytes(r["payload"])) for r in full.collect()}
    assert a == b
    row = fetched.first()
    assert row["warc_source_range"] == "bytes={}-{}".format(
        row["member_offset"], row["member_offset"] + row["member_length"] - 1
    )
    assert row["warc_source_uri"].endswith(".warc.gz")


def test_fetch_requires_capture_fields(spark):
    df = spark.createDataFrame([("f",)], "filename string")
    with pytest.raises(ValueError, match="length"):
        W.fetch_warc_records(spark, df)


def test_uncompressed_warc_roundtrip(spark, sf_dir, tmp_path):
    recs = W.synth_warc_records(spark, sf_dir).limit(20).coalesce(1)
    out = str(tmp_path / "plain")
    W.write_warc_segments(
        recs, out, prefix="PL", gzip_members=False, target_bytes=1 << 20
    ).collect()
    back = W.read_warc(spark, out + "/*.warc")
    assert back.where(F.col("warc_type") != "warcinfo").count() == 20
