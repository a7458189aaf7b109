"""Golden vectors ported from the reference's pure-function unit tests
(/root/reference/tests/unit/test_timeutils.py, tests/unit/test_cc.py) —
semantic parity checks, no Spark needed."""

import pytest

from cdx_toolkit_spark import timeutils as tu


def test_padding():
    assert tu.pad_timestamp("1998") == "19980101000000"
    assert tu.pad_timestamp_up("199802") == "19980228235959"
    assert tu.pad_timestamp_up("199812") == "19981231235959"


def test_feb_never_leaps():
    # parity trap: reference pads Feb to 28 even in leap years
    assert tu.pad_timestamp_up("201602") == "20160228235959"


def test_time_timestamp_roundtrip():
    tests = (
        ("1978", 252460800.0),
        ("1999", 915148800.0),
        ("19981231235959", 915148799.0),
    )
    for ts, t in tests:
        assert tu.timestamp_to_time(ts) == t
        assert tu.time_to_timestamp(t) == tu.pad_timestamp(ts)

    with pytest.raises(ValueError):
        tu.timestamp_to_time("19990231")
    with pytest.raises(ValueError, match="are not unix timestamps"):
        tu.timestamp_to_time("1598411009")
    with pytest.raises(ValueError, match="is it a valid cdx timestamp"):
        tu.timestamp_to_time("x")


def test_validate_timestamps():
    with pytest.raises(ValueError):
        tu.validate_timestamps({"to": "asdf"})
    with pytest.raises(ValueError):
        tu.validate_timestamps({"to": {}})
    tu.validate_timestamps({"to": "12345"})
    tu.validate_timestamps({"to": 12345})


def test_cc_index_to_time():
    assert tu.cc_index_to_time("2018-02") == 1515888000.0


def test_cc_index_to_time_special():
    assert tu.cc_index_to_time_special("2012") == 1338508800.0
    assert tu.cc_index_to_time_special("2009-2010") == 1283299200.0
    assert tu.cc_index_to_time_special("nope") is None


def test_http_dates():
    import datetime

    assert tu.http_date_to_datetime(
        "Thu, 26 Dec 2013 09:50:10 GMT"
    ) == datetime.datetime(2013, 12, 26, 9, 50, 10)
    assert (
        tu.datetime_to_iso_date(datetime.datetime(2013, 12, 26, 10, 11, 12))
        == "2013-12-26T10:11:12Z"
    )


def test_pages_to_samples():
    # reference __init__.py:43-50 arithmetic
    assert tu.pages_to_samples(1) == 1500
    assert tu.pages_to_samples(2) == 3000
    assert tu.pages_to_samples(10) == 27000


def test_normalize_crawl():
    tests = [
        [["1"], ["1"]],
        [["a"], ["a"]],
        [["a", "b"], ["a", "b"]],
        [["a,b", "c"], ["a", "b", "c"]],
        [["a,b,c,d"], ["a", "b", "c", "d"]],
        [["a", "b,c"], ["a", "b", "c"]],
    ]
    for arg, want in tests:
        assert tu.normalize_crawl(arg) == want
    with pytest.raises(ValueError):
        tu.normalize_crawl(["1", "2"])
