"""Crawl-selection / default-window parity (golden vectors from
/root/reference/tests/unit/test_cc.py:32-237, including the deliberate
±1-index bisect over-inclusion)."""

import pytest

from cdx_toolkit_spark import planner
from cdx_toolkit_spark.timeutils import timestamp_to_time

NOW = 1524962339.157388  # 20180429003859

ENDPOINTS = [
    "https://index.commoncrawl.org/CC-MAIN-2008-2009-index",
    "https://index.commoncrawl.org/CC-MAIN-2009-2010-index",
    "https://index.commoncrawl.org/CC-MAIN-2012-index",
    "https://index.commoncrawl.org/CC-MAIN-2013-20-index",
    "https://index.commoncrawl.org/CC-MAIN-2017-51-index",
    "https://index.commoncrawl.org/CC-MAIN-2018-05-index",
    "https://index.commoncrawl.org/CC-MAIN-2018-09-index",
    "https://index.commoncrawl.org/CC-MAIN-2018-13-index",
]


def _ep(name):
    return f"https://index.commoncrawl.org/CC-MAIN-{name}-index"


def test_apply_cc_defaults():
    tests = [
        [{"crawl": "foo"}, {}],
        [
            {"closest": "20180101"},
            {"from_ts": "20171003000000", "to": "20180401000000"},
        ],
        [{"closest": "20180101", "to": "20181201"}, {"from_ts": "20171003000000"}],
        [{"to": "20180101"}, {"from_ts": "20170131235959"}],
        [{}, {"from_ts": "20170429003859"}],
        [{"from_ts": "20100101", "closest": "20150301"}, {"to": "20150530000000"}],
        [{"from_ts": "20100101"}, {}],
    ]
    for test_in, test_out in tests:
        crawl_present = bool(test_in.pop("crawl", None))
        test_out.update(test_in)
        planner.apply_cc_defaults(test_in, crawl_present=crawl_present, now=NOW)
        assert test_in == test_out


def test_match_cc_crawls():
    tests = [
        [["CC-MAIN-2013-20"], [_ep("2013-20")]],
        [["CC-MAIN-2017"], [_ep("2017-51")]],
        [["CC-MAIN-2018"], [_ep("2018-05"), _ep("2018-09"), _ep("2018-13")]],
        [["CC-MAIN-2013", "CC-MAIN-2017"], [_ep("2013-20"), _ep("2017-51")]],
        [["CC-MAIN-2013-20", "no match"], [_ep("2013-20")]],
        [["2"], [_ep("2018-09"), _ep("2018-13")]],  # int = last N
    ]
    for asked, want in tests:
        assert planner.match_cc_crawls(asked, ENDPOINTS) == want
    with pytest.raises(ValueError):
        planner.match_cc_crawls(["no match"], ENDPOINTS)


def test_make_cc_maps():
    cc_map, cc_times = planner.make_cc_maps(ENDPOINTS)
    assert cc_map[cc_times[0]] == _ep("2008-2009")
    assert cc_map[cc_times[-1]] == _ep("2018-13")
    # bare crawl names (our partition values) parse too
    names = [e.rsplit("/", 1)[1].replace("-index", "") for e in ENDPOINTS]
    cc_map2, cc_times2 = planner.make_cc_maps(names)
    assert cc_times2 == cc_times
    assert cc_map2[cc_times2[-1]] == "CC-MAIN-2018-13"


def test_bisect_cc():
    cc_map, cc_times = planner.make_cc_maps(ENDPOINTS)
    tests = [
        # the XXX'd over-inclusions are deliberate reference behavior
        [("201801", "201804"), ("2017-51", "2018-13", 4)],
        [("20180214", "201804"), ("2018-05", "2018-13", 3)],
        [("20180429", "20180430"), ("2018-13", "2018-13", 1)],
    ]
    for (lo, hi), (first, last, count) in tests:
        got = planner.bisect_cc(
            cc_map, cc_times, timestamp_to_time(lo), timestamp_to_time(hi)
        )
        assert got[0] == _ep(first)
        assert got[-1] == _ep(last)
        assert len(got) == count
        # open-ended: runs to the newest index
        open_got = planner.bisect_cc(
            cc_map, cc_times, timestamp_to_time(lo), None
        )
        assert open_got[0] == _ep(first)
        assert open_got[-1] == _ep("2018-13")


def test_check_cc_from_to_raises():
    for params in (
        {"closest": "2010", "to": "2010"},
        {"closest": "2010", "from_ts": "2010"},
        {"to": "2010"},
        {},
    ):
        with pytest.raises(ValueError):
            planner.check_cc_from_to(params)


def test_filter_cc_endpoints_order_and_empty():
    # ascending vs mixed vs invalid (reference commoncrawl.py:258-270)
    params = {"from_ts": "201801", "to": "201804"}
    asc = planner.filter_cc_endpoints(ENDPOINTS, "ascending", dict(params))
    mixed = planner.filter_cc_endpoints(ENDPOINTS, "mixed", dict(params))
    assert asc == list(reversed(mixed))
    assert asc[0] == _ep("2017-51") and asc[-1] == _ep("2018-13")
    with pytest.raises(ValueError):
        planner.filter_cc_endpoints(ENDPOINTS, "invalid", dict(params))
    # very empty time range -> empty list
    empty = planner.filter_cc_endpoints(
        ENDPOINTS, "mixed", {"from_ts": "20180430", "to": "20100429"}
    )
    assert empty == []
    # crawl selection path
    got = planner.filter_cc_endpoints(
        ENDPOINTS, "ascending", {"crawl": ["CC-MAIN-2018"]}
    )
    assert got == [_ep("2018-05"), _ep("2018-09"), _ep("2018-13")]


def test_filter_cc_endpoints_closest_window():
    # closest defaulting narrows the endpoint range (test_cc.py:211-237)
    params = {"closest": "201801", "from_ts": "20171230", "to": None}
    planner.apply_cc_defaults(params)
    got = planner.filter_cc_endpoints(ENDPOINTS, "mixed", params)
    assert got[0] == _ep("2018-13") and got[-1] == _ep("2017-51")
    assert len(got) == 4

    params = {"closest": "201801", "from_ts": "20171230", "to": "201802"}
    planner.apply_cc_defaults(params)
    got = planner.filter_cc_endpoints(ENDPOINTS, "mixed", params)
    assert got[0] == _ep("2018-05") and got[-1] == _ep("2017-51")
    assert len(got) == 2
