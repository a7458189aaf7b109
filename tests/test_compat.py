"""Dialect table from /root/reference/tests/unit/test_compat.py:6-26."""

import pytest

from cdx_toolkit_spark.compat import munge_filter, normalize_field_names


def test_munge_filter():
    tests = (
        ("foo", "foo", "foo"),
        ("!status:200", "!statuscode:200", "!status:200"),
        ("statuscode:200", "statuscode:200", "status:200"),
        ("url:foo", "original:foo", "url:foo"),
    )
    for t, ia, cc in tests:
        assert munge_filter([t], "ia") == [ia]
        assert munge_filter([t], "cc") == [cc]
    with pytest.raises(ValueError):
        munge_filter(["!=status:200"], "ia")


def test_normalize_field_names():
    assert normalize_field_names(["statuscode", "original", "mimetype", "x"]) == [
        "status",
        "url",
        "mime",
        "x",
    ]
