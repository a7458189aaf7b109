"""CDX 14-digit timestamp algebra.

Semantic parity with the reference's pure time kernels
(/root/reference/cdx_toolkit/timeutils.py:19-111) — independently implemented,
verified against the reference's golden doctest/unit vectors
(tests/unit/test_timeutils.py).

These run driver-side: every caller passes scalar query parameters, never
columns. Column-level timestamp work stays in Spark built-ins (the CDX view
keeps `timestamp` as a fixed-width digit string, so window predicates are
plain string comparisons that push down to parquet/Iceberg row-group stats).
"""

from __future__ import annotations

import datetime
from email.utils import parsedate

TIMESTAMP_FMT = "%Y%m%d%H%M%S"
TIMESTAMP_LOW = "19780101000000"
TIMESTAMP_HIGH = "29991231235959"

# Reference parity trap (timeutils.py:16): Feb always pads to 28, even in
# leap years — so this is NOT Spark's last_day().
_DAYS_IN_MONTH = (0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

_UTC = datetime.timezone.utc


def pad_timestamp(ts: str) -> str:
    """Pad a timestamp prefix downward: '1998' -> '19980101000000'."""
    ts = str(ts)
    return ts + TIMESTAMP_LOW[len(ts):]


def pad_timestamp_up(ts: str) -> str:
    """Pad a timestamp prefix upward, clamping the day to the month length:
    '199802' -> '19980228235959' (reference timeutils.py:27-35)."""
    ts = str(ts)
    ts = ts + TIMESTAMP_HIGH[len(ts):]
    month = int(ts[4:6])
    return ts[:6] + str(_DAYS_IN_MONTH[month]) + ts[8:]


def timestamp_to_time(ts) -> float:
    """14-digit (or prefix) CDX timestamp -> unix time (UTC).

    Rejects unixtime-looking inputs with a hint, mirroring the reference's
    range check 605664000..1989031200 (timeutils.py:38-54).
    """
    ts = str(ts)
    padded = pad_timestamp(ts)
    try:
        return (
            datetime.datetime.strptime(padded, TIMESTAMP_FMT)
            .replace(tzinfo=_UTC)
            .timestamp()
        )
    except ValueError:
        if ts.isdigit() and 605664000 < int(ts) < 1989031200:
            raise ValueError(
                "cannot parse timestamp, cdx timestamps are not unix "
                "timestamps: " + ts
            ) from None
        raise ValueError(
            "cannot parse timestamp, is it a valid cdx timestamp?: " + ts
        ) from None


def time_to_timestamp(t: float) -> str:
    """Unix time -> 14-digit CDX timestamp string (UTC)."""
    return datetime.datetime.fromtimestamp(t, tz=_UTC).strftime(TIMESTAMP_FMT)


# Common Crawl index names encode a (non-ISO) %Y-%W week; the Sunday (-0) of
# that week is treated as the index's data END time (timeutils.py:65-76).
_CC_WEEK_FMT = "%Y-%W-%w"


def cc_index_to_time(cc: str) -> float:
    """'2018-02' -> unixtime of that year-week's Sunday, UTC."""
    return (
        datetime.datetime.strptime(cc + "-0", _CC_WEEK_FMT)
        .replace(tzinfo=_UTC)
        .timestamp()
    )


# Legacy crawl names with hand-assigned end times (timeutils.py:79-97).
_CC_SPECIAL = {
    "2012": "201206",
    "2009-2010": "201009",
    "2008-2009": "200901",
}


def cc_index_to_time_special(cc: str):
    if cc in _CC_SPECIAL:
        return timestamp_to_time(_CC_SPECIAL[cc])
    return None


def validate_timestamps(params: dict) -> None:
    """from_ts / to / closest must be digit-strings or ints
    (timeutils.py:100-111)."""
    for key in ("from_ts", "to", "closest"):
        if key in params:
            value = params[key]
            if isinstance(value, str):
                if not value.isdigit():
                    raise ValueError(
                        "invalid parameter {} {!r}".format(key, value)
                    )
            elif isinstance(value, int):
                pass
            else:
                raise ValueError("invalid parameter {} {!r}".format(key, value))


ISO_DT = "%Y-%m-%dT%H:%M:%SZ"


def http_date_to_datetime(string: str) -> datetime.datetime:
    """RFC-822 date -> naive datetime (timeutils.py:122-127)."""
    return datetime.datetime(*parsedate(string)[:6])


def datetime_to_iso_date(dt: datetime.datetime) -> str:
    return dt.strftime(ISO_DT)


def pages_to_samples(pages: float) -> int:
    """Size-estimate arithmetic (reference __init__.py:43-50): a partial
    final page means (pages - 1) * 3000; a single page counts as half."""
    if pages <= 1:
        pages = pages * 0.5
    else:
        pages = pages - 1.0
    return int(pages * 3000)


def normalize_crawl(crawl: list) -> list:
    """Split comma-lists; an integer spec must be alone
    (reference commoncrawl.py:24-33)."""
    crawls = []
    for c in crawl:
        if "," in c:
            crawls.extend(c.split(","))
        else:
            crawls.append(c)
    if len(crawls) > 1 and any(x.isdigit() for x in crawls):
        raise ValueError("If you specify an integer, only one crawl is allowed")
    return crawls
