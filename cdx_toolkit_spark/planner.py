"""Query-parameter resolution + crawl (partition) pruning.

This is the reference's hard-coded "analyzer/optimizer" stage re-expressed as
pure functions that produce *partition predicates* for Catalyst instead of an
endpoint list for an HTTP loop:

- default time-window injection (reference commoncrawl.py:97-138)
- crawl-name / crawl-count matching   (commoncrawl.py:141-165)
- crawl-name -> end-time maps          (commoncrawl.py:168-190)
- time-range bisect with the deliberate ±1-index over-inclusion
  (commoncrawl.py:223-232 — an index name marks its data END time, so rows
  for `from` may live in the *previous* index; we reproduce the slop exactly
  so endpoint-selection traces match the reference's unit tests)
- cc_sort ordering ('ascending' | 'mixed') (commoncrawl.py:258-270)

Everything here is driver-side scalar work over tiny metadata (the distinct
crawl list); the output feeds `col('crawl').isin([...])`, which Iceberg /
parquet partition pruning consumes. No per-row Python ever touches data.
"""

from __future__ import annotations

import bisect
import logging
import re
import time as _time

from .timeutils import (
    cc_index_to_time,
    cc_index_to_time_special,
    pad_timestamp_up,
    time_to_timestamp,
    timestamp_to_time,
)

LOGGER = logging.getLogger(__name__)

THREE_MONTHS = 3 * 30 * 86400
ONE_YEAR = 365 * 86400


def apply_cc_defaults(params: dict, crawl_present: bool = False, now=None) -> None:
    """Inject default from/to windows (mutates params, reference semantics).

    closest= -> from/to = closest ∓ 3 months (when absent);
    no crawl and no from -> from = now - 1 year;
    crawl present -> leave everything alone.
    """
    if params.get("closest") is not None:
        closest_t = timestamp_to_time(params["closest"])
        if params.get("from_ts") is None:
            params["from_ts"] = time_to_timestamp(closest_t - THREE_MONTHS)
        if params.get("to") is None:
            params["to"] = time_to_timestamp(closest_t + THREE_MONTHS)
    elif not crawl_present:
        if params.get("from_ts") is not None:
            pass  # from but no to: reference leaves the window open
        elif params.get("to") is not None:
            to = pad_timestamp_up(params["to"])
            params["from_ts"] = time_to_timestamp(timestamp_to_time(to) - ONE_YEAR)
        else:
            if not now:
                now = _time.time()
            params["from_ts"] = time_to_timestamp(now - ONE_YEAR)


def match_cc_crawls(crawls, raw_index_list):
    """Select crawl names: a single integer means 'last N'; otherwise
    substring match, warning on partial misses, raising on zero matches."""
    if crawls is None:
        return raw_index_list
    if len(crawls) == 1 and crawls[0].isdigit():
        return raw_index_list[-int(crawls[0]):]
    selected = set()
    used = set()
    for asked in crawls:
        for available in raw_index_list:
            if asked in available:
                used.add(asked)
                selected.add(available)
    if not used:
        raise ValueError("No matches for crawls " + ",".join(crawls))
    missed = set(crawls).difference(used)
    if missed:
        LOGGER.warning("No matches for these crawl args: %s", ",".join(missed))
    return sorted(selected)


_CC_WEEKLY = re.compile(r"CC-MAIN-(\d\d\d\d-\d\d)(?:-|$)")
_CC_SPECIAL_RANGE = re.compile(r"CC-MAIN-(\d\d\d\d-\d\d\d\d)(?:-|$)")
_CC_SPECIAL_YEAR = re.compile(r"CC-MAIN-(\d\d\d\d)(?:-i|$)")


def make_cc_maps(raw_index_list):
    """Parse each crawl name to its data end time; returns ({t: name}, sorted ts).

    Accepts both full endpoint URLs (reference shape) and bare crawl names
    (our partition values), hence the `(?:-|$)` anchors.
    """
    cc_times = []
    cc_map = {}
    for name in raw_index_list:
        t = None
        m = _CC_WEEKLY.search(name)
        if m:
            t = cc_index_to_time(m.group(1))
        m = _CC_SPECIAL_RANGE.search(name)
        if m:
            t = cc_index_to_time_special(m.group(1))
        m = _CC_SPECIAL_YEAR.search(name)
        if m:
            t = cc_index_to_time_special(m.group(1))
        if t is None:
            LOGGER.error("unable to parse date out of %s", name)
            continue
        cc_times.append(t)
        cc_map[t] = name
    return cc_map, sorted(cc_times)


def check_cc_from_to(params):
    """Resolve the (from_t, to_t) unixtime pair after defaulting."""
    if "closest" in params:
        if params.get("from_ts") is None or params.get("to") is None:
            raise ValueError("Cannot happen")
        return timestamp_to_time(params["from_ts"]), timestamp_to_time(params["to"])
    if "to" in params and params["to"] is not None:
        to_t = timestamp_to_time(pad_timestamp_up(params["to"]))
    else:
        to_t = None
    if params.get("from_ts") is None:
        raise ValueError("Cannot happen")
    return timestamp_to_time(params["from_ts"]), to_t


def bisect_cc(cc_map, cc_times, from_ts_t, to_t):
    """[bisect_left(from)-1, bisect_right(to)+1) — deliberately over-inclusive
    by one index on each side (reference commoncrawl.py:223-232)."""
    start = max(0, bisect.bisect_left(cc_times, from_ts_t) - 1)
    if to_t is not None:
        end = min(bisect.bisect_right(cc_times, to_t) + 1, len(cc_times))
    else:
        end = len(cc_times)
    return [cc_map[t] for t in cc_times[start:end]]


def filter_cc_endpoints(raw_index_list, cc_sort="ascending", params=None):
    """Produce the ordered crawl list a query should scan.

    Either explicit crawl selection (params['crawl']) or time-window bisect;
    then 'ascending' keeps oldest-first, 'mixed' reverses (newest crawl first,
    recency-biased limit, reference README.md:243-257).
    """
    params = params if params is not None else {}
    if "crawl" in params:
        crawls = params.pop("crawl")
        index_list = match_cc_crawls(crawls, raw_index_list)
    else:
        cc_map, cc_times = make_cc_maps(raw_index_list)
        from_ts_t, to_t = check_cc_from_to(params)
        index_list = bisect_cc(cc_map, cc_times, from_ts_t, to_t)
        params["from_ts"] = time_to_timestamp(from_ts_t)
        if to_t is not None:
            params["to"] = time_to_timestamp(to_t)

    if cc_sort == "ascending":
        pass
    elif cc_sort == "mixed":
        index_list = list(reversed(index_list))
    else:
        raise ValueError("unknown cc_sort arg of " + cc_sort)
    return index_list
