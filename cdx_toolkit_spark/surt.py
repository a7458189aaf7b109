"""SURT URL canonicalization (the `urlkey` kernel, reference README.md:207-213).

The reference only *consumes* urlkeys (servers compute them); the new engine
must compute them at ingest for 10^10 URLs, so the hot path matters. Two
implementations of ONE spec:

- ``surt_col(col)``  — pure Spark built-in expression. Stays inside
  whole-stage codegen on the JVM: no Python, no Arrow transfer, vectorized by
  Tungsten. This is what ingest and the frontier use.
- ``surt(url)``      — scalar Python, used driver-side to turn a user's query
  URL into exact/prefix/domain predicates, and as the property-test oracle
  for ``surt_col``.

Spec (subset of the SURT convention used by pywb/Common Crawl urlkeys):
  1. trim + lowercase
  2. drop fragment, scheme, '//' and userinfo
  3. host: drop leading 'www.' / 'www<digits>.'; drop ports 80/443, keep others
  4. reverse dot-separated host labels, join with ','
  5. append ')', then the path ('/' if empty)
  6. query: split on '&', drop empties, sort lexicographically, rejoin;
     append '?query' if non-empty

Golden: 'https://commoncrawl.org/' -> 'org,commoncrawl)/'.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^[a-z][a-z0-9+.-]*://"


def surt(url: str) -> str:
    """Scalar Python SURT (driver-side; mirrors surt_col exactly)."""
    u = url.strip().lower()
    hash_pos = u.find("#")
    if hash_pos != -1:
        u = u[:hash_pos]
    # scheme — only strip when followed by '//' (mirrors _SCHEME_RE)
    m = re.match(_SCHEME_RE, u)
    if m:
        u = u[m.end():]
    elif u.startswith("//"):
        u = u[2:]
    # authority / rest
    cut = len(u)
    for ch in "/?":
        p = u.find(ch)
        if p != -1:
            cut = min(cut, p)
    authority, rest = u[:cut], u[cut:]
    if "@" in authority:
        authority = authority.rsplit("@", 1)[1]
    host, port = authority, ""
    m = re.search(r":(\d+)$", authority)
    if m:
        host, port = authority[: m.start()], m.group(1)
        if port in ("80", "443"):
            port = ""
    host = re.sub(r"^www\d*\.", "", host)
    revhost = ",".join(reversed(host.split(".")))
    # path / query
    if rest.startswith("?"):
        path, query = "/", rest[1:]
    elif "?" in rest:
        path, query = rest.split("?", 1)
    else:
        path, query = rest or "/", ""
    qparts = sorted(p for p in query.split("&") if p)
    key = revhost + ((":" + port) if port else "") + ")" + path
    if qparts:
        key += "?" + "&".join(qparts)
    return key


def surt_col(url) -> Column:
    """SURT as a pure built-in Column expression (JVM-side, codegen-friendly).

    Equivalent to ``surt`` above for every well-formed http(s) URL; verified
    by property tests comparing the two on fixture + fuzzed URLs.
    """
    if isinstance(url, str):
        url = F.col(url)
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, r"#.*$", "")          # fragment
    u = F.regexp_replace(u, _SCHEME_RE, "")        # scheme
    u = F.regexp_replace(u, r"^//", "")            # authority marker
    authority = F.regexp_extract(u, r"^([^/?]*)", 1)
    rest = F.substring(u, F.length(authority) + F.lit(1), F.lit(2147483647))
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(port.isin("80", "443", ""), F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    host = F.regexp_replace(host, r"^www\d*\.", "")
    revhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != F.lit(""))),
        "&",
    )
    return F.concat(
        revhost,
        port,
        F.lit(")"),
        path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    ).alias("urlkey")


def host_col(url) -> Column:
    """Lowercased registered host of a URL (politeness / robots key).

    Keeps the 'www.' prefix OFF (same dropping rule as surt) so that
    http://www.x.com and http://x.com share one politeness bucket.
    """
    if isinstance(url, str):
        url = F.col(url)
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, _SCHEME_RE, "")
    u = F.regexp_replace(u, r"^//", "")
    authority = F.regexp_extract(u, r"^([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host = F.regexp_replace(hostport, r":\d+$", "")
    return F.regexp_replace(host, r"^www\d*\.", "").alias("host")


def url_hash_col(urlkey) -> Column:
    """64-bit URL key hash (BASELINE.json north_star: xxhash64 urlkeys)."""
    if isinstance(urlkey, str):
        urlkey = F.col(urlkey)
    return F.xxhash64(urlkey).alias("url_hash")
