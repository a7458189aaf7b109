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


_TRIM_CHARS = " \t\n\r\x0b\x0c"  # the shared trim set of all four kernels


def surt(url: str) -> str:
    """Scalar Python SURT (driver-side; mirrors surt_col exactly)."""
    u = url.strip(_TRIM_CHARS).lower()
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


# ONE anchored pattern decomposing any string into (userinfo, host, :port,
# path, query) — groups 1..5. Design notes for exact `surt` parity:
#   - scheme strips only when followed by '//' (or a bare '//' prefix)
#   - userinfo is GREEDY [^/?#]*@ => strips to the LAST '@' in the authority
#   - host is lazy with a (?=[/?#]|$) boundary lookahead, so ':<digits>' at
#     the authority end is a port but ':abc' stays part of the host
#   - (?s) because the fragment tail must swallow newlines
# The pattern cannot fail to match (every piece is optional), so
# regexp_extract returns '' for absent parts instead of erroring.
_URL_PARTS_RE = (
    r"(?s)^(?:[a-z][a-z0-9+.-]*://|//)?(?:([^/?#]*)@)?([^/?#]*?)(:\d+)?"
    r"(?=[/?#]|$)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)


def surt_col(url) -> Column:
    """SURT as a pure built-in Column expression (JVM-side, codegen-friendly).

    Equivalent to ``surt`` above for every well-formed http(s) URL; verified
    by property tests comparing the two on fixture + fuzzed URLs.

    Hot-path shape (10^10 URLs at ingest): ONE shared anchored pattern with
    group extracts instead of a chain of regexp_replace passes — the r1
    profile showed the old 6+ replace pipeline memory-bandwidth-bound on the
    intermediate strings (BENCH.md); this form does no intermediate string
    rewrites at all (plus one small `www.` replace on the host only).
    """
    if isinstance(url, str):
        url = F.col(url)
    # btrim with the explicit whitespace set: F.trim strips SPACES ONLY,
    # while the scalar spec (Python .strip) strips tabs/newlines too
    u = F.lower(F.btrim(url, F.lit(_TRIM_CHARS)))
    host = F.regexp_extract(u, _URL_PARTS_RE, 2)
    port = F.regexp_extract(u, _URL_PARTS_RE, 3)  # ':<digits>' or ''
    path = F.regexp_extract(u, _URL_PARTS_RE, 4)
    query = F.regexp_extract(u, _URL_PARTS_RE, 5)

    port = F.when(port.isin(":80", ":443"), F.lit("")).otherwise(port)
    host = F.regexp_replace(host, r"^www\d*\.", "")
    revhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.when(path == "", F.lit("/")).otherwise(path)
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
    u = F.lower(F.btrim(url, F.lit(_TRIM_CHARS)))
    host = F.regexp_extract(u, _URL_PARTS_RE, 2)
    return F.regexp_replace(host, r"^www\d*\.", "").alias("host")


def url_hash_col(urlkey) -> Column:
    """64-bit URL key hash (BASELINE.json north_star: xxhash64 urlkeys)."""
    if isinstance(urlkey, str):
        urlkey = F.col(urlkey)
    return F.xxhash64(urlkey).alias("url_hash")
