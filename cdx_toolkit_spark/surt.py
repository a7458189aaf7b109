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


# One-pass group packing: the anchored pattern matches the WHOLE string
# exactly once, so a single regexp_replace rewrites the url into its four
# groups joined by \x01 (a control char no sane URL carries) — ONE regex
# execution per row instead of four regexp_extract matcher runs. Unmatched
# optional groups render as '' in both the replacement and regexp_extract,
# so the two forms agree group-by-group.
_SEP = "\x01"
_PACKED_FMT = f"$2{_SEP}$3{_SEP}$4{_SEP}$5"


def _surt_from_parts(host, port, path, query) -> Column:
    """Assemble the urlkey from the four authority/rest parts (steps 3-6 of
    the spec) — shared by the fast packed path and the exact fallback."""
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
    )


def surt_col(url) -> Column:
    """SURT as a pure built-in Column expression (JVM-side).

    Equivalent to ``surt`` above for EVERY string input (not just well-formed
    http(s) URLs); verified by property tests comparing the two on fixture +
    fuzzed URLs, including the separator-collision fallback path.

    Hot-path shape (10^10 URLs at ingest): ONE anchored-pattern pass packs
    all four groups, and the packed array is LET-BOUND through a
    single-element `transform` lambda so the split evaluates exactly once
    per row — Catalyst's subexpression elimination does not dedupe repeated
    subtrees inside conditional branches, so naming the value via a lambda
    variable is the only way to keep one evaluation under the fallback
    `when`. Measured 4x over per-group regexp_extract on 8M urls (the r1
    profile showed a 6+ regexp_replace chain memory-bandwidth-bound; the r2
    profile showed 4 separate extracts paying the matcher 4x — BENCH.md).
    Rows containing the separator (garbage input, never real URLs) take the
    exact per-group-extract branch instead of the packed parse.
    """
    if isinstance(url, str):
        url = F.col(url)
    # btrim with the explicit whitespace set: F.trim strips SPACES ONLY,
    # while the scalar spec (Python .strip) strips tabs/newlines too
    u = F.lower(F.btrim(url, F.lit(_TRIM_CHARS)))
    packed = F.split(F.regexp_replace(u, _URL_PARTS_RE, _PACKED_FMT), _SEP, -1)
    fast = F.element_at(
        F.transform(
            F.array(packed),
            lambda p: _surt_from_parts(
                F.element_at(p, 1),
                F.element_at(p, 2),
                F.element_at(p, 3),
                F.element_at(p, 4),
            ),
        ),
        1,
    )
    slow = _surt_from_parts(
        *[F.regexp_extract(u, _URL_PARTS_RE, g) for g in (2, 3, 4, 5)]
    )
    return F.when(u.contains(_SEP), slow).otherwise(fast).alias("urlkey")


def host_col(url) -> Column:
    """Lowercased registered host of a URL (politeness / robots key).

    Keeps the 'www.' prefix OFF (same dropping rule as surt) so that
    http://www.x.com and http://x.com share one politeness bucket.
    Single-group use => one plain regexp_extract IS the one-pass form.
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
