"""PII detection and redaction as pure column projections.

Corpus cleaning for LLM training redacts (or drops documents heavy with)
personally identifying strings. These kernels are deliberately
expression-only: chained `regexp_replace` / `regexp_count` over patterns
written in the COMMON dialect of Java regex (Spark executors) and RE2
(the DuckDB oracle) — no lookarounds, no backreferences, so both engines
implement identical leftmost-first semantics and the oracle is a full
value-hash twin, not an approximation (cross-engine equality is fuzzed in
tests/test_pii.py).

Scale shape: zero shuffles, zero Python — the whole family runs inside
WholeStageCodegen on the scan's output, composes with any pipeline gate,
and the counts are SIMD-friendly single-pass scans per pattern.

The reference has no PII surface (cdx_toolkit replays captures
verbatim); this belongs to the training-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ONE source of truth per pattern, shared verbatim by the Spark kernels
# and the SQL twins. Keep to the Java∩RE2 dialect: character classes,
# bounded quantifiers, non-capturing groups, \b anchors.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# international-ish phone: +CC then 2-3 separator-led digit groups; the
# separator lives INSIDE the repeated group so a trailing space is never
# swallowed into the match.
PHONE_RE = r"\+\d{1,3}(?:[ -]\d{2,4}){2,3}\b"

#: applied in this order; earlier redactions see the original text,
#: later ones see prior placeholders (identical chaining in the twins).
PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _col(c):
    return F.col(c) if isinstance(c, str) else c


def redact_col(text, alias: str = "redacted") -> Column:
    """Text with every email/IPv4/phone replaced by a typed placeholder."""
    out = _col(text)
    for _, pat, tag in PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out.alias(alias)


def pii_count_cols(text) -> list[Column]:
    """One ``n_<kind>`` count per pattern, measured on the RAW text
    (independent single passes; the patterns cannot overlap — emails
    require an alphabetic TLD, phones a leading '+')."""
    t = _col(text)
    return [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in PATTERNS
    ]


def redact_sql(text_expr: str, alias: str = "redacted") -> str:
    """DuckDB twin of redact_col (regexp_replace with the 'g' flag —
    DuckDB defaults to first-match-only, Spark to global)."""
    out = text_expr
    for _, pat, tag in PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return f"{out} AS {alias}"


def pii_count_sql(text_expr: str) -> list[str]:
    return [
        f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{kind}"
        for kind, pat, _ in PATTERNS
    ]
