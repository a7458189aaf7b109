"""pywb <-> IA (java wayback) dialect normalization.

Parity with /root/reference/cdx_toolkit/compat.py (tests
tests/unit/test_compat.py). In the Spark engine there is exactly one
execution path (DataFrame predicates over pywb-normalized column names);
this shim only normalizes user-facing filter/field spellings at the API
edge before the plan is built.
"""

from __future__ import annotations

import re

FIELDS_TO_PYWB = {"statuscode": "status", "original": "url", "mimetype": "mime"}
FIELDS_TO_IA = {v: k for k, v in FIELDS_TO_PYWB.items()}


def munge_filter(filters, source: str):
    """Normalize a list of CDX filter strings for the given source dialect.

    - 'ia' rejects the pywb-only modifiers = != ~ !~ and renames fields to
      IA spellings (statuscode/original/mimetype).
    - anything else is normalized to pywb spellings (status/url/mime).
    """
    out = []
    for f in filters:
        if source == "ia":
            for bad in ("=", "!=", "~", "!~"):
                if f.startswith(bad):
                    raise ValueError("ia does not support the filter " + bad)
            for pywb_name, ia_name in FIELDS_TO_IA.items():
                f = re.sub(r"\b" + pywb_name + ":", ia_name + ":", f, count=1)
        else:
            for ia_name, pywb_name in FIELDS_TO_PYWB.items():
                f = re.sub(r"\b" + ia_name + ":", pywb_name + ":", f, count=1)
        out.append(f)
    return out


def normalize_field_names(fields):
    """Rename IA field spellings to pywb for projection lists."""
    return [FIELDS_TO_PYWB.get(f, f) for f in fields]
