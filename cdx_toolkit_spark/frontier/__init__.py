"""Frontier engine: URL-seen membership at scale, per-host politeness,
priority drain, golden-trace parity with a serial reference scheduler,
and a Structured-Streaming drain with checkpoint lineage.

Capabilities required by BASELINE.json north_rule; the reference
(cdx_toolkit) is a serial polite client (myrequests.py) — the semantics
here generalize its per-host minimum-interval model to a distributed
frontier while keeping the crawl order bit-for-bit reproducible.
"""
