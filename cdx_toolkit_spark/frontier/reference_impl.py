"""Tiny serial reference scheduler — the golden-trace generator.

An event-loop crawler in plain Python: one heap of (next_fetch_time,
priority, urlkey) host-queue heads, exactly the shape of the reference's
serial client (one host gate per hostname, minimum interval between
fetches — /root/reference/cdx_toolkit/myrequests.py:23-78) extended with
priorities. The Spark drain (scheduler.py) must reproduce this trace's
crawl order and final URL-seen set exactly (BASELINE.json north_rule).

Deliberately implemented *differently* from the Spark engine (heap
simulation vs declarative rank arithmetic) so agreement is evidence, not
tautology.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from ..surt import surt

DEFAULT_DELAY = 3.0


def _host_of(url: str) -> str:
    import re

    u = url.strip(" \t\n\r\x0b\x0c").lower()
    u = re.sub(r"^[a-z][a-z0-9+.-]*://", "", u)
    u = re.sub(r"^//", "", u)
    authority = re.match(r"^([^/?#]*)", u).group(1)
    host = authority.rsplit("@", 1)[-1]  # userinfo to the LAST '@'
    host = re.sub(r":\d+$", "", host)
    return re.sub(r"^www\d*\.", "", host)


def _path_of(url: str) -> str:
    import re

    m = re.match(r"^[a-z]+://[^/]+(/.*)?$", url.strip().lower())
    return (m.group(1) or "") if m else ""


def run_reference_schedule(
    seeds,
    robots=None,
    seen=None,
    batch_window: float = 60.0,
    host_next_free=None,
):
    """seeds: iterable of (url, priority, discovered_ts) or, for retry rows
    (ST-3), (url, priority, discovered_ts, retries, next_attempt_ts).
    robots: {host: (crawl_delay_s, [disallow_prefixes...])}.
    seen: iterable of urlkeys already crawled. Retry rows (retries > 0)
    bypass the seen check — their keys entered the seen set when first
    scheduled — and may not be fetched before next_attempt_ts:
    t_i = max(t_{i-1} + delay, next_attempt_i).

    Returns (trace, seen_set): trace = list of dicts with step, url, urlkey,
    host, fetch_time, batch — in crawl order.
    """
    robots = robots or {}
    seen_set = set(seen or [])

    # dedup: first occurrence per urlkey by (priority, discovered_ts, url)
    best = {}
    for seed in seeds:
        url, priority, disc_ts = seed[0], seed[1], seed[2]
        retries = seed[3] if len(seed) > 3 else 0
        na = float(seed[4]) if len(seed) > 4 else 0.0
        key = surt(url)
        # a retry row is marked by retries > 0 OR a backoff gate: connection
        # -error retries keep retries at 0 (the reference counts connect
        # errors separately from status retries) but always carry
        # next_attempt_ts > 0 — they bypass the seen check like any retry
        if retries == 0 and na == 0.0 and key in seen_set:
            continue
        host = _host_of(url)
        delay, disallow = robots.get(host, (DEFAULT_DELAY, []))
        path = _path_of(url)
        if any(path.startswith(p) for p in disallow):
            continue
        cand = (priority, disc_ts, url)
        if key not in best or cand < best[key][:3]:
            best[key] = (priority, disc_ts, url, host, delay, na)

    # per-host FIFO ordered by (priority, discovered_ts, urlkey)
    queues = defaultdict(list)
    for key, (priority, disc_ts, url, host, delay, na) in best.items():
        queues[host].append((priority, disc_ts, key, url, delay, na))
    for host in queues:
        queues[host].sort()

    # event loop: heap of host heads keyed by (t, priority, urlkey);
    # hosts may start late (politeness carryover from a previous epoch),
    # and a backoff-gated head delays at most its own host's queue
    host_next_free = host_next_free or {}
    heap = []
    for host, q in queues.items():
        priority, disc_ts, key, url, delay, na = q[0]
        t0 = max(float(host_next_free.get(host, 0.0)), na)
        heapq.heappush(heap, (t0, priority, key, host, 0))
    trace = []
    step = 0
    while heap:
        t, priority, key, host, idx = heapq.heappop(heap)
        _, disc_ts, _, url, delay, _ = queues[host][idx]
        trace.append(
            {
                "step": step,
                "url": url,
                "urlkey": key,
                "host": host,
                "fetch_time": t,
                "batch": int(t // batch_window),
            }
        )
        seen_set.add(key)
        step += 1
        if idx + 1 < len(queues[host]):
            n_priority, n_disc, n_key, n_url, n_delay, n_na = queues[host][idx + 1]
            heapq.heappush(
                heap, (max(t + delay, n_na), n_priority, n_key, host, idx + 1)
            )
    return trace, seen_set
