"""ST-3 retry/backoff: requeue_failures policy golden vs the reference's
myrequests backoff rule, and a two-epoch golden-trace parity run with
injected failures (Spark drain vs serial reference scheduler)."""

import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark.frontier.reference_impl import run_reference_schedule
from cdx_toolkit_spark.frontier.scheduler import (
    RETRYABLE_STATUSES,
    FrontierDrain,
    requeue_failures,
)

ROBOTS = {
    "slowhost.com": (6.0, []),
    "fasthost.org": (0.55, []),
}


def _robots_df(spark):
    return spark.createDataFrame(
        [(h, d, p) for h, (d, p) in ROBOTS.items()],
        "host string, crawl_delay_s double, disallow_prefixes array<string>",
    )


def _seeds(n=36):
    out = []
    for i in range(n):
        host = "slowhost.com" if i % 3 == 0 else (
            "fasthost.org" if i % 3 == 1 else f"host{i % 4}.net"
        )
        out.append((f"https://{host}/p/{i}", i % 2, 1000 + i))
    return out


def _cands(spark, seeds):
    return spark.createDataFrame(
        seeds, "url string, priority int, discovered_ts long"
    )


def _status_for(url: str) -> int:
    # deterministic injected outcomes: some retryable, some give-up, rest ok
    h = sum(url.encode())
    if h % 3 == 0:
        return 503
    if h % 7 == 0:
        return 404
    return 200


def test_requeue_policy_golden(spark, tmp_path):
    drain = FrontierDrain(spark, str(tmp_path / "wd"), n_shards=2)
    drain.drain_epoch(_cands(spark, _seeds()), robots=_robots_df(spark))
    sched = drain.schedule_df(1)
    results = spark.createDataFrame(
        [(r["url"], _status_for(r["url"])) for r in sched.collect()],
        "url string, status int",
    )
    re = requeue_failures(sched, results).collect()
    assert re, "injected failures must produce retries"
    sched_by_url = {r["url"]: r for r in sched.collect()}
    for r in re:
        assert _status_for(r["url"]) in RETRYABLE_STATUSES
        s = sched_by_url[r["url"]]
        assert r["retries"] == 1
        want = s["fetch_time"] + min(2.0 * s["crawl_delay_s"] * 1.0, 60.0)
        assert r["next_attempt_ts"] == pytest.approx(want, abs=1e-9)
    # non-retryable failures are dropped
    assert all(_status_for(r["url"]) != 404 for r in re)
    # the doubling caps at 60s: a 3rd-retry slowhost row waits 48s; 5th: 60s
    row = spark.createDataFrame(
        [("u", 0, 1, 4, 100.0, 6.0)],
        "url string, priority int, discovered_ts long, retries int, "
        "fetch_time double, crawl_delay_s double",
    )
    res = spark.createDataFrame([("u", 503)], "url string, status int")
    got = requeue_failures(row, res).first()
    assert got["next_attempt_ts"] == pytest.approx(100.0 + 60.0)  # capped


def _spark_trace(drain, epoch):
    return [
        (t["urlkey"], t["host"], round(t["fetch_time"], 9), t["batch"])
        for t in drain.trace(epoch)
    ]


def _ref_trace(trace):
    return [
        (t["urlkey"], t["host"], round(t["fetch_time"], 9), t["batch"])
        for t in trace
    ]


@pytest.mark.parametrize("mitigate_skew", [False, True])
def test_two_epoch_retry_golden_trace(spark, tmp_path, mitigate_skew):
    wd = str(tmp_path / f"wd_{mitigate_skew}")
    drain = FrontierDrain(spark, wd, n_shards=2, mitigate_skew=mitigate_skew)
    robots = _robots_df(spark)
    seeds1 = _seeds()
    drain.drain_epoch(_cands(spark, seeds1), robots=robots)

    ref1, seen1 = run_reference_schedule(seeds1, robots=ROBOTS)
    assert _spark_trace(drain, 1) == _ref_trace(ref1)

    # inject failures, requeue with backoff
    sched = drain.schedule_df(1)
    results = spark.createDataFrame(
        [(r["url"], _status_for(r["url"])) for r in sched.collect()],
        "url string, status int",
    )
    requeued = requeue_failures(sched, results)
    retry_rows = [
        (r["url"], r["priority"], r["discovered_ts"], r["retries"],
         r["next_attempt_ts"])
        for r in requeued.collect()
    ]
    assert retry_rows

    # epoch 2: fresh discoveries + retries (+ one already-seen dup that must
    # be dropped) drained together
    seeds2_new = [
        ("https://slowhost.com/new/1", 0, 2000),
        ("https://fasthost.org/new/2", 1, 2001),
        ("https://host9.net/new/3", 0, 2002),
        seeds1[0],  # duplicate discovery of a seen (and possibly retrying) url
    ]
    cand2 = _cands(spark, seeds2_new).withColumn(
        "retries", F.lit(0)
    ).withColumn("next_attempt_ts", F.lit(0.0)).unionByName(
        spark.createDataFrame(
            retry_rows,
            "url string, priority int, discovered_ts long, retries int, "
            "next_attempt_ts double",
        )
    )
    rec2 = drain.drain_epoch(cand2, robots=robots)

    # serial reference with the same carryover, seen set and retry seeds
    host_next_free = {}
    for t in ref1:
        delay = ROBOTS.get(t["host"], (3.0, []))[0]
        host_next_free[t["host"]] = max(
            host_next_free.get(t["host"], 0.0), t["fetch_time"] + delay
        )
    ref2, seen2 = run_reference_schedule(
        seeds2_new + retry_rows,
        robots=ROBOTS,
        seen=seen1,
        host_next_free=host_next_free,
    )
    assert _spark_trace(drain, 2) == _ref_trace(ref2)
    assert rec2["n_scheduled"] == len(ref2)
    # retried urls are in the epoch-2 output with their retry metadata
    out2 = {r["url"]: r for r in drain.schedule_df(2).collect()}
    for (url, _, _, retries, na) in retry_rows:
        assert out2[url]["retries"] == retries
        assert out2[url]["fetch_time"] >= na - 1e-9
    # the duplicate discovery did not re-enter
    assert drain.seen_set() == seen2
