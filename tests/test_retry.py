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


# ---- r3: error-class retries (conn/timeout/dns) with warn/give-up ---------


def _serial_myrequests_policy(rows, retry_max_sec=60.0, warn_after=10,
                              give_up_after=100, seen_hosts=()):
    """Independent serial model of the reference retry policy
    (myrequests.py:94-157) for golden comparison: one dict per failed
    fetch with category/retries/conn_errors/next_attempt/warned."""
    out = {}
    for r in rows:
        url, host, status, error = r["url"], r["host"], r["status"], r["error"]
        retries, conn, ft, delay = (
            r["retries"], r["conn_errors"], r["fetch_time"], r["crawl_delay_s"]
        )
        if error is not None:
            conn += 1
            if error == "dns" and host not in seen_hosts:
                out[url] = dict(category="drop_dns_fatal", retries=retries,
                                conn_errors=conn, next_attempt=None,
                                warned=False)
                continue
            if conn > give_up_after:
                out[url] = dict(category="drop_give_up", retries=retries,
                                conn_errors=conn, next_attempt=None,
                                warned=conn > warn_after)
                continue
            out[url] = dict(category="retry_conn", retries=retries,
                            conn_errors=conn,
                            next_attempt=ft + retry_max_sec,
                            warned=conn > warn_after)
        elif status in RETRYABLE_STATUSES:
            out[url] = dict(
                category="retry_status", retries=retries + 1,
                conn_errors=conn,
                next_attempt=ft + min(2.0 * delay * (2.0 ** retries),
                                      retry_max_sec),
                warned=False)
        elif status >= 400:
            out[url] = dict(category="drop", retries=retries,
                            conn_errors=conn, next_attempt=None,
                            warned=False)
    return out


def test_classify_failures_policy_golden(spark):
    from cdx_toolkit_spark.frontier.scheduler import classify_failures

    # hand-built scheduled rows spanning every category
    sched_rows = []
    cases = [
        # url-suffix, status, error, retries, conn_errors
        ("ok", 200, None, 0, 0),
        ("retry503", 503, None, 0, 0),
        ("retry503-again", 503, None, 3, 0),
        ("gone404", 404, None, 0, 0),
        ("conn-1", 0, "connection", 0, 0),
        ("conn-warn", 0, "timeout", 2, 10),       # -> 11 > warn_after
        ("conn-giveup", 0, "connection", 1, 100),  # -> 101 > give_up_after
        ("dns-new-host", 0, "dns", 0, 0),          # fatal: host never seen
        ("dns-seen-host", 0, "dns", 0, 3),         # conn-class: host seen
        ("chunked", 0, "chunked_encoding", 0, 0),
    ]
    res_rows = []
    for i, (name, status, error, retries, conn) in enumerate(cases):
        host = "seen.example.com" if name == "dns-seen-host" else f"h-{name}.net"
        url = f"https://{host}/{name}"
        sched_rows.append(
            (url, host, 1, 1000, retries, 0.0, conn, 4.0, i, 10.0 * i)
        )
        res_rows.append((url, status, error))
    sched = spark.createDataFrame(
        sched_rows,
        "url string, host string, priority int, discovered_ts long, "
        "retries int, next_attempt_ts double, conn_errors int, "
        "crawl_delay_s double, host_rank int, fetch_time double",
    )
    results = spark.createDataFrame(
        res_rows, "url string, status int, error string"
    )
    seen_hosts = spark.createDataFrame(
        [("seen.example.com",)], "host string"
    )
    got = {
        r["url"]: r
        for r in classify_failures(
            sched, results, seen_hosts=seen_hosts
        ).collect()
    }
    want = _serial_myrequests_policy(
        [
            dict(url=s[0], host=s[1], status=rr[1], error=rr[2],
                 retries=s[4], conn_errors=s[6], fetch_time=s[9],
                 crawl_delay_s=s[7])
            for s, rr in zip(sched_rows, res_rows)
        ],
        seen_hosts={"seen.example.com"},
    )
    assert set(got) == set(want), "successes must produce no rows"
    for url, w in want.items():
        g = got[url]
        assert g["category"] == w["category"], url
        assert g["retries"] == w["retries"], url
        assert g["conn_errors"] == w["conn_errors"], url
        assert g["warned"] == w["warned"], url
        if w["next_attempt"] is None:
            assert g["next_attempt_ts"] is None, url
        else:
            assert g["next_attempt_ts"] == pytest.approx(w["next_attempt"]), url


def test_conn_error_give_up_never_reappears(spark, tmp_path):
    """A URL that exhausts give_up_after connection errors is dropped from
    requeue output and cannot re-enter the schedule in later epochs."""
    drain = FrontierDrain(spark, str(tmp_path / "wd"), n_shards=2)
    url = "https://flaky.example.net/a"
    cand = spark.createDataFrame(
        [(url, 0, 1000)], "url string, priority int, discovered_ts long"
    )
    drain.drain_epoch(cand, robots=_robots_df(spark))
    sched = drain.schedule_df(1)
    assert sched.count() == 1

    # fail with connection errors until one short of the cap: still requeued
    results = spark.createDataFrame(
        [(url, 0, "connection")], "url string, status int, error string"
    )
    requeued = requeue_failures(
        sched.withColumn("conn_errors", F.lit(99)), results, give_up_after=100
    )
    rows = requeued.collect()
    assert len(rows) == 1 and rows[0]["conn_errors"] == 100
    assert rows[0]["retries"] == 0  # conn errors do not bump status retries

    # drain the retry (bypasses seen in spite of retries == 0) ...
    rec2 = drain.drain_epoch(requeued, robots=_robots_df(spark))
    assert rec2["n_scheduled"] == 1

    # ... fail once more: beyond the cap -> dropped for good
    final = requeue_failures(
        drain.schedule_df(2), results, give_up_after=100
    )
    assert final.count() == 0
    # and a fresh DISCOVERY of the same url is seen-filtered as usual
    rec3 = drain.drain_epoch(cand, robots=_robots_df(spark))
    assert rec3["n_scheduled"] == 0


def test_two_epoch_conn_retry_golden_trace(spark, tmp_path):
    """Connection-error retries (flat 60 s wait, retries stays 0) reproduce
    the serial reference trace when drained alongside fresh discoveries."""
    drain = FrontierDrain(spark, str(tmp_path / "wd"), n_shards=2,
                          mitigate_skew=True)
    robots = _robots_df(spark)
    seeds1 = _seeds()
    drain.drain_epoch(_cands(spark, seeds1), robots=robots)
    ref1, seen1 = run_reference_schedule(seeds1, robots=ROBOTS)

    sched = drain.schedule_df(1)
    # every 4th url fails with a connection error
    failing = [r["url"] for r in sched.collect()][::4]
    results = spark.createDataFrame(
        [(u, 0, "timeout") for u in failing],
        "url string, status int, error string",
    )
    requeued = requeue_failures(sched, results)
    retry_rows = [
        (r["url"], r["priority"], r["discovered_ts"], r["retries"],
         r["next_attempt_ts"])
        for r in requeued.collect()
    ]
    assert retry_rows and all(r[3] == 0 for r in retry_rows)

    seeds2 = [("https://fasthost.org/brand-new", 0, 3000)]
    cand2 = _cands(spark, seeds2).withColumn("retries", F.lit(0)).withColumn(
        "next_attempt_ts", F.lit(0.0)
    ).unionByName(
        spark.createDataFrame(
            retry_rows,
            "url string, priority int, discovered_ts long, retries int, "
            "next_attempt_ts double",
        )
    )
    drain.drain_epoch(cand2, robots=robots)

    host_next_free = {}
    for t in ref1:
        delay = ROBOTS.get(t["host"], (3.0, []))[0]
        host_next_free[t["host"]] = max(
            host_next_free.get(t["host"], 0.0), t["fetch_time"] + delay
        )
    ref2, _ = run_reference_schedule(
        seeds2 + retry_rows, robots=ROBOTS, seen=seen1,
        host_next_free=host_next_free,
    )
    assert _spark_trace(drain, 2) == _ref_trace(ref2)
