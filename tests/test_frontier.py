"""Frontier engine: golden-trace parity vs the serial reference scheduler,
bloom no-false-negatives, politeness, multi-epoch carryover (north_rule)."""

import shutil

import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark.frontier.bloom import BloomShardStore
from cdx_toolkit_spark.frontier.reference_impl import run_reference_schedule
from cdx_toolkit_spark.frontier.scheduler import FrontierDrain
from cdx_toolkit_spark.surt import surt


def _seed_urls(n=240):
    """Deterministic skewed seed list: ~40% of urls on bighost.com, the rest
    spread over 20 hosts; interleaved priorities and discovery times.

    Every 16th row is a MIXED-CASE variant (uppercase scheme/host, cased
    path) — some hitting bighost's /private disallow rule. The reference
    matcher lowercases the whole URL before the path prefix test
    (reference_impl._path_of), so these rows pin the robots case-parity
    the r2 drain got wrong (VERDICT r2 defect #1: an uppercase scheme
    slipped past the raw-URL path regex and got scheduled)."""
    seeds = []
    for i in range(n):
        if i % 10 < 4:
            host = "bighost.com"
        else:
            host = f"host{i % 20}.org"
        www = "www." if i % 2 == 0 else ""
        if i % 16 == 7:
            path = "Private" if i % 32 == 7 else "P"
            url = f"HTTPS://{www.upper()}{host.upper()}/{path}/{i % 80}?x={i % 5}"
        else:
            url = f"https://{www}{host}/p/{i % 80}?x={i % 5}"
        seeds.append((url, i % 3, 1000 + (i * 37) % 500))
    return seeds


ROBOTS = {
    "bighost.com": (0.55, ["/private"]),
    "host1.org": (1.0, []),
    "host2.org": (6.0, ["/p/7"]),
}


def _robots_df(spark):
    return spark.createDataFrame(
        [(h, d, p) for h, (d, p) in ROBOTS.items()],
        "host string, crawl_delay_s double, disallow_prefixes array<string>",
    )


@pytest.fixture()
def workdir(tmp_path):
    d = str(tmp_path / "frontier")
    yield d
    shutil.rmtree(d, ignore_errors=True)


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


def test_golden_trace_parity(spark, workdir):
    """The parallel drain reproduces the serial event-loop crawler's order
    and URL-seen set exactly (BASELINE.json north_rule)."""
    seeds = _seed_urls()
    ref_trace, ref_seen = run_reference_schedule(
        seeds, robots=ROBOTS, batch_window=30.0
    )
    drain = FrontierDrain(spark, workdir, batch_window=30.0)
    cand = spark.createDataFrame(
        seeds, "url string, priority int, discovered_ts long"
    )
    rec = drain.drain_epoch(cand, _robots_df(spark))
    assert rec["epoch"] == 1 and rec["bloom_version"] == 1
    assert rec["n_scheduled"] == len(ref_trace)
    assert _spark_trace(drain, 1) == _ref_trace(ref_trace)
    assert drain.seen_set() == ref_seen


def test_golden_trace_parity_with_skew_mitigation(spark, workdir):
    """Two-phase range-partitioned ranking produces the identical trace."""
    seeds = _seed_urls()
    ref_trace, _ = run_reference_schedule(seeds, robots=ROBOTS, batch_window=30.0)
    drain = FrontierDrain(spark, workdir, batch_window=30.0, mitigate_skew=True)
    # force many small range partitions so hosts genuinely split across tasks
    import cdx_toolkit_spark.frontier.politeness as pol

    orig = pol.host_rank

    def patched(frontier, mitigate_skew=False, n_range_parts=None, **kw):
        return orig(frontier, mitigate_skew, n_range_parts=7, **kw)

    pol.host_rank = patched
    try:
        cand = spark.createDataFrame(
            seeds, "url string, priority int, discovered_ts long"
        )
        drain.drain_epoch(cand, _robots_df(spark))
        assert _spark_trace(drain, 1) == _ref_trace(ref_trace)
    finally:
        pol.host_rank = orig


def test_multi_epoch_carryover_and_dedup(spark, workdir):
    """Epoch 2: previously-seen urls dropped; politeness clock carries."""
    seeds1 = _seed_urls(120)
    # epoch 2 = the old urls again (must dedup to zero) + genuinely new ones
    new = [
        (f"https://host{i % 7}.org/fresh/{i}", i % 2, 2000 + i)
        for i in range(60)
    ]
    seeds2 = seeds1 + new
    drain = FrontierDrain(spark, workdir, batch_window=30.0)
    cand1 = spark.createDataFrame(seeds1, "url string, priority int, discovered_ts long")
    rec1 = drain.drain_epoch(cand1, _robots_df(spark))

    ref1, seen1 = run_reference_schedule(seeds1, robots=ROBOTS, batch_window=30.0)
    host_next = {}
    for t in ref1:
        host_next[t["host"]] = t["fetch_time"] + ROBOTS.get(t["host"], (3.0, []))[0]
    ref2, seen2 = run_reference_schedule(
        seeds2, robots=ROBOTS, seen=seen1, batch_window=30.0,
        host_next_free=host_next,
    )
    cand2 = spark.createDataFrame(seeds2, "url string, priority int, discovered_ts long")
    rec2 = drain.drain_epoch(cand2, _robots_df(spark))
    assert rec2["epoch"] == 2
    assert rec2["bloom_version"] == rec1["bloom_version"] + 1
    assert _spark_trace(drain, 2) == _ref_trace(ref2)
    assert drain.seen_set() == seen2
    # no urlkey scheduled twice across epochs
    df = drain.schedule_df()
    assert df.groupBy("urlkey").count().where(F.col("count") > 1).count() == 0


def test_disallow_and_www_collapse(spark, workdir):
    seeds = [
        ("https://bighost.com/private/x", 0, 1),   # disallowed
        ("https://www.bighost.com/p/1", 0, 2),     # same urlkey as below
        ("https://bighost.com/p/1", 1, 3),
        ("http://host2.org/p/7?x=1", 0, 4),        # disallowed prefix
        ("https://host3.org/ok", 0, 5),
    ]
    drain = FrontierDrain(spark, workdir)
    cand = spark.createDataFrame(seeds, "url string, priority int, discovered_ts long")
    drain.drain_epoch(cand, _robots_df(spark))
    rows = drain.schedule_df(1).collect()
    urls = sorted(r["url"] for r in rows)
    # www variant wins (priority 0 < 1); disallowed urls dropped
    assert urls == ["https://host3.org/ok", "https://www.bighost.com/p/1"]


def test_bloom_no_false_negatives_and_fp_rate(spark, tmp_path):
    store = BloomShardStore(
        spark, str(tmp_path / "bloom"), n_shards=4, m_bits=1 << 16, k=5
    )
    inserted = spark.range(0, 2000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    v = store.build(inserted)
    assert v == 1
    # zero false negatives
    flagged = store.probe(inserted)
    assert flagged.where(~F.col("maybe_seen")).count() == 0
    # measured fp rate on disjoint keys
    novel = spark.range(100000, 104000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    fp = store.probe(novel).where(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.05, f"fp rate too high: {fp / 4000}"


def test_bloom_counting_delete(spark, tmp_path):
    store = BloomShardStore(
        spark, str(tmp_path / "bloomdel"), n_shards=2, m_bits=1 << 14, k=4
    )
    a = spark.range(0, 500).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    b = spark.range(500, 1000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    store.build(a)
    v2 = store.add(b)
    v3 = store.remove(b)
    assert (v2, v3) == (2, 3)
    # a still fully present at v3
    assert store.probe(a, version=v3).where(~F.col("maybe_seen")).count() == 0
    # b removed: most are gone (collisions with a's bits may linger)
    still = store.probe(b, version=v3).where(F.col("maybe_seen")).count()
    assert still < 50
    # old version untouched (lineage): b fully present at v2
    assert store.probe(b, version=v2).where(~F.col("maybe_seen")).count() == 0


def test_pages_text_invariant(spark, sf_dir):
    """input_hint per-row invariant: text == html.decode('utf-8','replace')
    byte-identically, for every row incl. invalid-UTF-8 garnishes."""
    from cdx_toolkit_spark.pages import synth_pages

    pages = synth_pages(spark, sf_dir)
    rows = pages.select("html", "text").collect()
    assert len(rows) > 0
    bad = 0
    for r in rows:
        want = bytes(r["html"]).decode("utf-8", errors="replace")
        if r["text"] != want:
            bad += 1
    assert bad == 0
    # the garnish set really exercises replacement chars
    assert any("�" in r["text"] for r in rows)


def test_rank_integrity_when_hosts_split_across_range_partitions(spark):
    """Regression: repartitionByRange's boundary sample is rdd.id-seeded, so
    without pinning, the offsets branch would see different _pid values and
    the rank join silently dropped rows. Every host must get a dense
    0..n-1 rank even when it spans many range partitions."""
    from cdx_toolkit_spark.frontier import politeness

    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 4, F.lit("hot.example.com"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                            F.lit(".org"))).alias("host"),
        (F.col("id") % 3).cast("int").alias("priority"),
        (F.col("id") % 997).alias("discovered_ts"),
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 8, "0"))
        .alias("urlkey"),
        F.lit(1.0).alias("crawl_delay_s"),
    )
    ranked = politeness.host_rank(df, mitigate_skew=True, n_range_parts=16)
    chk = ranked.groupBy("host").agg(
        F.count("*").alias("n"),
        F.countDistinct("host_rank").alias("nd"),
        F.max("host_rank").alias("mx"),
    )
    assert ranked.count() == n
    assert chk.where(
        (F.col("n") != F.col("nd")) | (F.col("mx") != F.col("n") - 1)
    ).count() == 0
