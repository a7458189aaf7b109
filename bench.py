"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The headline operator is the frontier drain (BASELINE.json metric): a
deterministic synthetic candidate frontier (Zipf-ish host skew, ~40% of URLs
on one hot host) is SURT-canonicalized, xxhash64-keyed, bloom+exact deduped,
robots-joined, politeness-scheduled and written in crawl order; we report
URLs scheduled+deduped per second alongside per-query wall times.

Scaling evidence (two parallelism levels) lives in bench_scaling.py; this
script is the single-level per-round probe the driver records.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def synth_candidates(spark, n: int, offset: int = 0):
    from cdx_toolkit_spark.frontier.synth import synth_candidates as _sc

    return _sc(spark, n, offset=offset)


def bench_frontier(spark, n_urls: int) -> tuple[float, int]:
    """The r1/r2-comparable config: ONE cold epoch, serial bookkeeping."""
    from cdx_toolkit_spark.frontier.scheduler import FrontierDrain

    workdir = tempfile.mkdtemp(prefix="bench_frontier_")
    try:
        drain = FrontierDrain(
            spark, workdir, batch_window=60.0, n_shards=CPUS,
            m_bits=1 << 22, mitigate_skew=True,
        )
        robots = spark.createDataFrame(
            [("hot-cdn.example.com", 0.01, ["/private"])],
            "host string, crawl_delay_s double, disallow_prefixes array<string>",
        )
        cands = synth_candidates(spark, n_urls)
        t0 = time.monotonic()
        rec = drain.drain_epoch(cands, robots=robots)
        dt = time.monotonic() - t0
        return dt, rec["n_scheduled"]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _bench_robots(spark):
    return spark.createDataFrame(
        [("hot-cdn.example.com", 0.01, ["/private"])],
        "host string, crawl_delay_s double, disallow_prefixes array<string>",
    )


def bench_frontier_epochs(spark, n_urls: int, overlap: bool) -> tuple[float, int]:
    """THREE epochs of the same size. overlap=True pipelines each epoch's
    bookkeeping under the next epoch's compute (the streaming cadence);
    overlap=False is the serial control with the IDENTICAL input — run
    back-to-back so BENCH records the on/off delta under the same VM noise
    (VERDICT r3 #1). The final flush is inside the timed region either way,
    so total wall covers all work."""
    from cdx_toolkit_spark.frontier.scheduler import FrontierDrain

    workdir = tempfile.mkdtemp(prefix="bench_frontier_p_")
    try:
        drain = FrontierDrain(
            spark, workdir, batch_window=60.0, n_shards=CPUS,
            m_bits=1 << 22, mitigate_skew=True,
        )
        robots = _bench_robots(spark)
        total = 0
        t0 = time.monotonic()
        for ep in range(3):
            cands = synth_candidates(spark, n_urls, offset=ep * n_urls)
            rec = drain.drain_epoch(
                cands, robots=robots, overlap_bookkeeping=overlap
            )
            total += rec["n_scheduled"]
        drain.flush()
        dt = time.monotonic() - t0
        return dt, total
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def bench_frontier_stream(
    spark, n_urls: int, files_per_batch: int = 2
) -> tuple[float, int, list[float]]:
    """ST-1 streaming cadence (VERDICT r3 #6): an AvailableNow readStream
    over 6 candidate parquet files through the same epoch pipeline with
    bookkeeping overlapped; per-batch wall comes from the query's own
    progress log (triggerExecution). `files_per_batch` of 2/3/6 yields
    3/2/1 micro-batches over the SAME input — the micro-batch fixed-cost
    curve the r4 verdict asked for (batch size is the latency/throughput
    knob; throughput should converge to the batch drain as batches grow)."""
    from cdx_toolkit_spark.frontier.scheduler import FrontierDrain
    from cdx_toolkit_spark.frontier.stream import drain_stream

    workdir = tempfile.mkdtemp(prefix="bench_frontier_s_")
    try:
        cand_dir = os.path.join(workdir, "cands")
        synth_candidates(spark, n_urls).repartition(6).write.parquet(cand_dir)
        drain = FrontierDrain(
            spark, os.path.join(workdir, "wd"), batch_window=60.0,
            n_shards=CPUS, m_bits=1 << 22, mitigate_skew=True,
        )
        robots = _bench_robots(spark)
        t0 = time.monotonic()
        q = drain_stream(
            spark, cand_dir, drain, robots=robots,
            max_files_per_batch=files_per_batch, overlap=True,
        )
        q.awaitTermination()
        drain.flush()
        dt = time.monotonic() - t0
        batch_walls = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
        n_sched = sum(int(e.get("n_scheduled", 0)) for e in drain.epochs())
        return dt, n_sched, batch_walls
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    from cdx_toolkit_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    headline = [
        "iter_window_filter",
        "get_closest",
        "collapse_urlkey",
        "closest_per_urlkey",
        "urlseen_antijoin",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_minhash_lsh_prod",
        "dedup_simhash",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_lsh_multiseed",
        "ann_ivf_topk",
        "ann_ivf_queries",
        "pipeline_clean_corpus",
        "pipeline_near_dedup",
        "pipeline_near_dedup_prod",
        "pipeline_near_dedup_cc",
        "pipeline_pretrain",
        "text_stats",
        "text_lang_id",
        "fingerprint_winnow",
        "fingerprint_winnow_prod",
        "dedup_winnow_overlap",
        "decontaminate_ngram",
        "pack_segments",
        "pii_redact",
        "sample_group_quota",
        "sample_temperature",
        "vocab_topk",
        "text_repetition",
        "events_daily_counts",
        "warc_ingest",
        "cli_iter_lines",
        "cli_size_details",
        "pywb_jsonl_decode",
        "politeness_schedule",
        "retry_classify",
    ]

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warm the JVM/Arrow paths once so timings measure the plan, not startup;
    # pre-build the WARC fixture so warc_ingest times the INGEST, not the
    # one-time fixture write
    force(qs["iter_window_filter"](spark, SF_DIR))
    from cdx_toolkit_spark.ingest import ensure_pywb_wire_fixture
    from cdx_toolkit_spark.warc import ensure_warc_fixture

    ensure_warc_fixture(spark, SF_DIR)
    ensure_pywb_wire_fixture(spark, SF_DIR)
    # the skew-safe rank pays one-time codegen + checkpoint machinery on
    # its first execution — warm it like the rest of the JVM paths
    force(qs["politeness_schedule"](spark, SF_DIR))

    from cdx_toolkit_spark import similarity

    times: dict[str, float] = {}
    for name in headline:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        force(df)
        times[name] = round(time.monotonic() - t0, 3)
        # drop any intermediates the plan persisted (ivf centroid blob /
        # salted assignment) — no-op for plans with nothing tracked
        similarity.release(df)

    # auto-salted IVF (hot-list parallelism sized from the per-list
    # histogram): benched OUTSIDE queries() because auto mode runs its one
    # histogram job at compose, which the zero-job-compose contract for
    # driver entries forbids — timing includes that histogram, honestly
    t0 = time.monotonic()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    auto_df = similarity.ivf_topk(
        emb, k=5, nlist=64, nprobe=8, n_salts="auto", auto_salt_rows=8192
    )
    force(auto_df)
    times["ann_ivf_auto_salt"] = round(time.monotonic() - t0, 3)
    similarity.release(auto_df)

    # Release every session-lifetime persisted/checkpointed block the
    # operator suite accumulated (memoized shingle/pair-graph/CC frames,
    # orphaned localCheckpoint blocks) BEFORE the frontier section:
    # BENCH_r05 recorded the memory-hungry pipelined drain 2x SLOWER than
    # serial with those blocks resident in the same long driver session —
    # the overlapping-epoch path is the most storage-sensitive job in the
    # suite (VERDICT r5 #1/#2).
    released = E.release_caches(spark)
    print(f"release_caches before frontier: {released}", file=sys.stderr)

    sf = sf_of(SF_DIR)
    n_urls = max(int(5_000_000 * sf), 10_000)
    # frontier_drain: the SAME single-cold-epoch 500k config r1/r2 recorded
    dt, n_scheduled = bench_frontier(spark, n_urls)
    times["frontier_drain"] = round(dt, 3)
    urls_per_sec = n_scheduled / dt if dt > 0 else 0.0
    # The pipelining A/B (VERDICT r3 #1): serial control first, then the
    # overlapped variant, back-to-back on the identical 3x input so the
    # on/off delta is recorded under the same VM noise window
    dts, n_s = bench_frontier_epochs(spark, n_urls, overlap=False)
    times["frontier_serial_3ep"] = round(dts, 3)
    dtp, n_p = bench_frontier_epochs(spark, n_urls, overlap=True)
    times["frontier_pipelined_3ep"] = round(dtp, 3)
    steady_ups = n_p / dtp if dtp > 0 else 0.0
    # streaming cadence (ST-1): AvailableNow micro-batches at THREE batch
    # sizes over the same input (3/2/1 batches) — the per-batch fixed-cost
    # curve; throughput should climb toward the batch drain as batch size
    # grows (VERDICT r4 #4)
    stream_points = []
    for fpb, n_batches in ((2, 3), (3, 2), (6, 1)):
        dtq, n_q, batch_walls = bench_frontier_stream(
            spark, n_urls, files_per_batch=fpb
        )
        stream_points.append(
            {
                "files_per_batch": fpb,
                "n_batches": n_batches,
                "wall_sec": round(dtq, 3),
                "urls_scheduled": n_q,
                "urls_per_sec": round(n_q / dtq if dtq > 0 else 0.0, 1),
                "batch_walls_sec": batch_walls,
            }
        )
    dtq, n_q, batch_walls = (
        stream_points[0]["wall_sec"],
        stream_points[0]["urls_scheduled"],
        stream_points[0]["batch_walls_sec"],
    )
    times["frontier_stream_availnow"] = stream_points[0]["wall_sec"]
    times["frontier_stream_2batch"] = stream_points[1]["wall_sec"]
    times["frontier_stream_1batch"] = stream_points[2]["wall_sec"]

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "headline suite wall time (frontier drain + CDX + training-data ops)",
        "value": total,
        "unit": "sec",
        # 2-decimal on the wire (3dp in bench_detail.json): every byte of
        # the stdout line counts against the driver's 2000-char tail buffer
        "queries": {k: round(v, 2) for k, v in times.items()},
        "sf": sf,
        "cpus": CPUS,
        "frontier_urls_in": n_urls,
        "frontier_urls_scheduled": n_scheduled,
        "frontier_urls_per_sec": round(urls_per_sec, 1),
        "frontier_serial_urls_in": 3 * n_urls,
        "frontier_serial_urls_scheduled": n_s,
        "frontier_serial_urls_per_sec": round(n_s / dts if dts > 0 else 0.0, 1),
        "frontier_pipelined_urls_in": 3 * n_urls,
        "frontier_pipelined_urls_scheduled": n_p,
        "frontier_pipelined_urls_per_sec": round(steady_ups, 1),
        "frontier_stream_urls_in": n_urls,
        "frontier_stream_urls_scheduled": n_q,
        "frontier_stream_urls_per_sec": round(n_q / dtq if dtq > 0 else 0.0, 1),
    }
    # The grading driver parses the final JSON from the LAST ~2000 chars of
    # stdout: r5's line grew past that with the stream-point arrays and the
    # round's suite metric was lost (BENCH_r05 parsed: null). Per-batch
    # detail goes to a side file + stderr; the stdout line stays compact
    # and is emitted LAST (VERDICT r5 #4).
    detail = dict(
        payload,
        queries=times,
        frontier_stream_batch_walls_sec=batch_walls,
        frontier_stream_points=stream_points,
        release_caches=released,
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as fd:
        json.dump(detail, fd, indent=1)
    print(f"stream points: {json.dumps(stream_points)}", file=sys.stderr)
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:
        # last-resort guard: never let the line outgrow the driver's tail
        # buffer again — shed the per-query map detail before the metric
        payload["queries"] = {"suite_entries": len(times)}
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
