"""Structured-Streaming drain (ST-1): AvailableNow micro-batches through the
epoch pipeline, checkpointed resume, and golden parity of the cumulative
seen-set + per-epoch crawl order vs the serial reference scheduler."""

import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401

from cdx_toolkit_spark.frontier.reference_impl import run_reference_schedule
from cdx_toolkit_spark.frontier.scheduler import FrontierDrain
from cdx_toolkit_spark.frontier.stream import drain_stream


def _seeds(lo, hi):
    out = []
    for i in range(lo, hi):
        host = "big.com" if i % 3 == 0 else f"h{i % 5}.org"
        out.append((f"http://{host}/p/{i % 40}", i % 2, 100 + i))
    return out


@pytest.fixture()
def dirs(tmp_path):
    cand = str(tmp_path / "cands")
    work = str(tmp_path / "work")
    os.makedirs(cand)
    yield cand, work
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write_batch(spark, cand_dir, name, seeds):
    df = spark.createDataFrame(seeds, "url string, priority int, discovered_ts long")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(cand_dir, name))


def test_stream_drain_and_checkpoint_resume(spark, dirs):
    cand_dir, workdir = dirs
    s1, s2 = _seeds(0, 60), _seeds(40, 100)  # overlap: 40..59 already seen

    # ---- run 1: one file present, drain it
    _write_batch(spark, cand_dir, "b1", s1)
    drain = FrontierDrain(spark, workdir, batch_window=30.0, n_shards=4,
                          m_bits=1 << 14)
    q = drain_stream(spark, cand_dir + "/*", drain)
    q.awaitTermination()
    epochs1 = drain.epochs()
    assert len(epochs1) >= 1
    ref1, seen1 = run_reference_schedule(s1, batch_window=30.0)
    assert drain.seen_set() == seen1
    assert sum(e["n_scheduled"] for e in epochs1) == len(ref1)

    # ---- run 2: second file arrives; restart from the SAME checkpoint —
    # only the new file is processed, overlap urls dedup against the seen set
    _write_batch(spark, cand_dir, "b2", s2)
    q = drain_stream(spark, cand_dir + "/*", drain)
    q.awaitTermination()
    epochs2 = drain.epochs()
    assert len(epochs2) > len(epochs1)

    # reference: run 2 sees s2 with run-1 seen-set and politeness carryover
    host_free = {}
    for t in ref1:
        host_free[t["host"]] = max(
            host_free.get(t["host"], 0.0), t["fetch_time"] + 3.0
        )
    ref2, seen2 = run_reference_schedule(
        s2, seen=seen1, batch_window=30.0, host_next_free=host_free
    )
    assert drain.seen_set() == seen2
    new_scheduled = sum(
        e["n_scheduled"] for e in epochs2[len(epochs1):]
    )
    assert new_scheduled == len(ref2)

    # ---- run 3: nothing new -> no new epochs with rows
    q = drain_stream(spark, cand_dir + "/*", drain)
    q.awaitTermination()
    epochs3 = drain.epochs()
    assert sum(e["n_scheduled"] for e in epochs3[len(epochs2):]) == 0
    assert drain.seen_set() == seen2


def _sched_rows(spark, rows):
    # minimal schedule-shaped rows: (host, fetch_time, retries)
    from cdx_toolkit_spark.frontier.metrics import SCHEDULE_SCHEMA

    full = [
        (f"http://{h}/x", f"{h})/x", 0, h, 0, 0, r, 0.0, 0, 1.0, 0, t,
         int(t // 60), 1, 0)
        for h, t, r in rows
    ]
    return spark.createDataFrame(full, SCHEDULE_SCHEMA)


def test_watermarked_rate_metrics(spark, tmp_path):
    """ST-6-class: windows close exactly once when the watermark passes;
    late rows merge while open and are dropped after close."""
    import time

    from cdx_toolkit_spark.frontier.metrics import run_rate_metrics

    sched = str(tmp_path / "schedule")
    os.makedirs(sched)
    # batch 1: host a in [0,60) x2 and [60,120) x1; max event time 300 ->
    # watermark becomes 300-120=180 for the NEXT batch
    _sched_rows(spark, [("a.com", 5.0, 0), ("a.com", 30.0, 1),
                        ("a.com", 70.0, 0), ("b.com", 300.0, 0)]) \
        .coalesce(1).write.parquet(os.path.join(sched, "ep_1"))
    time.sleep(1.1)  # file source orders by modification time
    # batch 2: advances the watermark to 380; windows ending <= 180 are
    # EMITTED + EVICTED during this batch
    _sched_rows(spark, [("b.com", 500.0, 0)]) \
        .coalesce(1).write.parquet(os.path.join(sched, "ep_2"))
    time.sleep(1.1)
    # batch 3: a LATE row at t=10 — its window's state is gone, so it is
    # dropped (Spark only guarantees the drop AFTER eviction; a late row
    # landing in the same batch as the close would still merge)
    _sched_rows(spark, [("a.com", 10.0, 0), ("b.com", 700.0, 0)]) \
        .coalesce(1).write.parquet(os.path.join(sched, "ep_3"))

    q = run_rate_metrics(
        spark, sched + "/ep_*", str(tmp_path / "ckpt"),
        sink_table="rate_test", window_s=60.0, watermark_s=120.0,
    )
    q.awaitTermination()
    out = {
        (r["window_start"].strftime("%H:%M:%S"), r["host"]):
            (r["n_fetches"], r["retried"])
        for r in spark.sql("SELECT * FROM rate_test").collect()
    }
    # [0,60)xa.com closed with exactly the 2 on-time rows, emitted ONCE —
    # the late t=10 row in batch 3 was dropped, not re-emitted
    assert out[("00:00:00", "a.com")] == (2, 1)
    assert out[("00:01:00", "a.com")] == (1, 0)
    # b.com t=300 window [300,360) closes when the watermark reaches 380
    assert out[("00:05:00", "b.com")] == (1, 0)
    # t=700's window is still open at stream end -> not emitted
    assert ("00:11:00", "b.com") not in out
    assert len(out) == 4  # exactly-once per closed (host, window)


def test_stream_drain_overlap_parity(spark, dirs):
    """overlap=True (pipelined bookkeeping across micro-batches) produces
    the identical seen set + schedule as the serial streaming drain."""
    cand_dir, workdir = dirs
    batches = [_seeds(0, 50), _seeds(30, 80), _seeds(60, 120)]
    for i, b in enumerate(batches):
        _write_batch(spark, cand_dir, f"b{i}", b)

    drain = FrontierDrain(spark, workdir, batch_window=30.0, n_shards=4,
                          m_bits=1 << 14)
    q = drain_stream(spark, cand_dir + "/*", drain, overlap=True,
                     max_files_per_batch=1)
    q.awaitTermination()
    drain.flush()  # last batch's bookkeeping is pending by design

    # serial reference over the same three batches with carryover
    seen = set()
    host_free = {}
    total = 0
    for b in batches:
        ref, seen = run_reference_schedule(
            b, seen=seen, batch_window=30.0, host_next_free=host_free
        )
        for t in ref:
            host_free[t["host"]] = max(
                host_free.get(t["host"], 0.0), t["fetch_time"] + 3.0
            )
        total += len(ref)
    assert drain.seen_set() == seen
    assert sum(e["n_scheduled"] for e in drain.epochs()) == total
