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
