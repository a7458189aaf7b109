"""Profile the frontier drain step-by-step at the bench config.

Replicates scheduler.drain_epoch stage boundaries with wall timers + Spark
job counts so the per-epoch fixed cost is attributable. Run:
    python tools/profile_drain.py [n_urls]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from cdx_toolkit_spark.session import get_spark
    from cdx_toolkit_spark.frontier.scheduler import (
        FrontierDrain, prepare, dedupe,
    )
    from cdx_toolkit_spark.frontier import politeness
    from cdx_toolkit_spark.frontier.synth import synth_candidates

    spark = get_spark("profile_drain", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(st.getJobIdsForGroup(None) or []) + len(st.getJobIdsForGroup() or [])

    # job ids are global; track via allJobs
    def njobs() -> int:
        try:
            return len(spark.sparkContext.statusTracker().getActiveJobsIds())
        except Exception:
            return -1

    tracker = {"last": 0.0}

    def mark(label: str) -> None:
        now = time.monotonic()
        dt = now - tracker["last"]
        tracker["last"] = now
        print(f"{label:40s} {dt:8.2f}s", flush=True)

    workdir = tempfile.mkdtemp(prefix="prof_drain_")
    try:
        drain = FrontierDrain(
            spark, workdir, batch_window=60.0, n_shards=32,
            m_bits=1 << 22, mitigate_skew=True,
        )
        robots = spark.createDataFrame(
            [("hot-cdn.example.com", 0.01, ["/private"])],
            "host string, crawl_delay_s double, disallow_prefixes array<string>",
        )
        cands = synth_candidates(spark, n_urls)
        # warm JVM on unrelated tiny job
        spark.range(10).count()
        tracker["last"] = time.monotonic()

        epoch = 1
        has_backoff = "next_attempt_ts" in cands.columns
        frontier = prepare(cands)
        caches: list = []
        fresh = dedupe(
            frontier, drain.store, drain._seen_exact(),
            split_retries=has_backoff, caches=caches,
        ).persist()
        mark("compose dedupe (lazy)")
        fresh.count()
        mark("materialize fresh (dedupe+probe)")
        polite = politeness.attach_robots(fresh, robots)
        scheduled = politeness.assign_fetch_times(
            polite if has_backoff else polite.drop("next_attempt_ts"),
            drain._host_state(epoch - 1),
            mitigate_skew=True,
        )
        if not has_backoff:
            scheduled = scheduled.withColumn("next_attempt_ts", F.lit(0.0))
        scheduled = scheduled.withColumn(
            "batch", F.floor(F.col("fetch_time") / F.lit(60.0)).cast("int")
        ).withColumn("epoch", F.lit(epoch)).withColumn(
            "source_partition", F.spark_partition_id()
        )
        out_cols = [
            "url", "urlkey", "url_hash", "host", "priority", "discovered_ts",
            "retries", "next_attempt_ts", "crawl_delay_s", "host_rank",
            "fetch_time", "batch", "epoch", "source_partition",
        ]
        scheduled = scheduled.select(*out_cols).persist()
        mark("compose schedule (lazy)")
        scheduled.count()
        mark("materialize scheduled (rank)")
        out_path = os.path.join(workdir, "schedule", f"ep_{epoch}")
        (
            scheduled.repartitionByRange(
                32, "batch", "fetch_time", "priority", "urlkey"
            )
            .sortWithinPartitions("batch", "fetch_time", "priority", "urlkey")
            .write.mode("overwrite").parquet(out_path)
        )
        mark("range-write schedule")
        written = spark.read.parquet(out_path)
        n_scheduled = written.count()
        mark(f"read-back + count ({n_scheduled})")
        fresh.unpersist()
        for c in caches:
            c.unpersist()

        done = written.select("urlkey", "url_hash")
        done.write.mode("overwrite").parquet(
            os.path.join(workdir, "seen_exact", f"ep_{epoch}")
        )
        mark("seen-store write")
        drain.store.build(done, "url_hash")
        mark("bloom build")
        state = politeness.next_host_state(written)
        state.write.mode("overwrite").parquet(
            os.path.join(workdir, "host_state", f"ep_{epoch}")
        )
        mark("host-state write")
        scheduled.unpersist()
        print(f"TOTAL n_scheduled={n_scheduled}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
