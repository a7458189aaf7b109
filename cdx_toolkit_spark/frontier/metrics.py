"""Watermarked crawl-rate metrics over the drained schedule (ST-6 class).

The reference has no streaming surface at all (SURVEY.md marks watermarks
n/a), but a 10^10-URL crawl needs live per-host rate observability: this
treats the schedule table's epoch directories as an UNBOUNDED file stream
(new `ep_N` files keep appearing as the drain runs) and maintains
per-(host, time-window) fetch counts with a watermark on simulated fetch
time, so:

  - state is bounded: windows older than the watermark are finalized and
    dropped from the store (a crawl horizon of months cannot accumulate
    unbounded aggregation state);
  - late rows (an epoch written out of order, a straggler partition) are
    merged while the window's state is live and DROPPED once it was
    evicted (Spark finalizes a window in the first batch whose watermark
    passed its end; a late row landing in that same batch still merges) —
    append mode emits each (host, window) exactly once.

`fetch_time` is the drain's simulated clock (seconds, double) — the stream
converts it to an event-time timestamp, which keeps the whole pipeline
deterministic and wall-clock-free like the rest of the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEDULE_SCHEMA = (
    "url string, urlkey string, url_hash long, host string, "
    "priority int, discovered_ts long, retries int, "
    "next_attempt_ts double, conn_errors int, crawl_delay_s double, "
    "host_rank int, fetch_time double, batch int, epoch int, "
    "source_partition int"
)


def schedule_rate_stream(
    spark: SparkSession,
    schedule_glob: str,
    window_s: float = 60.0,
    watermark_s: float = 120.0,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming per-(host, window) fetch counts with a watermark.

    `schedule_glob`: file-source glob over the drain's schedule output
    (e.g. `{workdir}/schedule/ep_*`). Append-mode consumers receive each
    (window_start, host, n_fetches, retried) row exactly once, after the
    watermark passes the window end. Start with
    `.writeStream.outputMode("append")`.
    """
    src = (
        spark.readStream.schema(SCHEDULE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(schedule_glob)
    )
    ev = src.withColumn("event_time", F.timestamp_seconds(F.col("fetch_time")))
    agg = (
        ev.withWatermark("event_time", f"{int(watermark_s)} seconds")
        .groupBy(
            F.window("event_time", f"{int(window_s)} seconds").alias("w"),
            "host",
        )
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(F.when(F.col("retries") > 0, 1).otherwise(0)).alias("retried"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("host"),
        F.col("n_fetches"),
        F.col("retried"),
    )


def run_rate_metrics(
    spark: SparkSession,
    schedule_glob: str,
    checkpoint_dir: str,
    sink_table: str = "crawl_rate_metrics",
    **kwargs,
):
    """Convenience runner: AvailableNow drain of everything currently in the
    schedule dir into an in-memory sink table (tests/dashboards); production
    swaps the sink for a parquet/Iceberg metrics table with the identical
    plan."""
    df = schedule_rate_stream(spark, schedule_glob, **kwargs)
    return (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
