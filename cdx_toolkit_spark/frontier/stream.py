"""Structured-Streaming frontier drain (SURVEY.md §2.6 ST-1).

The reference's pull-iterator (`CDXFetcherIter`,
/root/reference/cdx_toolkit/__init__.py:157-205) buffers one page and
refills on demand; the Spark-native equivalent drains candidate files as
micro-batches: `readStream` over a candidates directory, each micro-batch
fed through the SAME FrontierDrain epoch pipeline (dedup -> politeness ->
crawl-ordered batch write) via foreachBatch.

Exactly-once across restarts comes from two cooperating layers:
- Spark's streaming checkpoint (offset log) remembers which candidate
  files each micro-batch consumed, so a restarted query replays only
  unfinished batches;
- FrontierDrain's two-phase epoch commit makes the replayed batch safe at
  EVERY crash point: before the per-epoch commit marker no global state
  (seen set, bloom, host state) has been touched, so the replay re-drains
  and regenerates identical output; after the marker the committed output
  is kept and only the idempotent bookkeeping re-runs — a replay can never
  dedupe an epoch's urls against a seen set that already contains them and
  overwrite its schedule with an empty one (the lost-output window).

Trigger.AvailableNow bounds a run: process everything currently in the
directory, then stop — the streaming analogue of the reference's
StopIteration at 'last endpoint'.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .scheduler import FrontierDrain

CANDIDATE_SCHEMA = "url string, priority int, discovered_ts long"


def drain_stream(
    spark: SparkSession,
    candidates_dir: str,
    drain: FrontierDrain,
    robots=None,
    checkpoint_dir: str | None = None,
    max_files_per_batch: int = 8,
    overlap: bool = False,
):
    """Start an AvailableNow micro-batch drain over candidate parquet files.

    Returns the StreamingQuery; callers .awaitTermination() it. Restarting
    with the same checkpoint_dir resumes from the last committed batch.

    overlap=True pipelines each micro-batch's bookkeeping under the next
    batch's compute (scheduler.drain_epoch overlap_bookkeeping): the batch
    id rides the epoch marker so a post-crash restart can tell a REPLAYED
    batch (resume, keep output) from its successor (finish the crashed
    epoch's bookkeeping, then drain as the next epoch). The LAST batch's
    bookkeeping is still pending when the query terminates — call
    drain.flush() after awaitTermination().
    """
    checkpoint_dir = checkpoint_dir or os.path.join(drain.workdir, "_checkpoint")
    source = (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(candidates_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        # foreachBatch gives at-least-once; drain_epoch's two-phase commit
        # (marker before any global-state mutation, committed epochs resumed
        # not re-drained) makes the composition effectively-once.
        drain.drain_epoch(
            batch_df, robots=robots, overlap_bookkeeping=overlap,
            batch_key=f"stream-{batch_id}" if overlap else None,
        )

    return (
        source.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
