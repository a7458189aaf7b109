"""Exchange-free exact grouped rank — the general form of the frontier's
skew-safe host rank (frontier/politeness.py `_host_rank_rangesorted`,
where the pattern and its measurements live).

A per-group rank via ``row_number() over (partition by g order by ...)``
hash-exchanges the whole frame on g and sorts — and a hot group (the .com
of hosts, the `en` of languages) lands on one task. This variant:

  1. ONE range exchange on (group, order) — contiguous group runs, hot
     groups SPLIT across adjacent partitions instead of fused onto one;
  2. in-partition sort (no movement) + local rank from
     `monotonically_increasing_id()` (consecutive within a partition);
  3. a tiny per-(group, partition) stats aggregate -> exclusive prefix
     offsets via a window over partition ids (rows = groups×partitions
     touched, driver-scale), joined back (AQE broadcasts when it fits).

The localCheckpoint pins range boundaries and mid assignments: the stats
branch and the output join must observe identical (_pid, _mid) pairs
(RangePartitioner boundary sampling is not deterministic across
recomputations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_rank(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    rank_col: str = "rank",
    n_range_parts: int | None = None,
) -> DataFrame:
    """``df`` + an exact 0-based ``rank_col`` within each group, ordered by
    ``order_cols`` — identical to ``row_number()-1`` over the same window
    (pytest-pinned), but the only big-frame exchange is a range partition.
    ``order_cols`` must be a total order within each group for the rank to
    be deterministic (append a unique id as the last key)."""
    if n_range_parts is None:
        n_range_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    gcols = [F.col(c) if isinstance(c, str) else c for c in group_cols]
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    gnames = [c if isinstance(c, str) else df.select(c).columns[0]
              for c in group_cols]
    ranged = (
        df.repartitionByRange(n_range_parts, *gcols, *ocols)
        .sortWithinPartitions(*gcols, *ocols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    stats = (
        ranged.groupBy(*gnames, "_pid")
        .agg(F.min("_mid").alias("_mmin"), F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.sum("_cnt").over(
                Window.partitionBy(*gnames)
                .orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .fillna({"_offset": 0})
    )
    return (
        ranged.join(
            stats.select(*gnames, "_pid", "_mmin", "_offset"),
            gnames + ["_pid"],
        )
        .withColumn(
            rank_col, (F.col("_mid") - F.col("_mmin") + F.col("_offset"))
        )
        .drop("_pid", "_mid", "_mmin", "_offset")
    )
