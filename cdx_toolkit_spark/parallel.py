"""Scan-parallelism floor for map-heavy kernels (r7, guide §2.5/§6).

A single-row-group parquet file (or any unsplittable input) yields ONE scan
partition no matter how many cores the cluster has, so every expensive
per-row kernel downstream (shingle explode, winnowing, language-ID, simhash
votes) runs single-threaded. `spread_for_map` round-robin-repartitions the
source up to the cluster's default parallelism — but ONLY when the source
actually supplies fewer partitions, so at real scale (inputs already in
hundreds of splits) it is a plain no-op and never adds an exchange. This is
the guide's "one huge unsplittable file → repartition immediately after the
read" rule, made conditional.

Cost notes: the partition-count peek forces physical planning of the (small)
source plan on the driver — no Spark job — and the repartition itself pays
the keyless-repartition local sort (sortBeforeRepartition, deterministic
under retries) on a frame that is by construction small enough to have come
from very few partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_map(df: DataFrame, target: int | None = None) -> DataFrame:
    """Raise map parallelism to `target` (default: defaultParallelism) when
    the source yields fewer partitions; no-op otherwise. Row set unchanged
    (round-robin placement only) — safe above any per-row/per-doc kernel."""
    sc = df.sparkSession.sparkContext
    if target is None:
        target = sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        return df
    if have >= target:
        return df
    return df.repartition(target)
