"""Deterministic corpus sampling and mixture rebalancing.

Training-data pipelines never use ``df.sample()`` at scale: its output
depends on partitioning and evaluation count, so two runs (or a retried
stage) disagree about corpus membership. Everything here derives
membership from a PORTABLE per-document hash (the md5-low-32 family the
split/dedup oracles already use — dedup.hash64_col, textkit
split_assign_col), so:

  * assignments are stable across runs, partitionings, and cluster sizes;
  * a DuckDB/ANSI-SQL twin reproduces the exact row set (value-hash
    oracles, not rows-only);
  * membership of one document is computable without touching the corpus.

Operators:
  * hash_sample         — Bernoulli(fraction) by hash threshold; a pure
                          pushed-down filter, zero shuffles.
  * group_quota_sample  — at most `quota` docs per group (host, lang,
                          domain), priority = hashed pseudo-random order;
                          exact exchange-free grouped rank (rank.py) over
                          the SKINNY (id, group) projection, kept ids
                          semi-joined back.
  * temperature_rebalance — language/domain mixture reweighting
                          p(g) ∝ count_g^alpha (the multilingual-corpus
                          temperature-sampling rule, e.g. the multilingual
                          pretraining recipe of XLM-R/mT5): per-doc copy
                          counts realize the target mixture exactly in
                          expectation — fractional parts resolved by hash
                          Bernoulli, upsampling (alpha<1 tail boost) via a
                          bounded explode.

The reference has no sampling surface (cdx_toolkit's cli streams every
capture); this family is part of the 100 TB training-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash granularity shared with the SQL twins; thresholds are INTEGERS in
#: [0, GRANULARITY] so spark/duckdb comparisons never race on float ulps.
GRANULARITY = 1_000_000


def sample_bucket_col(id_col="doc_id", seed: int = 0) -> Column:
    """Portable pseudo-random bucket in [0, GRANULARITY): md5 of
    ``id:seed``, hex digits 9-16 as an integer, mod GRANULARITY. Twin:
    sample_bucket_sql."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", idc.cast("string"), F.lit(str(seed)))),
                9,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(GRANULARITY)
    ).alias("bucket")


def sample_bucket_sql(id_expr: str = "doc_id", seed: int = 0) -> str:
    return (
        f"(CAST(concat('0x', substring(md5(CAST({id_expr} AS VARCHAR)"
        f" || ':' || '{seed}'), 9, 8)) AS BIGINT) % {GRANULARITY})"
    )


def hash_sample(
    docs: DataFrame, fraction: float, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic Bernoulli(fraction) subsample: keep iff
    bucket(id, seed) < fraction*GRANULARITY. A single filter expression —
    pushes down to the scan, composes with everything, costs nothing."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * GRANULARITY))
    return docs.where(sample_bucket_col(id_col, seed) < F.lit(thr))


def group_quota_sample(
    docs: DataFrame,
    group_col: str,
    quota: int,
    seed: int = 0,
    id_col: str = "doc_id",
    n_range_parts: int | None = None,
) -> DataFrame:
    """At most ``quota`` documents per group, chosen by hashed priority
    (bucket, id) — i.e. a uniform without-replacement draw per group that
    every rerun reproduces. Groups under quota pass through whole.

    Scale shape: the rank runs on the skinny (id, group, bucket)
    projection via the exchange-free grouped rank — the heavy text column
    moves through NO exchange; kept ids return by left_semi join (the
    kept side is ≤ groups×quota rows, AQE broadcasts when small).
    Oracle twin: row_number() over (partition by g order by bucket, id).
    """
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    from .rank import grouped_rank

    skinny = docs.select(
        F.col(id_col).alias("_qid"),
        F.col(group_col).alias("_qg"),
        sample_bucket_col(id_col, seed),
    )
    kept = (
        grouped_rank(skinny, ["_qg"], ["bucket", "_qid"], rank_col="_rk",
                     n_range_parts=n_range_parts)
        .where(F.col("_rk") < quota)
        .select(F.col("_qid").alias(id_col))
    )
    return docs.join(kept, id_col, "left_semi")


def group_quota_sample_sql(
    table: str, group_expr: str, quota: int, seed: int = 0,
    id_expr: str = "doc_id",
) -> str:
    return (
        f"SELECT * EXCLUDE (_b, _rk) FROM (SELECT *,"
        f" {sample_bucket_sql(id_expr, seed)} AS _b,"
        f" row_number() OVER (PARTITION BY {group_expr}"
        f" ORDER BY {sample_bucket_sql(id_expr, seed)}, {id_expr}) AS _rk"
        f" FROM {table}) WHERE _rk <= {int(quota)}"
    )


def temperature_weights(
    docs: DataFrame,
    group_col: str,
    alpha: float,
    target_rows: int | None = None,
) -> DataFrame:
    """Per-group copy factor realizing the temperature-α mixture:
    share_g ∝ count_g**alpha, factor_g = share_g * target / count_g
    (rounded to 6 decimals — the spark/duckdb float-parity convention).
    ``target_rows`` defaults to the corpus size (pure rebalance: total
    expected output ≈ input). One tiny aggregate; returns
    (group, n_docs, factor)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = docs.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum(F.pow("n_docs", F.lit(alpha))).alias("_z"),
        F.sum("n_docs").alias("_n"),
    )
    target = F.lit(target_rows).cast("double") if target_rows else F.col("_n")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            F.round(
                F.pow("n_docs", F.lit(alpha)) / F.col("_z") * target
                / F.col("n_docs"),
                6,
            ).alias("factor"),
        )
    )


def temperature_rebalance(
    docs: DataFrame,
    group_col: str,
    alpha: float,
    seed: int = 0,
    id_col: str = "doc_id",
    target_rows: int | None = None,
) -> DataFrame:
    """Documents replicated/downsampled to the temperature-α mixture:
    each doc appears floor(factor_g) times, +1 with probability
    frac(factor_g) decided by its hash bucket. Output adds `copy`
    (1-based) — downstream shuffles (packing order, splits) treat copies
    as distinct rows. alpha=1 is a no-op mixture (factor 1 everywhere);
    alpha=0 equalizes groups; alpha in (0,1) boosts tails like the
    multilingual pretraining recipes.

    Scale shape: factors are a broadcast dimension (one row per group);
    the explode factor is ceil(factor) ≤ target/min-group-count — bounded
    by the mixture itself, and the hot (downsampled) groups explode 0-or-1
    wide, so replication CONCENTRATES on small groups by construction."""
    w = temperature_weights(docs, group_col, alpha, target_rows)
    base = F.floor("factor").cast("long")
    thr = F.round((F.col("factor") - base) * GRANULARITY).cast("long")
    n_copies = base + (sample_bucket_col(id_col, seed) < thr).cast("long")
    return (
        docs.join(F.broadcast(w.select(group_col, "factor")), group_col)
        .withColumn("_nc", n_copies)
        .where(F.col("_nc") >= 1)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_nc"))))
        .drop("factor", "_nc")
    )


def temperature_rebalance_sql(
    table: str, group_expr: str, alpha: float, seed: int = 0,
    id_expr: str = "doc_id", target_rows: int | None = None,
) -> str:
    tgt = str(int(target_rows)) if target_rows else "(SELECT sum(n_docs) FROM counts)"
    return (
        f"WITH counts AS (SELECT {group_expr} AS g, count(*) AS n_docs"
        f" FROM {table} GROUP BY 1),\n"
        f"z AS (SELECT sum(pow(n_docs, {alpha})) AS z FROM counts),\n"
        "f AS (SELECT g, round(pow(n_docs, " + str(alpha) + ") / z.z"
        f" * {tgt} / n_docs, 6) AS factor FROM counts, z),\n"
        "e AS (SELECT t.*, CAST(floor(f.factor) AS BIGINT)"
        f" + CASE WHEN {sample_bucket_sql(id_expr, seed)}"
        f" < CAST(round((f.factor - floor(f.factor)) * {GRANULARITY})"
        " AS BIGINT) THEN 1 ELSE 0 END AS _nc"
        f" FROM {table} t JOIN f ON t.{group_expr} = f.g)\n"
        "SELECT * EXCLUDE (_nc, copy), copy FROM (SELECT e.*,"
        " unnest(generate_series(1, _nc)) AS copy FROM e WHERE _nc >= 1)"
    )
