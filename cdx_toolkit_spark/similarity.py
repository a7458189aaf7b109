"""Approximate-nearest-neighbor search over embedding columns.

Baseline: exact brute-force cosine top-k — a self-join with the dot product
expressed through higher-order array functions (zip_with + aggregate), all
JVM-side in double precision.

Scale path: random-hyperplane LSH. Signatures are computed in one Arrow
batch per partition (numpy matmul inside mapInPandas — the canonical "Python
only where built-ins can't express it" case), then candidates come from
bucket-equality self-joins and only candidates pay the exact-cosine price.
At 10^9 vectors the brute-force join is O(n²) and impossible; LSH buckets
bound the pair space, and the bucket join is shuffle-partitioned by bucket
key (AQE splits hot buckets).

Everything is deterministic: hyperplanes come from a fixed-seed
numpy.random.Generator, so signatures are reproducible across runs/workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn("_norm", F.sqrt(_dot(v, v)))


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k for every query vector (defaults to all-pairs).

    Returns (query_id, neighbor_id, rank). Ties broken by neighbor id —
    fully deterministic. Cosine is computed in double precision regardless
    of the storage type (float32 arrays stay float32 on disk/scan)."""
    base = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.col("_norm").alias("n_norm"),
    )
    qs = with_norm(queries if queries is not None else embeddings, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    pairs = qs.crossJoin(base).where(F.col("q_id") != F.col("n_id"))
    sim = (_dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cosine")
    scored = pairs.select("q_id", "n_id", sim)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """mapInPandas stage stamping each row with its hyperplane-sign bucket.

    One numpy matmul per Arrow batch — vectorized across the whole batch,
    no per-row Python."""
    planes = _hyperplanes(dim, n_planes, seed)

    def stamp(batches):
        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if len(mat) == 0:
                pdf["bucket"] = pd.Series([], dtype="int64")
                yield pdf
                continue
            signs = (mat @ planes) > 0
            bucket = np.zeros(len(mat), dtype=np.int64)
            for j in range(n_planes):
                bucket |= signs[:, j].astype(np.int64) << j
            pdf = pdf.copy()
            pdf["bucket"] = bucket
            yield pdf

    return stamp


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share an LSH bucket; exact cosine re-rank inside.

    Recall < 1 by construction (single hash table); multiple tables = union
    of several seeds. Returns (query_id, neighbor_id, rank)."""
    from .shipping import ensure_shipped

    ensure_shipped(embeddings.sparkSession)
    dim = len(embeddings.select(vec_col).first()[0])
    schema = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ).schema.add("bucket", "long")
    )
    stamped = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).mapInPandas(lsh_bucket_udf(dim, n_planes, seed), schema)
    stamped = with_norm(stamped, "embedding")

    a = stamped.select(
        F.col("bucket"),
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    b = stamped.select(
        F.col("bucket"),
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_vec"),
        F.col("_norm").alias("n_norm"),
    )
    pairs = a.join(b, "bucket").where(F.col("q_id") != F.col("n_id"))
    sim = (_dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cosine")
    scored = pairs.select("q_id", "n_id", sim)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank"),
        )
    )
