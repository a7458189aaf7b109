"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payloads + typed metadata — the Spark-side
contract (schema, partitioning, Arrow batch shape, UDF signatures) is real
and tested; the codec step is stubbed because decode libraries (PIL/ffmpeg)
are not in this container. Swapping `_decode_stub` for a real decoder is a
one-function change; nothing in the plan shape moves.

Pattern: `mapInPandas` over batches of (media_id, kind, payload, meta) —
each batch is one Arrow RecordBatch, features are computed vectorized with
numpy over the payload bytes. Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so executor
memory is bounded by batch_rows × max_payload, independent of partition
size — the property that keeps this safe at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),   # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", LongType()),       # typed metadata (nullable)
        StructField("height", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def _decode_stub(payload: bytes, kind: str):
    """Real decoders (PIL / soundfile / pyav) are not available in this
    environment. The plumbing around this stub is the deliverable."""
    raise NotImplementedError(
        f"decode({kind}): codec libraries not available in this container; "
        "plug a real decoder here — the Spark plan is codec-agnostic."
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level features per media row (the fake 'decode'):
    size, mean byte value, byte-histogram entropy. Vectorized numpy per
    Arrow batch via mapInPandas."""

    from .shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                }
            )
            n_bytes, means, ents = [], [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n_bytes.append(len(arr))
                if len(arr) == 0:
                    means.append(0.0)
                    ents.append(0.0)
                    continue
                means.append(float(arr.mean()))
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts[counts > 0] / len(arr)
                ents.append(float(-(p * np.log2(p)).sum()))
            out["n_bytes"] = pd.Series(n_bytes, dtype="int64")
            out["byte_mean"] = means
            out["byte_entropy"] = ents
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame offset.

    The offsets come from typed metadata (duration) — pure built-ins; only
    the (stubbed) per-frame decode would touch the payload. Explode happens
    before decode so frame work parallelizes across the cluster."""
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("duration_s") / F.lit(every_s)).cast("long")
    )
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_offset_s",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i.cast("double") * F.lit(every_s),
                )
            ),
        )
        .select("media_id", "frame_offset_s", "payload")
    )


def synth_media(spark, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents (payload =
    utf-8 bytes of text) — exercises the binary plumbing end-to-end."""
    from .cdx_view import DOCS_SCHEMA

    docs = spark.read.schema(DOCS_SCHEMA).parquet(
        f"{sf_dir}/documents.parquet"
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 640).cast("long").alias("width"),
        (F.col("doc_id") % 480).cast("long").alias("height"),
        (F.col("n_chars") / 100.0).alias("duration_s"),
    )
