"""Fixed-budget sequence packing (concat-and-chunk) for LLM pretraining.

Training consumes fixed-length token sequences, not documents: the corpus
is laid out as one long token stream in a deterministic document order
(ascending doc_id) and cut every `budget` tokens — the standard
concat-and-chunk packing of GPT-style pretraining (documents may straddle
a cut; the straddling document contributes a segment to each side).

The only global computation is the exclusive running token total per
document (its start offset in the stream). A naive window
``sum(n_tokens) over (order by doc_id)`` collapses the corpus onto ONE
partition — the classic global-cumsum scale trap. This module uses the
same two-phase exchange-free shape as the frontier's skew-safe rank
(frontier/politeness.py `_host_rank_rangesorted`):

  1. range-partition the SKINNY (doc_id, n_tokens) projection by doc_id
     and sort within partitions — the single big-frame exchange;
  2. per-partition running sums via ONE Arrow-streamed mapInPandas pass
     with a scalar carry (no exchange: mapInPandas sees each partition as
     an ordered iterator of batches);
  3. a tiny per-partition-totals aggregate (≤ n_range_parts rows) turned
     into exclusive partition offsets by a driver-scale window, broadcast
     back.

100 TB notes: the heavy columns (text/html) never enter the computation —
callers join the returned assignment to the corpus by doc_id. The skinny
frame is ~16 bytes/row, so even a 10^10-document corpus moves ~160 GB
through the one exchange. Stream offsets reach ~10^14 tokens at that
scale: all arithmetic stays in 64-bit integers (`div`/`%`, never
floating-point floor-division).

The reference has no packing operator (cdx_toolkit emits captures one at
a time, cli.py); this is part of the training-data-pipeline surface the
brief adds on top of the reference's query semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cumsum_stream(batches):
    """Running per-partition token total with a scalar carry across Arrow
    batches (mapInPandas calls this once per partition with an ordered
    batch iterator, so the carry is per-partition by construction)."""
    import pandas as pd

    run = 0
    for pdf in batches:
        if len(pdf) == 0:
            yield pdf.assign(_cum=pd.Series([], dtype="int64"))
            continue
        c = pdf["n_tokens"].cumsum() + run
        run = int(c.iloc[-1])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "_pid": pdf["_pid"],
                "_cum": c.astype("int64"),
            }
        )


def pack_assignments(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
    n_range_parts: int | None = None,
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Returns (doc_id, n_tokens, seq_start, pack_id, pack_offset, n_packs):
    seq_start is the document's 0-based global token offset (exclusive
    running sum in ascending doc_id order), pack_id the sequence holding
    its first token, pack_offset the position inside that sequence, and
    n_packs how many sequences it spans (0 for an empty document, which
    occupies no tokens). Deterministic and partitioning-independent: the
    stream order is defined by doc_id alone.

    ``tokens_col`` may be a column name or an expression (e.g.
    textkit.token_count_col("text")).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    if n_range_parts is None:
        n_range_parts = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # NULL token counts (a NULL-text doc makes token_count_col yield NULL)
    # must not reach _cumsum_stream: Arrow hands a nullable int64 column to
    # pandas as float64 with NaN, and cumsum().astype('int64') dies deep in
    # the mapInPandas stage with an obscure non-finite-cast error. A NULL
    # document occupies zero tokens — same as empty text (ADVICE r5).
    skinny = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(tok.cast("long"), F.lit(0)).alias("n_tokens"),
    )
    ranged = (
        skinny.repartitionByRange(n_range_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    # one Arrow pass; localCheckpoint pins partition boundaries AND the
    # carried sums so the stats branch and the output join read identical
    # values (RangePartitioner boundary sampling is not deterministic
    # across recomputations — same note as politeness.host_rank).
    carried = ranged.mapInPandas(
        _cumsum_stream, "doc_id long, n_tokens long, _pid int, _cum long"
    ).localCheckpoint(eager=False)
    # tiny frame: ≤ n_range_parts rows. The single-partition window is the
    # point — the corpus-sized frame never sees it.
    stats = (
        carried.groupBy("_pid")
        .agg(F.max("_cum").alias("_ptot"))
        .withColumn(
            "_offset",
            F.sum("_ptot").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .fillna({"_offset": 0})
    )
    out = (
        carried.join(F.broadcast(stats.select("_pid", "_offset")), "_pid")
        .withColumn("seq_start", F.col("_offset") + F.col("_cum") - F.col("n_tokens"))
        .withColumn("pack_id", F.expr(f"seq_start div {int(budget)}"))
        .withColumn("pack_offset", F.col("seq_start") % F.lit(int(budget)))
        .withColumn(
            "n_packs",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(seq_start + n_tokens - 1) div {int(budget)}")
                - F.col("pack_id")
                + F.lit(1),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )
    return out.select(
        "doc_id", "n_tokens", "seq_start", "pack_id", "pack_offset", "n_packs"
    )


def pack_segments(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
    n_range_parts: int | None = None,
) -> DataFrame:
    """One row per (document, training sequence) the document contributes
    tokens to — the materialization plan a packing writer executes.

    Returns (doc_id, pack_id, pack_offset, doc_offset, seg_len): the
    document's tokens [doc_offset, doc_offset+seg_len) land in sequence
    pack_id at positions [pack_offset, pack_offset+seg_len). Every
    sequence except the stream's last is exactly `budget` tokens when its
    segments are concatenated in pack_offset order (pytest-pinned).
    Empty documents contribute no segments. Straddlers explode via
    F.sequence over [pack_id, pack_id+n_packs) — pure JVM; a document
    spans at most n_tokens/budget + 1 sequences, so the explode factor is
    bounded by the data itself, not a skew risk.
    """
    a = pack_assignments(docs, budget, id_col, tokens_col, n_range_parts)
    b = F.lit(int(budget)).cast("long")
    seg = (
        a.where(F.col("n_tokens") > 0)
        .withColumn(
            "pack",
            F.explode(
                F.sequence(
                    F.col("pack_id"), F.col("pack_id") + F.col("n_packs") - 1
                )
            ),
        )
        .withColumn("_gstart", F.greatest(F.col("seq_start"), F.col("pack") * b))
        .withColumn(
            "_gend",
            F.least(F.col("seq_start") + F.col("n_tokens"), (F.col("pack") + 1) * b),
        )
    )
    return seg.select(
        "doc_id",
        F.col("pack").alias("pack_id"),
        (F.col("_gstart") - F.col("pack") * b).alias("pack_offset"),
        (F.col("_gstart") - F.col("seq_start")).alias("doc_offset"),
        (F.col("_gend") - F.col("_gstart")).alias("seg_len"),
    )


def pack_assignments_sql(nt_sql: str, budget: int) -> str:
    """DuckDB twin of pack_assignments. ``nt_sql`` must select
    (doc_id, nt) — the token count per document. NULL counts coalesce to 0,
    mirroring pack_assignments."""
    b = int(budget)
    return (
        f"WITH t0 AS ({nt_sql}),\n"
        "t AS (SELECT doc_id, coalesce(nt, 0) AS nt FROM t0),\n"
        "c AS (SELECT doc_id, nt, sum(nt) OVER (ORDER BY doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)\n"
        "SELECT doc_id, nt AS n_tokens,\n"
        "  CAST(cum - nt AS BIGINT) AS seq_start,\n"
        f"  CAST((cum - nt) // {b} AS BIGINT) AS pack_id,\n"
        f"  CAST((cum - nt) % {b} AS BIGINT) AS pack_offset,\n"
        f"  CAST(CASE WHEN nt > 0 THEN (cum - 1) // {b} - (cum - nt) // {b} + 1"
        "    ELSE 0 END AS BIGINT) AS n_packs\n"
        "FROM c"
    )


def pack_segments_sql(nt_sql: str, budget: int) -> str:
    """DuckDB twin of pack_segments (unnest(generate_series) explode)."""
    b = int(budget)
    return (
        f"WITH a AS ({pack_assignments_sql(nt_sql, budget)}),\n"
        "e AS (SELECT doc_id, seq_start, n_tokens,\n"
        "  unnest(generate_series(pack_id, pack_id + n_packs - 1)) AS pack\n"
        "  FROM a WHERE n_tokens > 0)\n"
        "SELECT doc_id, pack AS pack_id,\n"
        f"  greatest(seq_start, pack * {b}) - pack * {b} AS pack_offset,\n"
        "  greatest(seq_start, pack * " + str(b) + ") - seq_start AS doc_offset,\n"
        f"  least(seq_start + n_tokens, (pack + 1) * {b})"
        f" - greatest(seq_start, pack * {b}) AS seg_len\n"
        "FROM e"
    )
