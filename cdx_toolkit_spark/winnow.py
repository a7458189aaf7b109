"""Rolling-hash document fingerprinting (winnowing) — Spark-first.

Implements the MOSS winnowing scheme (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):

1. normalize the text (lowercase, collapse whitespace),
2. hash every character k-gram with a polynomial Karp–Rabin hash
   (the classic *rolling* hash family: H(c_0..c_{k-1}) =
   sum c_j * B^{k-1-j}  mod 2^32),
3. slide a window of w consecutive gram hashes and keep the minimum of
   each window (rightmost occurrence on ties, per the paper),
4. the de-duplicated selected (position, hash) set is the document's
   fingerprint.

Guarantee: any shared substring of length >= w + k - 1 between two
documents produces at least one shared fingerprint, while only ~2/(w+1)
of all gram hashes are kept.

Spark-first shape: the per-document computation is a chain of narrow
projections — codes array, gram-hash array, window-min selection — each
an unrolled `transform(sequence(...))` expression over the PREVIOUS
stage's column (k and w are compile-time constants, so the k-term
polynomial and the w-wide argmin unroll into whole-stage-codegen'd
integer ops). Each expensive array lives in its own select() so every
lambda touches only a cheap AttributeReference; Catalyst's
CollapseProject keeps non-cheap multiply-referenced aliases staged
rather than re-inlining them. No UDF, no explode until the caller wants
rows, zero shuffles for the fingerprint table. A literally-incremental
rolling update (O(1) per position instead of O(k)) would need stateful
per-row code (mapInPandas); at k=8 the unrolled form stays in Tungsten
and wins — the hash FUNCTION is identical either way, so a scale
deployment can swap in an incremental kernel without changing a single
fingerprint.

The polynomial modulus is 2^32 (a power of two), so `mod` is a bitwise
AND and the whole computation is exact 64-bit integer arithmetic — a
DuckDB/ANSI-SQL twin (``winnow_fingerprint_sql``) reproduces every
fingerprint bit-for-bit for the driver oracle.

Reference parity note: cdx_toolkit has no fingerprinting operator; this
module is brief-driven (LLM-pipeline text analysis: "document
fingerprinting (rolling hash)"). The near-dup *pairs* operator reuses the
inverted-index join shape of dedup.ngram_jaccard_pairs (same single
shuffle-on-key plan, same ubiquitous-key guard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINNOW_BASE = 257            # polynomial base (> any byte value)
WINNOW_MASK = (1 << 32) - 1  # modulus 2^32 as a bitwise AND
_POS_LANE = 1 << 31          # (fp, pos) packing: v = fp*2^31 + (2^31-1-pos)


def _norm_col(text) -> Column:
    """Shared normalization: lowercase, trim, collapse runs of whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


NORM_SQL = "regexp_replace(lower(trim({t})), '\\s+', ' ', 'g')"


def _pows(k: int) -> list[int]:
    """B^{k-1-j} mod 2^32 for j in 0..k-1 — shared with the SQL twin."""
    return [pow(WINNOW_BASE, k - 1 - j, 1 << 32) for j in range(k)]


def _let(value: Column, body) -> Column:
    """Let-binding via a single-element transform (the surt.py:152 trick).

    Catalyst's CollapseProject re-inlines chained select() stages and its
    subexpression elimination does not dedupe repeated subtrees referenced
    from lambda bodies, so a staged formulation of this kernel multiplies
    the expression tree by the reference count at EVERY stage (norm is
    referenced ~n times by codes, codes k+1 times by hashes, ...) —
    measured: plan compilation alone took >50 s for a 3-row input. Naming
    each stage as a lambda variable keeps every expensive array exactly
    once in the tree and evaluated exactly once per row.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def codes_col(norm) -> Column:
    """Array of character code points of an already-normalized string."""
    norm = F.col(norm) if isinstance(norm, str) else norm
    return F.when(
        F.length(norm) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(norm)),
            lambda i: F.ascii(F.substr(norm, i, F.lit(1))).cast("long"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def gram_hash_col(codes, k: int = 8) -> Column:
    """Karp–Rabin k-gram hashes from a materialized codes column.

    Each hash is the k-term polynomial unrolled into one expression over
    element_at(codes, ...) — cheap attribute lookups. Terms are
    < 2^21 * 2^32 and there are k of them, so the 64-bit sum cannot
    overflow for k <= 512; the single AND at the end is the exact mod.
    """
    codes = F.col(codes) if isinstance(codes, str) else codes
    pows = _pows(k)

    def gram(i):
        s = None
        for j, p in enumerate(pows):
            term = F.element_at(codes, i + j) * F.lit(p)
            s = term if s is None else s + term
        return s.bitwiseAND(F.lit(WINNOW_MASK))

    n_grams = F.size(codes) - k + 1
    return F.when(
        n_grams >= 1, F.transform(F.sequence(F.lit(1), n_grams), gram)
    ).otherwise(F.array().cast("array<bigint>"))


def gram_enc_col(hashes) -> Column:
    """Pack each (hash, 1-based position) into ONE BIGINT:
    ``h * 2^31 + (2^31 - 1 - pos)``.

    The packing makes plain integer ``min`` implement the paper's
    selection rule directly: comparing encodings compares hashes first,
    and for EQUAL hashes the larger position has the smaller suffix — so
    ``min(window)`` is the minimum hash at its RIGHTMOST occurrence.
    Range proof: h < 2^32 and pos < 2^31, so v <= (2^32-1)*2^31 +
    (2^31-1) = 2^63-1 — no signed-64 overflow (pos < 2^31 caps docs at
    2 GiB of normalized text per document).
    """
    hashes = F.col(hashes) if isinstance(hashes, str) else hashes
    # sequence(1, 0) generates a *descending* [1, 0] — guard empty input
    return F.when(
        F.size(hashes) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(hashes)),
            lambda i: F.element_at(hashes, i) * F.lit(_POS_LANE)
            + (F.lit(_POS_LANE - 1) - i),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_select_col(enc, w: int = 8) -> Column:
    """Winnowing selection over the packed-encoding column: each window of
    w consecutive grams contributes ``array_min(slice(enc, t, w))`` — one
    builtin call per window, no lambda aggregate, no struct churn (the
    first formulation used a per-window struct-CASE aggregate; interpreted
    higher-order lambdas made it ~4x slower) — then overlapping windows'
    picks are de-duplicated.

    Documents with fewer than w grams get one window over all their grams
    (slice() clamps), so every document with >= 1 gram has >= 1
    fingerprint. Returns array<bigint> of packed (fp, pos) encodings —
    decode with fp_from_enc / pos_from_enc.
    """
    enc = F.col(enc) if isinstance(enc, str) else enc
    sel = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(enc) - w + 1, F.lit(1))),
        lambda t: F.array_min(F.slice(enc, t, w)),
    )
    return F.when(F.size(enc) >= 1, F.array_distinct(sel)).otherwise(
        F.array().cast("array<bigint>")
    )


def fp_from_enc(e) -> Column:
    e = F.col(e) if isinstance(e, str) else e
    return F.shiftright(e, 31)


def pos_from_enc(e) -> Column:
    e = F.col(e) if isinstance(e, str) else e
    return (F.lit(_POS_LANE - 1) - e.bitwiseAND(F.lit(_POS_LANE - 1))).cast(
        "int"
    )


def winnow_col(text, k: int = 8, w: int = 8) -> Column:
    """The whole winnowing kernel as ONE let-bound column expression:
    normalize -> codes -> gram hashes -> packed encodings -> window-min
    selection, each stage named once via ``_let``. Returns the selected
    array<bigint> of packed (fp, pos) encodings (de-duplicated, window
    order) — decode with fp_from_enc / pos_from_enc."""
    return _let(
        _norm_col(text),
        lambda norm: _let(
            codes_col(norm),
            lambda codes: _let(
                gram_hash_col(codes, k),
                lambda h: _let(
                    gram_enc_col(h),
                    lambda enc: winnow_select_col(enc, w),
                ),
            ),
        ),
    )


def _winnow_arrow_fn(k: int, w: int, id_col: str, text_col: str):
    """mapInPandas kernel: the SAME fingerprint function as winnow_col,
    vectorized with numpy per document (~10 numpy ops per doc regardless
    of length: sliding_window_view for both the polynomial and the
    window-min). Bit-identical to the expression form — pinned by pytest
    and by sharing the driver oracle."""
    import re as _re

    import numpy as np
    import pandas as pd

    pows = np.array(_pows(k), dtype=np.uint64)
    lane = np.uint64(_POS_LANE)
    lmask = np.uint64(_POS_LANE - 1)
    # Java \s (Spark regexp_replace) = [ \t\n\x0B\f\r]; Python str \s also
    # matches unicode spaces — use the explicit Java class. F.trim strips
    # spaces only; ASCII lower() agrees between the JVM and Python.
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def fn(batches):
        for pdf in batches:
            out = {"doc_id": [], "pos": [], "fp": []}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                norm = ws.sub(" ", (text or "").strip(" ").lower())
                if len(norm) < k:
                    continue
                codes = np.frombuffer(
                    norm.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                grams = np.lib.stride_tricks.sliding_window_view(codes, k)
                # codepoints < 2^21, pows < 2^32, k terms: sum < 2^56 — the
                # uint64 accumulation is exact, the AND is the exact mod
                h = (grams * pows).sum(axis=1) & np.uint64(WINNOW_MASK)
                pos = np.arange(1, h.size + 1, dtype=np.uint64)
                enc = h * lane + (lmask - pos)
                if enc.size >= w:
                    mins = np.lib.stride_tricks.sliding_window_view(
                        enc, w
                    ).min(axis=1)
                else:
                    mins = enc.min(keepdims=True)
                sel = np.unique(mins)
                out["doc_id"].append(np.full(sel.size, doc_id))
                out["pos"].append(
                    (lmask - (sel & lmask)).astype(np.int32)
                )
                out["fp"].append((sel >> np.uint64(31)).astype(np.int64))
            if out["doc_id"]:
                yield pd.DataFrame(
                    {c: np.concatenate(v) for c, v in out.items()}
                )

    return fn


def winnow_fingerprint_table(
    docs: DataFrame,
    k: int = 8,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "expr",
) -> DataFrame:
    """(doc_id, pos, fp) — one row per selected fingerprint.

    ``impl="expr"`` (default): one narrow projection + explode, zero
    shuffles, zero Python — the portable/oracle form. Interpreted
    higher-order lambdas put its throughput around 0.3 MB/s/core.

    ``impl="arrow"``: the production path — ONE mapInPandas stage running
    the numpy-vectorized twin (~10 numpy calls per document); same
    fingerprints bit-for-bit (shared driver oracle + equality pytest),
    ~5x the throughput at sf0.1 and the gap widens with document length
    (numpy work is O(len) with tiny constants vs per-element interpreted
    lambdas). Both are zero-shuffle map stages, so the 100 TB story is
    identical: cost scales with bytes scanned, no hot keys."""
    from .parallel import spread_for_map

    if impl == "arrow":
        src = spread_for_map(
            docs.select(
                F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
            )
        )
        return src.mapInPandas(
            _winnow_arrow_fn(k, w, id_col, text_col),
            schema="doc_id long, pos int, fp long",
        )
    # r7: spread the source before the per-doc kernel — a single-row-group
    # corpus file otherwise runs the whole chain in ONE task (guide §2.5)
    d = spread_for_map(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col).alias("doc_id"), winnow_col(text_col, k, w).alias("sel")
    )
    # explode_outer, NOT explode: plain explode injects a `size(sel) > 0 AND
    # isnotnull(sel)` Filter BELOW the Generate, and both predicates inline
    # the ENTIRE kernel expression — three evaluations per row (measured
    # 3x wall). explode_outer plans no such filter; empty docs surface as
    # one null row and are dropped by a cheap post-Generate predicate.
    return (
        d.select("doc_id", F.explode_outer("sel").alias("e"))
        .where(F.col("e").isNotNull())
        .select(
            "doc_id",
            pos_from_enc("e").alias("pos"),
            fp_from_enc("e").alias("fp"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 8,
    threshold_num: int = 1,
    threshold_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
    fps: DataFrame | None = None,
    impl: str = "expr",
) -> DataFrame:
    """Near-dup pairs by winnowing-fingerprint overlap.

    Jaccard over the documents' distinct fingerprint SETS, evaluated in
    exact integer arithmetic (den*|A∩B| >= num*|A∪B|). Returns
    (doc_a, doc_b, n_common, n_union).

    Same scale posture as dedup.ngram_jaccard_pairs: inverted index on
    fp, self-join shuffles once on the fp key, counts are map-side
    combined; ``max_doc_freq`` caps ubiquitous fingerprints (boilerplate)
    that would otherwise create quadratic buckets — capped fps are
    excluded from BOTH the intersection and the per-doc set sizes, a
    well-defined semantic the oracle mirrors. Winnowing keeps only
    ~2/(w+1) of gram hashes, so the exploded index is ~(w+1)/2 x smaller
    than the equivalent character-shingle index before any capping.

    ``fps``: optionally pass a pre-built distinct (doc, fp) table — build
    it once with ``winnow_fingerprint_table(...).select(col(id).alias
    ('doc'), 'fp').distinct()`` and ``.persist()`` it when composing
    several fingerprint consumers, exactly like dedup.shingle_table's
    ``shingles=`` (the declarative plan otherwise recomputes the
    fingerprint kernel once per use: rare-fp cap, sizes, and both join
    sides).
    """
    if fps is None:
        fps = (
            winnow_fingerprint_table(docs, k, w, id_col, text_col, impl=impl)
            .select(F.col("doc_id").alias("doc"), "fp")
            .distinct()
        )
    if max_doc_freq is not None:
        # anti-join the tiny ubiquitous set instead of inner-joining the
        # near-full rare set (r7 — see dedup.ngram_jaccard_pairs): same
        # rows, one broadcastable exchange instead of a full-table shuffle
        ubiq = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_doc_freq)
            .select("fp")
        )
        fps = fps.join(ubiq, "fp", "left_anti")
    sizes = fps.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
    inter = (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a"), "doc_a")
        .withColumnRenamed("n_fp", "n_a")
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed(
                "n_fp", "n_b"
            ),
            "doc_b",
        )
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .where(
            F.col("n_common") * threshold_den
            >= F.col("n_union") * threshold_num
        )
        .select("doc_a", "doc_b", "n_common", "n_union")
    )


# ---------------------------------------------------------------------------
# DuckDB twins (keep in lockstep with the column kernels above)
# ---------------------------------------------------------------------------

def winnow_fingerprint_sql(
    k: int = 8, w: int = 8, table: str = "documents"
) -> str:
    """DuckDB CTE chain ending in ``fp(doc_id, pos, fp)`` — the twin of
    winnow_fingerprint_table.

    Same polynomial (unrolled with the same precomputed powers), same
    packed encoding v = h*2^31 + (2^31-1-pos), so the same plain
    ``list_min`` per window implements min-hash-at-rightmost-position.
    """
    norm = NORM_SQL.format(t="text")
    pows = _pows(k)
    lane, lmask = _POS_LANE, _POS_LANE - 1
    terms = " + ".join(
        f"CAST(ord(substr(norm, i + {j}, 1)) AS BIGINT) * {p}"
        for j, p in enumerate(pows)
    )
    return (
        f"WITH t AS (SELECT doc_id, {norm} AS norm FROM {table}),\n"
        f"g AS (SELECT doc_id,\n"
        f"  list_transform(range(1, len(norm) - {k} + 2),\n"
        f"    i -> ({terms}) & {WINNOW_MASK}) AS h\n"
        f"  FROM t WHERE len(norm) >= {k}),\n"
        f"enc AS (SELECT doc_id, list_transform(range(1, len(h) + 1),\n"
        f"    i -> h[i] * {lane} + ({lmask} - i)) AS e FROM g),\n"
        f"sel AS (SELECT doc_id, unnest(list_distinct(list_transform(\n"
        f"    range(1, greatest(len(e) - {w} + 1, 1) + 1),\n"
        f"    s -> list_min(e[s:s+{w - 1}])))) AS v\n"
        f"  FROM enc),\n"
        f"fp AS (SELECT doc_id, CAST({lmask} - (v & {lmask}) AS INTEGER)"
        f" AS pos,\n"
        f"  v >> 31 AS fp FROM sel)"
    )


def winnow_overlap_sql(
    k: int = 8,
    w: int = 8,
    threshold_num: int = 1,
    threshold_den: int = 2,
    table: str = "documents",
    max_doc_freq: int | None = None,
) -> str:
    """DuckDB twin of winnow_overlap_pairs (full query)."""
    base = winnow_fingerprint_sql(k, w, table)
    dfcap = (
        f",\nrare AS (SELECT fp FROM d GROUP BY fp"
        f" HAVING count(*) <= {max_doc_freq}),\n"
        f"dd AS (SELECT d.* FROM d JOIN rare USING (fp))"
        if max_doc_freq is not None
        else ",\ndd AS (SELECT * FROM d)"
    )
    return (
        base
        + ",\nd AS (SELECT DISTINCT doc_id AS doc, fp FROM fp)"
        + dfcap
        + (
            ",\nsz AS (SELECT doc, count(*) AS n_fp FROM dd GROUP BY doc),\n"
            "inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b,"
            " count(*) AS n_common\n"
            "  FROM dd a JOIN dd b ON a.fp = b.fp AND a.doc < b.doc\n"
            "  GROUP BY 1, 2)\n"
            "SELECT doc_a, doc_b, n_common,\n"
            "  sa.n_fp + sb.n_fp - n_common AS n_union\n"
            "FROM inter JOIN sz sa ON sa.doc = doc_a"
            " JOIN sz sb ON sb.doc = doc_b\n"
            f"WHERE n_common * {threshold_den}"
            f" >= (sa.n_fp + sb.n_fp - n_common) * {threshold_num}"
        )
    )
