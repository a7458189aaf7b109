"""Deduplication operators for web-text corpora.

All four dedup families are expressed as *pure DataFrame plans* — even
MinHash and SimHash, which are built from `xxhash64` + higher-order array
functions and aggregations instead of Python UDFs. At 100 TB this matters:
every kernel below stays inside whole-stage codegen, map-side partial
aggregation applies to the per-doc signature reductions, and the only
shuffles are the groupBys/joins that are information-theoretically required
(signature -> bucket, bucket -> pair).

Families:
  exact_dedup          — hash-groupBy on content fingerprint
  ngram_shingles       — word n-grams (windowed, order-preserving)
  ngram_jaccard_pairs  — exact n-gram Jaccard via inverted-index self-join
  minhash_signatures   — k min-hash values per doc (k parallel min() aggs)
  minhash_lsh_pairs    — banded LSH candidate pairs (+ optional exact verify)
  simhash_signatures   — 64-bit SimHash via bit-vote aggregation
  simhash_pairs        — Hamming-distance pairs via pigeonhole band join

Scale notes: candidate-pair joins are self-joins on low-cardinality bucket
keys; AQE skew-join handles hot buckets (enabled in session.py), and the
`doc_a < doc_b` predicate halves the pair space before the shuffle write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one representative (min id) per distinct
    normalized text; map-side combine makes this one cheap shuffle."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        docs.select(F.md5(norm).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def tokens_col(text_col: str = "text"):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def ngram_shingles_col(n: int = 3, text_col: str = "text"):
    """Array of word n-gram shingles (order-preserving, then de-duplicated).

    transform(sequence(...)) keeps the whole computation in one projected
    expression — no explode until the caller needs rows."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    # sequence(0, negative) would generate a *descending* range — guard it
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold_num: int = 8,
    threshold_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Jaccard >= num/den is evaluated as den*|A∩B| >= num*|A∪B| in *integer*
    arithmetic — exact, portable, and oracle-friendly (no float rounding).
    Returns (doc_a, doc_b, n_inter, n_union).
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(ngram_shingles_col(n, text_col)).alias("shingle"),
    ).where(F.col("shingle") != "")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .where(
            F.col("n_inter") * threshold_den >= F.col("n_union") * threshold_num
        )
        .select("doc_a", "doc_b", "n_inter", "n_union")
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """k MinHash values per document: explode shingles once, take k parallel
    min(xxhash64(shingle, seed_j)) aggregations. Entirely JVM-side; partial
    (map-side) min() means the shuffle carries k longs per doc, not shingles.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(ngram_shingles_col(n, text_col)).alias("shingle"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(j))).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Banded-LSH candidate pairs: hash each band of the signature to a
    bucket, self-join buckets. rows_per_band = num_hashes // bands.

    Returns distinct (doc_a, doc_b) candidates; callers verify with
    ngram_jaccard_pairs or accept LSH's probabilistic guarantee.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig"))
        )
    buckets = sig.select(
        F.col("doc"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    pairs = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "sig"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash_signatures(
    docs: DataFrame,
    bits: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash: per-token xxhash64, per-bit ±1 votes summed per doc,
    sign -> bit. Pure aggregation (64 conditional sums), JVM-side."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.xxhash64(F.col("tok"))
    votes = [
        F.sum(
            F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sim = None
    for i in range(bits):
        bit = F.when(
            F.col(f"v_{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("doc", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: split 64 bits into max_hamming+1 chunks; any pair
    within distance d must agree on >=1 chunk, so join per-chunk equality,
    then verify with bit_count(xor). Avoids the quadratic cross join."""
    sig = simhash_signatures(docs, 64, id_col, text_col)
    chunks = max_hamming + 1
    width = 64 // chunks
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
            .alias("key"),
        )
        for c in range(chunks)
    ]
    b = sig.select(
        "doc", "simhash", F.explode(F.array(*chunk_cols)).alias("ck")
    ).select(
        "doc", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    pairs = (
        b.alias("a")
        .join(b.alias("b"), ["chunk", "key"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine(a, b) >= threshold, a < b.

    Same blocked-GEMM layout as similarity.brute_force_topk (pack unit
    vectors into dense blocks, cross-join the block grid, one numpy matmul
    per pair of blocks) but emitting threshold survivors instead of top-k —
    the pair space is O(n^2) but per-task memory stays O(block_rows^2) and
    the output is only the near-dup edges. For 10^9+ vectors compose with
    the LSH bucketer (similarity.lsh_topk's stamp stage) to bound the grid.
    """
    import numpy as np
    import pandas as pd

    from .shipping import ensure_shipped
    from .similarity import _pack_blocks

    ensure_shipped(embeddings.sparkSession)
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    n = embeddings.count()
    nb = max(1, -(-n // block_rows))
    a = _pack_blocks(embeddings, id_col, vec_col, nb).select(
        F.col("ids").alias("a_ids"), F.col("mat").alias("a_mat"),
        F.col("n").alias("a_n"), F.col("dim").alias("dim"),
        F.col("block").alias("a_block"),
    )
    b = _pack_blocks(embeddings, id_col, vec_col, nb).select(
        F.col("ids").alias("b_ids"), F.col("mat").alias("b_mat"),
        F.col("n").alias("b_n"), F.col("block").alias("b_block"),
    )
    # upper-triangular block grid: (a_block <= b_block) halves the matmuls
    grid = a.crossJoin(b).where(F.col("a_block") <= F.col("b_block"))

    def score(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                a_ids = np.frombuffer(r.a_ids, dtype=np.int64)
                b_ids = np.frombuffer(r.b_ids, dtype=np.int64)
                if not len(a_ids) or not len(b_ids):
                    continue
                am = np.frombuffer(r.a_mat, dtype=np.float64).reshape(r.a_n, r.dim)
                bm = np.frombuffer(r.b_mat, dtype=np.float64).reshape(r.b_n, r.dim)
                sims = am @ bm.T
                ii, jj = np.where(
                    (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
                )
                if len(ii):
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_a": a_ids[ii],
                                "doc_b": b_ids[jj],
                                "cosine": sims[ii, jj],
                            }
                        )
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []}).astype(
                    {"doc_a": "int64", "doc_b": "int64", "cosine": "float64"}
                )
            )

    return grid.mapInPandas(score, "doc_a long, doc_b long, cosine double")
