"""Round-4 fixes: IVF tie determinism + hot-list salting (ADVICE r3),
the per-bucket GEMM re-rank in lsh_topk (VERDICT r3 #2), and the shared
shingle frame across the near-dedup pipeline (VERDICT r3 #3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark import dedup, similarity


def _dup_embeddings(spark, n_groups=6, copies=6, dim=16, seed=5):
    """Groups of IDENTICAL vectors: exact cosine-1.0 ties at every k
    boundary — the adversarial input for tie-break contracts."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_groups, dim))
    rows = [
        (i, [float(x) for x in base[i % n_groups]])
        for i in range(n_groups * copies)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(7)


def test_ivf_duplicate_vector_ties_resolve_by_neighbor_id(spark):
    """ADVICE r3 (similarity.py:376): with duplicate vectors, the per-list
    partial top-k must break cosine ties by ascending neighbor id — pandas
    group row order is partitioning-dependent and must not leak into the
    result. Full probe => IVF must equal exact brute force, which pins the
    (-cosine, n_id) order end-to-end."""
    emb = _dup_embeddings(spark)
    ivf = sorted(
        map(tuple, similarity.ivf_topk(emb, k=3, nlist=4, nprobe=4).collect())
    )
    exact = sorted(
        map(tuple, similarity.brute_force_topk(emb, k=3).collect())
    )
    assert ivf == exact
    # closed form: each vector's top-3 are the three SMALLEST other ids of
    # its own duplicate group (cosine exactly 1.0 beats everything else)
    n_groups, copies = 6, 6
    for qid in range(n_groups * copies):
        mates = [
            i for i in range(n_groups * copies)
            if i % n_groups == qid % n_groups and i != qid
        ]
        expect = sorted(mates)[:3]
        got = [n for (q, n, r) in exact if q == qid]
        assert got == expect, f"q={qid}: {got} != {expect}"


def test_ivf_salted_equals_unsalted(spark):
    """n_salts > 1 splits hot lists across (list_id, salt) tasks; every
    (probe, member) pair must still score exactly once — results identical
    to the unsalted plan."""
    rng = np.random.default_rng(9)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(
        map(tuple, similarity.ivf_topk(emb, k=4, nlist=6, nprobe=3).collect())
    )
    b = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                emb, k=4, nlist=6, nprobe=3, n_salts=4
            ).collect(),
        )
    )
    assert a == b


def test_lsh_topk_gemm_matches_numpy_reference(spark):
    """VERDICT r3 #2: the per-bucket GEMM re-rank must reproduce the exact
    per-bucket top-k an independent driver-side numpy pass computes (same
    hyperplanes, same (-cosine, n_id) order)."""
    rng = np.random.default_rng(3)
    n, dim, n_planes, seed, k = 240, 32, 6, 42, 3
    mat = rng.standard_normal((n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    got = sorted(
        map(
            tuple,
            similarity.lsh_topk(
                emb, k=k, n_planes=n_planes, seed=seed, dim=dim
            ).collect(),
        )
    )
    # independent reference: bucket by hyperplane signs, exact cosine per
    # bucket, top-k by (-cosine, neighbor id)
    planes = similarity._hyperplanes(dim, n_planes, seed)
    signs = (mat @ planes) > 0
    bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    expect = []
    for b in np.unique(bucket):
        ids = np.where(bucket == b)[0]
        sims = norm[ids] @ norm[ids].T
        for qi, q in enumerate(ids):
            order = sorted(
                [(float(-sims[qi, ni]), int(nid))
                 for ni, nid in enumerate(ids) if nid != q]
            )[:k]
            expect.extend(
                (int(q), nid, r + 1) for r, (_, nid) in enumerate(order)
            )
    assert got == sorted(expect)


def test_lsh_topk_buckets_spanning_arrow_batches(spark):
    """The streamed bucket scorer carries a bucket that spans Arrow
    batches across batch boundaries. Force pathological batching
    (maxRecordsPerBatch=7, buckets of ~40 rows) and require identical
    results to the default batching."""
    rng = np.random.default_rng(17)
    n, dim = 200, 16
    mat = rng.standard_normal((n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(3)
    # n_planes=3 => 8 buckets over 200 rows => ~25 rows/bucket >> 7
    kw = dict(k=4, n_planes=3, seed=11, dim=dim)
    baseline = sorted(map(tuple, similarity.lsh_topk(emb, **kw).collect()))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        tiny = sorted(map(tuple, similarity.lsh_topk(emb, **kw).collect()))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert tiny == baseline


def test_ivf_external_queries_full_probe_equals_exact(spark):
    """ivf_topk(queries=Q) with full probe must equal
    brute_force_topk(corpus, queries=Q) — including the (-cosine, n_id)
    tie order — and the salted variant must match bit-for-bit."""
    rng = np.random.default_rng(31)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(240)],
        "vec_id long, embedding array<double>",
    )
    qset = spark.createDataFrame(
        [
            (1000 + i, [float(x) for x in rng.standard_normal(16)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    exact = sorted(
        map(
            tuple,
            similarity.brute_force_topk(corpus, k=3, queries=qset).collect(),
        )
    )
    ivf = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                corpus, k=3, nlist=5, nprobe=5, queries=qset
            ).collect(),
        )
    )
    assert ivf == exact
    salted = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                corpus, k=3, nlist=5, nprobe=5, queries=qset, n_salts=3
            ).collect(),
        )
    )
    assert salted == exact
    # partial probe: probe-only queries never appear as neighbors, and
    # every query still gets ranks 1..k
    part = similarity.ivf_topk(
        corpus, k=3, nlist=8, nprobe=2, queries=qset
    ).collect()
    assert all(r["neighbor_id"] < 1000 for r in part)
    assert {r["query_id"] for r in part} == {1000 + i for i in range(40)}


def test_lsh_topk_multiseed_is_exact_union_of_tables(spark):
    """seeds=(a,b) with k >= any bucket size must return exactly the UNION
    of the two single-table candidate pair sets (each pair ranked once),
    and seeds=(a,) must equal the single-seed path bit-for-bit."""
    rng = np.random.default_rng(23)
    n, dim = 150, 16
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(n_planes=4, dim=dim, k=n)  # k=n => no truncation
    single_a = similarity.lsh_topk(emb, seed=42, **kw).collect()
    single_tuple = sorted(map(tuple, single_a))
    assert single_tuple == sorted(
        map(tuple, similarity.lsh_topk(emb, seeds=(42,), **kw).collect())
    )
    single_b = similarity.lsh_topk(emb, seed=43, **kw).collect()
    multi = similarity.lsh_topk(emb, seeds=(42, 43), **kw).collect()
    pairs = lambda rows: {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert pairs(multi) == pairs(single_a) | pairs(single_b)
    assert len(multi) == len(pairs(multi))  # each pair ranked exactly once


def test_lsh_topk_external_queries_matches_numpy_reference(spark):
    """lsh_topk(queries=Q): each query's candidates are its corpus
    bucket-mates under the same hyperplanes; query-query pairs never
    score. Verified against an independent driver-side numpy pass,
    single- and multi-seed."""
    rng = np.random.default_rng(41)
    n, nq, dim, n_planes, k = 180, 25, 16, 4, 3
    cmat = rng.standard_normal((n, dim))
    qmat = rng.standard_normal((nq, dim))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in cmat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    qset = spark.createDataFrame(
        [(500 + i, [float(x) for x in qmat[i]]) for i in range(nq)],
        "vec_id long, embedding array<double>",
    )

    def ref(seed_list):
        cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        cand = {qi: set() for qi in range(nq)}
        for sd in seed_list:
            planes = similarity._hyperplanes(dim, n_planes, sd)
            cb = ((cmat @ planes) > 0) @ (1 << np.arange(n_planes))
            qb = ((qmat @ planes) > 0) @ (1 << np.arange(n_planes))
            for qi in range(nq):
                cand[qi] |= set(np.where(cb == qb[qi])[0])
        out = []
        for qi in range(nq):
            scored = sorted(
                (float(-(qn[qi] @ cn[ci])), int(ci)) for ci in cand[qi]
            )[:k]
            out.extend(
                (500 + qi, ci, r + 1) for r, (_, ci) in enumerate(scored)
            )
        return sorted(out)

    got1 = sorted(
        map(
            tuple,
            similarity.lsh_topk(
                corpus, k=k, n_planes=n_planes, seed=7, dim=dim, queries=qset
            ).collect(),
        )
    )
    assert got1 == ref([7])
    got2 = sorted(
        map(
            tuple,
            similarity.lsh_topk(
                corpus, k=k, n_planes=n_planes, dim=dim, queries=qset,
                seeds=(7, 8),
            ).collect(),
        )
    )
    assert got2 == ref([7, 8])


def test_split_assign_deterministic_and_proportional(spark):
    """split_assign_col: stable across partitionings, ratios track the
    weights, and different seeds give (near-)independent assignments."""
    from cdx_toolkit_spark import textkit

    ids = spark.range(0, 20_000).select(F.col("id").alias("doc_id"))
    a = ids.select("doc_id", textkit.split_assign_col("doc_id"))
    b = ids.repartition(13).select(
        "doc_id", textkit.split_assign_col("doc_id")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.90) < 0.01
    assert abs(counts["val"] / 20_000 - 0.05) < 0.005
    assert abs(counts["test"] / 20_000 - 0.05) < 0.005
    # a different seed reassigns ~10% of train rows away (independence)
    c = ids.select(
        "doc_id", textkit.split_assign_col("doc_id", seed=7).alias("split2")
    )
    joined = a.join(c, "doc_id")
    same = joined.where(F.col("split") == F.col("split2")).count()
    # P(same) = 0.9^2 + 0.05^2 + 0.05^2 = 0.815 under independence
    assert abs(same / 20_000 - 0.815) < 0.02


def test_shared_shingles_match_per_kernel_explode(spark, sf_dir):
    """VERDICT r3 #3: passing a shared shingle_table frame must be
    result-identical to each kernel exploding its own."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    sh = dedup.shingle_table(docs, n=3).persist()
    try:
        cand0 = dedup.minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, portable=True
        )
        cand1 = dedup.minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, portable=True, shingles=sh
        )
        c0 = sorted(map(tuple, cand0.collect()))
        assert c0 == sorted(map(tuple, cand1.collect()))
        v0 = dedup.verify_jaccard_pairs(
            docs, cand0, n=3, threshold_num=1, threshold_den=2,
            max_doc_freq=100,
        )
        v1 = dedup.verify_jaccard_pairs(
            docs, cand1, n=3, threshold_num=1, threshold_den=2,
            max_doc_freq=100, shingles=sh,
        )
        assert sorted(map(tuple, v0.collect())) == sorted(
            map(tuple, v1.collect())
        )
    finally:
        sh.unpersist()
