"""Round-6 fixes: session-lifetime cache release (VERDICT r5 #1/#2) and
the r5 ADVICE lows (packing NULL tokens, cuckoo marker errno narrowing,
similarity release visibility)."""

import errno
import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from cdx_toolkit_spark import packing, similarity


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_caches_empties_storage(spark, sf_dir):
    """release_caches() must leave ZERO persistent RDDs: the memoized
    shingle/pair-graph persists AND the orphaned localCheckpoint blocks
    (CC rounds, politeness ranks) — BENCH_r05 showed these contending
    with the memory-hungry pipelined frontier drain (VERDICT r5 #1/#2).
    Entries rebuild fresh frames afterwards, so the driver contract is
    unaffected."""
    qs = entry_mod.queries()
    df = qs["pipeline_near_dedup_cc"](spark, sf_dir)
    n_before = df.count()  # BEFORE release: the old handle dies with it
    assert _n_persistent(spark) > 0
    res = entry_mod.release_caches(spark)
    assert res["unpersisted"] + res["swept"] > 0
    assert _n_persistent(spark) == 0
    # caches are gone, not broken: the entry rebuilds from scratch
    rebuilt = qs["pipeline_near_dedup_cc"](spark, sf_dir)
    assert rebuilt.count() == n_before
    entry_mod.release_caches(spark)
    assert _n_persistent(spark) == 0


def test_release_reports_freed_count_and_release_all_backstops(spark):
    """release() returns how many frames it freed, so the silent-no-op
    failure mode (calling it on a TRANSFORMED handle, which lacks the
    tracking attribute) is visible at the call site; release_all() frees
    the leak regardless of which handle survived (ADVICE r5)."""
    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.ivf_topk(emb, k=2, nlist=4, nprobe=2, n_salts=2)
    out.collect()
    wrapped = out.where(F.col("rank") == 1)
    assert similarity.release(wrapped) == 0  # the documented trap
    assert similarity._TRACKED  # the blocks are still pinned...
    assert similarity.release_all() >= 1  # ...and the backstop frees them
    assert not similarity._TRACKED
    # release() on the true handle reports what it freed and deregisters
    out2 = similarity.ivf_topk(emb, k=2, nlist=4, nprobe=2, n_salts=2)
    out2.collect()
    assert similarity.release(out2) >= 1
    assert not similarity._TRACKED


def test_pack_assignments_null_tokens_occupy_zero(spark):
    """A NULL token count (NULL-text doc through token_count_col) must
    behave exactly like an empty document — 0 tokens, 0 packs — instead
    of crashing the Arrow cumsum with a non-finite-cast error deep in
    mapInPandas (ADVICE r5)."""
    docs = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "doc_id long, n_tokens int"
    )
    rows = {
        r["doc_id"]: r
        for r in packing.pack_assignments(docs, budget=4).collect()
    }
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_packs"] == 0
    assert rows[2]["seq_start"] == 5  # sits between doc 1 and doc 3
    assert rows[3]["seq_start"] == 5  # the NULL doc added no tokens
    assert rows[3]["n_packs"] == 2  # tokens 5..11 span packs [4,8),[8,12)

    # end-to-end through the real tokens expression on NULL text
    from cdx_toolkit_spark import textkit

    txt = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in packing.pack_assignments(
            txt, budget=4, tokens_col=textkit.token_count_col("text")
        ).collect()
    }
    assert out[2]["n_tokens"] == 0
    assert out[3]["seq_start"] == 3


def test_pack_assignments_sql_twin_coalesces_nulls():
    """The DuckDB twin mirrors the NULL→0 coalesce (ADVICE r5)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW d AS SELECT * FROM (VALUES (1, 5), (2, NULL), (3, 7))"
        " t(doc_id, nt)"
    )
    sql = packing.pack_assignments_sql("SELECT doc_id, nt FROM d", 4)
    rows = {r[0]: r for r in con.sql(sql).fetchall()}
    assert rows[2][1] == 0 and rows[2][5] == 0  # n_tokens, n_packs
    assert rows[3][2] == 5  # seq_start unaffected by the NULL doc


def test_cuckoo_marker_write_failure_surfaces(spark, tmp_path, monkeypatch):
    """A genuine marker-write failure (ENOSPC/EIO) must raise NOW, not be
    swallowed into a later misleading 'legacy store (scheme 1)' error;
    read-only errnos stay tolerated (ADVICE r5)."""
    from cdx_toolkit_spark.frontier import cuckoo as cmod

    def boom_enospc(src, dst):
        raise OSError(errno.ENOSPC, "No space left on device")

    monkeypatch.setattr(cmod.os, "replace", boom_enospc)
    with pytest.raises(OSError) as ei:
        cmod.CuckooShardStore(
            spark, str(tmp_path / "s1"), n_shards=2, capacity=1 << 10
        )
    assert ei.value.errno == errno.ENOSPC

    def boom_eacces(src, dst):
        raise OSError(errno.EACCES, "Permission denied")

    monkeypatch.setattr(cmod.os, "replace", boom_eacces)
    store = cmod.CuckooShardStore(
        spark, str(tmp_path / "s2"), n_shards=2, capacity=1 << 10
    )
    assert store is not None  # read-only path: usable handle, no marker
    assert not os.path.isfile(
        os.path.join(str(tmp_path / "s2"), cmod._SCHEME_MARKER)
    )


def test_grid_salting_nonvacuous_at_sf_embeddings(spark, sf_dir):
    """Grid tiling pinned on the real embeddings table with a threshold
    low enough that EVERY bucket salts (the sf tables hold 500 vectors
    over 16 buckets of 19-48 rows; a larger threshold silently tests the
    unsalted plan — vacuous). Top-k ranks must be identical; the pairs
    path must produce the identical pair SET with cosines equal to
    machine epsilon (BLAS summation order differs across GEMM shapes —
    the documented multi-seed caveat)."""
    import numpy as np

    from cdx_toolkit_spark import dedup

    emb = spark.read.schema(
        "vec_id bigint, embedding array<float>, label int"
    ).parquet(f"{sf_dir}/embeddings.parquet")
    kw = dict(k=5, n_planes=4, dim=64, id_col="vec_id")
    plain = sorted(map(tuple, similarity.lsh_topk(emb, **kw).collect()))
    salted = sorted(
        map(
            tuple,
            similarity.lsh_topk(emb, **kw, hot_bucket_rows=16).collect(),
        )
    )
    assert plain == salted and len(plain) > 0

    pkw = dict(threshold=0.3, n_planes=4, dim=64, id_col="vec_id")
    p1 = {
        (r[0], r[1]): r[2]
        for r in dedup.lsh_bucketed_cosine_pairs(emb, **pkw).collect()
    }
    p2 = {
        (r[0], r[1]): r[2]
        for r in dedup.lsh_bucketed_cosine_pairs(
            emb, **pkw, hot_bucket_rows=16
        ).collect()
    }
    assert set(p1) == set(p2) and len(p1) > 0
    assert np.allclose(
        [p1[k] for k in sorted(p1)], [p2[k] for k in sorted(p1)],
        rtol=0, atol=1e-12,
    )


def test_ivf_auto_selective_no_hot_lists_is_plain(spark):
    """Selective auto (r6): a threshold above every list's member count
    must resolve to NO salting at all (max ns == 1, no hot map, no
    replicas) and still match the unsalted plan — the r5 uniform form
    would have replicated every list whenever ANY list crossed the
    threshold."""
    emb = spark.createDataFrame(
        [(i, [float((i * j) % 11 - 5) for j in range(8)]) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(k=3, nlist=4, nprobe=2)
    plain = sorted(map(tuple, similarity.ivf_topk(emb, **kw).collect()))
    auto_df = similarity.ivf_topk(
        emb, **kw, n_salts="auto", auto_salt_rows=10_000
    )
    assert auto_df._cdx_n_salts == 1
    assert sorted(map(tuple, auto_df.collect())) == plain
    similarity.release(auto_df)
