"""Sequence packing (cdx_toolkit_spark/packing.py).

Pins: hand-computed placements, the Arrow-batch carry (tiny
maxRecordsPerBatch), partitioning/parallelism invariance, empty-document
semantics, the every-pack-is-full invariant, and the DuckDB twin.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark import packing


def _docs(spark, counts, n_parts=None):
    df = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(counts)], "doc_id long, n_tokens long"
    )
    return df.repartition(n_parts) if n_parts else df


def _assign(spark, counts, budget, **kw):
    out = packing.pack_assignments(_docs(spark, counts, kw.pop("n_parts", None)),
                                   budget, **kw)
    return {r.doc_id: r for r in out.collect()}


def test_hand_computed_placement(spark):
    # tokens [3,5,2,7], budget 5 -> starts [0,3,8,10]
    a = _assign(spark, [3, 5, 2, 7], 5)
    got = {
        i: (r.seq_start, r.pack_id, r.pack_offset, r.n_packs)
        for i, r in a.items()
    }
    assert got == {
        0: (0, 0, 0, 1),
        1: (3, 0, 3, 2),   # straddles packs 0 and 1
        2: (8, 1, 3, 1),
        3: (10, 2, 0, 2),  # fills pack 2, spills 2 tokens into pack 3
    }


def test_empty_documents_occupy_nothing(spark):
    a = _assign(spark, [4, 0, 3], 8)
    assert a[1].n_packs == 0 and a[1].seq_start == 4
    assert a[2].seq_start == 4  # the empty doc shifted nothing
    segs = packing.pack_segments(_docs(spark, [4, 0, 3]), 8).collect()
    assert {r.doc_id for r in segs} == {0, 2}


def test_partitioning_and_parallelism_invariant(spark):
    counts = [(i * 7919) % 13 for i in range(300)]
    base = _assign(spark, counts, 32)
    for n_parts, n_range in [(1, 1), (17, 5), (3, 16)]:
        other = _assign(spark, counts, 32, n_parts=n_parts,
                        n_range_parts=n_range)
        assert {i: tuple(r) for i, r in other.items()} == {
            i: tuple(r) for i, r in base.items()
        }, (n_parts, n_range)


def test_carry_across_arrow_batches(spark):
    # force multi-batch partitions so _cumsum_stream's scalar carry is on
    # the hot path (same pin style as the lsh topk_stream carry test)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        counts = [1 + (i % 5) for i in range(200)]
        a = _assign(spark, counts, 16, n_range_parts=3)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # closed form: seq_start must equal the python prefix sum
    start = 0
    for i, c in enumerate(counts):
        assert a[i].seq_start == start, i
        start += c


def test_every_pack_full_except_last(spark):
    counts = [(i * 31) % 9 for i in range(150)]
    budget = 24
    segs = packing.pack_segments(_docs(spark, counts), budget).collect()
    per_pack = {}
    for r in segs:
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + r.seg_len
        assert 0 < r.seg_len <= budget
        assert 0 <= r.pack_offset < budget
    last = max(per_pack)
    assert set(per_pack) == set(range(last + 1))  # no holes
    for p, tot in per_pack.items():
        assert tot == budget or (p == last and tot <= budget), p
    # segments reconstruct each document exactly
    per_doc = {}
    for r in segs:
        per_doc.setdefault(r.doc_id, []).append((r.doc_offset, r.seg_len))
    for d, parts in per_doc.items():
        parts.sort()
        assert parts[0][0] == 0
        for (o1, l1), (o2, _) in zip(parts, parts[1:]):
            assert o1 + l1 == o2
        assert sum(l for _, l in parts) == counts[d]


def test_budget_validation(spark):
    with pytest.raises(ValueError, match="budget"):
        packing.pack_assignments(_docs(spark, [1]), 0)


@pytest.mark.parametrize("budget", [5, 64])
def test_sql_twins(spark, budget):
    counts = [(i * 17) % 11 for i in range(80)]
    vals = ", ".join(f"({i}, {c})" for i, c in enumerate(counts))
    nt_sql = f"SELECT doc_id, nt FROM (VALUES {vals}) t(doc_id, nt)"
    a = {
        tuple(r)
        for r in packing.pack_assignments(_docs(spark, counts), budget).collect()
    }
    assert a == set(
        map(tuple, duckdb.sql(packing.pack_assignments_sql(nt_sql, budget)).fetchall())
    )
    s = {
        tuple(r)
        for r in packing.pack_segments(_docs(spark, counts), budget).collect()
    }
    assert s == set(
        map(tuple, duckdb.sql(packing.pack_segments_sql(nt_sql, budget)).fetchall())
    )
