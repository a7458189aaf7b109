"""connected_components / cc_survivors (cdx_toolkit_spark/cluster.py).

Reference semantics: component_id = min doc_id reachable through the
undirected pair graph — checked against a driver-side union-find on
deterministic random graphs, plus structural pins:
  * a chain of 256 nodes converges within a log-scale round budget
    (pointer-jumping; naive propagation would need 255 rounds),
  * results are independent of partitioning,
  * cc_survivors keeps exactly the per-component min id and passes
    untouched documents through.
"""

import random

import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark import cluster


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min id in component == root under min-union
    return {i: find(i) for i in n_ids}


def _cc_dict(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = cluster.connected_components(df, **kw).collect()
    return {r.doc_id: r.component_id for r in out}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(20260817)
    # sparse graph: many small components + one larger one
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(180)]
    edges = [e for e in edges if e[0] != e[1]]
    nodes = sorted({x for e in edges for x in e})
    expect = _union_find(nodes, edges)
    got = _cc_dict(spark, edges)
    assert got == expect


def test_cc_chain_converges_in_log_rounds(spark):
    # a path graph 0-1-2-...-255: diameter 255. Naive min-label
    # propagation needs ~255 rounds; pointer-jumping must land well
    # inside 16. max_rounds raises RuntimeError if exceeded, so passing
    # with max_rounds=16 IS the log-convergence pin.
    edges = [(i, i + 1) for i in range(255)]
    got = _cc_dict(spark, edges, max_rounds=16)
    assert got == {i: 0 for i in range(256)}


def test_cc_partitioning_invariant(spark):
    edges = [(i, i + 1) for i in range(0, 60, 2)]  # 30 two-node comps
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = {
        (r.doc_id, r.component_id)
        for r in cluster.connected_components(df.repartition(1)).collect()
    }
    b = {
        (r.doc_id, r.component_id)
        for r in cluster.connected_components(df.repartition(17)).collect()
    }
    assert a == b
    assert a == {(i, i - i % 2) for i in range(60)}


def test_cc_custom_column_names(spark):
    df = spark.createDataFrame([(5, 9), (9, 2)], "left long, right long")
    out = cluster.connected_components(df, id_a="left", id_b="right")
    got = {r.doc_id: r.component_id for r in out.collect()}
    assert got == {2: 2, 5: 2, 9: 2}


def test_cc_self_loops_and_duplicates_ignored(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.component_id
        for r in cluster.connected_components(df).collect()
    }
    # the pure self-loop (1,1) adds no node beyond the (1,2) edge
    assert got == {1: 1, 2: 1}


def test_cc_max_rounds_guard_raises(spark):
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster.connected_components(df, max_rounds=1)


def test_cc_survivors_transitive_chain(spark):
    # A~B and B~C only: pairwise doc_b-drop would keep {A}; cc keeps {A}
    # too — but with pairs (10,30),(20,30) pairwise drop keeps {10,20}
    # while the transitive closure collapses all three to {10}.
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (10, 20, 30, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(10, 30), (20, 30)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r.doc_id for r in cluster.cc_survivors(docs, pairs).collect()
    )
    assert kept == [10, 99]  # 20 is dropped transitively; 99 untouched


def test_cc_survivors_keep_by_quality(spark):
    # cluster {1,2,3}: qualities 0.2/0.9/0.9 -> keep 2 (max quality,
    # then lowest id breaks the 2-vs-3 tie); cluster {7,8}: keep 8.
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.5), (99, 0.0)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r.doc_id
        for r in cluster.cc_survivors(docs, pairs, keep_by="q").collect()
    )
    assert kept == [2, 8, 99]
    # default policy on the same graph keeps min ids
    kept_min = sorted(
        r.doc_id for r in cluster.cc_survivors(docs, pairs).collect()
    )
    assert kept_min == [1, 7, 99]


def test_cc_kept_subset_of_greedy_kept(spark, sf_dir):
    """Structural invariant tying the two survivor policies together on
    real data: a component's min id is never any pair's doc_b (doc_b >
    doc_a and pairs stay within components), so greedy keeps every cc
    survivor — cc-kept ⊆ greedy-kept, strictly smaller iff some chain has
    a non-min member that never appears as doc_b (the (10,30),(20,30)
    shape)."""
    import __spark_entry__ as E

    docs = E._docs(spark, sf_dir)
    pairs = E._verified_pairs(spark, sf_dir)
    cc_kept = {
        r.doc_id for r in cluster.cc_survivors(docs, pairs).collect()
    }
    greedy_drop = {r.doc_b for r in pairs.select("doc_b").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    greedy_kept = all_ids - greedy_drop
    assert cc_kept <= greedy_kept
    # and both keep every unpaired doc
    paired = {r.doc_a for r in pairs.select("doc_a").collect()} | greedy_drop
    assert (all_ids - paired) <= cc_kept


def test_cc_sql_twin_matches_spark(spark):
    import duckdb

    edges = [(1, 2), (2, 3), (7, 8), (5, 5), (9, 3)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r.doc_id, r.component_id)
        for r in cluster.connected_components(df).collect()
    }
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = cluster.connected_components_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_a, doc_b)"
    )
    # both sides drop pure-self-loop-only nodes: (5,5) contributes no node
    rows = duckdb.sql(sql).fetchall()
    assert set(rows) == got
    assert 5 not in {n for n, _ in rows}
