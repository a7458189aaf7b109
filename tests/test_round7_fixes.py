"""r7 optimization-round pins: every rewrite that changed an operator's
internals must produce bit-identical rows to the form it replaced."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def spark():
    from cdx_toolkit_spark.session import get_spark

    s = get_spark("test_r7", cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def _synth_expr_reference(spark, n, offset=0):
    """The synth generator's arithmetic, restated independently — a spec
    pin for the fixture (r7 evaluated a vectorized mapInPandas rewrite
    against this reference; A/B showed no win — serial 3-epoch walls
    29.2/33.2/27.0 s numpy vs 28.3/24.3/26.9 s expression, the extra
    Python stage costing what the stable codegen source saved — so the
    expression form stays; see OPTIMIZATION_r07.md)."""
    u = max(n * 9 // 10, 1)
    df = spark.range(offset, offset + n)
    uid = F.lit(offset) + F.pmod(F.col("id") - offset, F.lit(u))
    if offset > 0:
        uid = F.when(
            F.pmod(F.col("id"), F.lit(10)) == 9,
            F.greatest(uid - F.lit(n), F.lit(0)),
        ).otherwise(uid)
    df = df.withColumn("uid", uid)
    host = F.when(
        F.pmod(F.col("uid"), F.lit(10)) < 4, F.lit("hot-cdn.example.com")
    ).otherwise(
        F.concat(
            F.lit("site"),
            F.pmod(F.col("uid") * 2654435761, F.lit(max(n // 50, 1) | 1)),
            F.lit(".example.org"),
        )
    )
    scheme = (
        F.when(F.pmod(F.col("id"), F.lit(17)) == 0, F.lit("https://www."))
        .otherwise(F.lit("http://"))
    )
    url = F.concat(scheme, host, F.lit("/page/"), F.col("uid").cast("string"))
    return df.select(
        url.alias("url"),
        F.pmod(F.col("id"), F.lit(3)).cast("int").alias("priority"),
        (F.col("id") % 1000).cast("long").alias("discovered_ts"),
    )


@pytest.mark.parametrize("offset", [0, 100_000])
def test_synth_vectorized_matches_expression_form(spark, offset):
    from cdx_toolkit_spark.frontier.synth import synth_candidates

    n = 100_000
    new = synth_candidates(spark, n, offset=offset)
    ref = _synth_expr_reference(spark, n, offset=offset)
    assert new.schema == ref.schema
    assert _rowset(new) == _rowset(ref)


def test_lang_id_arrow_matches_expression_form(spark):
    from cdx_toolkit_spark import textkit

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    arrow = textkit.lang_id_table(docs, impl="arrow")
    expr = textkit.lang_id_table(docs, impl="expr")
    assert [f.name for f in arrow.schema] == [f.name for f in expr.schema]
    assert _rowset(arrow) == _rowset(expr)


def test_bloom_probe_direct_path_matches_cogroup(spark, tmp_path):
    """The opt-in direct (worker-cached) probe and the cogroup probe must
    flag identically, and the cogroup path must keep one flag row per hash
    without the removed distinct (join multiplicity invariant)."""
    from cdx_toolkit_spark.frontier.bloom import BloomShardStore

    store = BloomShardStore(
        spark, str(tmp_path / "bloom"), n_shards=4, m_bits=1 << 14
    )
    keys = spark.range(0, 2000).select(
        (F.col("id") * 7919).alias("url_hash")
    )
    store.build(keys, "url_hash")
    # half-seen probe set, WITH duplicate hashes to exercise multiplicity
    probe = spark.range(1000, 3000).select(
        (F.col("id") * 7919).alias("url_hash")
    )
    probe = probe.unionByName(probe.limit(50))
    store.probe_broadcast_bytes = 0
    cogroup = _rowset(store.probe(probe, "url_hash"))
    assert len(cogroup) == 2050  # every input row kept exactly once
    store.probe_broadcast_bytes = 256 << 20
    direct = _rowset(store.probe(probe, "url_hash"))
    assert cogroup == direct
    # zero false negatives on the seen half
    seen_flags = [
        f for h, f in cogroup if (h // 7919) < 2000 and h % 7919 == 0
    ]
    assert all(seen_flags)


def test_spread_for_map_is_noop_when_parallel_enough(spark):
    from cdx_toolkit_spark.parallel import spread_for_map

    df = spark.range(0, 1000)  # range already yields >= default parallelism
    n0 = df.rdd.getNumPartitions()
    out = spread_for_map(df, target=n0)
    assert out is df  # no-op: no exchange added at scale
    narrow = df.coalesce(1)
    spread = spread_for_map(narrow, target=4)
    assert spread.rdd.getNumPartitions() == 4
    assert sorted(r[0] for r in spread.collect()) == list(range(1000))
