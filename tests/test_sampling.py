"""Deterministic sampling / rebalancing (sampling.py) + the generalized
exchange-free grouped rank (rank.py)."""

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdx_toolkit_spark import rank, sampling


def _docs(spark, n=400, n_parts=None):
    rows = [
        (i, ["en", "en", "en", "en", "en", "de", "fr", "zh"][i % 8], f"t{i}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    return df.repartition(n_parts) if n_parts else df


# --- grouped_rank ----------------------------------------------------------

def test_grouped_rank_equals_window_row_number(spark):
    df = _docs(spark, 300).withColumn(
        "bucket", sampling.sample_bucket_col("doc_id", 7)
    )
    got = {
        r.doc_id: r.rk
        for r in rank.grouped_rank(
            df, ["lang"], ["bucket", "doc_id"], rank_col="rk", n_range_parts=5
        ).collect()
    }
    w = Window.partitionBy("lang").orderBy("bucket", "doc_id")
    want = {
        r.doc_id: r.rk - 1
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_grouped_rank_partitioning_invariant(spark):
    a = rank.grouped_rank(
        _docs(spark, 200, n_parts=1), ["lang"], ["doc_id"], n_range_parts=1
    )
    b = rank.grouped_rank(
        _docs(spark, 200, n_parts=13), ["lang"], ["doc_id"], n_range_parts=7
    )
    assert {(r.doc_id, r["rank"]) for r in a.collect()} == {
        (r.doc_id, r["rank"]) for r in b.collect()
    }


# --- hash_sample -----------------------------------------------------------

def test_hash_sample_deterministic_and_seeded(spark):
    d = _docs(spark, 400)
    a = {r.doc_id for r in sampling.hash_sample(d, 0.3, seed=1).collect()}
    b = {r.doc_id for r in sampling.hash_sample(d, 0.3, seed=1).collect()}
    c = {r.doc_id for r in sampling.hash_sample(d, 0.3, seed=2).collect()}
    assert a == b
    assert a != c
    assert 0.2 < len(a) / 400 < 0.4
    # nesting: fraction f1 then f2 on the SAME seed is the min threshold
    ab = {r.doc_id for r in sampling.hash_sample(d, 0.1, seed=1).collect()}
    assert ab <= a


def test_hash_sample_bounds(spark):
    d = _docs(spark, 50)
    assert sampling.hash_sample(d, 0.0).count() == 0
    assert sampling.hash_sample(d, 1.0).count() == 50
    with pytest.raises(ValueError, match="fraction"):
        sampling.hash_sample(d, 1.5)


# --- group_quota_sample ----------------------------------------------------

def test_group_quota_caps_and_passthrough(spark):
    d = _docs(spark, 400)  # en: 250, others: 50 each
    out = sampling.group_quota_sample(d, "lang", quota=40, seed=3)
    by_lang = {
        r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == 40          # capped
    assert by_lang["de"] == 40 and by_lang["fr"] == 40
    assert by_lang["zh"] == 40
    # full schema preserved
    assert out.columns == d.columns


def test_group_quota_under_quota_group_intact(spark):
    d = _docs(spark, 80)  # 10 per non-en lang
    out = sampling.group_quota_sample(d, "lang", quota=100)
    assert out.count() == 80


def test_group_quota_matches_sql_twin(spark):
    d = _docs(spark, 240)
    got = {
        (r.doc_id, r.lang)
        for r in sampling.group_quota_sample(d, "lang", 15, seed=5).collect()
    }
    con = duckdb.connect()
    con.register("docs", d.toPandas())
    sql = sampling.group_quota_sample_sql("docs", "lang", 15, seed=5)
    want = {(r[0], r[1]) for r in con.sql(sql).fetchall()}
    assert got == want


# --- temperature_rebalance -------------------------------------------------

def test_temperature_alpha1_identity(spark):
    d = _docs(spark, 160)
    out = sampling.temperature_rebalance(d, "lang", alpha=1.0)
    assert out.count() == 160
    assert out.agg(F.max("copy")).first()[0] == 1


def test_temperature_alpha0_equalizes(spark):
    d = _docs(spark, 400)  # en 250 / de,fr,zh 50
    w = {
        r.lang: r.factor
        for r in sampling.temperature_weights(d, "lang", alpha=0.0).collect()
    }
    # share 1/4 each, target 400 -> 100 per group
    assert w["en"] == pytest.approx(100 / 250)
    assert w["de"] == pytest.approx(100 / 50)
    out = sampling.temperature_rebalance(d, "lang", alpha=0.0, seed=11)
    n = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # expectation 100 per group; hash Bernoulli keeps it close
    for lang in ["en", "de", "fr", "zh"]:
        assert 80 <= n[lang] <= 120, n
    # upsampled groups carry copy indices; docs within stay distinct per copy
    assert out.where((F.col("lang") == "de") & (F.col("copy") == 2)).count() > 0


def test_temperature_matches_sql_twin(spark):
    d = _docs(spark, 240)
    out = sampling.temperature_rebalance(d, "lang", alpha=0.5, seed=4)
    got = {(r.doc_id, r.copy) for r in out.select("doc_id", "copy").collect()}
    con = duckdb.connect()
    con.register("docs", d.toPandas())
    sql = sampling.temperature_rebalance_sql("docs", "lang", 0.5, seed=4)
    want = {(r[0], r[-1]) for r in con.sql(sql).fetchall()}
    assert got == want


def test_temperature_validation(spark):
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_rebalance(_docs(spark, 8), "lang", alpha=-1)
