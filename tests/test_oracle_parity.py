"""Self-check of the driver's correctness gate: run every __spark_entry__
query AND its DuckDB oracle on the same parquet, compare row count, column
names, and an order-insensitive value multiset."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(rows):
    return sorted("|".join(_canon(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_all_queries_have_known_keys():
    # every oracle key must have a query; rows-only queries are allowed
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    rel = duck.sql(ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    assert spark_cols == duck_cols, f"{name}: column names differ"

    srows = [tuple(r) for r in sdf.collect()]
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _rowset(srows) == _rowset(drows), f"{name}: value multiset differs"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    # deterministic across re-builds of the same plan
    assert QUERIES[name](spark, sf_dir).count() == n


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "urlkey" in df.columns
