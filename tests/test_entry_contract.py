"""Local replica of the driver's correctness gate: every queries() entry
with an oracle_sql() twin must match DuckDB row-for-row (order-insensitive,
columns sorted by name) on the real testdata parquet."""

import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon_value(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


SQL_CHECKED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_duckdb(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    got = _canon(spark_rows, spark_cols)
    want = _canon(duck_rows, duck_cols)
    assert len(got) == len(want), (name, len(got), len(want))
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, (name, mismatches[:5])


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", [n for n in ROWS_ONLY if n != "q21_claims_triples"])
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    ratings = {r["rating"] for r in rows}
    assert ratings <= {"TRUE", "FALSE", "MIXTURE", "OTHER"}
