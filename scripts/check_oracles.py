"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() in DuckDB (tables registered
as views), then compare row count, schema (column names), and values
(rows sorted, columns sorted by name, dtype-sensitive stringification — so
a BIGINT/HUGEINT artifact shows up here before the driver sees it).

Usage: python scripts/check_oracles.py [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df


def cell(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    return str(v)


def compare(name, spark_df, oracle_df):
    s, o = canon(spark_df), canon(oracle_df)
    out = {"query": name, "rows": (len(s), len(o)),
           "rows_match": len(s) == len(o),
           "schema_match": list(s.columns) == list(o.columns),
           "dtype_mismatch": [], "value_match": None}
    for c in s.columns:
        if c in o.columns:
            s_int = pd.api.types.is_integer_dtype(s[c])
            o_int = pd.api.types.is_integer_dtype(o[c])
            s_f = pd.api.types.is_float_dtype(s[c])
            o_f = pd.api.types.is_float_dtype(o[c])
            if (s_int, s_f) != (o_int, o_f):
                out["dtype_mismatch"].append((c, str(s[c].dtype), str(o[c].dtype)))
    if out["rows_match"] and out["schema_match"]:
        eq = True
        for c in s.columns:
            sv = [cell(v) for v in s[c]]
            ov = [cell(v) for v in o[c]]
            if sv != ov:
                eq = False
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b][:3]
                out.setdefault("diffs", []).append((c, bad))
        out["value_match"] = eq
    return out


def main(argv):
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(argv) or set(oracles)
    n_bad = 0
    for name in qs:
        if name not in oracles or name not in only:
            continue
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        r = compare(name, sdf, odf)
        ok = r["rows_match"] and r["schema_match"] and r["value_match"] \
            and not r["dtype_mismatch"]
        if not ok:
            n_bad += 1
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={r['rows']}"
              + ("" if not r["dtype_mismatch"] else f" dtypes={r['dtype_mismatch']}")
              + ("" if r.get("value_match") in (True, None) else f" diffs={r.get('diffs')}")
              + ("" if r["schema_match"] else
                 f" schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"))
    print(f"\n{'ALL OK' if n_bad == 0 else f'{n_bad} FAILING'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
