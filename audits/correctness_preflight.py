"""Pre-flight the driver's correctness gate: run EVERY registered query at
sf0.01 on Spark and its DuckDB oracle side-by-side, sort columns by name and
rows by value, and compare row count + normalized values. Approximates the
driver's rows+schema+hash check (floats normalized to 12 significant digits).

Usage: python audits/correctness_preflight.py [only_query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(
                lambda v: str(sorted(v.tolist()) if False else (v.tolist() if isinstance(v, np.ndarray) else v))
            )
        elif s.dtype.kind == "f":
            df[c] = s.map(lambda v: f"{v:.12g}" if pd.notna(v) else "nan")
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF).toPandas()
        except Exception as ex:
            print(f"{name}: SPARK ERR {ex}")
            bad.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows={len(got)} (no oracle) {time.time()-t0:.1f}s")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name}: ORACLE ERR {ex}")
            bad.append(name)
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            g, x = norm(got), norm(exp)
            ok_vals = g.equals(x)
            if not ok_vals:
                diff_cols = [c for c in g.columns if not g[c].equals(x[c])]
                print(f"{name}: VALUE MISMATCH cols={diff_cols}")
                m = ~(g[diff_cols[0]] == x[diff_cols[0]])
                print("  spark:", g.loc[m, diff_cols].head(3).to_dict("records"))
                print("  oracle:", x.loc[m, diff_cols].head(3).to_dict("records"))
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            bad.append(name)
        print(
            f"{name}: {status} rows={len(got)}/{len(exp)} cols_ok={ok_cols} "
            f"{time.time()-t0:.1f}s"
        )
    print(f"\n{len(bad)} failures: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
