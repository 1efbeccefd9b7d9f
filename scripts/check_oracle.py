"""Local stand-in for the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet dir, compare
row-count, column names, and (order-insensitively) values.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> bool:
    ok = True
    if len(spark_pdf) != len(oracle_pdf):
        print(f"  ROWS MISMATCH: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        ok = False
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        print(f"  SCHEMA MISMATCH: spark={sc} oracle={oc}")
        return False
    if not ok:
        return False
    a, b = canon(spark_pdf), canon(oracle_pdf)
    # Dtype parity matters: the driver hashes canonicalized values, and an
    # int64 Spark column vs a float64 oracle column (DuckDB HUGEINT -> pandas
    # float64) hashes differently even when every value compares equal.
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            print(f"  DTYPE MISMATCH col={c}: spark={a[c].dtype} oracle={b[c].dtype}")
            ok = False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            eq = np.array([(math.isnan(x) and math.isnan(y)) or x == y
                           for x, y in zip(av, bv)])
            if not eq.all():
                i = int(np.argmax(~eq))
                print(f"  VALUE MISMATCH col={c}: row{i} spark={av[i]!r} oracle={bv[i]!r} "
                      f"(maxdiff={np.nanmax(np.abs(av.astype(float)-bv.astype(float)))})")
                ok = False
        else:
            eq = av == bv
            if not np.asarray(eq).all():
                i = int(np.argmax(~np.asarray(eq)))
                print(f"  VALUE MISMATCH col={c}: row{i} spark={av[i]!r} oracle={bv[i]!r}")
                ok = False
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entrymod
    from t_digest_spark.plans import get_spark
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        print(f"== {name}")
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  rows-only: {len(spark_pdf)} rows")
            n_rows_only += 1
            continue
        oracle_pdf = con.execute(oracles[name]).df()
        if compare(name, spark_pdf, oracle_pdf):
            print(f"  OK ({len(spark_pdf)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
