"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and diff against its ``oracle_sql()`` via
DuckDB — row count, schema (column names/kinds), and exact values after
sorting columns by name and rows by all columns.

Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount {len(spark_df)} vs {len(oracle_df)}")
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"columns {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}")
        return problems
    a, b = canon(spark_df), canon(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                av64 = av.astype(np.float64)
                bv64 = bv.astype(np.float64)
                neq = ~((av64 == bv64) | (np.isnan(av64) & np.isnan(bv64)))
                if neq.any():
                    i = int(np.flatnonzero(neq)[0])
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, first row {i}: {av64[i]!r} vs {bv64[i]!r}"
                    )
            else:
                neq = a[c].astype(str).to_numpy() != b[c].astype(str).to_numpy()
                if neq.any():
                    i = int(np.flatnonzero(neq)[0])
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, first row {i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
                    )
    return problems


def main() -> int:
    import __spark_entry__ as e
    from lucene_solr_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        t_spark = time.monotonic() - t0
        if name not in osql:
            print(f"ok(rows-only) {name}: {len(sdf)} rows  [{t_spark:.1f}s]")
            n_pass += 1
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems) + f"  [{t_spark:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows  [{t_spark:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
