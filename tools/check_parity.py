#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
views for every table in <sfDir>, and compares: row count, sorted-by-
column-name schema, and a hash over all values with rows sorted.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype('datetime64[us]')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype('float64')
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('Int64')
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
            ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            results[name] = f"NO_ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
            continue
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            # the driver hashes stringified values, so int64 vs float64
            # (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64) is a real
            # mismatch ("49" vs "49.0") even when values compare equal
            if (pd.api.types.is_float_dtype(a[c]) !=
                    pd.api.types.is_float_dtype(b[c])):
                mismatch = (f"DTYPE_MISMATCH col={c} "
                            f"spark={a[c].dtype} duck={b[c].dtype}")
                break
            if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
                eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
            else:
                eq = (pd.Series(av).astype(object).where(~pd.isna(av), None) ==
                      pd.Series(bv).astype(object).where(~pd.isna(bv), None)) | (pd.isna(av) & pd.isna(bv))
                eq = np.asarray(eq)
            if not np.all(eq):
                i = int(np.argmin(eq))
                mismatch = f"VALUE_MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
                break
        results[name] = mismatch or f"OK rows={len(a)}"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL' if 'NO_ORACLE' not in v else 'SKIP':4} {k}: {v}")
    print(f"== {npass}/{len([v for v in results.values() if 'NO_ORACLE' not in v])} oracle-checked pass")

if __name__ == "__main__":
    main()
