#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql over the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

from decimal import Decimal

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Spark decimal columns arrive as object-dtype Decimal while DuckDB
    # returns float64 — normalize both to float64 so the float path compares.
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: v is None or isinstance(v, Decimal)).all() \
                and df[c].notna().any():
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                af = av.astype("float64").to_numpy()
                bf = bv.astype("float64").to_numpy()
                eq = bool(np.all((np.isnan(af) & np.isnan(bf))
                                 | np.isclose(af, bf, rtol=1e-9, atol=1e-12,
                                              equal_nan=True)))
            else:
                av2 = av.astype(object).where(~av.isna(), None)
                bv2 = bv.astype(object).where(~bv.isna(), None)
                eq = all((x is None and y is None) or x == y
                         for x, y in zip(av2, bv2))
        except Exception as e:
            return f"COMPARE ERR col {c}: {e}"
        if not eq:
            mism = [(i, av.iloc[i], bv.iloc[i]) for i in range(len(av))
                    if not ((pd.isna(av.iloc[i]) and pd.isna(bv.iloc[i]))
                            or av.iloc[i] == bv.iloc[i])][:3]
            return f"VALUES col {c}: first mismatches {mism}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in
                                  sorted(glob.glob(res_dir + "/*.parquet"))],
                                 ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_bad += 1; continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb: {str(e).splitlines()[0][:200]}")
            n_bad += 1; continue
        err = compare(name, spark_df, duck_df)
        if err: print(f"FAIL {name}: {err}"); n_bad += 1
        else: print(f"OK   {name} ({len(spark_df)} rows)"); n_ok += 1
    print(f"== {n_ok} ok / {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
