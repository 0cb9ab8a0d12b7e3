#!/usr/bin/env python3
"""Dev-side oracle comparator mimicking the driver's t2 gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Registers each TESTDATA parquet as a DuckDB view, runs every SQL from
oracle_sql.json, reads the Spark result parquet for the same query name,
sorts columns by name and rows by all columns, and compares exactly.
"""
import duckdb, glob, json, pathlib, sys

import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize timestamp resolutions for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        con.execute(f"CREATE VIEW {pathlib.Path(p).stem} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            e_, g_ = exp[c], got[c]
            if e_.dtype != g_.dtype:
                bad.append(f"{c}: dtype exp={e_.dtype} got={g_.dtype}")
                continue
            if np.issubdtype(e_.dtype, np.floating):
                both_nan = e_.isna() & g_.isna()
                eq = (e_ == g_) | both_nan
                if not eq.all():
                    d = (e_ - g_).abs().max()
                    bad.append(f"{c}: {int((~eq).sum())} diffs, max abs {d}")
            else:
                eq = (e_ == g_) | (e_.isna() & g_.isna())
                if not eq.all():
                    i = int(np.argmax(~eq.values))
                    bad.append(f"{c}: {int((~eq).sum())} diffs, first at row {i}: exp={e_.iloc[i]!r} got={g_.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
