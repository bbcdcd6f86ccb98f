#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name>/ parquet (Spark result), runs the matching SQL
from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, and
compares as multisets with columns sorted by name.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # unify ints
        if str(df[c].dtype) in ("int32","uint32","int16","Int64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a query that FAILED in Verify leaves no output dir at all — that
    # must read as a failure here, not silently shrink the denominator
    for missing in sorted(set(oracle) - set(names)):
        results[missing] = "NO_OUTPUT_DIR (query failed in Verify?)"
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            results[name] = f"rows_only({len(got)})"; continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
            continue
        if g.equals(e):
            results[name] = "OK"
        else:
            # find first differing cell for debugging
            diff_cols = [c for c in g.columns if not g[c].equals(e[c])]
            detail = []
            for c in diff_cols[:3]:
                mask = g[c] != e[c]
                # nan != nan
                if str(g[c].dtype).startswith("float"):
                    mask = ~((g[c] == e[c]) | (g[c].isna() & e[c].isna()))
                idx = mask.idxmax() if mask.any() else None
                if idx is not None and mask.any():
                    detail.append(f"{c}[{idx}]: spark={g[c][idx]!r} duck={e[c][idx]!r} (n={int(mask.sum())})")
            if not detail:
                results[name] = "OK"   # only NaN-vs-NaN artifacts
            else:
                results[name] = "VALUE_MISMATCH " + "; ".join(detail)
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v=='OK' else 'INFO' if v.startswith('rows_only') else 'FAIL'} {k}: {v}")
    print(f"== {ok} OK / {len([v for v in results.values() if not v.startswith('rows_only')])} checked, {len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
