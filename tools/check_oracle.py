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

# The comparison is DTYPE-STRICT between the normalized frames: the
# driver's hash compare stringifies values, so an int64 252 vs a
# float64 252.0 (e.g. DuckDB HUGEINT -> pandas float64 from an
# uncasted SUM) is a real divergence and must FAIL here too.
# (Root cause of the r10 q136/q146 driver-only mismatches: the old
# fallback reported OK when every cell was VALUE-equal across dtypes.)

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # unify integer WIDTHS (the driver does too — q46/q61 have
        # been driver-green with DuckDB TINYINT vs Spark int64 for
        # ten rounds); int-vs-FLOAT stays strict, that one the driver
        # flags (the r10 q136/q146 HUGEINT->float64 mismatch)
        if str(df[c].dtype) in ("int8","uint8","int16","uint16",
                                "int32","uint32","Int64"):
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
    diffs = {}   # machine-readable per-query diffs -> oracle_diffs.json
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
        dtype_diff = [c for c in g.columns
                      if str(g[c].dtype) != str(e[c].dtype)]
        if dtype_diff:
            results[name] = "DTYPE_MISMATCH " + "; ".join(
                f"{c}: spark={g[c].dtype} duck={e[c].dtype}"
                for c in dtype_diff[:4])
            diffs[name] = [{"col": c, "kind": "dtype",
                            "spark": str(g[c].dtype),
                            "duck": str(e[c].dtype)} for c in dtype_diff]
            continue
        if g.equals(e):
            results[name] = "OK"
        else:
            # find first differing cell for debugging
            diff_cols = [c for c in g.columns if not g[c].equals(e[c])]
            detail = []
            cell_diffs = []
            for c in diff_cols[:3]:
                mask = g[c] != e[c]
                # nan != nan
                if str(g[c].dtype).startswith("float"):
                    mask = ~((g[c] == e[c]) | (g[c].isna() & e[c].isna()))
                idx = mask.idxmax() if mask.any() else None
                if idx is not None and mask.any():
                    detail.append(f"{c}[{idx}]: spark={g[c][idx]!r} duck={e[c][idx]!r} (n={int(mask.sum())})")
                    cell_diffs.append({
                        "col": c, "kind": "value", "row": int(idx),
                        "spark": repr(g[c][idx]), "duck": repr(e[c][idx]),
                        "n_diff": int(mask.sum())})
            if not detail:
                results[name] = "OK"   # only NaN-vs-NaN artifacts
            else:
                results[name] = "VALUE_MISMATCH " + "; ".join(detail)
                diffs[name] = cell_diffs
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v=='OK' else 'INFO' if v.startswith('rows_only') else 'FAIL'} {k}: {v}")
    print(f"== {ok} OK / {len([v for v in results.values() if not v.startswith('rows_only')])} checked, {len(results)} total")
    with open(os.path.join(out_dir, "oracle_diffs.json"), "w") as f:
        json.dump({"duckdb_version": duckdb.__version__,
                   "pandas_version": pd.__version__,
                   "diffs": diffs}, f, indent=1)
    if diffs:
        print(f"(diffs written to {out_dir}/oracle_diffs.json, "
              f"duckdb {duckdb.__version__})")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
