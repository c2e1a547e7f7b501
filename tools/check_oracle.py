#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet views, and
compares: row count, column names/dtypes, and exact values after sorting
columns by name and rows by all columns (mirrors the driver's
sort-columns-then-hash compare).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got.columns) != sorted(want.columns):
            problems.append(
                f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        else:
            g, w = canon(got), canon(want)
            for c in g.columns:
                if str(g[c].dtype) != str(w[c].dtype):
                    problems.append(
                        f"dtype[{c}] {g[c].dtype} != {w[c].dtype}")
            if not problems:
                neq = (g.astype(str) != w.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    problems.append(
                        f"value mismatch at sorted row {i}:\n"
                        f"  spark: {g.iloc[i].to_dict()}\n"
                        f"  duck : {w.iloc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
