#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/miniverify.py <sfDir> <outDir> [query ...]

Reads outDir/<name>/ parquet (written by graft.Verify), runs the matching
oracle SQL from outDir/oracle_sql.json in DuckDB with views over sfDir, and
compares after sorting rows and sorting columns by name.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, oracle_df):
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"FAIL cols spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"FAIL rows spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                d = (av - bv).abs().max()
                issues.append(f"col {c}: {neq.sum()} diffs maxabs={d}")
        else:
            neq = ~((av.astype(object) == bv.astype(object)) | (av.isna() & bv.isna()))
            if neq.any():
                ex = (a[c][neq].iloc[0], b[c][neq].iloc[0])
                issues.append(f"col {c}: {neq.sum()} diffs e.g. {ex}")
    # dtype check (schema-compat proxy)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            issues.append(f"dtype {c}: spark={a[c].dtype} oracle={b[c].dtype}")
    return "OK" if not issues else "FAIL " + "; ".join(issues)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name}: FAIL no spark output ({e})")
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: FAIL oracle error: {e}")
            continue
        r = compare(name, spark_df, oracle_df)
        n_ok += r == "OK"
        print(f"{name}: {r}")
    print(f"== {n_ok}/{len(only) if only else len(oracles)} OK")


if __name__ == "__main__":
    main()
