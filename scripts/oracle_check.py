#!/usr/bin/env python3
"""Dtype-strict DuckDB oracle cross-check for graft.Verify output.

Replicates the driver's compare (sorted columns, sorted rows, per-column
values) and ADDITIONALLY fails on pandas dtype mismatches — the exact gap
that let round 3's `p_ngram_corrected_sfs` HUGEINT leak ship: values were
equal (29 == 29.0) but the driver's hash of int64 vs float64 differed.

Usage:
    python3 scripts/oracle_check.py [sf_dir] [verify_out_dir]
Defaults: /root/testdata/sf0.001 /tmp/verify_out

Exit 0 only if every oracle-backed query matches rows, schema, VALUES and
DTYPES. Keys ending in `.parquet` in oracle_sql.json are the driver's twin
aliases and are skipped (same SQL under the bare name).
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "documents", "embeddings", "events", "lineitem", "orders",
    "part", "customer", "supplier", "nation", "region",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, exp: pd.DataFrame, got: pd.DataFrame) -> list:
    problems = []
    if list(exp.columns) != list(got.columns):
        problems.append(f"schema: oracle={list(exp.columns)} spark={list(got.columns)}")
        return problems
    if len(exp) != len(got):
        problems.append(f"rows: oracle={len(exp)} spark={len(got)}")
        return problems
    for c in exp.columns:
        # The driver's hash normalizes integer WIDTH (r_ntile int32 vs
        # int64 passed in r03) but NOT KIND: float64 29.0 vs int64 29
        # failed (p_ngram_corrected_sfs HUGEINT leak). So compare dtype
        # kind (i/u together as integer; f float; O object; b bool).
        kind = lambda d: "i" if d.kind in "iu" else d.kind
        if kind(exp[c].dtype) != kind(got[c].dtype):
            problems.append(f"dtype[{c}]: oracle={exp[c].dtype} spark={got[c].dtype}")
        eq = np.array_equal(exp[c].values, got[c].values)
        if not eq:
            try:
                eq = bool((exp[c].astype(str) == got[c].astype(str)).all())
            except Exception:
                eq = False
        if not eq:
            bad = [i for i in range(len(exp)) if str(exp[c].iloc[i]) != str(got[c].iloc[i])][:3]
            sample = "; ".join(
                f"row {i}: oracle={exp[c].iloc[i]!r} spark={got[c].iloc[i]!r}" for i in bad
            )
            problems.append(f"values[{c}]: {sample}")
    return problems


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name.endswith(".parquet"):
            continue  # driver twin key
        try:
            exp = normalize(con.sql(sql).df())
            got = normalize(pd.read_parquet(f"{out}/{name}.parquet"))
            problems = compare(name, exp, got)
        except Exception as e:
            problems = [f"err: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{n_ok} OK / {n_fail} FAIL (dtype-strict)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
