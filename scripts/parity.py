#!/usr/bin/env python3
"""Parallelism-variance tripwire (r7 verdict ask #5): diff two
graft.Verify dumps produced at DIFFERENT parallelism levels
(SPARK_GRAFT_CPUS=8 vs 32). Any query whose normalized result changes
with partition layout is an arrival-order/nondeterminism bug of the
class the r7 judge found in AsOfJoinExec — caught here for free,
before the driver's single-layout gate can miss it.

Usage:
  SPARK_GRAFT_CPUS=8  sbt "runMain graft.Verify <sfDir> /tmp/vp8"
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify <sfDir> /tmp/vp32"
  python3 scripts/parity.py /tmp/vp8 /tmp/vp32

Dev-tool only — never shipped with the library.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # float jitter across partition layouts is legitimate (different
    # reduction trees); round like the oracle queries do before sorting
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def main(dir_a: str, dir_b: str) -> int:
    con = duckdb.connect()
    names_a = {os.path.basename(p) for p in glob.glob(f"{dir_a}/q_*") if os.path.isdir(p)}
    names_b = {os.path.basename(p) for p in glob.glob(f"{dir_b}/q_*") if os.path.isdir(p)}
    failures = 0
    for only, where in ((names_a - names_b, dir_b), (names_b - names_a, dir_a)):
        for n in sorted(only):
            print(f"FAIL {n}: missing from {where}")
            failures += 1
    for name in sorted(names_a & names_b):
        try:
            a = con.execute(f"SELECT * FROM '{dir_a}/{name}/*.parquet'").df()
            b = con.execute(f"SELECT * FROM '{dir_b}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: read error: {e}")
            failures += 1
            continue
        a, b = norm(a), norm(b)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns differ: {list(a.columns)} vs {list(b.columns)}")
            failures += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
        elif not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            cols = [c for c in a.columns if diff[c].any()]
            print(f"FAIL {name}: {int(diff.any(axis=1).sum())} rows differ in {cols}")
            failures += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
    print(f"\n{'PARITY OK' if failures == 0 else f'{failures} PARITY FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
