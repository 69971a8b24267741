#!/usr/bin/env python3
"""Local pre-verification mirroring the driver's correctness gate:
run graft.Verify output vs DuckDB oracles on the same parquet tables.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"` first)

Dev-tool only — never shipped with the library.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns differ\n  spark={list(g.columns)}\n  duck ={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        # Driver's hash is dtype-class sensitive: int64 5 != float64 5.0.
        # DuckDB sum(int) -> HUGEINT -> float64 via pandas, Spark -> int64:
        # that mismatch fails the driver even when values agree.
        kind = lambda d: "f" if d.kind == "f" else ("i" if d.kind in "iub" else d.kind)
        dt_bad = [
            c for c in g.columns if kind(g[c].dtype) != kind(e[c].dtype)
        ]
        if dt_bad:
            print(
                f"FAIL {name}: dtype class differs on {dt_bad}: "
                f"spark={[str(g[c].dtype) for c in dt_bad]} duck={[str(e[c].dtype) for c in dt_bad]}"
            )
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:500]}")
            failures += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = d.rsplit("/", 1)[-1]
        if name not in oracles:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n} rows)")
            failures += 0 if n > 0 else 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
