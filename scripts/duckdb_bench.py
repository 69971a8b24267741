#!/usr/bin/env python3
"""Same-box DuckDB baseline for the bench headline (bench tooling only,
never shipped with the library).

Reads a {query_name: oracle_sql} JSON map on stdin, registers the
testdata parquet tables as views, and times each query with the same
discipline the engine side uses (min of 3 runs, results fully fetched).
Two independent draws are taken because this box's wall-clock drifts
up to ~25% run-to-run — embedding both brackets the engine/DuckDB
ratio inside the artifact instead of leaving it to prose.

Usage: python3 scripts/duckdb_bench.py <sfDir>  (oracle map on stdin)
Prints ONE json line: {"draws":[d1,d2],"queries":{name:best_sec}}
"""
import json
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def draw(con, oracles, failed):
    total = 0.0
    per = {}
    for name, sql in oracles.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception as e:  # one broken oracle must not null the whole baseline
                print(f"[duckdb_bench] {name} failed: {e}", file=sys.stderr)
                failed.add(name)
                best = float("inf")
                break
            best = min(best, time.perf_counter() - t0)
        if best != float("inf"):
            per[name] = round(best, 3)
            total += best
    return round(total, 3), per


def main(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(sys.stdin)
    failed = set()
    _, per1 = draw(con, oracles, failed)
    _, per2 = draw(con, oracles, failed)
    # Totals over the COMMON query set only, so the two draws time the
    # same workload; an empty intersection (systemic failure) emits
    # draws=null — a [0.0, 0.0] "baseline" would claim DuckDB ran the
    # suite in zero seconds.
    common = sorted(set(per1) & set(per2))
    draws = ([round(sum(per1[k] for k in common), 3),
              round(sum(per2[k] for k in common), 3)] if common else None)
    print(json.dumps({
        "draws": draws,
        "queries": {k: min(per1[k], per2[k]) for k in common},
        "failed": sorted(failed),
    }))


if __name__ == "__main__":
    main(sys.argv[1])
