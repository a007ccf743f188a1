#!/usr/bin/env python3
"""Compare two graft.Verify dumps query by query in DuckDB.

Purpose: transfer an oracle-green verdict across a refactor at SFs
where re-running the full DuckDB oracle is expensive. If the old
dump was oracle-checked green and the new dump is row-for-row
identical to it (symmetric EXCEPT ALL empty in both directions +
equal counts + same columns), the green verdict applies to the new
binary's output too.

Usage: python3 tools/dump_compare.py <oldDir> <newDir> name1,name2,...

Developer tooling only — never runs on the cluster.
"""
import sys
from pathlib import Path

import duckdb


def main(old_dir: str, new_dir: str, names: str) -> int:
    con = duckdb.connect()
    fails = 0
    for name in names.split(","):
        a = Path(old_dir) / name
        b = Path(new_dir) / name
        if not a.exists() or not b.exists():
            print(f"[MISS] {name}: old={a.exists()} new={b.exists()}")
            fails += 1
            continue
        cols_a = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{a}/*.parquet')").fetchall()]
        cols_b = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{b}/*.parquet')").fetchall()]
        if sorted(cols_a) != sorted(cols_b):
            print(f"[COLS] {name}: {sorted(cols_a)} vs {sorted(cols_b)}")
            fails += 1
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(cols_a))
        na = con.execute(
            f"SELECT count(*) FROM read_parquet('{a}/*.parquet')").fetchone()[0]
        nb = con.execute(
            f"SELECT count(*) FROM read_parquet('{b}/*.parquet')").fetchone()[0]
        if na != nb:
            print(f"[ROWS] {name}: old={na} new={nb}")
            fails += 1
            continue
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM read_parquet('{a}/*.parquet') "
            f"EXCEPT ALL SELECT {cols} FROM read_parquet('{b}/*.parquet'))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM read_parquet('{b}/*.parquet') "
            f"EXCEPT ALL SELECT {cols} FROM read_parquet('{a}/*.parquet'))").fetchone()[0]
        if d1 or d2:
            print(f"[DIFF] {name}: old-only={d1} new-only={d2}")
            fails += 1
        else:
            print(f"[ OK ] {name}: {na} rows identical")
    print(f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
