#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [--only name1,name2]
                              [--sql-compare name1,name2]
  <outDir> must contain <name>/ parquet dirs written by graft.Verify
  plus oracle_sql.json. Each oracle SQL is run in DuckDB against views
  named after the tables in <sfDir>; results are compared to the Spark
  parquet by (schema-insensitive) column-name-sorted value hash.
  --only restricts the compare to the named queries (local iteration
  on a partial Verify dump without 100+ [MISS] lines).
  --sql-compare uses a DuckDB symmetric-EXCEPT compare (plus row
  counts) for the named queries instead of materializing both sides
  as pandas frames — same accept/reject decision, but it scales to
  the 100M-row pair outputs of the sf1.0 slice that pandas cannot
  hold. Values compare exactly (the queries round in-plan), so
  EXCEPT-equality == the frame compare for these outputs.

This file is developer tooling only — it is NOT part of the shipped
Scala library and never runs on the cluster.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints → int64 where possible, floats stay, decimals → float
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def sql_compare(con, name: str, spark_path: Path, oracle_sql: str) -> bool:
    """DuckDB-side compare for outputs too large for pandas: identical
    column sets, identical row counts, and an empty symmetric EXCEPT
    ALL (so duplicate-row multiplicity differences are caught too).
    """
    got_cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchall()]
    con.execute(f"CREATE OR REPLACE TEMP VIEW _want AS {oracle_sql}")
    want_cols = [r[0] for r in con.execute("DESCRIBE _want").fetchall()]
    if sorted(got_cols) != sorted(want_cols):
        print(f"[COLS] {name}: spark={sorted(got_cols)} duck={sorted(want_cols)}")
        return False
    cols = ", ".join(f'"{c}"' for c in sorted(got_cols))
    con.execute(f"CREATE OR REPLACE TEMP VIEW _got AS "
                f"SELECT {cols} FROM read_parquet('{spark_path}/*.parquet')")
    con.execute(f"CREATE OR REPLACE TEMP VIEW _wants AS SELECT {cols} FROM _want")
    n_got = con.execute("SELECT count(*) FROM _got").fetchone()[0]
    n_want = con.execute("SELECT count(*) FROM _wants").fetchone()[0]
    if n_got != n_want:
        print(f"[ROWS] {name}: spark={n_got} duck={n_want}")
        return False
    ndiff = con.execute(
        "SELECT count(*) FROM ((SELECT * FROM _got EXCEPT ALL SELECT * FROM _wants)"
        " UNION ALL (SELECT * FROM _wants EXCEPT ALL SELECT * FROM _got))").fetchone()[0]
    if ndiff:
        print(f"[HASH] {name}: {ndiff} rows differ (sql-compare)")
        return False
    print(f"[ OK ] {name}: {n_got} rows (sql-compare)")
    return True


def main(out_dir: str, sf_dir: str, only=None, sql_cmp=None) -> int:
    out = Path(out_dir)
    sql_cmp = sql_cmp or set()
    oracle = json.loads((out / "oracle_sql.json").read_text())
    if only:
        missing = sorted(set(only) - set(oracle))
        if missing:
            print(f"[ERR ] --only names not in oracle_sql.json: {missing}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        spark_path = out / name
        if not spark_path.exists():
            print(f"[MISS] {name}: no spark output")
            failures += 1
            continue
        try:
            if name in sql_cmp:
                if not sql_compare(con, name, spark_path, oracle[name]):
                    failures += 1
                continue
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} duck={list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} duck={len(want)}")
            failures += 1
            continue
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(want[c].dtype)]
        if dt_bad:
            print(f"[DTYPE] {name}: {dt_bad}")
            failures += 1
            continue
        # value compare with float tolerance-free equality (we round in-query)
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            ndiff = int(diff.values.sum())
            if ndiff == 0:
                eq = True  # only NaN-vs-NaN mismatches
        if eq:
            print(f"[ OK ] {name}: {len(got)} rows")
        else:
            print(f"[HASH] {name}: {ndiff} differing cells")
            bad = diff.any(axis=1)
            print(pd.concat({"spark": got[bad].head(3), "duck": want[bad].head(3)}, axis=1))
            failures += 1
    # queries without oracle: rows-only
    for d in sorted(out.iterdir()):
        if d.is_dir() and d.name not in oracle and (only is None or d.name in only):
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"[ROWS-ONLY] {d.name}: {n} rows")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    sql_cmp = set()
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--sql-compare" in args:
        i = args.index("--sql-compare")
        sql_cmp = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], only, sql_cmp))
