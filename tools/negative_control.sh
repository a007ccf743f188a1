#!/usr/bin/env bash
# Negative control for the correctness harness: prove tools/check.py
# (the local mirror of the driver's oracle gate) can say NO.
#
# The whole correctness edifice rests on the dump-and-compare gate; a
# harness bug that silently reports every query green would make all
# 100+ [OK] lines meaningless. This script red-teams the checker:
#   1. positive control — an untouched q1_agg dump must pass;
#   2. a single perturbed VALUE cell must be caught ([HASH]);
#   3. a dropped ROW must be caught ([ROWS]);
#   4. a renamed COLUMN must be caught ([COLS]).
# Exit 0 only if the clean dump passes AND every corruption is caught.
#
# Usage: tools/negative_control.sh [sfDir]   (default sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT=$(mktemp -d /tmp/negctl.XXXXXX)
trap 'rm -rf "$OUT"' EXIT

tools/run.sh graft.Verify "$SF" "$OUT/clean" q1_agg >/dev/null

# ---- positive control: the untouched dump passes the gate on both
# compare paths
if ! python3 tools/check.py "$OUT/clean" "$SF" --only q1_agg | grep '^\[ OK \] q1_agg' >/dev/null; then
  echo "NEGATIVE-CONTROL: FAIL — positive control did not pass the checker"
  exit 1
fi
if ! python3 tools/check.py "$OUT/clean" "$SF" --only q1_agg --sql-compare q1_agg \
    | grep '^\[ OK \] q1_agg' >/dev/null; then
  echo "NEGATIVE-CONTROL: FAIL — positive control did not pass sql-compare"
  exit 1
fi

corrupt() { # name, python body writing $OUT/<name> from $OUT/clean
  local name="$1" body="$2"
  mkdir -p "$OUT/$name/q1_agg"
  cp "$OUT/clean/oracle_sql.json" "$OUT/$name/"
  OUT="$OUT" NAME="$name" BODY="$body" python3 - <<'PY'
import os
import duckdb
out, name = os.environ["OUT"], os.environ["NAME"]
df = duckdb.sql(f"SELECT * FROM read_parquet('{out}/clean/q1_agg/*.parquet')").df()
exec(os.environ["BODY"])
import pyarrow as pa, pyarrow.parquet as pq
pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
               f"{out}/{name}/q1_agg/part-0.parquet")
PY
  # the corrupted dump must FAIL the gate — through BOTH compare
  # paths (pandas frames and the large-output DuckDB sql-compare)
  if python3 tools/check.py "$OUT/$name" "$SF" --only q1_agg | grep '^\[ OK \] q1_agg' >/dev/null; then
    echo "NEGATIVE-CONTROL: FAIL — checker passed a dump with a $name"
    exit 1
  fi
  if python3 tools/check.py "$OUT/$name" "$SF" --only q1_agg --sql-compare q1_agg \
      | grep '^\[ OK \] q1_agg' >/dev/null; then
    echo "NEGATIVE-CONTROL: FAIL — sql-compare passed a dump with a $name"
    exit 1
  fi
  echo "caught: $name"
}

corrupt "perturbed-value"  'df.iloc[0, df.columns.get_loc("sum_qty")] += 1'
corrupt "dropped-row"      'df = df.iloc[1:]'
corrupt "renamed-column"   'df = df.rename(columns={"sum_qty": "sum_qty2"})'

# ---- tools/dump_compare.py (the refactor transfer-proof) must also
# be able to say NO: identical dumps pass, a perturbed copy fails
if ! python3 tools/dump_compare.py "$OUT/clean" "$OUT/clean" q1_agg \
    | grep '^\[ OK \] q1_agg' >/dev/null; then
  echo "NEGATIVE-CONTROL: FAIL — dump_compare rejected identical dumps"
  exit 1
fi
if python3 tools/dump_compare.py "$OUT/clean" "$OUT/perturbed-value" q1_agg \
    | grep '^\[ OK \] q1_agg' >/dev/null; then
  echo "NEGATIVE-CONTROL: FAIL — dump_compare passed a perturbed dump"
  exit 1
fi
echo "caught: dump-compare-perturbed"

echo "NEGATIVE-CONTROL: PASS (clean dump accepted, all corruptions caught)"
