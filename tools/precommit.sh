#!/usr/bin/env bash
# Compile gate: run before EVERY commit. An un-compilable snapshot zeroes
# the round's whole correctness signal (see VERDICT round 6), so refuse
# to proceed unless main + test sources compile.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch Test/compile >/tmp/precommit.log 2>&1 || {
  echo "PRECOMMIT FAIL: Test/compile broken — do not commit." >&2
  tail -n 40 /tmp/precommit.log >&2
  exit 1
}
echo "PRECOMMIT OK: Test/compile green."
