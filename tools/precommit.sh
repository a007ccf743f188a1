#!/usr/bin/env bash
# Compile gate: run before EVERY commit. An un-compilable snapshot zeroes
# the round's whole correctness signal (see VERDICT round 6), so refuse
# to proceed unless main + test sources compile.
#
# PRECOMMIT_SMOKE=1 additionally runs every registered query at
# sf0.001 (QueriesSpec, ~90 s) — catches runtime breaks (bad column
# refs, unresolvable plans) that compile alone cannot. Use before
# END-OF-ROUND snapshots and after touching query plumbing.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch Test/compile >/tmp/precommit.log 2>&1 || {
  echo "PRECOMMIT FAIL: Test/compile broken — do not commit." >&2
  tail -n 40 /tmp/precommit.log >&2
  exit 1
}
echo "PRECOMMIT OK: Test/compile green."
if [[ "${PRECOMMIT_SMOKE:-0}" == "1" ]]; then
  sbt -batch "testOnly graft.QueriesSpec" >/tmp/precommit_smoke.log 2>&1 || {
    echo "PRECOMMIT FAIL: QueriesSpec smoke broken — do not commit." >&2
    tail -n 40 /tmp/precommit_smoke.log >&2
    exit 1
  }
  echo "PRECOMMIT OK: all registered queries run at sf0.001."
fi
