#!/usr/bin/env bash
# Isolated bench passes with GC telemetry — the outlier-attribution
# ritual (round-17 verdict item 1): an anomalous full-suite bench
# reading is adjudicated by N FRESH-JVM passes of just the suspect
# queries, each with unified GC logging, so the next 20x outlier is
# attributable (GC pressure / host weather / plan) instead of merely
# adjudicatable.
#
# Usage: tools/isolated.sh <sf-dir> <out-json> <passes> <query...>
set -euo pipefail
SF=$1; OUT=$2; PASSES=$3; shift 3
QUERIES=("$@")
[ ${#QUERIES[@]} -gt 0 ] || { echo "no queries given" >&2; exit 1; }
REPO=$(cd "$(dirname "$0")/.." && pwd)
TMP=$(mktemp -d /tmp/graft_isolated.XXXX)

for p in $(seq 1 "$PASSES"); do
  echo "[isolated] pass $p/${PASSES}" >&2
  (cd "$REPO" && SPARK_GRAFT_SF_DIR=$SF \
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-4} \
    SPARK_GRAFT_GC_LOG=$TMP/gc_$p.log \
    tools/run.sh graft.Bench "${QUERIES[@]}" >/dev/null)
  # Bench writes the per-query JSON to bench_queries.json (stdout can
  # carry logger noise — the interleave.sh discipline)
  cp "$REPO/bench_queries.json" "$TMP/pass_$p.json"
done

python3 - "$SF" "$PASSES" "$TMP" "$OUT" <<'EOF'
import json, re, sys
sf, passes, tmp, out = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
runs, gc = [], []
for p in range(1, passes + 1):
    with open(f"{tmp}/pass_{p}.json") as f:
        runs.append(json.load(f)["queries"])
    # GC summary: pause count + total/max pause ms from unified logging
    pauses = []
    with open(f"{tmp}/gc_{p}.log") as f:
        for line in f:
            m = re.search(r"Pause[^)]*\)[^0-9]*([\d.]+)ms", line)
            if m:
                pauses.append(float(m.group(1)))
    gc.append({"n_pauses": len(pauses),
               "total_pause_ms": round(sum(pauses), 1),
               "max_pause_ms": round(max(pauses), 1) if pauses else 0.0})
qs = {}
for n in sorted(runs[0]):
    samples = [r[n] for r in runs if n in r]
    qs[n] = {"passes": samples, "min": min(samples), "max": max(samples)}
doc = {"sf": sf, "passes": passes, "queries": qs, "gc_per_pass": gc}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
for n, q in qs.items():
    print(f"[isolated] {n}: {q['passes']} (min {q['min']})", file=sys.stderr)
print(f"[isolated] gc: {gc}", file=sys.stderr)
print(f"[isolated] wrote {out}", file=sys.stderr)
EOF
