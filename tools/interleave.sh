#!/usr/bin/env bash
# Paired A/B interleave bench — the weather adjudicator as a first-class
# artifact (round-16 verdict item 6). Cross-window bench comparisons are
# contaminated by host-load "weather" (this container swings single-query
# wall-times 2-3x minute to minute), so regressions are adjudicated by
# rebuilding the PREVIOUS round's binary in a git worktree and running
# prev/cur ALTERNATELY on the SAME slice data within one window: weather
# hits both sides equally and the paired per-query ratios are honest.
#
# Usage: tools/interleave.sh <prev-ref> <sf-dir> <out-json> <rounds> <query...>
#   prev-ref  git ref of the previous round's final commit
#   sf-dir    the slice both sides read (same parquet bytes)
#   out-json  paired per-query JSON artifact (e.g. artifacts/INTERLEAVE_r17.json)
#   rounds    A/B alternations (each side runs `rounds` full Bench passes)
#   query...  the query subset (must exist in BOTH refs' registries)
#
# Output JSON: per query the per-round min-of-2 samples for both sides,
# each side's min across rounds, and the cur/prev ratio; plus totals.
set -euo pipefail
REF=$1; SF=$2; OUT=$3; ROUNDS=$4; shift 4
QUERIES=("$@")
[ ${#QUERIES[@]} -gt 0 ] || { echo "no queries given" >&2; exit 1; }
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT_ABS=$(cd "$(dirname "$OUT")" 2>/dev/null && pwd)/$(basename "$OUT") || OUT_ABS=$REPO/$OUT

WT=/tmp/graft_interleave_wt
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$REF" >&2
else
  # A stale worktree from a previous run may hold a DIFFERENT ref —
  # silently benching against it would adjudicate vs a wrong baseline.
  # Force the requested ref (and a clean tree) every time.
  git -C "$WT" checkout --detach "$REF" >&2
  git -C "$WT" reset --hard "$REF" >&2
fi
WT_HEAD=$(git -C "$WT" rev-parse HEAD)
REF_SHA=$(git -C "$REPO" rev-parse "$REF^{commit}")
[ "$WT_HEAD" = "$REF_SHA" ] || { echo "worktree HEAD $WT_HEAD != requested ref $REF_SHA" >&2; exit 1; }
echo "[interleave] building prev ($REF) in $WT" >&2
(cd "$WT" && sbt -batch compile >/dev/null)
echo "[interleave] building cur in $REPO" >&2
(cd "$REPO" && sbt -batch compile >/dev/null)

TMP=$(mktemp -d /tmp/graft_interleave_runs.XXXX)
run_side() { # $1 = tree dir, $2 = tag, $3 = round
  echo "[interleave] round $3 $2" >&2
  (cd "$1" && SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-4} \
    tools/run.sh graft.Bench "${QUERIES[@]}" >/dev/null)
  cp "$1/bench_queries.json" "$TMP/$2_$3.json"
}
for r in $(seq 1 "$ROUNDS"); do
  run_side "$WT" prev "$r"
  run_side "$REPO" cur "$r"
done

python3 - "$REF" "$SF" "$ROUNDS" "$TMP" "$OUT_ABS" <<'EOF'
import json, sys
ref, sf, rounds, tmp, out = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
def load(tag):
    runs = []
    for r in range(1, rounds + 1):
        with open(f"{tmp}/{tag}_{r}.json") as f:
            runs.append(json.load(f)["queries"])
    return runs
prev, cur = load("prev"), load("cur")
# A query present on only one side (e.g. added after prev-ref) would
# yield an empty sample list and crash min() AFTER all bench passes
# were paid — validate the set against both sides' first round and
# pair only the intersection, reporting the rest.
only_cur = sorted(set(cur[0]) - set(prev[0]))
only_prev = sorted(set(prev[0]) - set(cur[0]))
for n in only_cur:
    print(f"[interleave] SKIP {n}: absent from prev ref's registry", file=sys.stderr)
for n in only_prev:
    print(f"[interleave] SKIP {n}: absent from cur registry", file=sys.stderr)
names = sorted(set(cur[0]) & set(prev[0]))
qs = {}
for n in names:
    p = [r[n] for r in prev if n in r]
    c = [r[n] for r in cur if n in r]
    pm, cm = min(p), min(c)
    qs[n] = {"prev": p, "cur": c, "prev_min": pm, "cur_min": cm,
             "ratio_cur_over_prev": round(cm / pm, 3) if pm > 0 else None}
tp = round(sum(q["prev_min"] for q in qs.values()), 3)
tc = round(sum(q["cur_min"] for q in qs.values()), 3)
doc = {"prev_ref": ref, "sf": sf, "rounds": rounds,
       "skipped_only_cur": only_cur, "skipped_only_prev": only_prev,
       "total_prev_min": tp, "total_cur_min": tc,
       "total_ratio_cur_over_prev": round(tc / tp, 3) if tp else None,
       "queries": qs}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
print(f"[interleave] wrote {out}: total cur/prev = {doc['total_ratio_cur_over_prev']}",
      file=sys.stderr)
worst = sorted(qs.items(), key=lambda kv: -(kv[1]["ratio_cur_over_prev"] or 0))[:5]
for n, q in worst:
    print(f"[interleave]   {n}: {q['prev_min']:.2f} -> {q['cur_min']:.2f} "
          f"({q['ratio_cur_over_prev']}x)", file=sys.stderr)
EOF
