#!/usr/bin/env bash
# Three-point scaling curve: bench the named queries at sf0.01, sf0.1
# and the sf1.0-equivalent slice, back-to-back on the same binary
# (same protocol as the SCALE.md round-8/9 curves: min of two passes,
# noop sink, 32 threads). Writes bench_queries.json per SF to
# /tmp/graft_curve/<sf>.json.
#
# Usage: tools/curve.sh q_a q_b ...   (queries as args)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/graft_curve
for sf in /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/graft_sf1.0; do
  tag=$(basename "$sf")
  echo "=== $tag ==="
  SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    tools/run.sh graft.Bench "$@"
  mv bench_queries.json "/tmp/graft_curve/$tag.json"
done
python3 - <<'EOF'
import json, math
from pathlib import Path
pts = {p.stem: json.load(open(p))["queries"] for p in Path("/tmp/graft_curve").glob("*.json")}
a, b, c = pts.get("sf0.01", {}), pts.get("sf0.1", {}), pts.get("graft_sf1.0", {})
print(f"{'query':28s} {'sf0.01':>8} {'sf0.1':>8} {'sf1.0':>8} {'e01':>6} {'e10':>6}")
for q in sorted(c, key=lambda q: -c[q]):
    e1 = math.log(b[q]/a[q])/math.log(10) if q in a and q in b else float('nan')
    e2 = math.log(c[q]/b[q])/math.log(10) if q in b else float('nan')
    print(f"{q:28s} {a.get(q,float('nan')):8.2f} {b.get(q,float('nan')):8.2f} {c[q]:8.2f} {e1:6.2f} {e2:6.2f}")
EOF
