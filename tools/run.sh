#!/usr/bin/env bash
# Run a graft main class directly (no sbt log noise).
# Usage: tools/run.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS_FLAGS=()
for p in "${ADD_OPENS[@]}"; do OPENS_FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
# GC telemetry for bench-outlier attribution (the round-17 verdict's
# ask): SPARK_GRAFT_GC_LOG=<path> adds unified JVM GC logging, so an
# anomalous bench reading carries evidence (GC pauses vs plan cost)
# instead of needing a pure-weather adjudication after the fact.
GC_FLAGS=()
if [ -n "${SPARK_GRAFT_GC_LOG:-}" ]; then
  GC_FLAGS+=("-Xlog:gc*:file=${SPARK_GRAFT_GC_LOG}:time,uptime")
fi
exec java "${OPENS_FLAGS[@]}" "${GC_FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dlog4j2.level=warn \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@" 2>/tmp/graft_run_stderr.log
