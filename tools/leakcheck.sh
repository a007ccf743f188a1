#!/usr/bin/env bash
# Reproducible scan for non-public references in the library source —
# the repo-side counterpart of the driver's LEAKCHECK gate, so the
# zero-hit claim is verifiable from the repo alone:
#   tools/leakcheck.sh    # per-category hit counts; exit 1 on any hit
#
# Categories mirror the driver's artifact: imports outside the public
# allowlist (Spark / Scala / Java stdlib / scalatest / this repo's
# `graft`), URLs outside well-known public hosts, cloud bucket
# schemes, chat links, credential-shaped strings, and env-var reads
# beyond the documented driver contract.
set -u
cd "$(dirname "$0")/.."
fail=0

report() { # name, hits
  local name="$1" hits="$2" n
  n=$(printf '%s' "$hits" | grep -c . || true)
  echo "[$name] $n hit(s)"
  if [ "$n" -gt 0 ]; then printf '%s\n' "$hits" | sed 's/^/    /'; fail=1; fi
}

# allowlist names the EXACT public roots in use — org.apache.spark
# specifically, not org.apache.*, so a bundled non-Spark artifact
# (commons, hadoop pulled directly, ...) shows up as a hit and must
# be consciously added here
report "nonpublic-import" "$(grep -rInE '^[[:space:]]*import ' src --include='*.scala' \
  | grep -vE 'import (org\.apache\.spark\.|org\.apache\.hadoop\.fs\.|org\.apache\.avro\.|scala\.|java\.|javax\.|graft\.|org\.scalatest|org\.scalacheck|spark\.implicits|s\.implicits|[A-Z][A-Za-z0-9]*\.(\{|[A-Z]))' || true)"
# org.apache.hadoop.fs is the Spark-bundled FileSystem API (atomic
# rename / commit markers in UpsertSink, Fallback) — public, ships in
# /opt/spark/jars; the .fs. scope keeps the rest of hadoop flagged.
# org.apache.avro is the public Avro Java library (ships in
# /opt/spark/jars; backs sources/AvroCodec). The [A-Z]...(\{|[A-Z])
# alternative is package-RELATIVE object MEMBER imports
# (import Gif.{FrameW, ...}, import TextOps.Bm25K1) — the member
# after the dot must itself be capitalized or a brace group, so an
# external root written as a capitalized package followed by
# lowercase segments (Foo.bar.baz) still flags

report "nonpublic-url" "$(grep -rInoE 'https?://[a-zA-Z0-9._/-]+' src --include='*.scala' \
  | grep -vE '(apache\.org|github\.com|wikipedia\.org|ietf\.org|w3\.org|example\.(com|org))' || true)"

report "bucket-scheme" "$(grep -rInE '(s3a?|gs|abfss?|wasbs?)://' src --include='*.scala' || true)"

report "chat-link" "$(grep -rInE 'slack\.com|app\.slack' src --include='*.scala' || true)"

report "credential" "$(grep -rInE '(api[_-]?key|secret[_-]?key|AKIA[0-9A-Z]{16})' src --include='*.scala' || true)"

report "nonpublic-env-var" "$(grep -rInE 'sys\.env|System\.getenv' src --include='*.scala' \
  | grep -vE 'SPARK_GRAFT_[A-Z_]+' || true)"

if [ "$fail" -eq 0 ]; then echo "LEAKCHECK: clean"; else echo "LEAKCHECK: HITS FOUND"; fi
exit "$fail"
