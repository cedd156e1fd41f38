#!/usr/bin/env bash
# Per-gate FRESH-JVM bench: one java process per query, so a gate's timing
# carries no GC/JIT/arena bleed from the 360 queries that ran before it in
# the in-context bench (documented 1.5-2x on allocation-heavy gates).
#
# Usage: tools/freshbench.sh <sf_dir> <out_json> [query ...]
#   (no queries -> every gate; expensive: ~10 s JVM spin-up per gate)
#
# Runs the compiled classes directly against the Spark distribution jars —
# no sbt in the loop. Each gate prints Bench's one-line JSON (restricted to
# that query); this script merges them into one {"queries": {...}} map.
set -euo pipefail
SF_DIR="${1:?sf dir}"
OUT="${2:?output json}"
shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
CP="$CLASSES:/opt/spark/jars/*"
CPUS="${SPARK_GRAFT_CPUS:-32}"
RUNS="${SPARK_GRAFT_BENCH_RUNS:-3}"
[ -d "$CLASSES" ] || { echo "compile first (sbt compile)" >&2; exit 1; }

if [ "$#" -eq 0 ]; then
  QUERIES=$(java -cp "$CP" graft.tools.ListQueries)
else
  QUERIES="$*"
fi

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
i=0
for q in $QUERIES; do
  i=$((i+1))
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_RUNS="$RUNS" SPARK_GRAFT_BENCH_OUT="$TMP/$q.json" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -Dlog4j2.level=warn -cp "$CP" graft.Bench "$q" \
      > "$TMP/$q.stdout" 2> "$TMP/$q.stderr" \
    || { echo "FAIL $q (see $TMP/$q.stderr)" >&2; cp "$TMP/$q.stderr" "/tmp/freshbench_fail_$q.log"; }
  echo "[$i] $q done" >&2
done
python3 - "$TMP" "$OUT" <<'EOF'
import json, sys
from pathlib import Path
tmp, out = sys.argv[1], sys.argv[2]
merged, runs, failed = {}, {}, []
for f in sorted(Path(tmp).glob("*.json")):
    d = json.loads(f.read_text())
    merged.update({k: v for k, v in d["queries"].items() if v is not None})
    runs.update(d.get("runs", {}))
    failed += d.get("failed", [])
total = sum(merged.values())
Path(out).write_text(json.dumps({
    "metric": "total_freshjvm", "value": total, "unit": "sec",
    "queries": merged, "runs": runs, "failed": failed}, indent=1))
print(f"{len(merged)} gates, total {total:.1f}s -> {out}")
EOF
