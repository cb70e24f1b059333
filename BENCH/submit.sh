#!/usr/bin/env bash
# Cluster-style launch: package the engine and run the replay bench via
# spark-submit --py-files (the north_rule's invocation shape). On a real
# cluster, swap --master local[N] for the cluster master and size
# executors with --num-executors/--executor-cores/--executor-memory —
# nothing in the job is local-mode-specific.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${1:-8}"
CONVS="${2:-120000}"
ZIP="$(mktemp -d)/engine.zip"
(cd "$REPO" && zip -qr "$ZIP" audience_behavior_semantic_etl_spark)
exec spark-submit \
  --master "local[$CPUS]" \
  --driver-memory "$(( CPUS * 3 / 4 > 6 ? CPUS * 3 / 4 : 6 ))g" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --py-files "$ZIP" \
  "$REPO/BENCH/replay_bench.py" --cpus "$CPUS" --convs "$CONVS" --check
