#!/usr/bin/env bash
# Cluster-submit template for the graft library (see docs/TUNING.md
# "Packaging"). The thin `sbt package` jar is the whole artifact - the
# library depends on nothing beyond Spark.
#
# Usage: tools/submit.sh <driver-class> <master-url> [extra spark-submit args...]
#   e.g. tools/submit.sh com.example.IngestTick yarn \
#          --conf spark.executor.instances=200
set -euo pipefail

CLASS="${1:?driver class required}"
MASTER="${2:?master url required (yarn | k8s://... | spark://...)}"
shift 2

JAR="$(ls "$(dirname "$0")"/../target/scala-2.13/jobhousespark_2.13-*.jar 2>/dev/null | head -1)"
[ -n "$JAR" ] || { echo "run 'sbt package' first" >&2; exit 1; }

exec spark-submit \
  --master "$MASTER" \
  --deploy-mode cluster \
  --class "$CLASS" \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.files.maxPartitionBytes=256m \
  "$@" \
  "$JAR"
