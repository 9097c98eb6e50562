#!/usr/bin/env bash
# Cluster-style deployment: package the engine and run the flagship
# job via spark-submit --py-files (north_rule deployment shape).
#
# Usage: scripts/submit.sh [job_script] [spark-submit extra args...]
# Default job: scripts/submit_job.py (flagship extraction end-to-end).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:-$REPO/scripts/submit_job.py}"
shift || true

ZIP="$(mktemp -d)/coies_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" coies_spark __spark_entry__.py)

SPARK_SUBMIT="${SPARK_SUBMIT:-spark-submit}"
exec "$SPARK_SUBMIT" \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-64}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$@" \
  "$JOB"
