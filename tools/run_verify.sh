#!/bin/bash
# Local mimic of the driver's Verify invocation. The --add-opens flags
# are required by Arrow's memory util on Java 17 (spark-submit adds them
# automatically; a bare `java` does not).
# Usage: tools/run_verify.sh <sf_dir> <out_dir> [only_csv]
set -e
cd "$(dirname "$0")/.."
SF_DIR=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_local}
[ -n "$3" ] && export SPARK_GRAFT_ONLY="$3"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16}
exec java \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT"
