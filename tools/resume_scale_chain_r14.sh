#!/bin/bash
# Resume the r14 chain after the window that ran sf0.1+sf1 died:
# identical invocation to run_scale_chain_r14.sh for the remaining
# two points (same frozen classes, same machine, ps-checked idle).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_classes_r14}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p bench_points_r14
bench() {
  local dir=$1 out=$2 warm=$3
  echo "=== bench $dir -> $out (warm=$warm) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r14/
}
bench /tmp/sf3 /tmp/bench_r14_sf3.json 1
bench /tmp/sf10 /tmp/bench_r14_sf10.json 1
echo "=== RESUME_CHAIN_DONE $(date +%T) ==="
