#!/bin/bash
# r15 scale-evidence chain: the FULL 127-entry suite (every operator,
# including the nine r15 additions — producer-cancel poll, converged +
# personalized PageRank, the quality-model trainer, batched BPE, the
# z-order write + skip audit, the TTL'd TWS KMV, and graph-beam ANN)
# at four scale points, run sequentially with no concurrent load
# against the frozen r15 classes. The sf0.1 point writes straight to
# repo-root BENCH_local.json. After each point the JSON is copied into
# bench_points_r15/ so a dead session still leaves the evidence in
# the work tree (artifacts first, claims second).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_classes_r15}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
unset SPARK_GRAFT_ONLY
mkdir -p bench_points_r15

bench() { # sf_dir out warm
  local dir=$1 out=$2 warm=$3
  echo "=== bench $dir -> $out (warm=$warm) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r15/
}

bench /root/testdata/sf0.1 /tmp/bench_r15_sf0.1.json ""
cp /tmp/bench_r15_sf0.1.json BENCH_local.json
bench /tmp/sf1 /tmp/bench_r15_sf1.json 1
bench /tmp/sf3 /tmp/bench_r15_sf3.json 1
bench /tmp/sf10 /tmp/bench_r15_sf10.json 1
echo "=== CHAIN_DONE $(date +%T) ==="
