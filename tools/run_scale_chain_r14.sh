#!/bin/bash
# r14 scale-evidence chain: the FULL 95-entry suite (every operator,
# including the eight r14 additions — the CMS top-k sketch + merge, the
# span-rewrite dedup, CUBE/GROUPING SETS, epoch mixing, the hashed-
# feature quality model — and the r14 engine-neutral
# HTTP wire contract under the transport entries) at four scale
# points, run sequentially with no concurrent load against the frozen
# r14 classes. The sf0.1 point writes straight to repo-root
# BENCH_local.json. After each point the JSON is copied into
# bench_points_r14/ so a dead session still leaves the evidence in
# the work tree (artifacts first, claims second).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_classes_r14}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p bench_points_r14

bench() { # sf_dir out warm
  local dir=$1 out=$2 warm=$3
  echo "=== bench $dir -> $out (warm=$warm) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r14/
}

bench /root/testdata/sf0.1 /tmp/bench_r14_sf0.1.json ""
cp /tmp/bench_r14_sf0.1.json BENCH_local.json
bench /tmp/sf1 /tmp/bench_r14_sf1.json 1
bench /tmp/sf3 /tmp/bench_r14_sf3.json 1
bench /tmp/sf10 /tmp/bench_r14_sf10.json 1
echo "=== CHAIN_DONE $(date +%T) ==="
