#!/bin/bash
# r19 scale-evidence chain: the FULL 141-entry suite (r18's surface
# plus multimodal_all, the declared fused decode) at four scale
# points, sequentially, no concurrent load, against the frozen r19
# classes. The sf0.1 point writes straight to repo-root
# BENCH_local.json. After each point the JSON is copied into
# bench_points_r19/ so a dead session still leaves the evidence in
# the work tree (artifacts first, claims second).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_classes_r19}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
unset SPARK_GRAFT_ONLY
mkdir -p bench_points_r19

bench() { # sf_dir out warm reps
  local dir=$1 out=$2 warm=$3 reps=$4
  echo "=== bench $dir -> $out (warm=$warm reps=$reps) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" SPARK_GRAFT_REPS="$reps" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r19/
}

bench /root/testdata/sf0.1 /tmp/bench_r19_sf0.1.json "" 3
cp /tmp/bench_r19_sf0.1.json BENCH_local.json
bench /tmp/sf1 /tmp/bench_r19_sf1.json 1 1
bench /tmp/sf10 /tmp/bench_r19_sf10.json 1 1
# sf3 last and OPTIONAL: killing the chain here still leaves a full
# three-point curve (the assembler requires sf0.1/sf1/sf10 only)
[ -d /tmp/sf3 ] && bench /tmp/sf3 /tmp/bench_r19_sf3.json 1 1 || echo "sf3 data absent - skipped (optional)"
echo "=== CHAIN_DONE $(date +%T) ==="
