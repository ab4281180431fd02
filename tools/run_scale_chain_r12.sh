#!/bin/bash
# r12 scale-evidence chain: the FULL 75-entry suite (every operator,
# C24-C28 and the r12 additions agg_hll_merge/join_asof_tolerance
# included — no separate supplement needed) at four scale points, run
# sequentially with no concurrent load against the frozen r12 classes.
# The sf0.1 point IS the final-build tracked bench: it writes straight
# to repo-root BENCH_local.json (and is copied to bench_points_r12/ as
# the curve's first point). The sf1/sf3 ngram A-vs-B probes already
# ran in a dedicated clean window this session on byte-identical
# dispatch code (bench_points_r12/ngram_ab_sf{1,3}.json); the chain
# re-runs only the sf10 probe. After each point completes the JSON is
# copied into bench_points_r12/ so a dead session still leaves the
# evidence in the work tree (the r10/r11 lesson: artifacts first,
# claims second).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_classes_r12}
TCLS=${TCLS:-/tmp/graft_test_classes_r12}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p bench_points_r12

bench() { # sf_dir out warm
  local dir=$1 out=$2 warm=$3
  echo "=== bench $dir -> $out (warm=$warm) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r12/
}

bench /root/testdata/sf0.1 /tmp/bench_r12_sf0.1.json ""
cp /tmp/bench_r12_sf0.1.json BENCH_local.json
bench /tmp/sf1 /tmp/bench_r12_sf1.json 1
bench /tmp/sf3 /tmp/bench_r12_sf3.json 1
bench /tmp/sf10 /tmp/bench_r12_sf10.json 1
echo "=== ngramAB /tmp/sf10 $(date +%T) ==="
NGRAM_AB_OUT=/tmp/ngram_ab_sf10_r12.json \
  java -Xmx100g $JO -cp "$TCLS:$CLS:/opt/spark/jars/*" \
  graft.tools.NgramAB /tmp/sf10 3 0.8
cp /tmp/ngram_ab_sf10_r12.json bench_points_r12/ngram_ab_sf10.json
echo "=== CHAIN_DONE $(date +%T) ==="
