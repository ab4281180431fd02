#!/bin/bash
# r11 scale-evidence chain: the full 64-entry suite at four scale
# points plus the ngram A-vs-B phase probes, run sequentially with no
# concurrent load (each point is its own JVM against the frozen
# classes snapshot). Critical points run FIRST (sf10 + its probe are
# the thrice-asked 100x evidence) so an overrun cuts only the cheap
# re-runnable tail. After each point completes, the JSON is copied
# into bench_points_r11/ so a dead session still leaves the evidence
# in the work tree (the r10 lesson: artifacts first, claims second).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_classes_r11}
TCLS=${TCLS:-/tmp/graft_test_classes_r11}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p bench_points_r11

bench() { # sf_dir out warm
  local dir=$1 out=$2 warm=$3
  echo "=== bench $dir -> $out (warm=$warm) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r11/
}
ngram() { # sf_dir out
  local dir=$1 out=$2
  echo "=== ngramAB $dir -> $out $(date +%T) ==="
  NGRAM_AB_OUT="$out" \
    java -Xmx100g $JO -cp "$TCLS:$CLS:/opt/spark/jars/*" \
    graft.tools.NgramAB "$dir" 3 0.8
  cp "$out" bench_points_r11/
}

bench /root/testdata/sf0.1 /tmp/bench_r11_sf0.1.json ""
bench /tmp/sf10 /tmp/bench_r11_sf10.json 1
ngram /tmp/sf10 /tmp/ngram_ab_sf10.json
bench /tmp/sf1 /tmp/bench_r11_sf1.json 1
ngram /tmp/sf1 /tmp/ngram_ab_sf1.json
bench /tmp/sf3 /tmp/bench_r11_sf3.json 1
ngram /tmp/sf3 /tmp/ngram_ab_sf3.json
echo "=== CHAIN_DONE $(date +%T) ==="
