#!/bin/bash
# Post-chain r11 sequence (run ONLY after run_scale_chain_r11.sh prints
# CHAIN_DONE — every step here needs the machine to itself):
#   1. supplement benches: the five post-chain entries (join_asof,
#      text_bigram_lm, agg_hll_distinct, pipeline_split_leakage_safe,
#      ann_mips_ivf) solo-warm at sf1/sf3/sf10, and the r10 watch-list
#      pair (dedup_simhash, dedup_minhash_lsh) solo-warm at sf3;
#   2. final-build full-suite sf0.1 bench -> tracked BENCH_local.json;
#   3. assemble BENCH_r11_scale.json from the chain points + probes +
#      supplements.
# Full `sbt test` + the full verify sweep are run by the session before
# invoking this (they are sbt-side, not frozen-classes-side).
set -e
cd "$(dirname "$0")/.."
CLS=${CLS:-target/scala-2.13/classes}
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
NEW=join_asof,text_bigram_lm,agg_hll_distinct,pipeline_split_leakage_safe,ann_mips_ivf

bench() { # sf_dir out warm only ("" = full suite; env must stay UNSET
          # then — an empty SPARK_GRAFT_ONLY matches nothing)
  local dir=$1 out=$2 warm=$3 only=$4
  echo "=== bench $dir -> $out (warm=$warm only=$only) $(date +%T) ==="
  local extra=()
  [ -n "$only" ] && extra=(SPARK_GRAFT_ONLY="$only")
  env "${extra[@]}" \
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="$out" \
    SPARK_GRAFT_BENCH_WARM="$warm" \
    java -Xmx100g $JO -cp "$CLS:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r11/
}

bench /tmp/sf1 /tmp/bench_r11_new_sf1.json 1 "$NEW"
bench /tmp/sf3 /tmp/bench_r11_new_sf3.json 1 "$NEW"
bench /tmp/sf10 /tmp/bench_r11_new_sf10.json 1 "$NEW"
bench /tmp/sf3 /tmp/bench_r11_watch_sf3.json 1 dedup_simhash,dedup_minhash_lsh
bench /root/testdata/sf0.1 BENCH_local.json "" ""
python3 tools/assemble_scale_r11.py
echo "=== POST_CHAIN_DONE $(date +%T) ==="
