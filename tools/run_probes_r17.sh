#!/bin/bash
# r17 probe window (the r16 verdict's items 3, 5, 7), one idle
# sequence, artifacts first:
#  1. swing_ab_sf10 — the unchanged-code sf10 swings
#     (dedup_ngram_containment 6.0x, join_range_count 4.9x,
#     agg_quantile_exact 2.8x vs r15) interleaved with the stable q1
#     control in ONE bench (Bench interleaves reps): if the control
#     swings comparably, the swing is host-wide, not code.
#  2. gbeam_ab — ann_graph_beam at sf10, ALTERNATING the frozen r15
#     and r16 builds across JVMs (A B A B), reps=3 each: the r16
#     verdict's one unexplained large-entry regression (19.0->62.5 s)
#     on a changed file. Code-vs-host attribution: if r15 and r16
#     builds read the same in the same window, the 3.3x was host.
#  3. prd_obs_sf10 — graph_pagerank_dist_converged solo at sf10 on
#     the r17 classes (observe-based witness): warm=1 gives one cold
#     pre-rep ("first") + 3 warm reps (median). r16 baseline: 367 s
#     cold / 529 s warm — the driver-job-debt measurement the observe
#     witness attacks.
set -e
cd "$(dirname "$0")/.."
JO="--add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p bench_points_r17

bench() { # classes sf_dir only out warm reps
  local cls=$1 dir=$2 only=$3 out=$4 warm=$5 reps=$6
  echo "=== bench cls=$cls only=$only -> $out (warm=$warm reps=$reps) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ONLY="$only" \
    SPARK_GRAFT_BENCH_OUT="$out" SPARK_GRAFT_BENCH_WARM="$warm" \
    SPARK_GRAFT_REPS="$reps" \
    java -Xmx100g $JO -cp "$cls:/opt/spark/jars/*" graft.Bench
  cp "$out" bench_points_r17/
}

# 1. unchanged-code swings + control, one interleaved window (r16 build
# = the build that measured the swing)
bench /tmp/graft_classes_r16 /tmp/sf10 \
  "dedup_ngram_containment,join_range_count,agg_quantile_exact,q1_pricing_summary" \
  /tmp/swing_ab_sf10.json "" 5

# 2. gbeam r15-vs-r16 alternating builds
bench /tmp/graft_classes_r15 /tmp/sf10 ann_graph_beam /tmp/gbeam_r15_a.json "" 3
bench /tmp/graft_classes_r16 /tmp/sf10 ann_graph_beam /tmp/gbeam_r16_a.json "" 3
bench /tmp/graft_classes_r15 /tmp/sf10 ann_graph_beam /tmp/gbeam_r15_b.json "" 3
bench /tmp/graft_classes_r16 /tmp/sf10 ann_graph_beam /tmp/gbeam_r16_b.json "" 3

# 3. observe-witness PageRank solo (r17 classes)
bench /tmp/graft_classes_r17 /tmp/sf10 graph_pagerank_dist_converged \
  /tmp/prd_obs_sf10.json 1 3

echo "=== PROBES_DONE $(date +%T) ==="
