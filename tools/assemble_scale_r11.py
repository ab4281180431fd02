#!/usr/bin/env python3
"""Assemble BENCH_r11_scale.json from the per-SF bench JSONs + the
ngram A-vs-B phase probes.

r11 artifact shape = the r10 plan, finally landed (r10 committed only
sf0.1/sf1/sf3 into bench_points_r10/ and never produced its scale
artifact):
- sf0.1 interleaved median-of-3 (r8/r9-comparable); sf1/sf3/sf10 in
  WARM mode (per entry one untimed cold pre-rep in `first`, then
  back-to-back timed reps — medians measure compute).
- `ngram_probe` embeds graft.tools.NgramAB phase runs at sf1/sf3/sf10:
  probe_only / prefix / count / auto each timed separately (cold +
  warm reps) in one session per SF, plus the dispatcher's V_count /
  V_prefix estimates and its decision. The r9/r10 ask was "auto <=
  dispatched plan + probe"; the phase split makes that check direct:
  auto_median vs prefix_median + probe_only_median.

IMPORTANT comparability note: the driver regenerated /root/testdata
AFTER r10's bench points were committed — the new documents corpus
carries ~4x the shared-gram mass (probe amplification 10.7 at sf0.1
vs ~2.7 at sf0.01). r11 absolutes for ngram/dedup entries are NOT
comparable to bench_points_r10/; the scale CURVE (ratios within r11)
is the signal.
"""
import json

POINTS = [
    ("sf0_1", "/tmp/bench_r11_sf0.1.json", 1),
    ("sf1", "/tmp/bench_r11_sf1.json", 10),
    ("sf3", "/tmp/bench_r11_sf3.json", 30),
    ("sf10", "/tmp/bench_r11_sf10.json", 100),
]
PROBES = [("sf1", "/tmp/ngram_ab_sf1.json"),
          ("sf3", "/tmp/ngram_ab_sf3.json"),
          ("sf10", "/tmp/ngram_ab_sf10.json")]

blocks = {}
for key, path, mult in POINTS:
    with open(path) as f:
        blocks[key] = json.load(f)
    assert blocks[key]["failed"] == 0, f"{key} had failures"

probes = {}
for key, path in PROBES:
    with open(path) as f:
        probes[key] = json.load(f)

curve = []
prev = None
for key, _, mult in POINTS:
    total = blocks[key]["value"]
    step = None if prev is None else round(total / prev, 3)
    curve.append({
        "point": key, "data_multiple": mult,
        "suite_total_sec": round(total, 3),
        "step_ratio_vs_prev": step,
        "failed": blocks[key]["failed"],
    })
    prev = total

q0, q10 = blocks["sf0_1"]["queries"], blocks["sf10"]["queries"]
ratios = {k: round(q10[k] / q0[k], 2) for k in sorted(q0) if k in q10}

probe_summary = {}
for key, p in probes.items():
    auto = p["auto"]["median"]
    prefix = p["prefix"]["median"]
    count = p["count"]["median"]
    probe_cost = p["probe_only"]["median"]
    probe_summary[key] = {
        "auto_median_sec": round(auto, 2),
        "prefix_median_sec": round(prefix, 2),
        "count_median_sec": round(count, 2),
        "probe_only_median_sec": round(probe_cost, 2),
        "dispatch": p["dispatch"],
        "auto_vs_min_plus_probe": round(
            auto / (min(prefix, count) + probe_cost), 3),
    }

out = {
    "metric": "scale_curve_r11",
    "description": (
        "Full 68-entry suite (final r11 build: threshold-aware ngram "
        "dispatch via plan-volume estimates, one-Lloyd-round per-list "
        "PQ codebooks, exchange-reuse-shared recall curve, repo-owned "
        "NANOS fixture) at sf0.1 and 10x/30x/100x scaled copies "
        "(tools/gen_scaled_sf.py) of the POST-r10-regeneration "
        "testdata, same machine, local[32], no concurrent load. "
        "sf0.1: interleaved median-of-3. sf1/sf3/sf10: WARM mode — "
        "per entry one untimed cold pre-rep ('first') then timed "
        "back-to-back reps, median = compute, first - median = "
        "cold-I/O share. Negative values anywhere mean that run "
        "failed (failed=0 at every point). NOT comparable to "
        "bench_points_r10/ absolutes for ngram/dedup entries: the "
        "regenerated documents corpus has ~4x the shared-gram mass."
    ),
    "generated_round": 11,
    "sf0_1": blocks["sf0_1"],
    "sf1": blocks["sf1"],
    "sf3": blocks["sf3"],
    "sf10": blocks["sf10"],
    "scale_curve": curve,
    "per_entry_sf10_over_sf0_1_ratio": ratios,
    "ngram_probe": {
        "note": (
            "graft.tools.NgramAB phase runs, one session per SF, warm "
            "reps after a cold pre-rep: probe_only = the dispatcher's "
            "two probe scans standalone; prefix/count = the two "
            "dispatchable plans at t=0.8; auto = probe + dispatch + "
            "reused-hot-frame plan. auto_vs_min_plus_probe <= ~1 is "
            "the r9/r10 acceptance check, now direct. raw blocks "
            "carry every rep for spread reading."
        ),
        "raw": probes,
        "summary": probe_summary,
    },
}

# Optional r11 supplement blocks (written by post-chain solo runs).
# The chain ran on the 68-entry build (C21/C22/C23/C8c included);
# new_entries_* carries the five post-chain additions (join_asof,
# text_bigram_lm, agg_hll_distinct, pipeline_split_leakage_safe,
# ann_mips_ivf) solo-warm-benched at each scale point, and
# watch_solo_sf3 is the solo A-vs-B window for the sf3 watch-list
# entries the r10 verdict asked to measure-not-chase (dedup_simhash,
# dedup_minhash_lsh).
import os
SUPPLEMENT = {
    "new_entries_sf1": "/tmp/bench_r11_new_sf1.json",
    "new_entries_sf3": "/tmp/bench_r11_new_sf3.json",
    "new_entries_sf10": "/tmp/bench_r11_new_sf10.json",
    "watch_solo_sf3": "/tmp/bench_r11_watch_sf3.json",
}
supplement = {}
for key, path in SUPPLEMENT.items():
    if os.path.exists(path):
        with open(path) as f:
            supplement[key] = json.load(f)

total100x = blocks["sf10"]["value"] / blocks["sf0_1"]["value"]
out["summary"] = (
    f"100x data in {total100x:.2f}x time, failed=0 at all four points; "
    f"steps " + "/".join(
        f"{c['step_ratio_vs_prev']}" for c in curve if c["step_ratio_vs_prev"]
    ) + "x; sf10 ngram: auto "
    f"{probe_summary['sf10']['auto_median_sec']}s vs dispatched "
    f"{probe_summary['sf10']['prefix_median_sec'] if probe_summary['sf10']['dispatch'] == 'prefix' else probe_summary['sf10']['count_median_sec']}s "
    f"+ probe {probe_summary['sf10']['probe_only_median_sec']}s "
    f"(dispatch={probe_summary['sf10']['dispatch']})."
)

if supplement:
    out["r11_supplement"] = {
        "note": (
            "Post-chain solo runs on the 68-entry build: "
            "new_entries_* = the r11 additions warm-benched at "
            "each scale point (SPARK_GRAFT_ONLY, so absolutes are "
            "solo-window, not suite-pressure); watch_solo_sf3 = the "
            "r10 verdict's watch-list pair in a solo A-vs-B window."
        ),
        **supplement,
    }

with open("/root/repo/BENCH_r11_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(out["summary"])
