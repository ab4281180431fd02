#!/usr/bin/env python3
"""Assemble BENCH_r10_scale.json from the per-SF bench JSONs + the
sf10 ngram A-vs-B probe.

r10 artifact shape = r8/r9 scale blocks (sf0_1/sf1/sf3/sf10 +
scale_curve + per-entry ratios) with two changes:
- sf1/sf3/sf10 ran in WARM mode (SPARK_GRAFT_BENCH_WARM=1): per entry,
  one untimed cold pre-rep (recorded in `first`) then back-to-back
  timed reps, so big-SF medians measure COMPUTE and `first` - median
  is the cold-I/O share. sf0.1 stays interleaved for r8/r9
  comparability (its working set is cache-resident).
- `ngram_probe_sf10` embeds the dedicated in-window A-vs-B run
  (auto vs jaccard vs prefix, 5 warm reps each, same session) that the
  r9 verdict required to clear dedup_ngram_auto's weak-at-100x grade.
"""
import json

POINTS = [
    ("sf0_1", "/tmp/bench_r10_sf0.1.json", 1),
    ("sf1", "/tmp/bench_r10_sf1.json", 10),
    ("sf3", "/tmp/bench_r10_sf3.json", 30),
    ("sf10", "/tmp/bench_r10_sf10.json", 100),
]

blocks = {}
for key, path, mult in POINTS:
    with open(path) as f:
        blocks[key] = json.load(f)
    assert blocks[key]["failed"] == 0, f"{key} had failures"

with open("/tmp/bench_r10_probe.json") as f:
    probe = json.load(f)
assert probe["failed"] == 0, "probe had failures"

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

auto = probe["queries"]["dedup_ngram_auto"]
prefix = probe["queries"]["dedup_ngram_prefix"]
jacc = probe["queries"]["dedup_ngram_jaccard"]

out = {
    "metric": "scale_curve_r10",
    "description": (
        "Full 65-entry suite (r10 build: + ann_ivfpq_perlist per-list "
        "residual codebooks, ann_recall_curve; grouped-pushdown "
        "overflow run-merging) at sf0.1 and 10x/30x/100x scaled copies "
        "(tools/gen_scaled_sf.py), same machine, local[32], no "
        "concurrent load. sf0.1: interleaved median-of-3 (r8/r9 "
        "comparable). sf1/sf3/sf10: WARM mode — per entry one untimed "
        "cold pre-rep ('first') then 3 back-to-back timed reps, median "
        "= compute, first - median = cold-I/O share. Negative values "
        "anywhere mean that run failed (none here: failed=0 at every "
        "point)."
    ),
    "generated_round": 10,
    "sf0_1": blocks["sf0_1"],
    "sf1": blocks["sf1"],
    "sf3": blocks["sf3"],
    "sf10": blocks["sf10"],
    "scale_curve": curve,
    "per_entry_sf10_over_sf0_1_ratio": ratios,
    "ngram_probe_sf10": {
        "note": (
            "The committed in-window A-vs-B proof the r9 verdict "
            "required: dedup_ngram_auto (ANALYZE-dispatch) vs the "
            "dedup_ngram_prefix plan it dispatches to at sf10 vs "
            "dedup_ngram_jaccard, one session, warm mode, 5 "
            "back-to-back timed reps each after a cold pre-rep. "
            "Medians are compute; 'first' carries each entry's cold "
            "run. auto <= dispatched plan + probe means the reused "
            "probe aggregate pays for itself at 100x."
        ),
        "raw": probe,
        "auto_median_sec": round(auto, 2),
        "prefix_median_sec": round(prefix, 2),
        "jaccard_median_sec": round(jacc, 2),
        "auto_over_prefix": round(auto / prefix, 3),
    },
}

total100x = blocks["sf10"]["value"] / blocks["sf0_1"]["value"]
out["summary"] = (
    f"100x data in {total100x:.2f}x time, failed=0 at all four points; "
    f"steps " + "/".join(
        f"{c['step_ratio_vs_prev']}" for c in curve if c["step_ratio_vs_prev"]
    ) + "x; sf10 ngram probe: auto "
    f"{auto:.1f}s vs prefix {prefix:.1f}s vs jaccard {jacc:.1f}s (warm medians)."
)

with open("/root/repo/BENCH_r10_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(out["summary"])
