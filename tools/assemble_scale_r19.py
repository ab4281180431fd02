#!/usr/bin/env python3
"""Assemble BENCH_r19_scale.json from the per-point chain raws in
bench_points_r19/ (written by tools/run_scale_chain_r19.sh)."""
import json
import os

POINTS = [
    ("sf0_1", "bench_points_r19/bench_r19_sf0.1.json", 1),
    ("sf1", "bench_points_r19/bench_r19_sf1.json", 10),
    ("sf3", "bench_points_r19/bench_r19_sf3.json", 30),
    ("sf10", "bench_points_r19/bench_r19_sf10.json", 100),
]
# sf3 is optional (it runs LAST; a wall-clock cut there still leaves a
# full three-point curve)
POINTS = [p for p in POINTS if os.path.exists(p[1])]
_missing = [k for k in ("sf0_1", "sf1", "sf10")
            if k not in {p[0] for p in POINTS}]
assert not _missing, f"required bench points missing: {_missing}"

blocks = {}
for key, path, mult in POINTS:
    with open(path) as f:
        blocks[key] = json.load(f)
    assert blocks[key]["failed"] == 0, f"{key} had failures"

curve = []
prev = None
for key, _, mult in sorted(POINTS, key=lambda p: p[2]):
    total = blocks[key]["value"]
    step = None if prev is None else round(total / prev, 3)
    curve.append({
        "point": key, "data_multiple": mult,
        "suite_total_sec": round(total, 3),
        "step_ratio_vs_prev": step,
        "failed": blocks[key]["failed"],
        "reps": blocks[key]["reps"],
    })
    prev = total

q0, q10 = blocks["sf0_1"]["queries"], blocks["sf10"]["queries"]
ratios = {k: round(q10[k] / q0[k], 2) for k in sorted(q0) if k in q10}

total100x = blocks["sf10"]["value"] / blocks["sf0_1"]["value"]
out = {
    "metric": "scale_curve_r19",
    "description": (
        "Full 141-entry suite (end-of-round r19 build, frozen classes "
        "across all points — verdict item 2: the r18 chain predated "
        "six of r18's own optimization commits; this one is the final "
        "build. r19 adds multimodal_all, the declared fused decode; "
        "the decode fusion is now first-use in the operator, so its "
        "one-time cost sits in multimodal_all's `first` and "
        "multimodal_decode_prewarm reads 0.0 — see OPTIMIZATION_r19.md "
        "section 5 before comparing totals with r18) at sf0.1 and "
        "10x/30x/100x scaled copies (tools/gen_scaled_sf.py), same "
        "machine, local[32], ps-checked idle at launch. sf0.1: "
        "interleaved median-of-3 (also the tracked BENCH_local.json). "
        "sf1/sf3/sf10: WARM reps=1 (wall-clock budget; sf3 runs LAST "
        "and is optional)."
    ),
    "generated_round": 19,
    **{key: blocks[key] for key, _, _ in POINTS},
    "scale_curve": curve,
    "per_entry_sf10_over_sf0_1_ratio": ratios,
}
out["summary"] = (
    f"141-entry suite, 100x data in {round(total100x, 1)}x time "
    f"({round(blocks['sf0_1']['value'], 1)}s -> "
    f"{round(blocks['sf10']['value'], 1)}s), failed=0 at all "
    f"{len(POINTS)} points (sf1/sf3/sf10 at reps=1-warm)."
)

with open("BENCH_r19_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(out["summary"])
