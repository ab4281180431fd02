#!/usr/bin/env python3
"""Assemble BENCH_r15_scale.json from the r15 chain's per-SF bench
JSONs.

The r15 chain benches the FULL 127-entry suite — including the nine
r15 additions (arrow_http_cancel_poll, graph_pagerank_converged,
graph_pagerank_personalized, text_quality_train,
text_bpe_learn_batched, layout_zorder_write, layout_zorder_skip,
stream_kmv_ttl, ann_graph_beam) — at sf0.1/sf1/(sf3)/sf10, so every
entry has in-suite scale evidence. The sf3 point was initially cut
for wall-clock (the session also regenerated every scaled SF after
the VM reset cleared /tmp) and restored late-session if the window
fit; sf3/sf10 run WARM with REPS=1 (one untimed cold pre-rep + one
timed rep per entry) — honest labeling: the `reps` field says so, and
the r14 sixth-window sf10 json is the cross-check for the 118 shared
entries.

Comparability note (measured, not assumed): THIS session's machine
reads a UNIFORM ~1.25-1.4x slower than the r14 session's on
byte-identical code — 118 shared entries at sf0.1 read 1.38x
(163.8s vs 119.1s) and at sf1 1.25x (524.8s vs 420.6s) with no
single-entry outlier beyond the documented wide-variance ngram
family, and the same factor shows in SOLO windows (dedup_clusters
20.7s solo vs 15.2s r14 in-suite; ann_recall_curve 37s vs 19.9s), so
it is environmental (boot/host), not suite pressure and not a code
regression. Within-session ratios (the scale curve below) are
unaffected.
"""
import json
import os

POINTS = [
    ("sf0_1", "bench_points_r15/bench_r15_sf0.1.json", 1),
    ("sf1", "bench_points_r15/bench_r15_sf1.json", 10),
    ("sf3", "bench_points_r15/bench_r15_sf3.json", 30),
    ("sf10", "bench_points_r15/bench_r15_sf10.json", 100),
]
# sf3 is optional (it was initially cut for wall-clock and restored
# late in the session if the window fit)
POINTS = [p for p in POINTS if os.path.exists(p[1])]

# ONLY sf3 is optional: the ratio/summary code below indexes sf0_1,
# sf1, and sf10 unconditionally — fail with a clear message up front
# instead of a bare KeyError after the existence filter silently
# accepted the absence
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
for key, _, mult in POINTS:
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
    "metric": "scale_curve_r15",
    "description": (
        "Full 127-entry suite (end-of-round r15 build, frozen classes "
        "across all points: the r14 surface plus producer-cancel "
        "polling, converged + personalized PageRank via monotone "
        "Kleene iteration, the quality-model trainer, batched BPE "
        "learning, the z-order write + skip audit, the TTL'd "
        "transformWithState KMV, and graph-beam ANN) at sf0.1 and "
        "10x/100x scaled copies (tools/gen_scaled_sf.py), same "
        "machine, local[32], ps-checked idle at launch. sf0.1: "
        "interleaved median-of-3 (also the tracked BENCH_local.json). "
        "sf1: WARM median-of-3. sf3 (if present) and sf10: WARM "
        "reps=1 (wall-clock budget; the r14 chain cross-checks the "
        "shared 118 entries). Cross-round comparisons must divide out "
        "the measured uniform ~1.25-1.4x environment factor documented "
        "in this file's assembler docstring."
    ),
    "generated_round": 15,
    **{key: blocks[key] for key, _, _ in POINTS},
    "scale_curve": curve,
    "per_entry_sf10_over_sf0_1_ratio": ratios,
}
out["summary"] = (
    f"127-entry suite, 100x data in {round(total100x, 1)}x time "
    f"({round(blocks['sf0_1']['value'], 1)}s -> "
    f"{round(blocks['sf10']['value'], 1)}s), failed=0 at all "
    f"{len(POINTS)} points (sf3/sf10 at reps=1-warm)."
)

with open("BENCH_r15_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(out["summary"])
