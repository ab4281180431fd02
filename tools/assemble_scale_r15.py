#!/usr/bin/env python3
"""Assemble BENCH_r15_scale.json from the r15 chain's per-SF bench
JSONs.

The r15 chain (tools/run_scale_chain_r15.sh) benches the FULL
127-entry suite — including the nine r15 additions
(arrow_http_cancel_poll, graph_pagerank_converged,
graph_pagerank_personalized, text_quality_train,
text_bpe_learn_batched, layout_zorder_write, layout_zorder_skip,
stream_kmv_ttl, ann_graph_beam) — at sf0.1/sf1/sf3/sf10, so every
entry has in-suite scale evidence.

Comparability: /tmp/sf1-sf10 are gen_scaled_sf.py outputs from the
same generator as r12-r14's chains (regenerated this round — the VM
reset cleared /tmp — so absolute file layout differs but the data is
deterministic), and the sixth-window r14 chain is the per-entry
baseline for the 118 shared entries.
"""
import json

POINTS = [
    ("sf0_1", "bench_points_r15/bench_r15_sf0.1.json", 1),
    ("sf1", "bench_points_r15/bench_r15_sf1.json", 10),
    ("sf3", "bench_points_r15/bench_r15_sf3.json", 30),
    ("sf10", "bench_points_r15/bench_r15_sf10.json", 100),
]

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
    })
    prev = total

q0, q10 = blocks["sf0_1"]["queries"], blocks["sf10"]["queries"]
ratios = {k: round(q10[k] / q0[k], 2) for k in sorted(q0) if k in q10}

total100x = blocks["sf10"]["value"] / blocks["sf0_1"]["value"]
out = {
    "metric": "scale_curve_r15",
    "description": (
        "Full 127-entry suite (end-of-round r15 build, frozen classes "
        "across ALL FOUR points: the r14 surface plus producer-cancel "
        "polling, converged + personalized PageRank via monotone "
        "Kleene iteration, the quality-model trainer, batched BPE "
        "learning, the z-order write + skip audit, the TTL'd "
        "transformWithState KMV, and graph-beam ANN) at sf0.1 and "
        "10x/30x/100x scaled copies (tools/gen_scaled_sf.py), same "
        "machine, local[32], no concurrent load, ps-checked idle "
        "before launch. sf0.1: interleaved median-of-3 (also the "
        "tracked BENCH_local.json at its commit). sf1/sf3/sf10: WARM "
        "mode — per entry one untimed cold pre-rep ('first') then "
        "timed back-to-back reps. failed=0 required at every point by "
        "the assembler."
    ),
    "generated_round": 15,
    "sf0_1": blocks["sf0_1"],
    "sf1": blocks["sf1"],
    "sf3": blocks["sf3"],
    "sf10": blocks["sf10"],
    "scale_curve": curve,
    "per_entry_sf10_over_sf0_1_ratio": ratios,
}
out["summary"] = (
    f"127-entry suite, 100x data in {round(total100x, 1)}x time "
    f"({round(blocks['sf0_1']['value'], 1)}s -> "
    f"{round(blocks['sf10']['value'], 1)}s), failed=0 at all four "
    "points."
)

with open("BENCH_r15_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(out["summary"])
