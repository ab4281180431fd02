#!/usr/bin/env python3
"""Assemble BENCH_r13_scale.json from the r13 chain's per-SF bench
JSONs plus the round's dedicated probe windows.

The r13 chain (tools/run_scale_chain_r13.sh) benches the FULL 87-entry
suite — including the nine r13 additions (arrow_http_scan/
arrow_http_agg/arrow_http_sql_query, agg_quantile_sketch_merge,
agg_quantile_exact, join_asof_chunked, text_tokens_bpe,
pipeline_pack_sequences_bpe, stream_asof_enrich) — at sf0.1/sf1/sf3/
sf10, so every entry has in-suite scale evidence. The sf10 ngram
question was settled this round in dedicated interleaved windows with
an order-swap control (ngram_ab_sf10_interleaved{,_cp}.json), and the
chunked as-of has its own single-key skew A/B (asof_skew_ab.json);
both ride along in this artifact.

Comparability: /tmp/sf1-sf10 are the same gen_scaled_sf.py outputs the
r12 chain used, so r13-vs-r12 per-entry comparisons are like-for-like
for the 78 shared entries.
"""
import json

POINTS = [
    ("sf0_1", "bench_points_r13/bench_r13_sf0.1.json", 1),
    ("sf1", "bench_points_r13/bench_r13_sf1.json", 10),
    ("sf3", "bench_points_r13/bench_r13_sf3.json", 30),
    ("sf10", "bench_points_r13/bench_r13_sf10.json", 100),
]

blocks = {}
for key, path, mult in POINTS:
    with open(path) as f:
        blocks[key] = json.load(f)
    assert blocks[key]["failed"] == 0, f"{key} had failures"

with open("bench_points_r13/ngram_ab_sf10_interleaved.json") as f:
    ngram_pc = json.load(f)
with open("bench_points_r13/ngram_ab_sf10_interleaved_cp.json") as f:
    ngram_cp = json.load(f)
with open("bench_points_r13/asof_skew_ab.json") as f:
    skew = json.load(f)

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
    "metric": "scale_curve_r13",
    "description": (
        "Full 87-entry suite (final r13 build: loopback HTTP Arrow-IPC "
        "transport incl. sql:= mode, quantile sketch merge + exact "
        "refinement, skew-hardened chunked as-of, deterministic BPE "
        "token counting + BPE-budget sequence packing, streaming as-of "
        "enrichment) at sf0.1 and 10x/30x/100x scaled copies "
        "(tools/gen_scaled_sf.py), same machine, local[32], no "
        "concurrent load, ps-checked idle before the chain. sf0.1: "
        "interleaved median-of-3 (also the tracked BENCH_local.json). "
        "sf1/sf3/sf10: WARM mode — per entry one untimed cold pre-rep "
        "('first') then timed back-to-back reps. failed=0 required at "
        "every point by the assembler."
    ),
    "generated_round": 13,
    "sf0_1": blocks["sf0_1"],
    "sf1": blocks["sf1"],
    "sf3": blocks["sf3"],
    "sf10": blocks["sf10"],
    "scale_curve": curve,
    "per_entry_sf10_over_sf0_1_ratio": ratios,
    "ngram_ab_sf10": {
        "note": (
            "The r12 open question, settled: interleaved A/B "
            "(prefix,count alternating inside one JVM after one cold "
            "pair) in BOTH rep orders on an idle machine. The clean "
            "cp-order window: prefix 24.1s vs count 29.7s medians, "
            "gap 5.6s vs core spreads ~4-6s. The r12 block-sequential "
            "2.8x 'inversion' was drift between non-comparable "
            "blocks; prefix and count are within ~1.2x at sf10."
        ),
        "order_pc": ngram_pc,
        "order_cp": ngram_cp,
    },
    "asof_skew_ab": {
        "note": (
            "Chunked vs plain as-of carry on a 20M-row SINGLE-KEY "
            "frame (the shape the chunked variant exists for), "
            "equality-guarded before timing: chunked wins "
            f"{round(skew['speedup'], 2)}x (medians "
            f"{round(skew['plain']['median'], 1)}s vs "
            f"{round(skew['chunked']['median'], 1)}s)."
        ),
        "raw": skew,
    },
}
out["summary"] = (
    f"87-entry suite, 100x data in {round(total100x, 1)}x time "
    f"({round(blocks['sf0_1']['value'], 1)}s -> "
    f"{round(blocks['sf10']['value'], 1)}s), failed=0 at all four "
    f"points; chunked as-of {round(skew['speedup'], 2)}x on the "
    "single-key skew frame; sf10 ngram prefix-vs-count within ~1.2x "
    "(interleaved, order-swapped)."
)

with open("BENCH_r13_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(out["summary"])
