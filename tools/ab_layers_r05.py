"""Round-5 step-level A/B of the two round-4 `models/layers.py` rewrites.

Round 4 shipped two kernel-level "optimizations" on per-op trace evidence
(max_pool custom VJP; constant-matmul align-corners upsample for C<128) but
BENCH_r04 recorded a 17-31% END-TO-END regression vs BENCH_r03 with no
per-change step-level measurement (VERDICT r4 weak #1).  This tool closes
that gap: it measures the full flagship CPS step (bench.run_profile — the
exact headline protocol: CSE-safe distinct batches, scan_steps=8, bf16,
last-loss hard sync) under all four toggle combinations and reports a table.

Usage:
    python tools/ab_layers_r05.py [--profile default|tuned|tuned_subpixel]
                                  [--iters 4] [--reps 1]

Writes/append results to AB_LAYERS_R05.json and prints the table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the persistent compile cache)
from vq_seg_tpu.models.layers import set_layer_impl  # noqa: E402

COMBOS = [
    {"max_pool_custom_vjp": True, "upsample_matmul": True},    # r4 as shipped
    {"max_pool_custom_vjp": False, "upsample_matmul": True},
    {"max_pool_custom_vjp": True, "upsample_matmul": False},
    {"max_pool_custom_vjp": False, "upsample_matmul": False},  # r3 behavior
]

PROFILES = {
    "default": dict(batch=4, decoder_channels=None, subpixel_tail=False, seed=0),
    "tuned": dict(batch=8, decoder_channels=(256, 128, 64, 48, 32),
                  subpixel_tail=False, seed=1),
    "tuned_subpixel": dict(batch=8, decoder_channels=(256, 128, 64, 48, 32),
                           subpixel_tail=True, seed=2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="default", choices=sorted(PROFILES))
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--combos", default="all",
                    help="comma list of combo indices (0..3) or 'all'")
    args = ap.parse_args()

    p = PROFILES[args.profile]
    idxs = (range(len(COMBOS)) if args.combos == "all"
            else [int(i) for i in args.combos.split(",")])
    rows = []
    for i in idxs:
        combo = COMBOS[i]
        set_layer_impl(**combo)
        r = bench.run_profile(p["batch"], args.hw, args.iters, half=True,
                              scan_steps=args.scan_steps,
                              decoder_channels=p["decoder_channels"],
                              seed=p["seed"], subpixel_tail=p["subpixel_tail"])
        row = {"profile": args.profile, "combo": combo,
               "ips": round(r["ips"], 3), "ms_per_step": round(r["ms_per_step"], 2),
               "mfu": round(r["mfu"], 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "AB_LAYERS_R05.json")
    existing = []
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    with open(out, "w") as f:
        json.dump(existing + rows, f, indent=1)
    print(f"appended {len(rows)} rows -> {out}")


if __name__ == "__main__":
    main()
