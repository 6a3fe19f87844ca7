"""Round-5 structural perf experiments at the BENCH protocol.

The round-5 per-op trace of the fixed default step (tools/profile_step.py)
shows ~35 ms/step of data formatting — layout copies/transposes between
[4,H,W,2,C] and [2,4,H,W,C] tilings around the STACKED pair axis (the vmap
over both models' params) plus decoder concat-skip backward splits.  That
cost is an artifact of HOW the two CPS branches are composed, not of the
reference architecture — so this tool re-measures the three compositions
under the exact headline protocol (scan_steps=8, bf16, CSE-safe distinct
random batches per scanned step, best-of-3, last-loss hard sync):

  stacked    the shipping default: both models vmapped into one trunk
  unstacked  two sequential per-model trunks in one jit (no pair axis;
             round-1 measured it slower pre-optimization — re-measured
             here because the formatting tax grew since)
  fused      (model x pass)-vmapped: sup+unsup trunks in one forward

    python tools/perf_experiments_r05.py [--variants stacked,unstacked,fused]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import optax

import bench  # noqa: E402  (compile cache + batch protocol)


def run(variant: str, batch=4, hw=512, iters=4, scan_steps=8, seed=0):
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.models.layers import compute_dtype
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_multi_step,
        make_cps_train_step,
        make_cps_train_step_fused,
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet50", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 512, 512, 512],
                   "distance": "euclidean", "kmeans_init": True},
        "margin": 0.5, "scale": 30.0, "depth": 5,
    }})
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    l_imgs, gts, ul_imgs = bench._random_batches(batch, hw, scan_steps, seed)
    kw = dict(num_classes=3, confidence_threshold=0.7, remat=False)
    with compute_dtype(jnp.bfloat16):
        state = create_cps_state(model, tx, (l_imgs[0], gts[0], 0.7))
        state = cps_init_phase(model, state, l_imgs[0], gts[0], 0.7)
        if variant == "stacked":
            state = stack_cps_state(state, tx)
            step = make_cps_train_step_stacked(model, tx, dice, **kw)
        elif variant == "fused":
            state = stack_cps_state(state, tx)
            step = make_cps_train_step_fused(model, tx, dice, **kw)
        elif variant == "unstacked":
            step = make_cps_train_step(model, tx, dice, **kw)
        else:
            raise SystemExit(f"unknown variant {variant}")
        multi = make_cps_multi_step(step, scan_steps)
        state, m, _, _ = multi(state, l_imgs, gts, ul_imgs)
        float(m["loss"])
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m, _, _ = multi(state, l_imgs, gts, ul_imgs)
            float(m["loss"])
            dt = (time.perf_counter() - t0) / (iters * scan_steps)
            best = max(best, 2 * batch / dt)
    row = {"variant": variant, "img_per_s": round(best, 2),
           "ms_per_step": round(2 * batch / best * 1e3, 2)}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="stacked,unstacked,fused")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scan_steps", type=int, default=8)
    args = ap.parse_args()
    rows = [run(v, args.batch, args.hw, args.iters, args.scan_steps)
            for v in args.variants.split(",")]
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
