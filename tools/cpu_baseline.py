"""Measure the CPU-backend throughput of the flagship CPS train step.

This produces the CPU_BASELINE_IPS constant recorded in bench.py (the
denominator of the BASELINE.json "5x over CPU" target).  Run with:

    JAX_PLATFORMS=cpu python tools/cpu_baseline.py [--hw 512] [--iters 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.training.cps import cps_init_phase, create_cps_state, make_cps_train_step
    from __graft_entry__ import _flagship

    model = _flagship(num_embeddings=(0, 0, 512, 512, 512), encoder="resnet50")
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    x = jax.random.uniform(jax.random.PRNGKey(0), (args.batch, args.hw, args.hw, 3))
    gt = jnp.zeros((args.batch, args.hw, args.hw), jnp.int32)
    t0 = time.perf_counter()
    state = create_cps_state(model, tx, (x, gt, 0.7))
    state = cps_init_phase(model, state, x, gt, 0.7)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)
    step = make_cps_train_step(model, tx, dice, num_classes=3, confidence_threshold=0.7)
    state, m, _, _ = step(state, x, gt, x)
    jax.block_until_ready(m["loss"])
    print(f"compile+first step {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m, _, _ = step(state, x, gt, x)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"cpu_ips": round(2 * args.batch / dt, 4), "sec_per_step": round(dt, 3),
                      "hw": args.hw, "batch": args.batch}))


if __name__ == "__main__":
    main()
