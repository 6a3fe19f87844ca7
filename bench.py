"""Headline benchmark: flagship CPS train-step throughput (images/sec/chip).

Runs the fused VQRePTUnet1x1v2 CPS training step (6 forwards + fused
backward + 2 Adam updates, ResNet-50, per-stage 512-entry VQ codebooks) at
512x512, the reference's production shape (BASELINE.md: "VQ-UNet images/sec
/chip at 512^2 train step").  Counts labeled+unlabeled images consumed per
optimizer step.

vs_baseline compares against the reference's observed single-step
throughput target of 5x a CPU-chip baseline (BASELINE.json north_star);
CPU_BASELINE_IPS is this machine's measured CPU throughput for the same
step (amortised, small-step extrapolation) — recorded once, see comment.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax

# Measured once on this host's CPU backend (see tools/cpu_baseline.py):
# flagship CPS train step at 512^2, batch 4+4. Updated when re-measured.
CPU_BASELINE_IPS = 0.0329  # images/sec on host CPU, measured 2026-08-16 (243 s/step)


def main(batch: int = 4, hw: int = 512, iters: int = 10):
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step,
    )
    from __graft_entry__ import _flagship

    model = _flagship(num_embeddings=(0, 0, 512, 512, 512), encoder="resnet50")
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, hw, hw, 3), jnp.float32)
    gt = jnp.zeros((batch, hw, hw), jnp.int32)
    state = create_cps_state(model, tx, (x, gt, 0.7))
    state = cps_init_phase(model, state, x, gt, 0.7)
    step = make_cps_train_step(model, tx, dice, num_classes=3, confidence_threshold=0.7)

    # warmup / compile
    state, m, _, _ = step(state, x, gt, x)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, _, _ = step(state, x, gt, x)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    ips = 2 * batch / dt  # labeled + unlabeled images per optimizer step

    print(json.dumps({
        "metric": "flagship CPS train step images/sec/chip @512^2 (bs 4+4, resnet50, K=512 VQ)",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / (5 * CPU_BASELINE_IPS), 3),
    }))


if __name__ == "__main__":
    main()
