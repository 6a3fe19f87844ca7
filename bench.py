"""Headline benchmark: flagship CPS train-step throughput (images/sec/chip).

Runs the fused VQRePTUnet1x1v2 CPS training step (6 forwards + fused
backward + 2 Adam updates, ResNet-50, per-stage 512-entry VQ codebooks) at
512x512 — the reference's production shape (BASELINE.md: "VQ-UNet images/sec
/chip at 512^2 train step") — under bf16 matmul precision, mirroring the
reference flagship config's AMP setting (half=true,
config/vqreptunet1x1v2.json).  Counts labeled+unlabeled images consumed per
optimizer step.

Synchronisation: the loss scalar of the LAST step is fetched to host, which
forces the whole donated state chain to execute (a bare block_until_ready on
a tunneled array returns early through the axon relay — measured 80x too
fast).

vs_baseline = images/sec / (5 x CPU baseline): the BASELINE.json north-star
is ">=5x images/sec/chip over CPU baseline", so 1.0 means target met.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax

# Measured on this host's CPU backend (tools/cpu_baseline.py, 2026-08-16):
# flagship CPS train step at 512^2 bs 4+4 took 242.9 s/step.
CPU_BASELINE_IPS = 0.0329


def main(batch: int = 4, hw: int = 512, iters: int = 4, half: bool = True,
         scan_steps: int = 8):
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_multi_step,
        make_cps_train_step_stacked,
        stack_cps_state,
    )
    from __graft_entry__ import _flagship
    from contextlib import nullcontext
    from vq_seg_tpu.models.layers import compute_dtype

    model = _flagship(num_embeddings=(0, 0, 512, 512, 512), encoder="resnet50")
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, hw, hw, 3), jnp.float32)
    gt = jnp.zeros((batch, hw, hw), jnp.int32)
    with (compute_dtype(jnp.bfloat16) if half else nullcontext()):
        state = create_cps_state(model, tx, (x, gt, 0.7))
        state = cps_init_phase(model, state, x, gt, 0.7)
        state = stack_cps_state(state, tx)
        step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                           confidence_threshold=0.7,
                                           remat=not half)
        # the production driver's scan_steps path: K optimizer steps per
        # device dispatch over pre-staged batches (cfg.train.scan_steps;
        # numerics identical — tests/test_cps_training.py)
        multi = make_cps_multi_step(step, scan_steps)
        xs = tuple(jnp.stack([a] * scan_steps) for a in (x, gt, x))
        # warmup / compile; scalar fetch = hard sync
        state, m, _, _ = multi(state, *xs)
        float(m["loss"])
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m, _, _ = multi(state, *xs)
            float(m["loss"])  # forces the whole donated-state chain
            dt = (time.perf_counter() - t0) / (iters * scan_steps)
            best = max(best, 2 * batch / dt)

    print(json.dumps({
        "metric": "flagship CPS train step images/sec/chip @512^2 (bs 4+4, resnet50, K=512 VQ, bf16, scan_steps=8)",
        "value": round(best, 3),
        "unit": "images/sec",
        "vs_baseline": round(best / (5 * CPU_BASELINE_IPS), 3),
    }))


if __name__ == "__main__":
    main()
