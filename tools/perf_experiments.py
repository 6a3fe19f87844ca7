"""Single-chip perf experiments for the flagship CPS step (VERDICT #6).

Measures images/sec for a list of structural variants so each lever's value
is known before changing defaults.  Run on the real TPU:

    python tools/perf_experiments.py [--iters 8] [--hw 512] [--batch 4]

Variants:
  baseline              current defaults (reflect encoder, ref channel plan)
  dec_512               decoder plan (512,256,128,64,32) — half-width top
  dec_256               decoder plan (256,128,64,48,32)  — quarter-width top
  pad_zeros             encoder zero padding (sizes the reflect-pad cost;
                        semantic divergence — measurement only)
  bs8                   batch 8+8 (MXU utilisation headroom)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from contextlib import nullcontext

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax


def run_variant(name, batch, hw, iters, decoder_channels=None, padding_mode=None):
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.models.layers import compute_dtype
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    params = {
        "encoder_name": "resnet50", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 512, 512, 512],
                   "distance": "euclidean", "kmeans_init": True},
        "margin": 0.5, "scale": 30.0, "depth": 5,
    }
    if decoder_channels is not None:
        params["decoder_channels"] = list(decoder_channels)
    model = make_model({"name": "vqreptunet1x1v2", "params": params})
    if padding_mode is not None:
        # _PTNet hard-codes reflect in _trunk; monkeypatch at module level
        import vq_seg_tpu.models.networks.vq_unet as vqu
        from flax.core import FrozenDict

        orig = vqu._PTNet._trunk

        def _trunk(self, x, train, init_codebook):
            core = vqu.VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)),
                                  self.in_channels, self.decoder_channels, self.depth,
                                  padding_mode=padding_mode, name="core")
            return core(x, train, init_codebook)

        vqu._PTNet._trunk = _trunk
    try:
        tx = optax.adam(1e-4)
        dice = make_loss("dice_loss", 3, ignore_index=255)
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (batch, hw, hw, 3), jnp.float32)
        gt = jnp.zeros((batch, hw, hw), jnp.int32)
        with compute_dtype(jnp.bfloat16):
            state = create_cps_state(model, tx, (x, gt, 0.7))
            state = cps_init_phase(model, state, x, gt, 0.7)
            state = stack_cps_state(state, tx)
            step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                               confidence_threshold=0.7, remat=False)
            state, m, _, _ = step(state, x, gt, x)
            float(m["loss"])
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, m, _, _ = step(state, x, gt, x)
                float(m["loss"])
                dt = (time.perf_counter() - t0) / iters
                best = max(best, 2 * batch / dt)
        print(json.dumps({"variant": name, "img_per_s": round(best, 2),
                          "ms_per_step": round(2 * batch / best * 1e3, 1)}),
              flush=True)
        return best
    finally:
        if padding_mode is not None:
            vqu._PTNet._trunk = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    variants = {
        "baseline": dict(),
        "dec_512": dict(decoder_channels=(512, 256, 128, 64, 32)),
        "dec_256": dict(decoder_channels=(256, 128, 64, 48, 32)),
        "pad_zeros": dict(padding_mode="zeros"),
        "bs8": dict(),
        "dec_256_bs8": dict(decoder_channels=(256, 128, 64, 48, 32)),
    }
    for name, kw in variants.items():
        if args.only and name != args.only:
            continue
        batch = 8 if name.endswith("bs8") else args.batch
        run_variant(name, batch, args.hw, args.iters, **kw)


if __name__ == "__main__":
    main()
