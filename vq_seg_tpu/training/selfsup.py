"""Self-supervised VQ-VAE codebook pretraining
(reference deprecated/self_sup_train.py:22-128, call stack SURVEY.md §3.5).

Per step: recon = mse(decoder_output, input resized to output);
loss = recon + commitment.  Checkpoints split encoder/codebook/decoder for
``load_pretrained``-style reuse (utils/ckpoints.save_vqvae).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vq_seg_tpu.models.layers import resize_bilinear
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.supervised import TrainState, create_state, init_phase


def make_selfsup_train_step(model, tx):
    def loss_fn(params, state, img):
        variables = {**state.variables, "params": params}
        # "codebook" mutable for the opt-in EMA update (vq_cfg.ema) — the
        # natural fit here: VQ-VAE codebook pretraining with a frozen
        # (kmeans-initted) codebook only learns the encoder around it
        (recon, commit, usage), mut = model.apply(
            variables, img, train=True, mutable=["batch_stats", "codebook"])
        target = img if img.shape[1:3] == recon.shape[1:3] else resize_bilinear(img, recon.shape[1:3])
        recon_loss = jnp.mean((recon - target) ** 2)
        loss = recon_loss + commit
        aux = dict(mutated=dict(mut),
                   metrics=dict(loss=loss, recon_loss=recon_loss, commitment_loss=commit,
                                code_usage=jnp.mean(usage) if usage.size else jnp.float32(0.0)),
                   recon=recon)
        return loss, aux

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, img):
        grads, aux = jax.grad(loss_fn, has_aux=True)(state.variables["params"], state, img)
        updates, opt_state = tx.update(grads, state.opt_state, state.variables["params"])
        new_state = state.replace(
            variables={**state.variables, "params": optax.apply_updates(
                state.variables["params"], updates), **aux["mutated"]},
            opt_state=opt_state, step=state.step + 1)
        return new_state, aux["metrics"], aux["recon"]

    return train_step


def train(cfg, max_steps_per_epoch: Optional[int] = None):
    from vq_seg_tpu.data import FolderDataset, Loader
    from vq_seg_tpu.training.schedules import make_lr_schedule
    from vq_seg_tpu.utils.ckpoints import save_vqvae
    from vq_seg_tpu.utils.seed import seed_everything

    seed_everything()
    model = make_model(cfg.model)
    dataset = FolderDataset(cfg.train.data_dir, resize=cfg.resize)
    loader = Loader(dataset, cfg.train.batch_size, shuffle=True)
    steps_per_epoch = len(loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(loader))
    tx = optax.adam(schedule)
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    state = create_state(model, tx, (sample,))
    step = make_selfsup_train_step(model, tx)
    ckpt_dir = None
    if cfg.train.get("save_dir"):
        # keyed on save_dir, not wandb_logging (SURVEY.md §3.1 landmine)
        ckpt_dir = os.path.join(cfg.train.save_dir, "selfsup_ckpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
    initted = False
    for epoch in range(cfg.train.num_epochs):
        sums: dict = {}
        t0 = time.time()
        it = iter(loader)
        for _ in range(steps_per_epoch):
            img = jnp.asarray(next(it)["img"])
            if not initted:
                state = init_phase(model, state, (img,))
                initted = True
            state, metrics, recon = step(state, img)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        avg = {k: float(v / steps_per_epoch) for k, v in sums.items()}
        print(f"[Epoch{epoch}] " + ", ".join(f"{k}={v:.4f}" for k, v in avg.items())
              + f", {time.time() - t0:.1f}s")
        if ckpt_dir is not None:
            save_vqvae(state.variables, epoch, ckpt_dir)
    return state
