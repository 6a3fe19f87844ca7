"""Stateless LR schedules matching reference utils/lr_schedulers.py:89-112.

Each factory returns a jit-friendly `step -> lr` function usable directly as
an optax schedule.  Semantics preserved (incl. the cosine schedule ignoring
warmup except in its denominator, and poly's linear warmup ramp).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_poly(start_lr: float, lr_power: float, total_iters: int, warmup_steps: int):
    """Reference WarmUpPolyLR.get_lr (utils/lr_schedulers.py:89-101)."""
    total = float(total_iters)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_lr * (step / max(warmup_steps, 1))
        poly = start_lr * (1.0 - step / total) ** lr_power
        if warmup_steps <= 0:
            return poly
        return jnp.where(step < warmup_steps, warm, poly)

    return schedule


def cosine_annealing(start_lr: float, min_lr: float, total_iters: int, warmup_steps: int = 0):
    """Reference CosineAnnealingLR.get_lr (utils/lr_schedulers.py:103-112).

    Note: faithfully, warmup_steps only shortens the cosine period — the
    reference has no actual warmup ramp on this schedule.
    """
    denom = float(total_iters) - float(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return min_lr + 0.5 * (start_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * step / denom))

    return schedule


def make_lr_schedule(train_cfg, steps_per_epoch: int):
    """Build the schedule the flagship trainer selects from config.

    Reference: train_vqreptunet1x1v2.py:99-104 (note its `warmuppoly` branch
    crashes on a cfg typo; here both branches work).
    """
    sched_cfg = train_cfg.lr_scheduler
    total_iters = steps_per_epoch * train_cfg.num_epochs
    if sched_cfg.name == "warmuppoly":
        return warmup_poly(
            train_cfg.learning_rate,
            lr_power=sched_cfg.get("lr_power", 0.9),
            total_iters=total_iters,
            warmup_steps=steps_per_epoch * sched_cfg.get("warmup_epoch", 0),
        )
    if sched_cfg.name == "cosineannealing":
        return cosine_annealing(
            train_cfg.learning_rate,
            min_lr=sched_cfg.min_lr,
            total_iters=total_iters,
            warmup_steps=sched_cfg.get("warmup_steps", 0),
        )
    if sched_cfg.name == "poly":
        # reference utils/lr_schedulers.py:58-63: lr * (1 - iter/max)^power,
        # power default 0.9 (config/vq_pt_unet_easyhard.json uses this name)
        return warmup_poly(
            train_cfg.learning_rate,
            lr_power=sched_cfg.get("power", 0.9),
            total_iters=total_iters,
            warmup_steps=0,
        )
    if sched_cfg.name == "multistep":
        # reference :53-57: step decay x0.1 at each milestone EPOCH
        # (default milestones: num_epochs/3 spacing, :35-41)
        default_ms = list(range(0, int(train_cfg.num_epochs),
                                max(1, int(train_cfg.num_epochs) // 3)))[1:]
        ms = [int(m) * steps_per_epoch
              for m in sched_cfg.get("milestones", default_ms)]
        base = float(train_cfg.learning_rate)

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            power = sum(jnp.where(step >= m, 1.0, 0.0) for m in ms)
            return base * jnp.power(0.1, power)

        return schedule
    raise ValueError(f"unknown lr scheduler: {sched_cfg.name}")
