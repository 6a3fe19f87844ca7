"""Dice loss (reference loss/dice_loss.py:5-67), NHWC.

Reference semantics preserved exactly — including its quirky ignore-index
treatment: ignored pixels get their *logits zeroed* and their target forced
to class 0, which still contributes the class-0 one-hot to the denominator
(dice_loss.py:16-18).  The reference hard-codes a 3-channel mask stack
(``[mask]*3``, dice_loss.py:17); here the broadcast covers any C, which is
behaviour-identical at C==3 and correct (vs crashing) otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_coefficient(pred, target, num_classes: int, ignore_index=None):
    """pred (N,H,W,C) logits; target (N,H,W) int -> per-class dice (C,)."""
    n = pred.shape[0]
    c = pred.shape[-1]
    pred = pred.reshape(n, -1, c).astype(jnp.float32)
    target = target.reshape(n, -1)
    if ignore_index is not None:
        mask = (target != ignore_index)
        pred = pred * mask[..., None]
        target = target * mask
    if num_classes == 1:
        tgt = target.astype(pred.dtype)[..., None]
        prd = jax.nn.sigmoid(pred)
    else:
        tgt = jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=pred.dtype)
        prd = jax.nn.softmax(pred, axis=-1)
    inter = jnp.sum(prd * tgt, axis=1)          # (N, C)
    sum_sets = jnp.sum(prd + tgt, axis=1)       # (N, C)
    return jnp.mean(2 * inter / (sum_sets + 1e-6), axis=0)  # (C,)


def dice_loss(pred, target, num_classes: int = 3, weight=None, ignore_index=None):
    dice = dice_coefficient(pred, target, num_classes, ignore_index)
    if weight is not None:
        w = jnp.asarray(weight)
        dl = (1.0 - dice) * w / jnp.sum(w)
        return jnp.sum(dl) / num_classes
    return 1.0 - jnp.mean(dice)


class DiceLoss:
    """Callable mirroring reference ``DiceLoss`` (dice_loss.py:60-67)."""

    def __init__(self, num_classes: int, weight=None, ignore_index=None):
        self.num_classes = num_classes
        self.weight = weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        return dice_loss(pred, target, self.num_classes, self.weight, self.ignore_index)
