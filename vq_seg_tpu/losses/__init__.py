"""Loss registry (reference loss/__init__.py:1-33).

All losses are pure jnp functions over NHWC logits + (N,H,W) int targets,
usable directly inside a jitted train step.  ``make_loss`` mirrors the
reference factory surface.
"""
from __future__ import annotations

import jax.numpy as jnp

from vq_seg_tpu.losses.cross_entropy import cross_entropy_loss, nll_loss  # noqa: F401
from vq_seg_tpu.losses.dice import DiceLoss, dice_loss  # noqa: F401
from vq_seg_tpu.losses.focal import FocalLoss, focal_loss  # noqa: F401
from vq_seg_tpu.losses.contrastive import SupConLoss, supcon_loss  # noqa: F401
from vq_seg_tpu.losses.dc import DCLoss, dc_loss  # noqa: F401


class _CE:
    def __init__(self, ignore_index=-100, weight=None):
        self.ignore_index = ignore_index
        self.weight = weight

    def __call__(self, pred, target):
        return cross_entropy_loss(pred, target, ignore_index=self.ignore_index,
                                  weight=self.weight)


class _NLL:
    def __init__(self, ignore_index=-100, weight=None):
        self.ignore_index = ignore_index
        self.weight = weight

    def __call__(self, pred, target):
        return nll_loss(pred, target, ignore_index=self.ignore_index, weight=self.weight)


loss_dict = {
    "cross_entropy": _CE,
    "dice_loss": DiceLoss,
    "focal_loss": FocalLoss,
    "nll_loss": _NLL,
}

loss_func_dict = {
    "cross_entropy": cross_entropy_loss,
    "dice_loss": dice_loss,
    "focal_loss": focal_loss,
    "nll_loss": nll_loss,
}


def make_loss(loss_name: str, num_classes: int, ignore_index: int = -100, weight=None):
    """Name -> callable loss (reference loss/__init__.py:20-25)."""
    if loss_name in ("cross_entropy", "nll_loss"):
        return loss_dict[loss_name](ignore_index=ignore_index, weight=weight)
    return loss_dict[loss_name](num_classes=num_classes, ignore_index=ignore_index, weight=weight)


def make_loss_as_func(loss_name: str):
    return loss_func_dict[loss_name]


def compute_class_weight(num_classes: int, y):
    """Inverse-frequency class weights: 1 - count/total
    (reference loss/__init__.py:28-33)."""
    counts = jnp.bincount(jnp.reshape(y, (-1,)), length=num_classes)
    prob = counts / jnp.sum(counts)
    return 1.0 - prob
