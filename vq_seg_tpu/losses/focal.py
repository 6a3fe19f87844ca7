"""Focal loss (reference loss/focal_loss.py), NHWC.

Two reference quirks preserved / documented:
  * ``FocalLoss.forward`` softmaxes, then the inner function softmaxes AGAIN
    (focal_loss.py:63-68 + :21) — the class path reproduces the double
    softmax for parity.
  * ignored pixels have logits zeroed and target forced to 0, then enter
    ``-log(p)`` — the reference would emit inf there; we clamp the log at
    1e-12 (documented divergence, keeps jit-grad finite).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(pred, target, alpha=0.25, gamma=2.0, num_classes: int = 3,
               ignore_index=None, reduction: str = "sum", weight=None,
               _presoftmaxed: bool = False):
    """pred (N,H,W,C) logits (or probabilities when _presoftmaxed);
    target (N,H,W) int."""
    n = pred.shape[0]
    c = pred.shape[-1]
    pred = pred.reshape(n, -1, c).astype(jnp.float32)
    target = target.reshape(n, -1)
    if ignore_index is not None:
        mask = (target != ignore_index)
        pred = pred * mask[..., None]
        target = target * mask
    if num_classes == 1:
        p = jax.nn.sigmoid(pred)
    else:
        p = jax.nn.softmax(pred, axis=-1)
    onehot = jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=p.dtype)
    if weight is not None:
        onehot = onehot * jnp.asarray(weight)[None, None, :]
    focal = (1.0 - p) ** gamma
    ce = -jnp.log(jnp.maximum(p, 1e-12))
    fl = jnp.sum(alpha * focal * ce * onehot, axis=-1)  # (N, HW)
    if reduction == "none":
        return fl
    if reduction == "mean":
        # reference parity: focal_loss.py:44-48 divides by sum(weight) but
        # then OVERWRITES the result with plain torch.mean(focal_loss) — the
        # division is dead code, so weighted mean == unweighted mean of the
        # weighted per-pixel terms
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    raise NotImplementedError(f"Invalid reduction mode: {reduction}")


class FocalLoss:
    """Callable mirroring reference ``FocalLoss`` (focal_loss.py:55-68),
    including its double softmax."""

    def __init__(self, num_classes: int, alpha=0.25, gamma=2.0, ignore_index=-100,
                 reduction: str = "mean", weight=None):
        self.num_classes = num_classes
        self.alpha = alpha
        self.gamma = gamma
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.weight = weight

    def __call__(self, pred, target):
        if self.num_classes == 1:
            pred = jax.nn.sigmoid(pred)
        else:
            pred = jax.nn.softmax(pred, axis=-1)
        return focal_loss(pred, target, self.alpha, self.gamma, self.num_classes,
                          self.ignore_index, self.reduction, self.weight)
