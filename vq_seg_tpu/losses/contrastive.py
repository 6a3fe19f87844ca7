"""Pixel supervised-contrastive loss (reference loss/contrastive_loss.py:9-30).

Contrast between the first two batch items' decoder features: positives are
pixel pairs sharing a label.  NHWC features; labels (N,H,W).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def supcon_loss(x, label, temperature: float = 0.04):
    """x (N,H,W,C) with N >= 2; label (N,h,w) int."""
    n, h, w, c = x.shape
    if label.shape[1:] != (h, w):
        label = jax.image.resize(label.astype(jnp.float32), (label.shape[0], h, w),
                                 method="nearest")
    f1 = x[0].reshape(-1, c)
    f2 = x[1].reshape(-1, c)
    g1 = label[0].reshape(-1)
    g2 = label[1].reshape(-1)
    logits = (f1 @ f2.T) / temperature  # (HW, HW)
    # max-subtraction cancels in the ratio below — pure overflow guard
    # (the reference exponentiates raw logits, contrastive_loss.py:26, which
    # overflows for unbounded features)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits))
    sim = jnp.exp(logits)
    pos = (g1[:, None] == g2[None, :])
    hw = h * w
    return -jnp.log(jnp.sum(sim * pos) / jnp.sum(sim)) / (hw * hw)


class SupConLoss:
    def __init__(self, temperature: float = 0.04):
        self.temperature = temperature

    def __call__(self, x, label):
        return supcon_loss(x, label, self.temperature)
