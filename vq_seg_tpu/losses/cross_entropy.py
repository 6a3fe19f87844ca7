"""Cross-entropy / NLL with ignore_index and class weights.

torch ``nn.CrossEntropyLoss(weight, ignore_index)`` semantics
(the reference's sup/CPS criterion, train_vqreptunet1x1v2.py:83): mean over
non-ignored pixels, weighted mean normalised by the summed weights of the
kept pixels.  NHWC logits here (reference is NCHW).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(pred, target, ignore_index: int = -100, weight=None):
    """pred (N,H,W,C) logits; target (N,H,W) int."""
    c = pred.shape[-1]
    logp = jax.nn.log_softmax(pred, axis=-1).reshape(-1, c)
    t = target.reshape(-1).astype(jnp.int32)
    keep = (t != ignore_index)
    t_safe = jnp.where(keep, t, 0)
    nll = -jnp.take_along_axis(logp, t_safe[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = jnp.asarray(weight)[t_safe] * keep
    else:
        w = keep.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def nll_loss(pred, target, ignore_index: int = -100, weight=None):
    """pred (N,H,W,C) log-probabilities; target (N,H,W) int."""
    c = pred.shape[-1]
    logp = pred.reshape(-1, c)
    t = target.reshape(-1).astype(jnp.int32)
    keep = (t != ignore_index)
    t_safe = jnp.where(keep, t, 0)
    nll = -jnp.take_along_axis(logp, t_safe[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = jnp.asarray(weight)[t_safe] * keep
    else:
        w = keep.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
