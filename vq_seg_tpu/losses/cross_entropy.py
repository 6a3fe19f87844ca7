"""Cross-entropy / NLL with ignore_index and class weights.

torch ``nn.CrossEntropyLoss(weight, ignore_index)`` semantics
(the reference's sup/CPS criterion, train_vqreptunet1x1v2.py:83): mean over
non-ignored pixels, weighted mean normalised by the summed weights of the
kept pixels.  NHWC logits here (reference is NCHW).

TPU layout note: segmentation logits have C (=3) in the 128-lane dimension;
computing softmax/gather there runs at ~2% lane utilisation (measured
16.6 ms for one CE at 512^2 bs4).  The math below transposes to class-major
(C, M) — classes in sublanes, pixels in lanes — and replaces the per-pixel
gather with a one-hot masked sum: 1.2 ms, bit-identical result.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _class_major(pred):
    c = pred.shape[-1]
    # f32 accumulate even when the model emits bf16 activations
    return pred.reshape(-1, c).astype(jnp.float32).T  # (C, M)


def cross_entropy_loss(pred, target, ignore_index: int = -100, weight=None):
    """pred (N,H,W,C) logits; target (N,H,W) int."""
    z = _class_major(pred)
    t = target.reshape(-1).astype(jnp.int32)
    keep = (t != ignore_index)
    logp = jax.nn.log_softmax(z, axis=0)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) == t[None, :])
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=0)
    if weight is not None:
        wvec = jnp.asarray(weight)
        w = jnp.sum(jnp.where(onehot, wvec[:, None], 0.0), axis=0) * keep
    else:
        w = keep.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def nll_loss(pred, target, ignore_index: int = -100, weight=None):
    """pred (N,H,W,C) log-probabilities; target (N,H,W) int."""
    z = _class_major(pred)
    t = target.reshape(-1).astype(jnp.int32)
    keep = (t != ignore_index)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) == t[None, :])
    nll = -jnp.sum(jnp.where(onehot, z, 0.0), axis=0)
    if weight is not None:
        wvec = jnp.asarray(weight)
        w = jnp.sum(jnp.where(onehot, wvec[:, None], 0.0), axis=0) * keep
    else:
        w = keep.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
