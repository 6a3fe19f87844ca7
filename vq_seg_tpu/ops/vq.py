"""VQ codebook assignment: the hot op of the framework.

Reference behaviour being reproduced (vector_quantizer/vq_img.py:160-177 for
euclidean, :92-116 for cosine): flatten features to rows, compute pairwise
distance/similarity to a (K, C) codebook, argmin/argmax, gather the selected
code rows, and report ``code_usage`` = 100 * (#codes with zero assignments)/K.

TPU-first design: the distance matrix is never materialised in HBM.  The
public entry ``vq_assign`` dispatches to a fused Pallas kernel on TPU
(vq_seg_tpu.ops.vq_pallas) and to an XLA path elsewhere.  The op is
non-differentiable by construction (argmin/gather); the straight-through
estimator and commitment loss live in the caller (models/modules), matching
vq_img.py:236-240.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vq_seg_tpu.ops.kmeans import l2norm

_FORCE_IMPL = None  # test hook: "xla" | "pallas" | None (auto)


def set_impl(impl):
    """Force the assignment implementation ("xla", "pallas", or None=auto)."""
    global _FORCE_IMPL
    _FORCE_IMPL = impl


def _use_pallas() -> bool:
    if _FORCE_IMPL == "xla":
        return False
    if _FORCE_IMPL == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("metric",))
def vq_assign_xla(x: jnp.ndarray, codebook: jnp.ndarray, metric: str = "euclidean"):
    """XLA reference path.  x (N, C), codebook (K, C) ->
    (idx (N,) int32, quantized (N, C), counts (K,) int32)."""
    x = x.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    k = codebook.shape[0]
    if metric == "euclidean":
        # ||x-e||^2 = ||x||^2 - 2 x.e + ||e||^2 ; ||x||^2 constant per row,
        # dropped — it does not change the argmin.
        scores = -2.0 * (x @ codebook.T) + jnp.sum(codebook * codebook, axis=-1)[None, :]
        idx = jnp.argmin(scores, axis=-1).astype(jnp.int32)
    elif metric == "cosine":
        # caller pre-normalises x and codebook (vq_img.py:97-100)
        sims = x @ codebook.T
        idx = jnp.argmax(sims, axis=-1).astype(jnp.int32)
    else:
        raise ValueError(f"unknown metric {metric}")
    quantized = jnp.take(codebook, idx, axis=0)
    counts = jnp.bincount(idx, length=k)
    return idx, quantized, counts


def vq_assign(x: jnp.ndarray, codebook: jnp.ndarray, metric: str = "euclidean"):
    """Fused codebook assignment with automatic Pallas/XLA dispatch."""
    if _use_pallas():
        try:
            from vq_seg_tpu.ops.vq_pallas import vq_assign_pallas

            return vq_assign_pallas(x, codebook, metric=metric)
        except ValueError:
            pass  # unsupported shape (lane alignment / small K) -> XLA path
    return vq_assign_xla(x, codebook, metric=metric)


def code_usage_percent(counts: jnp.ndarray) -> jnp.ndarray:
    """100 * unused/K — lower is better (vq_img.py:112-114, 172-175)."""
    k = counts.shape[0]
    return 100.0 * jnp.sum(counts == 0).astype(jnp.float32) / k


def quantize_ste(x: jnp.ndarray, quantized: jnp.ndarray) -> jnp.ndarray:
    """Straight-through estimator: value = quantized, grad flows to x
    (vq_img.py:236)."""
    return x + jax.lax.stop_gradient(quantized - x)


def commitment_loss(x: jnp.ndarray, quantized_ste: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """mse(stop_grad(quantize), x) * weight (vq_img.py:237-240).

    Note the reference detaches the post-STE quantize, whose *value* equals
    the hard codes — so this pulls the encoder toward the (frozen) codebook.
    """
    return weight * jnp.mean((jax.lax.stop_gradient(quantized_ste) - x) ** 2)


def cosine_prep(x: jnp.ndarray, codebook: jnp.ndarray):
    """l2-normalise inputs and codebook for the cosine metric
    (vq_img.py:97-100)."""
    return l2norm(x), l2norm(codebook)
