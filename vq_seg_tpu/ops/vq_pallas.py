"""Fused Pallas TPU kernel for VQ codebook assignment.

The reference hot path (vector_quantizer/vq_img.py:167-175) materialises a
full (N, K) pairwise-distance matrix in HBM (torch.cdist), argmins it, then
gathers codes via a one-hot matmul and bincounts usage — four HBM-bound
passes.  This kernel fuses distance + argmin + gather + usage count into one
pass over row tiles:

  * per (TN, C) tile of inputs: scores = -2 x @ E^T + ||e||^2 on the MXU
    (the ||x||^2 term is row-constant and dropped — it cannot change the
    argmin);
  * argmin + usage one-hot stay in VMEM; the code gather happens outside
    as a native XLA gather (exact f32 — an in-kernel one-hot matmul would
    round codebook values through the MXU's bf16 passes);
  * the (N, K) score matrix NEVER reaches HBM — the kernel writes only idx
    (N,) and counts (K,);
  * usage counts accumulate across the sequential TPU grid into one (K,)
    output block.

Codebook sits whole in VMEM: K=512, C<=2048 -> 4 MB fp32, within the
~16 MB/core budget alongside a 256-row tile.  Shapes must be lane-aligned
(C, K multiples of 128); vq_seg_tpu.ops.vq.vq_assign dispatches here on TPU
and falls back to the XLA path otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _kernel(metric: str, n_valid: int, x_ref, cb_ref, cbsq_ref, idx_ref,
            counts_ref):
    i = pl.program_id(0)
    x = x_ref[:]  # (TN, C) f32
    cb = cb_ref[:]  # (K, C) f32
    k = cb.shape[0]
    tn = x.shape[0]
    if metric == "euclidean":
        scores = -2.0 * jnp.dot(x, cb.T, preferred_element_type=jnp.float32) + cbsq_ref[:]
        idx = jnp.argmin(scores, axis=-1).astype(jnp.int32)
    else:  # cosine: inputs pre-normalised by the caller
        scores = jnp.dot(x, cb.T, preferred_element_type=jnp.float32)
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1) == idx[:, None])
    # mask padded rows out of the usage count
    row_ids = i * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0)
    valid = (row_ids < n_valid)
    onehot_f = (onehot & valid).astype(jnp.float32)
    # idx output keeps its full (n_tiles, TN) block resident; each grid step
    # writes one row (TPU grids are sequential, so no races)
    idx_ref[pl.ds(i, 1), :] = idx[None, :]

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    counts_ref[:] += jnp.sum(onehot_f, axis=0).astype(jnp.int32)[None, :]


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def vq_assign_pallas(x: jnp.ndarray, codebook: jnp.ndarray, metric: str = "euclidean"):
    """x (N, C), codebook (K, C) -> (idx (N,) i32, quantized (N, C) f32,
    counts (K,) i32).  Same contract as ops.vq.vq_assign_xla.

    Declared non-differentiable (custom_jvp with zero tangents): the
    assignment is piecewise constant and every caller stop_gradients the
    outputs anyway (STE, vq_img.py:236-240); this also keeps jax.checkpoint
    from tracing a JVP through pallas_call (which has no TPU grid context
    in that trace)."""
    return _vq_assign_pallas_impl(x, codebook, metric)


@vq_assign_pallas.defjvp
def _vq_assign_pallas_jvp(metric, primals, tangents):
    from jax.custom_derivatives import zero_from_primal

    out = _vq_assign_pallas_impl(*primals, metric)
    idx, quant, counts = out
    return out, (zero_from_primal(idx), jnp.zeros_like(quant), zero_from_primal(counts))


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def _vq_assign_pallas_impl(x: jnp.ndarray, codebook: jnp.ndarray, metric: str = "euclidean",
                           interpret: bool = False):
    """``interpret=True`` runs the kernel through the Pallas interpreter —
    the same kernel logic, executable on CPU, so the grid/accumulator/
    masking code is covered by the regular suite and not only by the
    TPU-only timing test (tests/test_pallas_interpret.py)."""
    n, c = x.shape
    k = codebook.shape[0]
    # K >= 256: Mosaic's argmin lowering fails on a single 128-lane block
    # (unrealized f32->i32 materialization); the XLA path covers small K.
    if c % 128 != 0 or k % 128 != 0 or k < 256:
        raise ValueError(f"pallas vq_assign needs lane-aligned shapes, got C={c}, K={k}")
    x = x.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    cb_sq = jnp.sum(codebook * codebook, axis=-1)[None, :]  # (1, K)

    grid = (n_pad // TILE_N,)
    idx, counts = pl.pallas_call(
        functools.partial(_kernel, metric, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad // TILE_N, TILE_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // TILE_N, TILE_N), jnp.int32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * c,  # the distance matmul
            bytes_accessed=n_pad * c * 4 + k * c * 4 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, codebook, cb_sq)
    idx = idx.reshape(-1)[:n]
    # exact row gather with XLA (one-hot matmuls on the MXU round codebook
    # values through bf16; the STE hands these to the decoder, so use the
    # native gather)
    quant = jnp.take(codebook, idx, axis=0)
    return idx, quant, counts[0]
