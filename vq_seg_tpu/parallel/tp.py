"""Tensor-parallel parameter sharding policy.

The reference is single-device (SURVEY.md §2.9), so TP has no port target —
this is the framework's own scaling layer: conv kernels shard their
output-channel dimension over the mesh's ``model`` axis and XLA GSPMD
propagates the layouts (activations pick up channel sharding; the
channel-mixing convs insert all-gathers/reduce-scatters over ICI as
needed).  BN scales/biases and small tensors stay replicated.

Use: ``shardings = tp_param_shardings(params, mesh)`` then
``params = jax.device_put(params, shardings)`` before jitting the step.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_leaf: str, x, min_channels: int = 64) -> P:
    """Shard the trailing (output-channel) dim of large conv/dense kernels."""
    if path_leaf == "kernel" and getattr(x, "ndim", 0) in (2, 4) and \
            x.shape[-1] >= min_channels:
        return P(*([None] * (x.ndim - 1) + ["model"]))
    return P()


def tp_param_shardings(params, mesh: Mesh, min_channels: int = 64):
    """A pytree of NamedShardings matching ``params``: kernels channel-sharded
    over 'model', everything else replicated.  Kernels whose channel count
    doesn't divide the model-axis size stay replicated."""
    msize = mesh.shape["model"]

    def walk(tree):
        if isinstance(tree, dict):
            return {k: walk_leaf(k, v) if not isinstance(v, dict) else walk(v)
                    for k, v in tree.items()}
        return NamedSharding(mesh, P())

    def walk_leaf(key, x):
        spec = _spec_for(key, x, min_channels)
        if spec != P() and x.shape[-1] % msize != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return walk(params)


def apply_tp(variables, mesh: Mesh, min_channels: int = 64):
    """device_put a full variable dict with TP param shardings (params
    sharded; batch_stats/codebook replicated)."""
    out = {}
    for coll, tree in variables.items():
        if coll == "params":
            out[coll] = jax.device_put(tree, tp_param_shardings(tree, mesh, min_channels))
        else:
            out[coll] = jax.device_put(tree, NamedSharding(mesh, P()))
    return out
