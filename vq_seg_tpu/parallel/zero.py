"""ZeRO-style sharded optimizer state over the data axis (SURVEY §2.9).

The reference is single-GPU, so its Adam moments are simply resident
(train_vqreptunet1x1v2.py keeps two full optimizers).  Multi-chip data
parallelism replicates params AND moments on every chip; the moments are
pure per-parameter state that is only read/written by the elementwise Adam
update, so replicating them wastes 2x the parameter bytes per chip.

TPU-native ZeRO-1 needs no hand-written collectives: give each Adam moment
leaf a layout sharded over the ``data`` axis and jit does the rest — the
elementwise moment update runs shard-local, and XLA inserts exactly one
all-gather where the (sharded) parameter update meets the replicated
parameters.  This trades an update-sized all-gather per step for a
2x-parameter-bytes HBM saving per chip — the standard ZeRO-1 contract
(Rajbhandari et al., 2019), expressed as shardings instead of code.

Composition: the train steps donate their state, and GSPMD propagates the
input layout, so sharding the moments ONCE before the first step keeps them
sharded for the whole run.  Used by ``training/cps.train`` when
``cfg.train.zero_opt`` is set (scripts/train.py --zero).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(a, n_data: int) -> P:
    """Shard the largest dimension divisible by n_data; replicate scalars
    and odd shapes (counts, schedules, small BN vectors)."""
    shape = getattr(a, "shape", ())
    best = None
    for d, s in enumerate(shape):
        if s % n_data == 0 and s >= n_data and (best is None or s > shape[best]):
            best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def zero_opt_shardings(opt_state, mesh: Mesh):
    """NamedSharding tree for an optax state: moments sharded over "data"."""
    n_data = dict(mesh.shape).get("data", 1)
    return jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, _leaf_spec(a, n_data)), opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Lay an optax state out ZeRO-style: each moment leaf sharded over the
    mesh's data axis (largest divisible dim), scalars replicated."""
    shardings = zero_opt_shardings(opt_state, mesh)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)


def opt_bytes_per_chip(opt_state) -> int:
    """Actual optimizer bytes resident on the first device (diagnostics)."""
    total = 0
    for a in jax.tree_util.tree_leaves(opt_state):
        if hasattr(a, "addressable_shards"):
            shard = a.addressable_shards[0]
            total += int(np.prod(shard.data.shape)) * a.dtype.itemsize
        elif hasattr(a, "nbytes"):
            total += a.nbytes
    return total
