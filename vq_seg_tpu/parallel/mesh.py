"""Device mesh + sharding policy — the framework's scaling layer.

The reference is single-GPU (utils/device.py:4-10 picks cuda:N; no
torch.distributed anywhere — SURVEY.md §2.9).  The TPU-native equivalent is
GSPMD: one ``jax.sharding.Mesh`` with a ``data`` axis over ICI, parameters
replicated, batches sharded on axis 0.  ``jit``-ing the train step with
these shardings makes XLA insert the gradient all-reduce (psum) over ICI —
no NCCL/MPI analogue exists or is needed.

A ``model`` axis is declared (size 1 by default) so channel-sharded tensor
parallelism can be enabled later without re-plumbing: conv kernels would
shard their output-channel dim over it.  A ``space`` axis (size 1 by
default) spatially partitions image rows across chips — GSPMD inserts the
conv halo exchanges over ICI (scripts/train.py --spatial; equivalence:
tests/test_sharding.py::test_spatial_sharded_step_matches_single).

BatchNorm note: under jit+GSPMD, ``jnp.mean`` over the sharded batch axis is
a GLOBAL reduction (the partitioner inserts the all-reduce), so BatchNorm
sees the full global batch exactly as the reference's single-device BN does
— sync-BN comes for free, unlike pmap-style per-replica stats.  Verified by
tests/test_sharding.py::test_stacked_cps_step_multi_device_matches_single
(8-device losses/params match single-device to fp tolerance).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_space: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ("data", "model", "space") axes; defaults to all devices
    on data.

    ``space`` is the SPATIAL partitioning axis: image ROWS (H, axis 1 of an
    NHWC batch) shard over it and GSPMD's spatial partitioner inserts the
    conv halo exchanges over ICI — the TPU-native way to spread ONE image's
    pixels across chips when the batch is smaller than the pod slice, or
    when one chip's HBM cannot hold the activations of a very large
    ``resize``.  Size 1 (the default) makes it inert."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_space)
    arr = np.asarray(devices[: n_data * n_model * n_space]).reshape(
        n_data, n_model, n_space)
    return Mesh(arr, ("data", "model", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis (inputs, labels); with an active
    ``space`` axis, image rows (axis 1 = H) shard over it too."""
    if dict(mesh.shape).get("space", 1) > 1:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch_fn(mesh: Mesh):
    """Returns a device_put-ing callable for Loader(device_put=...) that lays
    host batches out over the data axis (H2D overlaps compute under jit)."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return put


def pad_to_devices(batch_size: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= batch_size."""
    return -(-batch_size // n_devices) * n_devices
