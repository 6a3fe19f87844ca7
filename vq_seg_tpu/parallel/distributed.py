"""Multi-host (multi-process) data-parallel helpers.

The reference is one process on one GPU (SURVEY.md §2.9); this is the
framework's own scale-out layer for real TPU pods, following the standard
JAX multi-controller recipe:

  1. ``initialize()`` — ``jax.distributed.initialize`` (one call per host;
     env-driven on TPU pods, explicit coordinator elsewhere).
  2. Build ONE global mesh over ``jax.devices()`` (spans all hosts).
  3. Each host loads ITS shard of the dataset (``host_shard``) at the local
     batch size and assembles a global array with ``make_global_batch`` —
     the jitted train step then runs SPMD with XLA collectives over ICI/DCN.

Single-host meshes work unchanged (process_count == 1), so everything here
is exercised by the 8-device virtual CPU mesh tests.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Bring up the multi-controller runtime.  On TPU pods all arguments are
    discovered from the environment; pass them explicitly elsewhere.  Safe
    to call when already initialised (no-op) or single-process."""
    # do NOT probe jax.process_count() here: it initialises the XLA backend,
    # after which jax.distributed.initialize refuses to run.  The
    # distributed-client state is inspectable without touching the backend.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # single-process / non-cluster environments have nothing to
            # auto-discover — only the env-driven path may soft-fail
            pass
    else:
        # explicit topology: failures here are real configuration errors
        # and must surface (a swallowed one silently runs single-process)
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def host_shard(items: Sequence, process_index: Optional[int] = None,
               process_count: Optional[int] = None):
    """Deterministic per-host slice of a (sorted) item list: host i takes
    items[i::count].  Every host must pass the same ``items`` order."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]


def make_global_batch(local_batch: np.ndarray, mesh: Mesh,
                      axis: str = "data"):
    """Assemble a globally-sharded array from each host's LOCAL batch.

    ``local_batch`` is this host's slice (global_batch = local * n_hosts,
    sharded over ``axis``).  Single-host: equivalent to a device_put with
    batch sharding."""
    sharding = NamedSharding(mesh, P(axis))
    global_shape = (local_batch.shape[0] * jax.process_count(),) + local_batch.shape[1:]
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch,
                                                  global_shape)


def shard_host_batch_fn(mesh: Mesh, axis: str = "data"):
    """Loader(device_put=...) callable for multi-host training: each host's
    local batch becomes its slice of the global sharded batch."""

    def put(x):
        return make_global_batch(np.asarray(x), mesh, axis)

    return put
