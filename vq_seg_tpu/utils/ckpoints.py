"""Checkpointing (reference utils/ckpoints.py:7-33), orbax-backed.

Preserves the reference checkpoint *contract*:
  * ``save_ckpoints`` writes ``{model_1, model_2, epoch, batch_idx,
    optimizer_1, optimizer_2}`` to ``{save_dir}/ckpoints/{N}ep.ckpt`` and
    ``last.ckpt``
  * ``load_ckpoints(path, istrain)`` returns the train-resume tuple or just
    model_1 for eval (ckpoints.py:15-21)
  * ``save_vqvae`` stores encoder / codebook / decoder subtrees separately
    for ``load_pretrained``-style reuse (ckpoints.py:23-26)
  * ``save_tar`` gzips and removes the run dir (ckpoints.py:28-33)

Each "model" entry is the full flax variable dict (params + batch_stats +
codebook); optimizers are optax state pytrees.  Orbax writes directories,
not single files — the ``.ckpt`` suffix is a directory name.
"""
from __future__ import annotations

import functools
import os
import shutil
import tarfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


# Packed device->host fetch.  A production CPS state is ~1.5 GB across
# ~1000 leaves; through a tunneled chip (axon) the per-transfer overhead
# dominates — measured 2026-08-17: ~1000 leaf-wise fetches sustain ~0.5
# MB/s while ~32 MB transfers reach ~3 MB/s; very large SINGLE transfers
# collapse again (64 MB measured at 0.16 MB/s on a bad minute, and a
# single ~1.4 GB fetch ran >70 min before being killed).  So: pack all
# same-dtype leaves into ONE 1-D device array under jit, then fetch it in
# ~32 MB chunks with `copy_to_host_async` pipelining.  On a directly
# attached TPU this is a handful of DMAs instead of a thousand.
_PACK_THRESHOLD_BYTES = 32 * 1024 * 1024
_FETCH_CHUNK_BYTES = 32 * 1024 * 1024


@jax.jit
def _pack(leaves):
    flat = [l.ravel() for l in leaves]
    return jnp.concatenate(flat) if len(flat) > 1 else flat[0]


@functools.partial(jax.jit, static_argnums=2)
def _chunk(flat, start, n):
    return jax.lax.dynamic_slice(flat, (start,), (n,))


def _fetch_flat(flat):
    """Chunked, pipelined device->host copy of a packed 1-D array.

    One ``_chunk`` compilation serves every chunk (dynamic start, static
    size); all chunk copies are started async before the first blocking
    read so the transport can stream.  dynamic_slice clamps the final
    start to ``size - n``, so the tail chunk overlaps the previous one and
    only its suffix is used.
    """
    n = max(1, _FETCH_CHUNK_BYTES // np.dtype(flat.dtype).itemsize)
    if flat.size <= n:
        return np.asarray(flat)
    pieces = []
    for s in range(0, flat.size, n):
        clamped = min(s, flat.size - n)
        pieces.append((s, clamped, _chunk(flat, clamped, n)))
    for _, _, c in pieces:
        c.copy_to_host_async()
    out = np.empty(flat.size, np.dtype(flat.dtype))
    for s, clamped, c in pieces:
        h = np.asarray(c)[s - clamped:]
        out[s:s + h.size] = h
    return out


def _to_host(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    jax_idx = [i for i, l in enumerate(leaves)
               if isinstance(l, jax.Array) and l.size > 0]
    total = sum(leaves[i].nbytes for i in jax_idx)
    out: list = [None] * len(leaves)
    if total >= _PACK_THRESHOLD_BYTES:
        groups: dict = {}
        for i in jax_idx:
            groups.setdefault(np.dtype(leaves[i].dtype), []).append(i)
        for _dt, idxs in groups.items():
            flat = _fetch_flat(_pack([leaves[i] for i in idxs]))
            off = 0
            for i in idxs:
                n = leaves[i].size
                out[i] = flat[off:off + n].reshape(leaves[i].shape)
                off += n
    for i, l in enumerate(leaves):
        if out[i] is None:
            out[i] = np.asarray(l)
    return jax.tree_util.tree_unflatten(treedef, out)


# Async checkpointing: the reference writes last.pth EVERY epoch
# (train_…v2.py:257-259) — cheap for torch.save, but a synchronous orbax
# directory write of both models + Adam moments costs ~10-25 s, dwarfing a
# ~1 s/epoch step loop (measured on the synthetic convergence run).  One
# process-wide AsyncCheckpointer overlaps serialization with the next
# epoch's compute; each save waits for the previous one, so at most one
# write is in flight and the contract (directory fully written before the
# next save returns) holds.
_ASYNC_CKPTR = None


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves():
    """Block until any in-flight async checkpoint write completes."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _save_tree(path: str, tree: Any, async_save: bool = False,
               on_host: bool = False):
    """``on_host=True`` promises the tree is already host numpy (e.g. a
    prefetched state shared between a snapshot and last.ckpt) — skips the
    device fetch, which through a tunneled chip is the dominant save cost."""
    path = os.path.abspath(path)
    host = tree if on_host else _to_host(tree)
    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, host)
        return
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, host)


def _load_tree(path: str):
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def fetch_ckpt_tree(model_1, model_2, epoch, batch_idx, optimizer_1,
                    optimizer_2, include_optimizers: bool = True):
    """One packed device->host fetch of the checkpoint contract, for
    sharing between a ``{N}ep.ckpt`` snapshot and ``last.ckpt`` written in
    the same epoch (each ``save_ckpoints`` would otherwise re-fetch).

    ``include_optimizers=False`` fetches models only (~4x fewer bytes) —
    for cadence epochs that write just a light snapshot and no
    ``last.ckpt``; the result cannot be used to write a full contract."""
    tree = {
        "model_1": model_1,
        "model_2": model_2,
        "epoch": np.asarray(epoch),
        "batch_idx": np.asarray(batch_idx),
    }
    if include_optimizers:
        tree["optimizer_1"] = optimizer_1
        tree["optimizer_2"] = optimizer_2
    return _to_host(tree)


def save_ckpoints(model_1, model_2, epoch, batch_idx, optimizer_1, optimizer_2,
                  filepath: str, async_save: bool = True,
                  prefetched=None, include_optimizers: bool = True):
    """``prefetched``: a ``fetch_ckpt_tree`` result to write without
    re-fetching.  ``include_optimizers=False`` writes a LIGHT snapshot
    (models + epoch only — 4x fewer bytes; the eval sweep reads only
    ``model_1``).  ``last.ckpt`` must always keep the full contract so
    resume works — the trainer enforces that."""
    tree = prefetched if prefetched is not None else fetch_ckpt_tree(
        model_1, model_2, epoch, batch_idx, optimizer_1, optimizer_2,
        include_optimizers=include_optimizers)
    if include_optimizers and "optimizer_1" not in tree:
        raise ValueError(
            "prefetched tree has no optimizer state (fetched with "
            "include_optimizers=False) but a full-contract write was "
            "requested — refetch with include_optimizers=True")
    if not include_optimizers:
        tree = {k: v for k, v in tree.items()
                if k not in ("optimizer_1", "optimizer_2")}
    _save_tree(filepath, tree, async_save=async_save, on_host=True)


def load_ckpoints(weights_path: str, istrain: bool):
    wait_for_saves()
    ck = _load_tree(weights_path)
    if istrain:
        if "optimizer_1" not in ck:
            raise ValueError(
                f"{weights_path} is a LIGHT snapshot (no optimizer state, "
                "cfg.train.light_snapshots) — resume from last.ckpt, which "
                "always keeps the full contract")
        return ck["model_2"], ck["epoch"], ck["batch_idx"], ck["optimizer_1"], ck["optimizer_2"]
    return ck["model_1"]


def load_full(weights_path: str):
    wait_for_saves()
    return _load_tree(weights_path)


def latest_ckpt(save_dir: str):
    """Newest run's full-contract ``last.ckpt`` under ``save_dir`` — the
    auto-resume target (``cfg.train.resume: "auto"``): each trainer
    invocation makes a fresh ``{project}_hybrid_N`` run dir, so elastic
    recovery means scanning the *previous* runs for the most recent
    last.ckpt.  Returns None when there is nothing to resume from."""
    if not save_dir or not os.path.isdir(save_dir):
        return None
    best, best_t = None, -1.0
    for run in os.listdir(save_dir):
        p = os.path.join(save_dir, run, "ckpoints", "last.ckpt")
        if os.path.exists(p):
            t = os.path.getmtime(p)
            if t > best_t:
                best, best_t = p, t
    return best


def save_vqvae(variables, epoch, ckpoints_dir: str):
    """Split a VQ-VAE's variables into encoder/codebook/decoder subtrees
    (reference saves three .pth files; here three orbax dirs)."""
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})

    def subtree(name):
        out = {}
        if name in params:
            out["params"] = params[name]
        if name in batch_stats:
            out["batch_stats"] = batch_stats[name]
        return out

    _save_tree(os.path.join(ckpoints_dir, f"{epoch}ep_encoder.ckpt"), subtree("encoder"))
    codebooks = {k: v for k, v in variables.get("codebook", {}).items()}
    _save_tree(os.path.join(ckpoints_dir, f"{epoch}ep_codebook.ckpt"), codebooks)
    _save_tree(os.path.join(ckpoints_dir, f"{epoch}ep_decoder.ckpt"), subtree("decoder"))


def save_tar(target_path: str):
    head, name = os.path.split(target_path)
    with tarfile.open(os.path.join(head, name + ".tar.gz"), "w:gz") as t:
        t.add(target_path)
    shutil.rmtree(target_path)


def load_vqvae_pretrained(variables, encoder_ckpt: str, codebook_ckpt: str,
                          encoder_path=("core", "encoder")):
    """Load a self-sup-pretrained encoder + codebooks into a network's
    variables (reference load_pretrained, unet/net.py:54-59: consumes the
    encoder/codebook files written by save_vqvae).

    Returns a new variables dict; the codebook collection keys are matched by
    name where present.
    """
    import copy

    enc = _load_tree(encoder_ckpt)
    cbs = _load_tree(codebook_ckpt)
    variables = {k: copy.deepcopy(dict(v)) if isinstance(v, dict) else v
                 for k, v in variables.items()}

    def subtree(root):
        node = root
        for p in encoder_path:
            node = node[p]
        return node

    if "params" in enc:
        subtree(variables["params"]).update(enc["params"])
    if "batch_stats" in enc and "batch_stats" in variables:
        subtree(variables["batch_stats"]).update(enc["batch_stats"])
    if cbs and "codebook" in variables:
        # codebooks live under the net's own scope (e.g. core/VectorQuantizer_i
        # in the U-Nets, top-level in the VQ-VAE) — locate the node whose keys
        # match the saved codebook names
        def find_host(tree):
            if isinstance(tree, dict):
                if any(k in tree for k in cbs):
                    return tree
                for v in tree.values():
                    found = find_host(v) if isinstance(v, dict) else None
                    if found is not None:
                        return found
            return None

        host = find_host(variables["codebook"])
        if host is None:
            import warnings

            warnings.warn("pretrained codebook names do not match any subtree "
                          "of the target net's codebook collection — skipped",
                          stacklevel=2)
        else:
            for k, v in cbs.items():
                if k in host:
                    host[k] = v
    return variables
