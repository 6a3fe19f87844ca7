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

import os
import shutil
import tarfile
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


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


def _save_tree(path: str, tree: Any, async_save: bool = False):
    path = os.path.abspath(path)
    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, _to_host(tree))
        return
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_host(tree))


def _load_tree(path: str):
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def save_ckpoints(model_1, model_2, epoch, batch_idx, optimizer_1, optimizer_2,
                  filepath: str, async_save: bool = True):
    _save_tree(filepath, {
        "model_1": model_1,
        "model_2": model_2,
        "epoch": np.asarray(epoch),
        "batch_idx": np.asarray(batch_idx),
        "optimizer_1": optimizer_1,
        "optimizer_2": optimizer_2,
    }, async_save=async_save)


def load_ckpoints(weights_path: str, istrain: bool):
    wait_for_saves()
    ck = _load_tree(weights_path)
    if istrain:
        return ck["model_2"], ck["epoch"], ck["batch_idx"], ck["optimizer_1"], ck["optimizer_2"]
    return ck["model_1"]


def load_full(weights_path: str):
    wait_for_saves()
    return _load_tree(weights_path)


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
