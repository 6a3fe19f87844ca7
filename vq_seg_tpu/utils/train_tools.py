"""Training utilities (reference utils/train_tools.py + models/__init__.py).

  * ``make_optim_paramgroup``-equivalent: ``multi_lr_tx`` builds an optax
    transform applying ``lr / decoder_lr_times`` to the encoder subtree and
    ``lr`` elsewhere (the reference mutates torch param groups,
    train_tools.py:1-9).
  * ``init_weight``-equivalent: ``reinit_modules`` re-draws kaiming-normal
    conv kernels (zeroing biases) for the given param subtrees — the
    reference's decoder/head decorrelation step (models/__init__.py:7-26).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from vq_seg_tpu.models.layers import kaiming_normal


def multi_lr_tx(schedule, decoder_lr_times: float, encoder_path: str = "encoder",
                b1: float = 0.9, b2: float = 0.999):
    """Adam with a reduced LR on the encoder subtree (any path segment equal
    to ``encoder_path``)."""
    if not decoder_lr_times or decoder_lr_times == 1:
        return optax.adam(schedule, b1=b1, b2=b2)

    def label_fn(params):
        def walk(tree, in_enc):
            if isinstance(tree, dict):
                return {k: walk(v, in_enc or k == encoder_path) for k, v in tree.items()}
            return "encoder" if in_enc else "rest"

        return walk(params, False)

    enc_sched = (lambda step: schedule(step) / decoder_lr_times) if callable(schedule) \
        else schedule / decoder_lr_times
    return optax.multi_transform(
        {"encoder": optax.adam(enc_sched, b1=b1, b2=b2),
         "rest": optax.adam(schedule, b1=b1, b2=b2)},
        label_fn)


def reinit_modules(params, key, paths: Sequence[Tuple[str, ...]]):
    """Kaiming-normal re-init of every conv kernel under each path; biases
    zeroed; BN scale/bias untouched (reference init_weight re-inits convs
    and only overrides BN eps/momentum, models/__init__.py:19-26)."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    def reinit(tree, key):
        if not isinstance(tree, dict):
            return tree
        if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 4:
            out = dict(tree)
            key, sub = jax.random.split(key)
            out["kernel"] = kaiming_normal(sub, tree["kernel"].shape, tree["kernel"].dtype)
            if "bias" in out:
                out["bias"] = jnp.zeros_like(out["bias"])
            return out
        out = {}
        for k, v in tree.items():
            key, sub = jax.random.split(key)
            out[k] = reinit(v, sub)
        return out

    def walk(tree, path):
        if not path:
            nonlocal key
            key, sub = jax.random.split(key)
            return reinit(tree, sub)
        head, *rest = path
        return {**tree, head: walk(tree[head], rest)}

    for p in paths:
        params = walk(params, list(p))
    return params


def freeze_encoder_tx(tx, encoder_path: str = "encoder"):
    """Zero all updates for the encoder subtree (reference freeze_encoder,
    unet/net.py:61-66: requires_grad=False on encoder + codebook params;
    the codebook collection is already non-trainable here)."""

    def label_fn(params):
        def walk(tree, in_enc):
            if isinstance(tree, dict):
                return {k: walk(v, in_enc or k == encoder_path) for k, v in tree.items()}
            return "frozen" if in_enc else "trainable"

        return walk(params, False)

    return optax.multi_transform({"trainable": tx, "frozen": optax.set_to_zero()},
                                 label_fn)
