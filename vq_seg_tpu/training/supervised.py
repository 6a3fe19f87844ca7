"""Supervised trainer (reference deprecated/train_sup.py /
only_supervised_train.py — the capability-envelope supervised path,
SURVEY.md §2.8).

Loss: dice + 0.5*CE + commitment + prototype (train_sup.py:136-137), with
the entropy-percentile drop schedule ``drop_percent = 100 - drop*(1 -
epoch/num_epochs)`` (:129-131) for percent-based prototype nets.  One jitted
step; works for any registry net returning (out, commit, usage[, proto]) or
bare logits (plain ``unet``).
"""
from __future__ import annotations

import os
import time
from contextlib import nullcontext
from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vq_seg_tpu.losses import cross_entropy_loss, make_loss
from vq_seg_tpu.metrics.measurement import confusion_matrix, miou
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.schedules import make_lr_schedule
from vq_seg_tpu.utils.seg_tools import img_to_label


@flax.struct.dataclass
class TrainState:
    variables: Any
    opt_state: Any
    step: jnp.ndarray


def create_state(model, tx, sample_args, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    variables = model.init({"params": key, "dropout": key}, *sample_args, train=True)
    return TrainState(variables=variables, opt_state=tx.init(variables["params"]),
                      step=jnp.zeros((), jnp.int32))


def init_phase(model, state: TrainState, args, seed: int = 0):
    """Data-dependent init (kmeans codebooks/prototypes).  Nets without those
    phases (plain unet, deeplab, ...) simply don't accept the kwargs — the
    signature TypeError is raised before any tracing, so falling through is
    safe (unlike in-trace try/except).  Only TypeErrors naming the probed
    kwargs are swallowed; a positional-arg mismatch (wrong forward_mode for
    the net) re-raises instead of silently skipping k-means init."""
    key = jax.random.PRNGKey(seed)
    for kwargs in ({"init_codebook": True, "init_protos": True},
                   {"init_codebook": True}, None):
        if kwargs is None:
            return state
        try:
            _, mut = model.apply(state.variables, *args, train=True, **kwargs,
                                 mutable=["params", "batch_stats", "codebook"],
                                 rngs={"kmeans": key, "dropout": key})
            return state.replace(variables={**state.variables, **mut})
        except TypeError as e:
            if any(k in str(e) for k in kwargs):
                continue
            raise


# forward-signature families across the registry (SURVEY.md §2.4): nets
# taking (x), (x, gt), or (x, gt, percent-or-th).  Names absent from both
# sets default to gt_extra (the prototype-loss family's common signature).
PLAIN_NETS = ("unet", "unetoriginal", "vqunet_v1", "vqunet_v2", "vqpatchunet",
              "vqatunet", "vqcanet", "vqcanetv2", "vqcanetv3", "vqcanetv4",
              "drsavqunet", "vqimdbnet", "vqsegheadnet", "deeplabv3",
              "deeplabv3plus", "fcn32s", "VQUnetwithSalientloss", "vqvaev2",
              "vqvaev1")
GT_ONLY_NETS = ("vqptunet", "vqeuptunet", "vqnedptunet", "vqashunet",
                "vqashunetv2")


def sup_forward_mode(name: str) -> str:
    if name in PLAIN_NETS:
        return "plain"
    if name in GT_ONLY_NETS:
        return "gt"
    return "gt_extra"


def make_sup_train_step(model, tx, dice_loss, *, num_classes: int,
                        ce_weight=None, model_arg: str = "percent",
                        forward_mode: str = "gt_extra"):
    """``forward_mode``: the net's forward signature — "plain" (x only:
    unet/vqunet), "gt" (x, gt), or "gt_extra" (x, gt, percent-or-th)."""

    def loss_fn(params, state, img, target, extra):
        variables = {**state.variables, "params": params}
        if forward_mode == "plain":
            args = (img,)
        elif forward_mode == "gt":
            args = (img, target)
        else:
            args = (img, target, extra)
        out, mut = model.apply(
            variables, *args, train=True, mutable=["batch_stats", "codebook"],
            # fcn32s carries fc6/fc7 dropout (reference fcn/net.py): a
            # step-folded key keeps the jitted step pure and reproducible
            rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0), state.step)})
        if isinstance(out, tuple):
            pred = out[0]
            commit = out[1] if len(out) > 1 and out[1] is not None else jnp.float32(0.0)
            proto = out[3] if len(out) > 3 and out[3] is not None else jnp.float32(0.0)
            usage = out[2] if len(out) > 2 else jnp.zeros((0,))
        else:
            pred, commit, proto, usage = out, jnp.float32(0.0), jnp.float32(0.0), jnp.zeros((0,))
        ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)
        sup = dice_loss(pred, target) + 0.5 * ce(pred, target)
        loss = sup + commit + proto
        conf = confusion_matrix(pred, target, num_classes=num_classes)
        m, iou_list = miou(conf)
        # vgg19 (non-bn) nets carry no batch_stats collection at all (mut
        # is then empty); mut also carries "codebook" when vq_cfg.ema
        # updates it
        aux = dict(mutated=dict(mut),
                   metrics=dict(loss=loss, sup_loss=sup, commitment_loss=commit,
                                prototype_loss=proto, miou=m, iou_list=iou_list,
                                code_usage=jnp.mean(usage) if usage.size else jnp.float32(0.0)),
                   pred=pred)
        return loss, aux

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, img, target, extra):
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.variables["params"], state, img, target, extra)
        updates, opt_state = tx.update(grads, state.opt_state, state.variables["params"])
        new_params = optax.apply_updates(state.variables["params"], updates)
        new_state = state.replace(
            variables={**state.variables, "params": new_params,
                       **aux["mutated"]},
            opt_state=opt_state, step=state.step + 1)
        return new_state, aux["metrics"], aux["pred"]

    return train_step


def train(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Supervised driver (train_sup.py flow)."""
    from vq_seg_tpu.data import BaseDataset, Loader
    from vq_seg_tpu.utils.ckpoints import _save_tree
    from vq_seg_tpu.utils.logger import Logger
    from vq_seg_tpu.utils.seed import seed_everything

    seed_everything()
    num_classes = cfg.num_classes
    batch_size = cfg.train.batch_size
    num_epochs = cfg.train.num_epochs
    half = cfg.train.get("half", False)

    from vq_seg_tpu.models.layers import set_decoder_bn_overrides

    set_decoder_bn_overrides(cfg.train.get("bn_eps"), cfg.train.get("bn_momentum"))
    model = make_model(cfg.model)
    # cfg.train.dataset selects the reference's dataset variants:
    # "obia" -> OBIA pseudo-target mixing (deprecated/train_obia.py),
    # "normalized" -> mean/std-normalised inputs
    # (deprecated/train_IJRR_with_normalized.py), default BaseDataset.
    ds_kind = cfg.train.get("dataset", "base")
    root = os.path.join(cfg.train.data_dir, "train")
    if ds_kind == "obia":
        from vq_seg_tpu.data import OBIADataset

        dataset = OBIADataset(root, batch_size=batch_size, resize=cfg.resize)
    elif ds_kind == "normalized":
        from vq_seg_tpu.data import NormalizedDataset

        dataset = NormalizedDataset(root, "labelled", batch_size=batch_size,
                                    resize=cfg.resize,
                                    mean=cfg.train.get("norm_mean", 0.5),
                                    std=cfg.train.get("norm_std", 0.5))
    else:
        dataset = BaseDataset(root, "labelled", batch_size=batch_size,
                              resize=cfg.resize)
    device_put = None
    if mesh is not None:
        from vq_seg_tpu.parallel import shard_batch_fn

        device_put = shard_batch_fn(mesh)
    loader = Loader(dataset, batch_size, shuffle=True, seed=0, device_put=device_put)
    steps_per_epoch = len(loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    schedule = make_lr_schedule(cfg.train, len(loader))
    tx = optax.adam(schedule)
    dice = make_loss(cfg.train.criterion.name, num_classes, ignore_index=255,
                     weight=cfg.train.criterion.get("weight"))

    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((batch_size, resize, resize), jnp.int32)
    name = cfg.model.name
    forward_mode = sup_forward_mode(name)
    needs_extra = forward_mode == "gt_extra"
    drop = cfg.train.get("unsup_loss_drop_percent", 80.0)
    sample_args = {"plain": (sample_x,), "gt": (sample_x, sample_gt),
                   "gt_extra": (sample_x, sample_gt, 100.0)}[forward_mode]
    state = create_state(model, tx, sample_args)
    if cfg.model.params.get("encoder_weights"):
        from vq_seg_tpu.utils.torch_weights import apply_pretrained_encoder

        state = state.replace(variables=apply_pretrained_encoder(
            state.variables, cfg.model.params.get("encoder_name"),
            cfg.model.params.get("encoder_weights")))

    train_step = make_sup_train_step(model, tx, dice, num_classes=num_classes,
                                     ce_weight=cfg.train.criterion.get("weight"),
                                     forward_mode=forward_mode)
    save_dir = None
    logger = None
    if cfg.train.get("save_dir"):
        os.makedirs(cfg.train.save_dir, exist_ok=True)
        logger_name = cfg.project_name + "_sup_" + str(len(os.listdir(cfg.train.save_dir)))
        save_dir = os.path.join(cfg.train.save_dir, logger_name)
        os.makedirs(os.path.join(save_dir, "ckpoints"), exist_ok=True)
        if cfg.wandb_logging:
            logger = Logger(cfg, logger_name, offline_dir=save_dir)

    from vq_seg_tpu.models.layers import compute_dtype

    prec_ctx = (compute_dtype(jnp.bfloat16) if half else nullcontext())
    initted = False
    with prec_ctx:
        for epoch in range(num_epochs):
            sums: dict = {}
            t0 = time.time()
            percent_unreliable = drop * (1 - epoch / num_epochs)
            drop_percent = 100.0 - percent_unreliable
            it = iter(loader)
            for batch_idx in range(steps_per_epoch):
                batch = next(it)
                img = jnp.asarray(batch["img"])
                target = img_to_label(jnp.asarray(batch["target"]), cfg.pixel_to_label)
                if not initted:
                    init_args = {"plain": (img,), "gt": (img, target),
                                 "gt_extra": (img, target, drop_percent)}[forward_mode]
                    state = init_phase(model, state, init_args)
                    # de-alias: jitted init CSEs identical constant leaves
                    # (e.g. fcn32s' two (4096,) zero biases) into ONE buffer,
                    # which the donated train step then rejects ("donate the
                    # same buffer twice"); an eager copy gives each leaf its
                    # own buffer
                    state = jax.tree_util.tree_map(jnp.copy, state)
                    initted = True
                extra = jnp.float32(drop_percent) if needs_extra else None
                state, metrics, pred = train_step(state, img, target, extra)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0) + np.asarray(v)
            avg = {k: v / steps_per_epoch for k, v in sums.items()}
            avg.pop("iou_list", None)
            print(f"[Epoch{epoch}] " + ", ".join(f"{k}={float(v):.4f}" for k, v in avg.items())
                  + f", {time.time() - t0:.1f}s")
            if logger is not None:
                logger.log_dict.update({k: float(v) for k, v in avg.items()})
                logger.logging(epoch=epoch)
            if save_dir is not None:
                _save_tree(os.path.join(save_dir, "ckpoints", "last.ckpt"),
                           {"model_1": state.variables, "epoch": epoch})
    return state
