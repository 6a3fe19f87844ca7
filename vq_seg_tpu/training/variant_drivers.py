"""Epoch-loop drivers for the reference's variant trainer envelope
(SURVEY.md §2.8: the deprecated/ trainer zoo), making every jitted step in
``training/variants.py`` reachable from the CLI:

  * ``train_plain_cps``   — deprecated/train_CPS.py:139-178 (two models,
    CE on each other's argmax pseudo-labels, no VQ losses in the objective)
  * ``train_unimatch``    — deprecated/train_UniMatch.py:158-190 (one model,
    teacher pass + 2 CutMix views + feature-perturbation view)
  * ``train_salient_cps`` — deprecated/train_salient_loss.py:120-161 (CPS +
    MSE auxiliary saliency decoders)
  * ``train_vqpt_cps``    — deprecated/train_vq_pt_unet.py:48-200 +
    train_only_decoder.py:53-57: the (x, gt)-signature prototype nets, with
    optional ``cfg.train.pretrained.{encoder,codebook}`` loading
    (load_vqvae_pretrained) and encoder freezing (freeze_encoder_tx) — the
    selfsup-pretrain -> frozen-encoder CPS flow.

All share the reference epoch pairing (zip(cycle(sup), unsup); epoch length
= len(unsup_loader)) and the run-dir/checkpoint layout.  Checkpoints save
whenever save_dir is set (not gated on wandb — SURVEY.md §3.1 landmine).
"""
from __future__ import annotations

import os
import time
from itertools import cycle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vq_seg_tpu.losses import make_loss
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.cps import CPSTrainState, evaluate
from vq_seg_tpu.training.schedules import make_lr_schedule
from vq_seg_tpu.training.supervised import TrainState, init_phase
from vq_seg_tpu.training.variants import (
    make_angularv3_cps_train_step,
    make_easyhard_cps_train_step,
    make_plain_cps_train_step,
    make_salient_cps_train_step,
    make_rept_cps_train_step,
    make_unimatch_train_step,
    make_vqpt_cps_train_step,
)
from vq_seg_tpu.utils.seg_tools import img_to_label


def _setup(cfg, tag):
    """Common preamble: seed, BN overrides, run dir.  Returns (save_dir,
    ckpoints_dir, log_txt, logger)."""
    from vq_seg_tpu.models.layers import set_decoder_bn_overrides
    from vq_seg_tpu.utils.logger import Logger
    from vq_seg_tpu.utils.seed import seed_everything

    seed_everything()
    set_decoder_bn_overrides(cfg.train.get("bn_eps"), cfg.train.get("bn_momentum"))
    save_dir = ckpoints_dir = None
    log_txt = None
    logger = None
    if cfg.train.get("save_dir"):
        os.makedirs(cfg.train.save_dir, exist_ok=True)
        name = cfg.project_name + f"_{tag}_" + str(len(os.listdir(cfg.train.save_dir)))
        save_dir = os.path.join(cfg.train.save_dir, name)
        ckpoints_dir = os.path.join(save_dir, "ckpoints")
        os.makedirs(ckpoints_dir)
        log_txt = open(os.path.join(save_dir, "log_txt"), "w")
        if cfg.wandb_logging:
            logger = Logger(cfg, name, offline_dir=save_dir)
    return save_dir, ckpoints_dir, log_txt, logger


def _semi_loaders(cfg, mesh=None):
    """Labeled/unlabeled loaders; with a mesh, batches land pre-sharded over
    the ``data`` axis (uncommitted params are then replicated by GSPMD, same
    as the cps driver's multi-chip path)."""
    from vq_seg_tpu.data import BaseDataset, Loader

    device_put = None
    if mesh is not None:
        from vq_seg_tpu.parallel import shard_batch_fn

        device_put = shard_batch_fn(mesh)
    root = os.path.join(cfg.train.data_dir, "train")
    bs = cfg.train.batch_size
    sup = BaseDataset(root, "labelled", batch_size=bs, resize=cfg.resize)
    unsup = BaseDataset(root, "unlabelled", batch_size=bs, resize=cfg.resize)
    return (Loader(sup, bs, shuffle=True, seed=0, device_put=device_put),
            Loader(unsup, bs, shuffle=True, seed=1, device_put=device_put))


def _test_loader(cfg, model=None):
    """(loader, cached_eval_step) or None — the cached step avoids a
    re-trace/re-compile on every probe (evaluate docstring)."""
    from vq_seg_tpu.data import BaseDataset, Loader
    from vq_seg_tpu.training.cps import make_eval_fn

    if not (cfg.get("test") and cfg.train.get("test_every")):
        return None
    ds = BaseDataset(os.path.join(cfg.test.data_dir, "test"), "labelled",
                     batch_size=1, resize=cfg.resize, target_resize=False)
    step = make_eval_fn(model, cfg.num_classes) if model is not None else None
    return Loader(ds, 1, shuffle=False), step


def _epoch_summary(tag, epoch, sums, n, t0, log_txt, logger):
    avg = {k: v / n for k, v in sums.items()}
    avg.pop("iou_list", None)
    avg = {k: float(np.mean(v)) for k, v in avg.items()}
    line = (f"[{tag}][Epoch{epoch}] "
            + ", ".join(f"{k}={v:.4f}" for k, v in avg.items())
            + f", {time.time() - t0:.1f}s")
    print(line)
    if log_txt is not None:
        log_txt.write(line + "\n")
    if logger is not None:
        logger.log_dict.update(avg)
        logger.logging(epoch=epoch)
    return avg


def _finish(log_txt, logger):
    from vq_seg_tpu.utils.ckpoints import wait_for_saves

    wait_for_saves()  # flush the in-flight async last.ckpt write
    if log_txt is not None:
        log_txt.close()
    if logger is not None:
        logger.finish()


def _dual_state(model, tx, sample_args, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    v1 = model.init({"params": k1, "dropout": k1}, *sample_args, train=True)
    v2 = model.init({"params": k2, "dropout": k2}, *sample_args, train=True)
    return CPSTrainState(variables_1=v1, variables_2=v2,
                         opt_state_1=tx.init(v1["params"]),
                         opt_state_2=tx.init(v2["params"]),
                         step=jnp.zeros((), jnp.int32))


def _apply_encoder_weights(cfg, variables):
    ew = cfg.model.params.get("encoder_weights")
    if not ew:
        return variables
    from vq_seg_tpu.utils.torch_weights import apply_pretrained_encoder

    return apply_pretrained_encoder(variables, cfg.model.params.get("encoder_name"), ew)


def _save_dual(ckpoints_dir, state, epoch, batch_idx, every=10):
    from vq_seg_tpu.utils.ckpoints import save_ckpoints

    if ckpoints_dir is None:
        return
    if epoch % every == 0:
        save_ckpoints(state.variables_1, state.variables_2, epoch, batch_idx,
                      state.opt_state_1, state.opt_state_2,
                      os.path.join(ckpoints_dir, f"{epoch}ep.ckpt"))
    save_ckpoints(state.variables_1, state.variables_2, epoch, batch_idx,
                  state.opt_state_1, state.opt_state_2,
                  os.path.join(ckpoints_dir, "last.ckpt"))


def train_plain_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Plain CPS driver (deprecated/train_CPS.py).  Works for any plain-
    forward net (cps_vqv2* configs use vqunet_v2)."""
    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "plaincps")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    # cfg.train.decoder_lr_times: encoder at lr/N, rest at lr (the reference
    # vqatunet.json knob, utils/train_tools.py make_optim_paramgroup)
    from vq_seg_tpu.utils.train_tools import multi_lr_tx

    tx = multi_lr_tx(schedule, cfg.train.get("decoder_lr_times", 1))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    state = _dual_state(model, tx, (sample,))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_plain_cps_train_step(
        model, tx, num_classes=cfg.num_classes,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        ce_weight=cfg.train.criterion.get("weight"),
        # deprecated/code_usage_train.py mode: add the (gradient-free)
        # per-stage code-usage term to the objective
        usage_loss_weight=cfg.train.get("code_usage_loss_weight", 0.0),
        depth=cfg.model.params.get("depth", 5))
    test_loader = _test_loader(cfg, model)

    initted = False
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                state = state.replace(
                    variables_1=init_phase(model, TrainState(state.variables_1, None, 0),
                                           (l_img,), seed=0).variables,
                    variables_2=init_phase(model, TrainState(state.variables_2, None, 0),
                                           (l_img,), seed=1).variables)
                initted = True
            state, metrics = step(state, l_img, l_tgt, ul_img)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("plaincps", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables_1, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_unimatch(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """UniMatch driver (deprecated/train_UniMatch.py:100-200): single model
    (registry 'unimatch'), confidence threshold 0.95, CutMix views."""
    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "unimatch")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    variables = _apply_encoder_weights(cfg, variables)
    state = TrainState(variables=variables, opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_unimatch_train_step(
        model, tx, num_classes=cfg.num_classes,
        confidence_threshold=cfg.train.get("confidence_threshold", 0.95),
        ce_weight=cfg.train.criterion.get("weight"))
    test_loader = _test_loader(cfg, model)

    from vq_seg_tpu.utils.ckpoints import _save_tree

    rng = jax.random.PRNGKey(cfg.train.get("seed", 0))
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, l_img, l_tgt, ul_img, sub)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("unimatch", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        if ckpoints_dir is not None:
            _save_tree(os.path.join(ckpoints_dir, "last.ckpt"),
                       {"model_1": state.variables, "epoch": epoch,
                        "optimizer_1": state.opt_state})
    _finish(log_txt, logger)
    return state


def train_salient_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Salient-loss CPS driver (deprecated/train_salient_loss.py): two
    VQUnetwithSalientloss models + precomputed saliency maps from
    ``cfg.train.salient_dir``."""
    from vq_seg_tpu.data import Loader, SalientDataset

    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "salientcps")
    model = make_model(cfg.model)
    root = os.path.join(cfg.train.data_dir, "train")
    salient_dir = cfg.train.salient_dir
    bs = cfg.train.batch_size
    sup_loader = Loader(SalientDataset(root, salient_dir, "labelled", resize=cfg.resize),
                        bs, shuffle=True, seed=0)
    unsup_loader = Loader(SalientDataset(root, salient_dir, "unlabelled", resize=cfg.resize),
                          bs, shuffle=True, seed=1)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample = jnp.zeros((bs, resize, resize, 3))
    state = _dual_state(model, tx, (sample,))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_salient_cps_train_step(
        model, tx, num_classes=cfg.num_classes,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        auxiliary_loss_weight=cfg.train.get("auxiliary_loss_weight", 1.0),
        ce_weight=cfg.train.criterion.get("weight"))

    initted = False
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            l_sal = jnp.asarray(sup_d["salient_map"])
            ul_img = jnp.asarray(unsup_d["img"])
            ul_sal = jnp.asarray(unsup_d["salient_map"])
            if not initted:
                state = state.replace(
                    variables_1=init_phase(model, TrainState(state.variables_1, None, 0),
                                           (l_img,), seed=0).variables,
                    variables_2=init_phase(model, TrainState(state.variables_2, None, 0),
                                           (l_img,), seed=1).variables)
                initted = True
            state, metrics = step(state, l_img, l_tgt, l_sal, ul_img, ul_sal)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("salientcps", epoch, sums, steps, t0, log_txt, logger)
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_vqpt_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """CPS for the (x, gt)-signature prototype nets (vqptunet / vqeuptunet /
    vqnedptunet), with the VQ-VAE-pretrained frozen-encoder flow when
    ``cfg.train.pretrained.{encoder,codebook}`` is set
    (deprecated/train_vq_pt_unet.py + train_only_decoder.py:53-57)."""
    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "vqpt")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    pretrained = cfg.train.get("pretrained")
    if pretrained:
        from vq_seg_tpu.utils.train_tools import freeze_encoder_tx

        tx = freeze_encoder_tx(tx)
    criterion = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                          weight=cfg.train.criterion.get("weight"))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((cfg.train.batch_size, resize, resize), jnp.int32)
    state = _dual_state(model, tx, (sample_x, sample_gt))
    if pretrained:
        from vq_seg_tpu.utils.ckpoints import load_vqvae_pretrained

        v1 = load_vqvae_pretrained(state.variables_1, pretrained.encoder, pretrained.codebook)
        v2 = load_vqvae_pretrained(state.variables_2, pretrained.encoder, pretrained.codebook)
        state = state.replace(variables_1=v1, variables_2=v2,
                              opt_state_1=tx.init(v1["params"]),
                              opt_state_2=tx.init(v2["params"]))
    else:
        state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                              variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_vqpt_cps_train_step(
        model, tx, criterion, num_classes=cfg.num_classes,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        # the angular-head configs (vqash*.json) name this knob
        # total_angular_loss_weight (deprecated/train_vqash.py)
        prototype_loss_weight=cfg.train.get(
            "total_prototype_loss_weight",
            cfg.train.get("total_angular_loss_weight", 0.01)))
    test_loader = _test_loader(cfg, model)

    initted = False
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                # skip codebook kmeans when pretrained codebooks were loaded
                kw = ({"init_protos": True} if pretrained
                      else {"init_codebook": True, "init_protos": True})
                new_vars = []
                for v, seed in ((state.variables_1, 0), (state.variables_2, 1)):
                    k = jax.random.PRNGKey(seed)
                    _, mut = model.apply(v, l_img, l_tgt, train=True, **kw,
                                         mutable=["params", "batch_stats", "codebook"],
                                         rngs={"kmeans": k, "dropout": k})
                    new_vars.append({**v, **mut})
                state = state.replace(variables_1=new_vars[0], variables_2=new_vars[1])
                initted = True
            state, metrics = step(state, l_img, l_tgt, ul_img)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("vqpt", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables_1, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_rept_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Percent-family reliable-prototype CPS driver (deprecated/
    train_with_test_pt_pseudo_entropy_reg.py:124-210 — the vqreptunet1x1 /
    vqreptunet / vqretemptunet / vqreeuptunet / vqreptunetangular trainer):
    per-epoch ramp ``drop_percent = 100 - unsup_loss_drop_percent *
    (1 - epoch/num_epochs)`` (:158-159) fed to the nets' entropy-percentile
    prototype filter and to the CPS pseudo-label regularizer, as a traced
    scalar (one compile for the whole run)."""
    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "reptcps")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    criterion = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                          weight=cfg.train.criterion.get("weight"))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((cfg.train.batch_size, resize, resize), jnp.int32)
    state = _dual_state(model, tx, (sample_x, sample_gt, 100.0))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_rept_cps_train_step(
        model, tx, criterion, num_classes=cfg.num_classes,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        prototype_loss_weight=cfg.train.get("total_prototype_loss_weight", 0.01))
    test_loader = _test_loader(cfg, model)

    initted = False
    num_epochs = cfg.train.num_epochs
    drop_base = float(cfg.train.get("unsup_loss_drop_percent", 20))
    for epoch in range(num_epochs):
        drop_percent = jnp.float32(100.0 - drop_base * (1 - epoch / num_epochs))
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                new_vars = []
                for v, seed in ((state.variables_1, 0), (state.variables_2, 1)):
                    k = jax.random.PRNGKey(seed)
                    _, mut = model.apply(v, l_img, l_tgt, 100.0, train=True,
                                         init_codebook=True, init_protos=True,
                                         mutable=["params", "batch_stats", "codebook"],
                                         rngs={"kmeans": k, "dropout": k})
                    new_vars.append({**v, **mut})
                state = state.replace(variables_1=new_vars[0], variables_2=new_vars[1])
                initted = True
            state, metrics = step(state, l_img, l_tgt, ul_img, drop_percent)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("reptcps", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables_1, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_angularv3_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Angular-v3 CPS driver (deprecated/train_angularv3.py:49-260):
    vqreptunetangularv3 with the per-epoch unreliable-threshold ramp
    ((epoch+1)/num_epochs until epoch 70, then 0.7 — :155)."""
    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "angularv3")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    dice = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                     weight=cfg.train.criterion.get("weight"))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((cfg.train.batch_size, resize, resize), jnp.int32)
    state = _dual_state(model, tx, (sample_x, sample_gt, "labeled", 0.0))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_angularv3_cps_train_step(
        model, tx, dice, num_classes=cfg.num_classes,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        prototype_loss_weight=cfg.train.get("total_prototype_loss_weight", 0.01),
        ce_weight=cfg.train.criterion.get("weight"))
    test_loader = _test_loader(cfg, model)

    initted = False
    num_epochs = cfg.train.num_epochs
    for epoch in range(num_epochs):
        th = jnp.float32((epoch + 1) / num_epochs if epoch < 70 else 0.7)
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                new_vars = []
                for v, seed in ((state.variables_1, 0), (state.variables_2, 1)):
                    k = jax.random.PRNGKey(seed)
                    _, mut = model.apply(v, l_img, l_tgt, "labeled", 0.0, train=True,
                                         init_codebook=True, init_protos=True,
                                         mutable=["params", "batch_stats", "codebook"],
                                         rngs={"kmeans": k, "dropout": k})
                    new_vars.append({**v, **mut})
                state = state.replace(variables_1=new_vars[0], variables_2=new_vars[1])
                initted = True
            state, metrics = step(state, l_img, l_tgt, ul_img, th)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("angularv3", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables_1, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_easyhard_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Easy-hard augmentation CPS driver (deprecated/
    train_vqpt_easyhard_aug.py): (x, gt)-signature prototype nets; pseudo
    labels from dihedral easy views, CutMix'd hard training views."""
    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "easyhard")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    criterion = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                          weight=cfg.train.criterion.get("weight"))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((cfg.train.batch_size, resize, resize), jnp.int32)
    state = _dual_state(model, tx, (sample_x, sample_gt))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_easyhard_cps_train_step(
        model, tx, criterion, num_classes=cfg.num_classes,
        cutmix_ratio=cfg.train.get("cutmix_ratio", 0.5),
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        prototype_loss_weight=cfg.train.get("total_prototype_loss_weight", 0.01))

    rng = np.random.default_rng(cfg.train.get("seed", 0))
    key = jax.random.PRNGKey(cfg.train.get("seed", 0))
    initted = False
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                new_vars = []
                for v, seed in ((state.variables_1, 0), (state.variables_2, 1)):
                    k = jax.random.PRNGKey(seed)
                    _, mut = model.apply(v, l_img, l_tgt, train=True,
                                         init_codebook=True, init_protos=True,
                                         mutable=["params", "batch_stats", "codebook"],
                                         rngs={"kmeans": k, "dropout": k})
                    new_vars.append({**v, **mut})
                state = state.replace(variables_1=new_vars[0], variables_2=new_vars[1])
                initted = True
            key, sub = jax.random.split(key)
            # reference aug draw: cases 1/2 flip, everything else identity
            draw = int(rng.integers(0, 10))
            case = jnp.int32(draw if draw in (1, 2) else 0)
            state, metrics = step(state, l_img, l_tgt, ul_img, sub, case)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("easyhard", epoch, sums, steps, t0, log_txt, logger)
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_obj_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """Object-loss CPS driver (deprecated/train_with_test_object_loss.py):
    plain CPS + binary object-vs-background loss on the non-bg softmax mass,
    weighted by ``cfg.train.obj_loss_weight``."""
    from vq_seg_tpu.training.variants import make_objloss_cps_train_step

    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "objcps")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    criterion = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                          weight=cfg.train.criterion.get("weight"))
    object_criterion = make_loss(cfg.train.criterion.name, 1)
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    state = _dual_state(model, tx, (sample,))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_objloss_cps_train_step(
        model, tx, criterion, object_criterion, num_classes=cfg.num_classes,
        batch_size=cfg.train.batch_size,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        obj_loss_weight=cfg.train.get("obj_loss_weight", 1.0))
    test_loader = _test_loader(cfg, model)

    initted = False
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                state = state.replace(
                    variables_1=init_phase(model, TrainState(state.variables_1, None, 0),
                                           (l_img,), seed=0).variables,
                    variables_2=init_phase(model, TrainState(state.variables_2, None, 0),
                                           (l_img,), seed=1).variables)
                initted = True
            state, metrics = step(state, l_img, l_tgt, ul_img)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("objcps", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables_1, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_supcon_cps(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """SupCon CPS driver (deprecated/train_supcon_unet.py): supconvqunet
    with the labeled-split supervised-contrastive aux loss
    (cfg.train.total_sup_con_loss_weight)."""
    from vq_seg_tpu.training.variants import make_supcon_cps_train_step

    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "supconcps")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    criterion = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                          weight=cfg.train.criterion.get("weight"))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((cfg.train.batch_size, resize, resize), jnp.int32)
    state = _dual_state(model, tx, (sample_x, sample_gt, "label"))
    state = state.replace(variables_1=_apply_encoder_weights(cfg, state.variables_1),
                          variables_2=_apply_encoder_weights(cfg, state.variables_2))
    step = make_supcon_cps_train_step(
        model, tx, criterion, num_classes=cfg.num_classes,
        cps_loss_weight=cfg.train.get("cps_loss_weight", 1.0),
        commitment_loss_weight=cfg.train.get("total_commitment_loss_weight", 1.0),
        sup_con_loss_weight=cfg.train.get("total_sup_con_loss_weight", 1.0))
    test_loader = _test_loader(cfg, model)

    initted = False
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            if not initted:
                new_vars = []
                for v, seed in ((state.variables_1, 0), (state.variables_2, 1)):
                    k = jax.random.PRNGKey(seed)
                    _, mut = model.apply(v, l_img, l_tgt, "label", train=True,
                                         init_codebook=True,
                                         mutable=["params", "batch_stats", "codebook"],
                                         rngs={"kmeans": k, "dropout": k})
                    new_vars.append({**v, **mut})
                state = state.replace(variables_1=new_vars[0], variables_2=new_vars[1])
                initted = True
            state, metrics = step(state, l_img, l_tgt, ul_img)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("supconcps", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables_1, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        _save_dual(ckpoints_dir, state, epoch, steps - 1)
    _finish(log_txt, logger)
    return state


def train_semiweed(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None):
    """SemiWeedNet contrastive semi-sup driver (deprecated/
    semiweednet_train.py): one model, CE(labeled, issup=True) +
    diagonal-cosine loss between MLP projections of two dihedral-transformed
    overlapping unlabeled crops."""
    from vq_seg_tpu.losses.dc import DCLoss
    from vq_seg_tpu.training.variants import make_semiweed_train_step

    save_dir, ckpoints_dir, log_txt, logger = _setup(cfg, "semiweed")
    model = make_model(cfg.model)
    sup_loader, unsup_loader = _semi_loaders(cfg, mesh)
    steps = len(unsup_loader)
    if max_steps_per_epoch:
        steps = min(steps, max_steps_per_epoch)
    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    criterion = make_loss(cfg.train.criterion.name, cfg.num_classes, ignore_index=255,
                          weight=cfg.train.criterion.get("weight"))
    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample = jnp.zeros((cfg.train.batch_size, resize, resize, 3))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    variables = _apply_encoder_weights(cfg, variables)
    state = TrainState(variables=variables, opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_semiweed_train_step(
        model, tx, criterion, DCLoss(), num_classes=cfg.num_classes,
        overlap_size=cfg.train.get("overlap_size", 240),
        ce_loss_weight=cfg.train.get("ce_loss_weight", 1.0),
        dc_loss_weight=cfg.train.get("dc_loss_weight", 1.0))
    test_loader = _test_loader(cfg, model)

    from vq_seg_tpu.utils.ckpoints import _save_tree

    rng = np.random.default_rng(cfg.train.get("seed", 0))
    for epoch in range(cfg.train.num_epochs):
        it = zip(cycle(iter(sup_loader)), iter(unsup_loader))
        sums: dict = {}
        t0 = time.time()
        for batch_idx in range(steps):
            sup_d, unsup_d = next(it)
            l_img = jnp.asarray(sup_d["img"])
            l_tgt = img_to_label(jnp.asarray(sup_d["target"]), cfg.pixel_to_label)
            ul_img = jnp.asarray(unsup_d["img"])
            draws = [int(rng.integers(0, 10)) for _ in range(2)]
            cases = [jnp.int32(d if d in (1, 2) else 0) for d in draws]
            key, sub = jax.random.split(key)
            state, metrics = step(state, l_img, l_tgt, ul_img, cases[0], cases[1], sub)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0) + np.asarray(v)
        _epoch_summary("semiweed", epoch, sums, steps, t0, log_txt, logger)
        if test_loader is not None and epoch % cfg.train.test_every == 0:
            tm = evaluate(model, state.variables, test_loader[0],
                          cfg.pixel_to_label, cfg.num_classes,
                          eval_step=test_loader[1])
            print(f"test miou : {tm}")
        if ckpoints_dir is not None:
            _save_tree(os.path.join(ckpoints_dir, "last.ckpt"),
                       {"model_1": state.variables, "epoch": epoch,
                        "optimizer_1": state.opt_state})
    _finish(log_txt, logger)
    return state
