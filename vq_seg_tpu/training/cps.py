"""Cross-Pseudo-Supervision trainer — the flagship training loop
(reference train_vqreptunet1x1v2.py:48-274, call stack SURVEY.md §3.1).

TPU-first redesign:
  * the reference's 6 forwards + 1 backward + 2 optimizer steps per
    iteration are ONE jitted, donated function (``make_cps_train_step``):
    the two eval-mode pseudo passes, the four train-mode passes, the CPS /
    sup / commitment / prototype losses, one grad over both models' params,
    two Adam updates, and the on-device mIoU metric all fuse into a single
    XLA program — no per-step host sync (the reference synced every step
    for numpy metrics, train_…v2.py:205).
  * the lazy k-means codebook/prototype init becomes the explicit
    ``cps_init_phase`` run once on the first labeled batch (the reference
    initialised during forward #3 of step 0).
  * LR schedule: optax.adam(schedule) reproduces the reference's per-step
    ``optimizer.param_groups[0]['lr'] = sched.get_lr(step)`` poke.
  * AMP: instead of GradScaler (unneeded on TPU), ``half=True`` switches
    conv/BN compute to bf16 via the global compute-dtype policy
    (models/layers.py) with f32 params and f32 loss accumulation.
  * data parallel: pass a Mesh — batches shard over the ``data`` axis and
    XLA inserts the gradient all-reduce (see parallel/mesh.py).

Gradient-flow parity notes: pseudo score maps are stop_gradient'ed (the
reference computes them under no_grad, :143-149); CPS targets are argmax
pseudo-labels with low-confidence pixels set to 255/ignore (:43-46,
:165-177); model_1's loss touches model_2 only through those detached
labels.  BN: pseudo passes use running stats (eval mode mid-step,
:143-149); the sup pass then the unsup pass update batch stats in order.
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
class CPSTrainState:
    variables_1: Any
    variables_2: Any
    opt_state_1: Any
    opt_state_2: Any
    step: jnp.ndarray


def _split(variables):
    rest = {k: v for k, v in variables.items() if k != "params"}
    return variables["params"], rest


def create_cps_state(model, tx, sample_args, rngs_seed: int = 0,
                     encoder_name=None, encoder_weights=None,
                     init_weights: bool = False):
    """Init two decorrelated models (the reference re-initialises the two
    decoders/heads with different RNG draws, train_…v2.py:74-80; here the
    entire trees use independent seeds) and their Adam states.

    ``encoder_weights``: pretrained tag or .pth path — loaded into BOTH
    models' encoders (the reference constructs every encoder with
    ImageNet/SWSL weights, models/encoders/__init__.py:24-29).
    ``init_weights``: kaiming re-init of decoder + head with per-model keys
    (reference init_weight, models/__init__.py:7-26) — with a shared
    pretrained encoder this is what decorrelates the CPS branches."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(rngs_seed))
    v1 = model.init({"params": k1, "dropout": k1}, *sample_args, train=True)
    v2 = model.init({"params": k2, "dropout": k2}, *sample_args, train=True)
    if encoder_weights:
        from vq_seg_tpu.utils.torch_weights import apply_pretrained_encoder

        v1 = apply_pretrained_encoder(v1, encoder_name, encoder_weights)
        v2 = apply_pretrained_encoder(v2, encoder_name, encoder_weights)
    if init_weights:
        from vq_seg_tpu.utils.train_tools import reinit_modules

        rk1, rk2 = jax.random.split(jax.random.PRNGKey(rngs_seed + 101))
        paths = [p for p in (("core", "decoder"), ("decoder",),
                             ("segmentation_head",), ("segmentation_head_0",),
                             ("segmentation_head_1",))
                 if _tree_has_path(v1["params"], p)]
        v1 = {**v1, "params": reinit_modules(v1["params"], rk1, paths)}
        v2 = {**v2, "params": reinit_modules(v2["params"], rk2, paths)}
    return CPSTrainState(
        variables_1=v1, variables_2=v2,
        opt_state_1=tx.init(v1["params"]), opt_state_2=tx.init(v2["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _tree_has_path(tree, path):
    for p in path:
        if not isinstance(tree, dict) or p not in tree:
            return False
        tree = tree[p]
    return True


def cps_init_phase(model, state: CPSTrainState, l_img, l_target, th, seed: int = 0,
                   init_codebook: bool = True):
    """One-time data-dependent init: k-means codebooks + prototypes on the
    first labeled batch (reference vq_img.py:165-166, prototype.py:829-830).
    ``init_codebook=False`` skips the codebook k-means (pretrained codebooks
    loaded via load_vqvae_pretrained arrive already initialised)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 2)
    new_vars = []
    for v, key in zip((state.variables_1, state.variables_2), keys):
        _, mut = model.apply(
            v, l_img, l_target, th, train=True, init_codebook=init_codebook,
            init_protos=True,
            mutable=["params", "batch_stats", "codebook"],
            rngs={"kmeans": key, "dropout": key},
        )
        new_vars.append({**v, **mut})
    return state.replace(variables_1=new_vars[0], variables_2=new_vars[1])


def make_cps_train_step(model, tx, dice_loss, *, num_classes: int,
                        confidence_threshold: float = 0.7,
                        cps_loss_weight: float = 1.0,
                        commitment_loss_weight: float = 1.0,
                        prototype_loss_weight: float = 0.01,
                        ce_weight=None,
                        remat=True):
    """Build the fused CPS train step for (x, gt, th)-signature nets (the
    flagship family; other signatures live in training/variants.py).

    ``remat``: without it the four training passes' activations coexist in
    HBM and a 512^2 batch-4 step exceeds a v5e's 16 GB by ~1 GB (measured);
    ``True`` checkpoints every train forward (max memory headroom),
    ``"unsup"`` checkpoints only the two unsupervised passes (fits the v5e
    with ~half the recompute cost — the default trade)."""

    th = confidence_threshold

    def _apply_train(variables, *args):
        # "codebook" mutable for the opt-in EMA update (vq_cfg.ema) — a
        # bitwise no-op when EMA is off
        return model.apply(variables, *args, train=True,
                           mutable=["batch_stats", "codebook"])

    _apply_train_remat = jax.checkpoint(_apply_train)
    _sup_apply = _apply_train_remat if remat is True else _apply_train
    _unsup_apply = _apply_train_remat if remat else _apply_train

    def forward_train(variables, *args, _apply=None):
        out, mut = (_apply or _sup_apply)(variables, *args)
        return out, {**variables, **mut}

    def loss_fn(p1, p2, state, l_img, l_target, ul_img):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}

        # pseudo pass: eval mode, no grad (train_…v2.py:143-149)
        pseudo_1_score = jax.lax.stop_gradient(model.apply(v1, ul_img, train=False)[0])
        pseudo_2_score = jax.lax.stop_gradient(model.apply(v2, ul_img, train=False)[0])

        # supervised passes (forwards #3, #4)
        (pred_sup_1, c_l1, u_l1, pl_l1), v1 = forward_train(v1, l_img, l_target, th)
        (pred_sup_2, c_l2, u_l2, pl_l2), v2 = forward_train(v2, l_img, l_target, th)
        # unsupervised passes with the OTHER model's score map (#5, #6)
        (pred_ul_1, c_ul1, u_ul1, pl_ul1), v1 = forward_train(
            v1, ul_img, pseudo_2_score, th, _apply=_unsup_apply)
        (pred_ul_2, c_ul2, u_ul2, pl_ul2), v2 = forward_train(
            v2, ul_img, pseudo_1_score, th, _apply=_unsup_apply)

        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], axis=0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], axis=0)
        pseudo_1 = jnp.argmax(pred_1, axis=-1)
        pseudo_2 = jnp.argmax(pred_2, axis=-1)

        def score_mask(pred, pseudo):
            # trainer-local confidence filter (train_…v2.py:43-46);
            # class-major transpose keeps the size-3 softmax off the lane dim
            n, h, w_, c = pred.shape
            z = pred.reshape(n, h * w_, c).transpose(0, 2, 1)
            pmax = jnp.max(jax.nn.softmax(z, axis=1), axis=1).reshape(n, h, w_)
            return jnp.where(pmax > th, pseudo, 255)

        filt_1 = jax.lax.stop_gradient(score_mask(pred_1, pseudo_1))
        filt_2 = jax.lax.stop_gradient(score_mask(pred_2, pseudo_2))

        ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)
        cps_loss = (0.5 * ce(pred_1, filt_2) + 0.5 * ce(pred_2, filt_1)
                    + dice_loss(pred_1, filt_2) + dice_loss(pred_2, filt_1))
        sup_loss_1 = 0.5 * ce(pred_sup_1, l_target) + dice_loss(pred_sup_1, l_target)
        sup_loss_2 = 0.5 * ce(pred_sup_2, l_target) + dice_loss(pred_sup_2, l_target)
        commitment = (c_l1 + c_l2 + c_ul1 + c_ul2) * commitment_loss_weight
        prototype = (pl_l1 + pl_l2 + pl_ul1 + pl_ul2) * prototype_loss_weight
        loss = sup_loss_1 + sup_loss_2 + cps_loss_weight * cps_loss + commitment + prototype

        code_usage = (u_l1 + u_l2 + u_ul1 + u_ul2) / 4.0
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        step_miou, iou_list = miou(conf)
        aux = dict(
            mutated_1={ck: v1[ck] for ck in ("batch_stats", "codebook") if ck in v1},
            mutated_2={ck: v2[ck] for ck in ("batch_stats", "codebook") if ck in v2},
            metrics=dict(loss=loss, cps_loss=cps_loss, sup_loss_1=sup_loss_1,
                         sup_loss_2=sup_loss_2, commitment_loss=commitment,
                         prototype_loss=prototype, miou=step_miou,
                         iou_list=iou_list, code_usage=code_usage),
            pred_sup_1=pred_sup_1, pred_ul_1=pred_ul_1,
        )
        return loss, aux

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: CPSTrainState, l_img, l_target, ul_img):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        grads_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
        (g1, g2), aux = grads_fn(p1, p2, state, l_img, l_target, ul_img)
        up1, os1 = tx.update(g1, state.opt_state_1, p1)
        up2, os2 = tx.update(g2, state.opt_state_2, p2)
        new_state = state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, up1),
                         **aux["mutated_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, up2),
                         **aux["mutated_2"]},
            opt_state_1=os1, opt_state_2=os2, step=state.step + 1,
        )
        return new_state, aux["metrics"], aux["pred_sup_1"], aux["pred_ul_1"]

    return train_step


def stack_cps_state(state: CPSTrainState, tx) -> CPSTrainState:
    """Stack the two models' variables along a leading axis of 2 and fuse
    their optimizers into one (Adam is elementwise, so one update over the
    stacked tree is identical to two separate updates).  The stacked layout
    lets every forward/backward run both models as ONE batched computation —
    measured: doubling the conv batch costs only ~17% at 512^2 bs4, so this
    nearly halves the 6-forward CPS step."""
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                     state.variables_1, state.variables_2)
    return CPSTrainState(variables_1=stacked, variables_2=None,
                         opt_state_1=tx.init(stacked["params"]), opt_state_2=None,
                         step=state.step)


def unstack_cps_state(state: CPSTrainState):
    """(model_1_vars, model_2_vars) from a stacked state — for the reference
    checkpoint layout {model_1, model_2, ...}."""
    v1 = jax.tree_util.tree_map(lambda x: x[0], state.variables_1)
    v2 = jax.tree_util.tree_map(lambda x: x[1], state.variables_1)
    return v1, v2


def _is_stacked_leaf(x):
    return hasattr(x, "ndim") and x.ndim > 0 and x.shape[0] == 2


def unstack_opt_state(opt_state):
    """Split the fused stacked-Adam state into per-model (opt_1, opt_2) so
    checkpoints honor the reference {optimizer_1, optimizer_2} contract
    (utils/ckpoints.py:7-13).  Adam moments mirror the stacked params (leading
    axis 2); scalar leaves (step counts) are shared."""
    o1 = jax.tree_util.tree_map(lambda x: x[0] if _is_stacked_leaf(x) else x, opt_state)
    o2 = jax.tree_util.tree_map(lambda x: x[1] if _is_stacked_leaf(x) else x, opt_state)
    return o1, o2


def restack_opt_state(template, o1, o2):
    """Rebuild the fused stacked optimizer state from a per-model pair as
    restored by orbax (plain containers — positional unflatten into the
    freshly-initialised template's NamedTuple structure)."""
    l1 = jax.tree_util.tree_leaves(o1)
    l2 = jax.tree_util.tree_leaves(o2)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(l1) != len(t_leaves) or len(l2) != len(t_leaves):
        return None
    stacked = []
    for a, b, t in zip(l1, l2, t_leaves):
        if _is_stacked_leaf(t):
            s = jnp.stack([jnp.asarray(a), jnp.asarray(b)])
        else:
            s = jnp.asarray(a)
        if getattr(s, "shape", None) != getattr(t, "shape", None):
            return None
        stacked.append(s)
    return jax.tree_util.tree_unflatten(treedef, stacked)


def make_cps_train_step_stacked(model, tx, dice_loss, *, num_classes: int,
                                confidence_threshold: float = 0.7,
                                cps_loss_weight: float = 1.0,
                                commitment_loss_weight: float = 1.0,
                                prototype_loss_weight: float = 0.01,
                                ce_weight=None,
                                remat=False):
    """Fused CPS step over a STACKED state (see stack_cps_state): the two
    models' 6 forwards become 3 vmapped forwards at double batch.  Loss math
    identical to make_cps_train_step (reference train_…v2.py:143-202)."""

    th = confidence_threshold

    def _apply_train(variables, img, gt, thv):
        # "codebook" mutable for the opt-in EMA update (vq_cfg.ema) — a
        # bitwise no-op when EMA is off
        return model.apply(variables, img, gt, thv, train=True,
                           mutable=["batch_stats", "codebook"])

    if remat:
        _apply_train = jax.checkpoint(_apply_train)

    # vmap over the model axis of variables; inputs broadcast or per-model
    vfwd_eval = jax.vmap(lambda v, img: model.apply(v, img, train=False)[0],
                         in_axes=(0, None))
    vfwd_sup = jax.vmap(_apply_train, in_axes=(0, None, None, None))
    vfwd_ul = jax.vmap(_apply_train, in_axes=(0, None, 0, None))

    def loss_fn(params, state, l_img, l_target, ul_img):
        v = {**state.variables_1, "params": params}
        pseudo_scores = jax.lax.stop_gradient(vfwd_eval(v, ul_img))   # (2, B, H, W, C)
        swapped = pseudo_scores[::-1]  # model k trains on the OTHER's scores

        (pred_sup, c_l, u_l, pl_l), mut = vfwd_sup(v, l_img, l_target, th)
        v = {**v, **mut}
        (pred_ul, c_ul, u_ul, pl_ul), mut = vfwd_ul(v, ul_img, swapped, th)

        pred = jnp.concatenate([pred_sup, pred_ul], axis=1)  # (2, 2B, H, W, C)
        pseudo = jnp.argmax(pred, axis=-1)

        def score_mask(p, ps):
            m, n, h, w_, c = p.shape
            z = p.reshape(m, n, h * w_, c).transpose(0, 1, 3, 2)
            pmax = jnp.max(jax.nn.softmax(z, axis=2), axis=2).reshape(m, n, h, w_)
            return jnp.where(pmax > th, ps, 255)

        filt = jax.lax.stop_gradient(score_mask(pred, pseudo))
        filt_swapped = filt[::-1]

        ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)
        vce = jax.vmap(ce)
        vdice = jax.vmap(dice_loss)
        # 0.5*ce(p1,f2)+0.5*ce(p2,f1)+dice(p1,f2)+dice(p2,f1)  (:177)
        cps_loss = (0.5 * jnp.sum(vce(pred, filt_swapped))
                    + jnp.sum(vdice(pred, filt_swapped)))
        sup_losses = (0.5 * vce(pred_sup, jnp.broadcast_to(l_target, (2,) + l_target.shape))
                      + vdice(pred_sup, jnp.broadcast_to(l_target, (2,) + l_target.shape)))
        commitment = (jnp.sum(c_l) + jnp.sum(c_ul)) * commitment_loss_weight
        prototype = (jnp.sum(pl_l) + jnp.sum(pl_ul)) * prototype_loss_weight
        loss = jnp.sum(sup_losses) + cps_loss_weight * cps_loss + commitment + prototype

        code_usage = (u_l[0] + u_l[1] + u_ul[0] + u_ul[1]) / 4.0
        conf = confusion_matrix(pred_sup[0], l_target, num_classes=num_classes)
        step_miou, iou_list = miou(conf)
        aux = dict(
            mutated=mut,
            metrics=dict(loss=loss, cps_loss=cps_loss, sup_loss_1=sup_losses[0],
                         sup_loss_2=sup_losses[1], commitment_loss=commitment,
                         prototype_loss=prototype, miou=step_miou,
                         iou_list=iou_list, code_usage=code_usage),
            pred_sup_1=pred_sup[0], pred_ul_1=pred_ul[0],
        )
        return loss, aux

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: CPSTrainState, l_img, l_target, ul_img):
        params = state.variables_1["params"]
        grads, aux = jax.grad(loss_fn, has_aux=True)(params, state, l_img, l_target, ul_img)
        updates, opt_state = tx.update(grads, state.opt_state_1, params)
        new_state = state.replace(
            variables_1={**state.variables_1,
                         "params": optax.apply_updates(params, updates),
                         **aux["mutated"]},
            opt_state_1=opt_state, step=state.step + 1,
        )
        return new_state, aux["metrics"], aux["pred_sup_1"], aux["pred_ul_1"]

    return train_step


def pair_state_specs(state: CPSTrainState):
    """PartitionSpec pytree for a STACKED CPSTrainState laid out for the
    pair-sharded step: every leading-axis-2 leaf (stacked params / BN stats /
    Adam moments) shards over ``model``; scalars replicate."""
    from jax.sharding import PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda x: P("model") if _is_stacked_leaf(x) else P(), state)


def shard_pair_state(state: CPSTrainState, mesh) -> CPSTrainState:
    """device_put a stacked state with the pair axis over ``model`` and
    everything else replicated (inputs then shard over ``data`` as usual)."""
    from jax.sharding import NamedSharding

    specs = pair_state_specs(state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def make_cps_train_step_pairsharded(model, tx, dice_loss, mesh, *,
                                    num_classes: int,
                                    confidence_threshold: float = 0.7,
                                    cps_loss_weight: float = 1.0,
                                    commitment_loss_weight: float = 1.0,
                                    prototype_loss_weight: float = 0.01,
                                    ce_weight=None,
                                    remat=False):
    """The production stacked CPS step with TRUE pair-axis model parallelism:
    ``shard_map`` manual over the mesh's ``model`` axis (size 2) places each
    CPS branch on its own device group, sidestepping the GSPMD limit that
    blocks sharding the vmapped pair axis (the partitioner rejects the
    vmapped 3-feature head conv with feature_group_count=2 — see
    __graft_entry__.py).  ``data`` stays an AUTO axis, so batch sharding,
    global-batch BatchNorm semantics, and the gradient all-reduce are
    inserted by GSPMD exactly as in the DP-only step — numerics match
    make_cps_train_step_stacked to fp tolerance (tests/test_sharding.py).

    Cross-branch traffic, all stop_gradient'ed (the reference couples the
    two models only through detached pseudo-labels, train_…v2.py:143-177),
    rides ICI as two ppermutes per step:
      * the eval-mode pseudo score swap (model k trains on the OTHER's
        scores);
      * the confidence-filtered CPS target swap.
    Loss sums over the pair become psums over ``model``.

    Use with a mesh where ``model`` has size 2 (make_mesh(n_model=2)) and a
    state laid out by ``shard_pair_state``.  Why this layout matters: the
    reference configs train at batch 4, so pure DP idles every chip past 4 —
    dp x pair2 doubles usable chips at identical math."""
    from jax.sharding import PartitionSpec as P

    th = confidence_threshold
    perm = [(0, 1), (1, 0)]  # pair swap over the model axis

    def _apply_train(variables, img, gt, thv):
        # "codebook" mutable for the opt-in EMA update (vq_cfg.ema) — a
        # bitwise no-op when EMA is off
        return model.apply(variables, img, gt, thv, train=True,
                           mutable=["batch_stats", "codebook"])

    if remat:
        _apply_train = jax.checkpoint(_apply_train)

    # local pair axis has size 1 on each model-group: keep the stacked-step
    # vmap structure (Adam and the forwards are batched over axis 0 of 1)
    vfwd_eval = jax.vmap(lambda v, img: model.apply(v, img, train=False)[0],
                         in_axes=(0, None))
    vfwd_sup = jax.vmap(_apply_train, in_axes=(0, None, None, None))
    vfwd_ul = jax.vmap(_apply_train, in_axes=(0, None, 0, None))

    def _select0(x):
        """The value on model-group 0, replicated (metrics keyed to model_1
        mirror the reference's logging of pred_sup_1)."""
        mine = jnp.where(jax.lax.axis_index("model") == 0, x, jnp.zeros_like(x))
        return jax.lax.psum(mine, "model")

    def loss_fn(params, state, l_img, l_target, ul_img):
        v = {**state.variables_1, "params": params}
        pseudo_score = jax.lax.stop_gradient(vfwd_eval(v, ul_img))  # (1, B, H, W, C)
        pseudo_other = jax.lax.ppermute(pseudo_score, "model", perm)

        (pred_sup, c_l, u_l, pl_l), mut = vfwd_sup(v, l_img, l_target, th)
        v = {**v, **mut}
        (pred_ul, c_ul, u_ul, pl_ul), mut = vfwd_ul(v, ul_img, pseudo_other, th)

        pred = jnp.concatenate([pred_sup, pred_ul], axis=1)  # (1, 2B, H, W, C)
        pseudo = jnp.argmax(pred, axis=-1)

        def score_mask(p, ps):
            m, n, h, w_, c = p.shape
            z = p.reshape(m, n, h * w_, c).transpose(0, 1, 3, 2)
            pmax = jnp.max(jax.nn.softmax(z, axis=2), axis=2).reshape(m, n, h, w_)
            return jnp.where(pmax > th, ps, 255)

        filt = jax.lax.stop_gradient(score_mask(pred, pseudo))
        filt_other = jax.lax.ppermute(filt, "model", perm)

        ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)
        # my half of the pair-symmetric CPS term; the psum'd metric equals
        # the reference total 0.5*ce(p1,f2)+0.5*ce(p2,f1)+dice(p1,f2)+dice(p2,f1)
        cps_mine = 0.5 * ce(pred[0], filt_other[0]) + dice_loss(pred[0], filt_other[0])
        cps_loss = jax.lax.psum(cps_mine, "model")
        sup_mine = 0.5 * ce(pred_sup[0], l_target) + dice_loss(pred_sup[0], l_target)
        commit_mine = (c_l[0] + c_ul[0]) * commitment_loss_weight
        proto_mine = (pl_l[0] + pl_ul[0]) * prototype_loss_weight
        # each group differentiates ONLY its local terms: the other branch's
        # CPS half reaches my params solely through stop_gradient'ed swaps,
        # so d(global total)/d(theta_mine) == d(loss_mine)/d(theta_mine)
        loss_mine = sup_mine + cps_loss_weight * cps_mine + commit_mine + proto_mine

        code_usage = jax.lax.psum(u_l[0] + u_ul[0], "model") / 4.0
        conf = confusion_matrix(pred_sup[0], l_target, num_classes=num_classes)
        step_miou, iou_list = miou(conf)
        metrics = dict(
            loss=jax.lax.psum(sup_mine + commit_mine + proto_mine, "model")
            + cps_loss_weight * cps_loss,
            cps_loss=cps_loss,
            sup_loss_1=_select0(sup_mine),
            sup_loss_2=jax.lax.psum(sup_mine, "model") - _select0(sup_mine),
            commitment_loss=jax.lax.psum(commit_mine, "model"),
            prototype_loss=jax.lax.psum(proto_mine, "model"),
            miou=_select0(step_miou), iou_list=_select0(iou_list),
            code_usage=code_usage)
        aux = dict(mutated=mut, metrics=metrics,
                   pred_sup=pred_sup, pred_ul=pred_ul)
        return loss_mine, aux

    def local_step(state: CPSTrainState, l_img, l_target, ul_img):
        params = state.variables_1["params"]
        grads, aux = jax.grad(loss_fn, has_aux=True)(params, state, l_img, l_target, ul_img)
        updates, opt_state = tx.update(grads, state.opt_state_1, params)
        new_state = state.replace(
            variables_1={**state.variables_1,
                         "params": optax.apply_updates(params, updates),
                         **aux["mutated"]},
            opt_state_1=opt_state, step=state.step + 1,
        )
        return new_state, aux["metrics"], aux["pred_sup"], aux["pred_ul"]

    def build(state_template):
        """Bind shard_map specs to this state's pytree structure."""
        specs = pair_state_specs(state_template)
        sharded = jax.shard_map(
            local_step, mesh=mesh, axis_names={"model"},
            in_specs=(specs, P(), P(), P()),
            out_specs=(specs, P(), P("model"), P("model")))

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, l_img, l_target, ul_img):
            new_state, metrics, pred_sup, pred_ul = sharded(
                state, l_img, l_target, ul_img)
            return new_state, metrics, pred_sup[0], pred_ul[0]

        return train_step

    return build


def make_cps_train_step_fused(model, tx, dice_loss, *, num_classes: int,
                              confidence_threshold: float = 0.7,
                              cps_loss_weight: float = 1.0,
                              commitment_loss_weight: float = 1.0,
                              prototype_loss_weight: float = 0.01,
                              ce_weight=None,
                              proto_margin: float = 0.5,
                              proto_scale: float = 30.0,
                              remat=False):
    """Fused-pass CPS step over a STACKED state: the sup and unsup training
    trunks run as ONE (model x pass)-vmapped forward — effective conv batch
    2 models x 2 passes x B (the binding encoder convs fill the MXU much
    better at batch 16 than 8; measured +17%/step over the stacked step at
    512^2 bs4).  Semantics preserved exactly:

      * per-pass BatchNorm batch statistics (the inner vmap keeps each
        pass's reduction separate, as the reference's sequential forwards
        do — train-mode BN ignores running stats, so ordering is moot);
      * running stats composed to the sequential-equivalent value
        ra2 = m*A + (B - m*ra0) per leaf (exact algebra; per-leaf momentum
        honours the decoder BN override);
      * the prototype loss — whose (int gt | score map) arity prevents
        stacking — is applied OUTSIDE the trunk on the returned decoder
        features via a standalone ReliablePrototypeLossv2 bound to the
        params/prototype_loss subtree (gradients flow unchanged).

    Only the flagship (x, gt, th)-signature nets are supported (the trunk
    must accept ``return_features=True``).  Equivalence vs the stacked step
    is pinned in tests/test_cps_training.py.  The opt-in EMA codebook
    update (vq_cfg.ema) is NOT applied by this experimental step (codebook
    stays non-mutable here, which would silently freeze the codebook), so
    combining the two raises at construction time."""
    _vq_cfg = getattr(model, "vq_cfg", None)
    if _vq_cfg is not None and dict(_vq_cfg).get("ema", False):
        raise ValueError(
            "make_cps_train_step_fused does not apply the EMA codebook "
            "update (vq_cfg.ema=true): the fused trunk keeps 'codebook' "
            "non-mutable, which would silently freeze the codebook. Use the "
            "stacked step (make_cps_train_step_stacked / the default "
            "driver path) with EMA, or set vq_cfg.ema=false.")
    from vq_seg_tpu.models.layers import decoder_bn_params
    from vq_seg_tpu.models.modules.prototype import ReliablePrototypeLossv2

    th = confidence_threshold

    def _trunk(variables, x):
        return model.apply(variables, x, train=True, return_features=True,
                           mutable=["batch_stats"])

    if remat:
        _trunk = jax.checkpoint(_trunk)

    # inner vmap: pass axis (inputs stacked, params shared) — BN reduces per
    # pass; outer vmap: model axis (params stacked, inputs shared)
    vtrunk = jax.vmap(jax.vmap(_trunk, in_axes=(None, 0)), in_axes=(0, None))
    vfwd_eval = jax.vmap(lambda v, img: model.apply(v, img, train=False)[0],
                         in_axes=(0, None))

    def _compose_stats(ra0, per_pass):
        """Sequential-equivalent running stats from the (model, pass)-vmapped
        updates: ra2 = m*A + (B - m*ra0), per-leaf momentum."""
        dec_eps, dec_m = decoder_bn_params()

        def leaf(path, old, new):
            in_decoder = any(getattr(k, "key", None) == "decoder" for k in path)
            m = dec_m if in_decoder else 0.9
            a, b = new[:, 0], new[:, 1]  # (model, pass, ...) -> sup, unsup
            return m * a + (b - m * old)

        return jax.tree_util.tree_map_with_path(leaf, ra0, per_pass)

    def loss_fn(params, state, l_img, l_target, ul_img):
        v = {**state.variables_1, "params": params}
        pseudo_scores = jax.lax.stop_gradient(vfwd_eval(v, ul_img))   # (2, B, H, W, C)

        x_passes = jnp.stack([l_img, ul_img])  # (pass=2, B, H, W, 3)
        (out, commit, usage, dec), mut = vtrunk(v, x_passes)
        # out: (model=2, pass=2, B, H, W, C); dec: (2, 2, B, h, w, Cd)
        pred_sup, pred_ul = out[:, 0], out[:, 1]
        new_stats = _compose_stats(state.variables_1["batch_stats"],
                                   mut["batch_stats"])

        # prototype losses outside the trunk (per model x pass)
        dec_ch = dec.shape[-1]
        proto_mod = ReliablePrototypeLossv2(
            num_classes=num_classes, embedding_dim=dec_ch, pt_init="kmeans",
            margin=proto_margin, scale=proto_scale)

        def proto_apply(emb, feats, gt):
            return proto_mod.apply({"params": {"embedding": emb}}, feats, gt, th)

        embs = params["prototype_loss"]["embedding"]  # (2, C, D) stacked
        pl_sup = jax.vmap(proto_apply, in_axes=(0, 0, None))(embs, dec[:, 0], l_target)
        swapped = pseudo_scores[::-1]
        pl_ul = jax.vmap(proto_apply, in_axes=(0, 0, 0))(embs, dec[:, 1], swapped)

        pred = jnp.concatenate([pred_sup, pred_ul], axis=1)  # (2, 2B, H, W, C)
        pseudo = jnp.argmax(pred, axis=-1)

        def score_mask(p, ps):
            m, n, h, w_, c = p.shape
            z = p.reshape(m, n, h * w_, c).transpose(0, 1, 3, 2)
            pmax = jnp.max(jax.nn.softmax(z, axis=2), axis=2).reshape(m, n, h, w_)
            return jnp.where(pmax > th, ps, 255)

        filt = jax.lax.stop_gradient(score_mask(pred, pseudo))
        filt_swapped = filt[::-1]

        ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)
        vce = jax.vmap(ce)
        vdice = jax.vmap(dice_loss)
        cps_loss = (0.5 * jnp.sum(vce(pred, filt_swapped))
                    + jnp.sum(vdice(pred, filt_swapped)))
        l_t2 = jnp.broadcast_to(l_target, (2,) + l_target.shape)
        sup_losses = 0.5 * vce(pred_sup, l_t2) + vdice(pred_sup, l_t2)
        commitment = jnp.sum(commit) * commitment_loss_weight
        prototype = (jnp.sum(pl_sup) + jnp.sum(pl_ul)) * prototype_loss_weight
        loss = jnp.sum(sup_losses) + cps_loss_weight * cps_loss + commitment + prototype

        code_usage = (usage[0, 0] + usage[1, 0] + usage[0, 1] + usage[1, 1]) / 4.0
        conf = confusion_matrix(pred_sup[0], l_target, num_classes=num_classes)
        step_miou, iou_list = miou(conf)
        aux = dict(
            batch_stats=new_stats,
            metrics=dict(loss=loss, cps_loss=cps_loss, sup_loss_1=sup_losses[0],
                         sup_loss_2=sup_losses[1], commitment_loss=commitment,
                         prototype_loss=prototype, miou=step_miou,
                         iou_list=iou_list, code_usage=code_usage),
            pred_sup_1=pred_sup[0], pred_ul_1=pred_ul[0],
        )
        return loss, aux

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: CPSTrainState, l_img, l_target, ul_img):
        params = state.variables_1["params"]
        grads, aux = jax.grad(loss_fn, has_aux=True)(params, state, l_img, l_target, ul_img)
        updates, opt_state = tx.update(grads, state.opt_state_1, params)
        new_state = state.replace(
            variables_1={**state.variables_1,
                         "params": optax.apply_updates(params, updates),
                         "batch_stats": aux["batch_stats"]},
            opt_state_1=opt_state, step=state.step + 1,
        )
        return new_state, aux["metrics"], aux["pred_sup_1"], aux["pred_ul_1"]

    return train_step


def make_cps_multi_step(train_step, k: int):
    """Scan ``k`` applications of a CPS train step inside ONE jitted
    dispatch, over pre-staged batches stacked on a leading K axis.

    Why: each host->device dispatch costs latency the async queue cannot
    fully hide (measured 44.2 -> 45.8 img/s at 512^2 on the tunneled chip;
    proportionally more at small resolutions where a step is ~10 ms).  The
    target workloads are tiny (30-430 images), so staging K batches on
    device is cheap.  (Benchmark caveat that motivated this: feeding the
    SAME constant array as labeled+unlabeled input lets XLA CSE the two
    trunk forwards and report a ~25% phantom speedup — always bench with
    distinct runtime-fed batches.)

    The inner ``train_step`` is a jitted single-step function; its trace is
    inlined under the scan (the inner donation is a no-op there).  Returns
    ``multi(state, l_imgs[K,B,...], l_targets[K,B,...], ul_imgs[K,B,...])
    -> (state, metrics_summed, last pred_sup_1, last pred_ul_1)``; every
    metric leaf (scalars AND vectors like iou_list/code_usage) is SUMMED
    over the K scanned steps — the driver divides by total steps per epoch,
    which yields the correct per-step average either way."""

    def body(state, xs):
        l_img, l_target, ul_img = xs
        state, metrics, ps, pu = train_step(state, l_img, l_target, ul_img)
        return state, (metrics, ps, pu)

    @partial(jax.jit, donate_argnums=(0,))
    def multi(state, l_imgs, l_targets, ul_imgs):
        state, (metrics, ps, pu) = jax.lax.scan(
            body, state, (l_imgs, l_targets, ul_imgs))
        summed = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), metrics)
        return state, summed, ps[-1], pu[-1]

    return multi


def make_sharded_stack(mesh=None):
    """Stacker for the scan_steps staging path (make_cps_multi_step inputs).

    Without a mesh: plain jnp.stack.  With one: a jitted stack whose output
    keeps each batch's ``data``-axis sharding on axis 1 under the new
    leading K axis — a host-side jnp.stack on mesh-sharded batches would
    otherwise gather/relayout through one device (VERDICT r2 weak #3).
    Tested: tests/test_sharding.py::test_scan_steps_under_mesh."""
    if mesh is None:
        return lambda *a: jnp.stack(a)
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = (P(None, "data", "space")
            if dict(mesh.shape).get("space", 1) > 1 else P(None, "data"))
    return jax.jit(lambda *a: jnp.stack(a),
                   out_shardings=NamedSharding(mesh, spec))


def make_eval_fn(model, num_classes: int):
    """Per-batch eval forward + confusion matrix (the in-training ``test``
    probe, train_…v2.py:28-41)."""

    @jax.jit
    def eval_step(variables, img):
        out = model.apply(variables, img, train=False)
        return out[0] if isinstance(out, tuple) else out

    return eval_step


def evaluate(model, variables, loader, pixel_to_label, num_classes: int,
             eval_step=None):
    """Sweep a test loader for mIoU following the OFFICIAL eval protocol
    (test_detailviz.py:107-145): targets at native resolution, logits
    bilinearly upsampled to the mask size before argmax — so in-training
    ``test_every`` curves are comparable to scripts/test.py results.
    Returns mean per-image mIoU.

    Pass a cached ``eval_step`` (make_eval_fn) when calling repeatedly — a
    fresh jax.jit per call re-traces and re-compiles every probe (measured
    ~45 s/probe through the tunneled chip)."""
    if eval_step is None:
        eval_step = make_eval_fn(model, num_classes)
    total, n = 0.0, 0
    for batch in loader:
        pred = eval_step(variables, jnp.asarray(batch["img"]))
        target = img_to_label(jnp.asarray(batch["target"]), pixel_to_label)
        if pred.shape[1:3] != target.shape[1:3]:
            b, _, _, c = pred.shape
            pred = jax.image.resize(pred, (b,) + target.shape[1:3] + (c,),
                                    method="bilinear", antialias=False)
        conf = confusion_matrix(pred, target, num_classes=num_classes)
        m, _ = miou(conf)
        total += float(m)
        n += 1
    return total / max(n, 1)


def ckpt_cadence(cfg, epoch: int, num_epochs: int):
    """Checkpoint-cadence decision for one epoch: ``(do_snap, do_last,
    light)``.

    * ``cfg.train.ckpt_every`` — last.ckpt cadence (reference writes every
      epoch, train_…v2.py:257; the knob matters when the device->host
      fetch is slow, e.g. a tunneled chip).  Snapshots (``{N}ep.ckpt``)
      keep the reference 10-epoch cadence or ``ckpt_every``, whichever is
      coarser.
    * ``cfg.train.last_every`` — decouples the FULL-contract last.ckpt
      from snapshots (defaults to ``ckpt_every``): a light-snapshot-only
      cadence epoch then fetches models only (~4x fewer bytes).
    * ``cfg.train.light_snapshots`` — snapshots keep models only (the
      eval sweep reads model_1); last.ckpt always keeps the full resume
      contract.
    The final epoch always writes both."""
    ckpt_every = int(cfg.train.get("ckpt_every", 1) or 1)
    snap_every = max(10, ckpt_every)
    last_every = int(cfg.train.get("last_every", ckpt_every) or ckpt_every)
    final = epoch == num_epochs - 1
    do_snap = epoch % snap_every == 0 or final
    do_last = epoch % last_every == 0 or final
    light = bool(cfg.train.get("light_snapshots", False))
    return do_snap, do_last, light


def train(cfg, max_steps_per_epoch: Optional[int] = None, mesh=None,
          preempt=None):
    """Flagship CPS driver mirroring reference train() (train_…v2.py:48-274).

    Returns the final state (also checkpointed per the reference layout).
    ``preempt`` injects a PreemptionGuard (tests); by default the driver
    installs its own, which latches SIGTERM into a graceful epoch-boundary
    shutdown with a full-contract last.ckpt (utils/preemption.py).
    """
    from itertools import cycle

    from vq_seg_tpu.data import BaseDataset, Loader
    from vq_seg_tpu.utils import visualize
    from vq_seg_tpu.utils.ckpoints import save_ckpoints, save_tar
    from vq_seg_tpu.utils.logger import Logger, list_to_separate_log
    from vq_seg_tpu.utils.seed import seed_everything

    seed_everything()
    num_classes = cfg.num_classes
    batch_size = cfg.train.batch_size
    num_epochs = cfg.train.num_epochs
    half = cfg.train.get("half", False)

    # Run-dir + checkpointing are keyed on save_dir alone — the reference
    # gated BOTH on wandb_logging (train_…v2.py:237-259), a landmine SURVEY.md
    # §3.1 says not to replicate: logging-off runs silently saved nothing.
    logger = None
    save_dir = ckpoints_dir = img_dir = None
    log_txt = None
    if cfg.train.get("save_dir"):
        os.makedirs(cfg.train.save_dir, exist_ok=True)
        logger_name = cfg.project_name + "_hybrid_" + str(len(os.listdir(cfg.train.save_dir)))
        save_dir = os.path.join(cfg.train.save_dir, logger_name)
        os.makedirs(save_dir)
        ckpoints_dir = os.path.join(save_dir, "ckpoints")
        os.mkdir(ckpoints_dir)
        if cfg.train.save_img:
            img_dir = os.path.join(save_dir, "imgs")
            os.mkdir(img_dir)
        log_txt = open(os.path.join(save_dir, "log_txt"), "w")
        if cfg.wandb_logging:
            logger = Logger(cfg, logger_name, offline_dir=save_dir)

    from vq_seg_tpu.models.layers import set_decoder_bn_overrides

    set_decoder_bn_overrides(cfg.train.get("bn_eps"), cfg.train.get("bn_momentum"))
    model = make_model(cfg.model)

    sup_dataset = BaseDataset(os.path.join(cfg.train.data_dir, "train"), "labelled",
                              batch_size=batch_size, resize=cfg.resize)
    unsup_dataset = BaseDataset(os.path.join(cfg.train.data_dir, "train"), "unlabelled",
                                batch_size=batch_size, resize=cfg.resize)
    device_put = None
    if mesh is not None:
        from vq_seg_tpu.parallel import shard_batch_fn

        device_put = shard_batch_fn(mesh)
    # workers=4 parallelises the cold-epoch PNG decode; the RAM cache then
    # serves epochs 2..400 at memory speed (tools/loader_bench.py: ~4 img/s
    # cold vs >=70 img/s cached at native CWFID resolution)
    sup_loader = Loader(sup_dataset, batch_size, shuffle=True, seed=0,
                        device_put=device_put, workers=4)
    unsup_loader = Loader(unsup_dataset, batch_size, shuffle=True, seed=1,
                          device_put=device_put, workers=4)
    steps_per_epoch = len(unsup_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    schedule = make_lr_schedule(cfg.train, len(unsup_loader))
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    accum = int(cfg.train.get("grad_accum_steps", 1) or 1)
    if accum > 1:
        # gradient accumulation: k micro-batches per optimizer step (the
        # effective batch grows k-fold without the HBM cost)
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    if cfg.train.get("debug_nans"):
        from vq_seg_tpu.utils.debug import enable_nan_debug

        enable_nan_debug()
    dice = make_loss(cfg.train.criterion.name, num_classes, ignore_index=255,
                     weight=cfg.train.criterion.get("weight"))
    th = cfg.train.confidence_threshold

    resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
    sample_x = jnp.zeros((batch_size, resize, resize, 3))
    sample_gt = jnp.zeros((batch_size, resize, resize), jnp.int32)
    state = create_cps_state(
        model, tx, (sample_x, sample_gt, th),
        encoder_name=cfg.model.params.get("encoder_name"),
        encoder_weights=cfg.model.params.get("encoder_weights"),
        init_weights=bool(cfg.train.get("init_weights", False)))

    step_kwargs = dict(
        num_classes=num_classes, confidence_threshold=th,
        cps_loss_weight=cfg.train.cps_loss_weight,
        commitment_loss_weight=cfg.train.total_commitment_loss_weight,
        prototype_loss_weight=cfg.train.total_prototype_loss_weight,
        ce_weight=cfg.train.criterion.get("weight"),
        # bf16 activations halve HBM pressure enough to skip remat (measured
        # 39 vs 24 img/s at 512^2 bs4); f32 needs it to fit a v5e
        remat=cfg.train.get("remat", not half),
    )
    # a mesh with a size-2 model axis selects the shard_map pair-sharded
    # production step (each CPS branch on its own device group — the
    # workload's natural 2-way model parallelism; scripts/train.py
    # --pair_parallel); otherwise the stacked vmapped step runs DP
    pair = mesh is not None and dict(mesh.shape).get("model", 1) == 2
    # cfg.train.scan_steps: batch K optimizer steps into one device dispatch
    # (measured 44.2 -> 45.8 img/s at 512^2 on the tunneled chip; identical
    # numerics — see make_cps_multi_step)
    scan_k = int(cfg.train.get("scan_steps", 0) or 0)
    train_step = multi_step = None

    def finalize_stacked(st):
        """Called once the state is stacked: lay it out for the chosen
        parallelism and build the (possibly scanned) train step."""
        nonlocal train_step, multi_step
        if pair:
            st = shard_pair_state(st, mesh)
            train_step = make_cps_train_step_pairsharded(
                model, tx, dice, mesh, **step_kwargs)(st)
        else:
            if mesh is not None and cfg.train.get("zero_opt"):
                # ZeRO-1: Adam moments sharded over the data axis instead of
                # replicated; donated jit propagates the layout across steps
                # (parallel/zero.py; tests/test_sharding.py)
                from vq_seg_tpu.parallel import shard_opt_state

                st = st.replace(opt_state_1=shard_opt_state(st.opt_state_1, mesh))
            if cfg.train.get("fused_step"):
                # (model x pass)-vmapped trunks: conv batch 4B fills the MXU
                # better than the stacked step's 2B (measured 47.0 vs 46.1
                # img/s at 512^2 bs4, round 5; equivalence-tested in
                # tests/test_cps_training.py::test_fused_step_matches_stacked).
                # Flagship-signature (x, gt, th) nets only.
                p = cfg.model.params
                train_step = make_cps_train_step_fused(
                    model, tx, dice, proto_margin=p.get("margin", 0.5),
                    proto_scale=p.get("scale", 30.0), **step_kwargs)
            else:
                train_step = make_cps_train_step_stacked(model, tx, dice, **step_kwargs)
        multi_step = make_cps_multi_step(train_step, scan_k) if scan_k > 1 else None
        return st

    _stack = make_sharded_stack(mesh)
    pred_sup_1 = pred_ul_1 = None

    # resume (the reference's cfg.train.resume is vestigial — here it works:
    # point it at a ckpoints/*.ckpt dir to restore both models + optimizers,
    # or set "auto" for elastic recovery: rerun the same command and the
    # newest previous run's last.ckpt is picked up)
    start_epoch = 0
    resume = cfg.train.get("resume")
    if resume == "auto":
        from vq_seg_tpu.utils.ckpoints import latest_ckpt

        resume = latest_ckpt(cfg.train.get("save_dir"))
        print(f"auto-resume: {resume or 'no previous last.ckpt — fresh start'}")
    stacked = False
    if resume:
        from vq_seg_tpu.utils.ckpoints import load_full

        ck = load_full(resume)
        state = state.replace(variables_1=ck["model_1"], variables_2=ck["model_2"])
        state = stack_cps_state(state, tx)
        state = finalize_stacked(state)
        if ck.get("optimizer_1") is not None:
            # checkpoints store the reference per-model {optimizer_1,
            # optimizer_2} pair (fused-only in older round-1 checkpoints) —
            # orbax restores plain containers, so rebuild into the fresh
            # template's NamedTuple structure
            template = state.opt_state_1
            restored = None
            if ck.get("optimizer_2") is not None:
                restored = restack_opt_state(template, ck["optimizer_1"],
                                             ck["optimizer_2"])
            else:
                leaves = jax.tree_util.tree_leaves(ck["optimizer_1"])
                t_leaves, treedef = jax.tree_util.tree_flatten(template)
                if len(leaves) == len(t_leaves) and all(
                        getattr(a, "shape", None) == getattr(b, "shape", None)
                        for a, b in zip(leaves, t_leaves)):
                    restored = jax.tree_util.tree_unflatten(treedef, leaves)
            if restored is not None:
                state = state.replace(opt_state_1=restored)
            else:
                print("resume: optimizer state structure mismatch — "
                      "continuing with fresh Adam moments")
        start_epoch = int(ck["epoch"]) + 1
        initted = True
        stacked = True
    else:
        initted = False

    test_loader = None
    if cfg.get("test") and cfg.train.get("test_every"):
        # official protocol: inputs resized, targets at NATIVE resolution
        # (test_detailviz.py:54-55 uses target_resize=False)
        test_dataset = BaseDataset(os.path.join(cfg.test.data_dir, "test"), "labelled",
                                   batch_size=1, resize=cfg.resize, target_resize=False)
        test_loader = Loader(test_dataset, 1, shuffle=False)
        eval_step = make_eval_fn(model, num_classes)

    from vq_seg_tpu.models.layers import compute_dtype
    from vq_seg_tpu.utils.preemption import PreemptionGuard

    prec_ctx = (compute_dtype(jnp.bfloat16) if half else nullcontext())
    with prec_ctx, (preempt or PreemptionGuard()) as preempt:
        for epoch in range(start_epoch, num_epochs):
            trainloader = zip(cycle(iter(sup_loader)), iter(unsup_loader))
            sums: dict = {}
            ep_start = time.time()
            pending: list = []

            def run_pending():
                nonlocal state, sums, pred_sup_1, pred_ul_1, pending
                if not pending:
                    return
                if multi_step is not None and len(pending) == scan_k:
                    xs = [_stack(*[p[i] for p in pending]) for i in range(3)]
                    state, metrics, pred_sup_1, pred_ul_1 = multi_step(state, *xs)
                else:
                    for li, lt, ui in pending:
                        state, metrics_1, pred_sup_1, pred_ul_1 = train_step(
                            state, li, lt, ui)
                        for k, v in metrics_1.items():
                            sums[k] = sums.get(k, 0) + np.asarray(v)
                    pending = []
                    return
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0) + np.asarray(v)
                pending = []

            for batch_idx in range(steps_per_epoch):
                sup_dict, unsup_dict = next(trainloader)
                l_input = jnp.asarray(sup_dict["img"])
                l_target = img_to_label(jnp.asarray(sup_dict["target"]), cfg.pixel_to_label)
                ul_input = jnp.asarray(unsup_dict["img"])
                if not initted:
                    state = cps_init_phase(model, state, l_input, l_target, th)
                    initted = True
                if not stacked:
                    state = finalize_stacked(stack_cps_state(state, tx))
                    stacked = True
                if multi_step is None:
                    state, metrics, pred_sup_1, pred_ul_1 = train_step(
                        state, l_input, l_target, ul_input)
                    for k, v in metrics.items():
                        sums[k] = sums.get(k, 0) + np.asarray(v)
                else:
                    # stage K batches, then ONE device dispatch scans K steps
                    # (eliminates per-step host->device dispatch latency; see
                    # make_cps_multi_step)
                    pending.append((l_input, l_target, ul_input))
                    if len(pending) == scan_k:
                        run_pending()
            run_pending()  # flush the epoch tail through the single step
            # end epoch
            avg = {k: v / steps_per_epoch for k, v in sums.items()}
            iou = avg.pop("iou_list")
            back_iou, weed_iou, crop_iou = [float(x) for x in iou[:3]]
            code_usage = [float(x) for x in np.atleast_1d(avg.pop("code_usage"))]
            lr = float(schedule(int(state.step) - 1))
            print_txt = (f"[Epoch{epoch}] miou={avg['miou']:.4f}, "
                         f"sup_loss_1={avg['sup_loss_1']:.4f}, "
                         f"prototype_loss={avg['prototype_loss']:.4f}, "
                         f"cps_loss={avg['cps_loss']:.4f}, "
                         f"commitment_loss={avg['commitment_loss']:.4f}, "
                         f"{time.time() - ep_start:.1f}s")
            print(print_txt)
            if test_loader is not None and epoch % cfg.train.test_every == 0:
                v1_eval, _ = unstack_cps_state(state)
                test_miou = evaluate(model, v1_eval, test_loader,
                                     cfg.pixel_to_label, num_classes,
                                     eval_step=eval_step)
                print(f"test miou : {test_miou}")
                if logger is not None:
                    logger.log_dict["test_miou"] = test_miou
            if log_txt is not None:
                log_txt.write(print_txt + "\n")
            if save_dir is not None:
                example = visualize.make_example_img(
                    np.asarray(l_input), np.asarray(l_target), np.asarray(pred_sup_1),
                    np.asarray(ul_input), np.asarray(pred_ul_1))
                if logger is not None:
                    logger.image_update(example, f"{epoch}ep")
                if cfg.train.save_img:
                    visualize.save_img(img_dir, f"output_{epoch}ep.png", example)
                do_snap, do_last, light = ckpt_cadence(cfg, epoch, num_epochs)
                if preempt.should_stop:
                    # preemption: last.ckpt must carry the full resume
                    # contract regardless of cadence
                    do_last = True
                if do_snap or do_last:
                    from vq_seg_tpu.utils.ckpoints import fetch_ckpt_tree

                    v1_ck, v2_ck = unstack_cps_state(state)
                    o1_ck, o2_ck = unstack_opt_state(state.opt_state_1)
                    # ONE packed device->host fetch shared by snapshot and
                    # last.ckpt — through a tunneled chip the fetch is the
                    # dominant save cost (BASELINE.md round-3 production run)
                    host_ck = fetch_ckpt_tree(
                        v1_ck, v2_ck, epoch, batch_idx, o1_ck, o2_ck,
                        include_optimizers=do_last or not light)
                    if do_snap:
                        # cfg.train.light_snapshots: snapshots keep models
                        # only (the sweep reads model_1); last.ckpt always
                        # keeps the full resume contract
                        save_ckpoints(v1_ck, v2_ck, epoch, batch_idx, o1_ck, o2_ck,
                                      os.path.join(ckpoints_dir, f"{epoch}ep.ckpt"),
                                      prefetched=host_ck,
                                      include_optimizers=not light)
                    if do_last:
                        save_ckpoints(v1_ck, v2_ck, epoch, batch_idx, o1_ck, o2_ck,
                                      os.path.join(ckpoints_dir, "last.ckpt"),
                                      prefetched=host_ck)
            if logger is not None:
                logger.log_dict.update({k: float(v) for k, v in avg.items()})
                logger.log_dict.update(dict(back_iou=back_iou, weed_iou=weed_iou,
                                            crop_iou=crop_iou, learning_rate=lr))
                logger.temp_update(list_to_separate_log(code_usage, "code_usage"))
                logger.logging(epoch=epoch)
                logger.config_update()
            if preempt.should_stop:
                print(f"preempted after epoch {epoch}: last.ckpt written — "
                      "rerun with cfg.train.resume='auto' to continue")
                break
    if log_txt is not None:
        log_txt.close()
    if logger is not None:
        logger.finish()
    if save_dir is not None:
        from vq_seg_tpu.utils.ckpoints import wait_for_saves

        wait_for_saves()  # flush the in-flight async last.ckpt write
        if cfg.train.get("save_as_tar", False):
            save_tar(save_dir)
    return state
