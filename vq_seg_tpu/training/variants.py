"""Additional semi-supervised trainer variants from the reference's
capability envelope (the ~50-script deprecated/ trainer zoo, SURVEY.md §2.8).

  * ``make_plain_cps_train_step`` — plain Cross Pseudo Supervision
    (deprecated/train_CPS.py:139-178): two models, CE on each other's argmax
    pseudo-labels (no confidence filter, no dice, no VQ losses), one fused
    jitted step.
  * ``make_unimatch_train_step`` — UniMatch (deprecated/train_UNIMatch.py:
    158-190): one model; a no-grad teacher pass on the raw unlabeled batch;
    two CutMix-perturbed student views + one feature-perturbation (fp) view;
    loss = (sup + 0.25 u1 + 0.25 u2 + 0.5 u_fp) / 2 with confidence
    threshold 0.95 pseudo-labels.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from vq_seg_tpu.data.augmentations import make_cutout_mask
from vq_seg_tpu.losses import cross_entropy_loss
from vq_seg_tpu.metrics.measurement import confusion_matrix, miou
from vq_seg_tpu.training.cps import CPSTrainState, _split
from vq_seg_tpu.training.supervised import TrainState


def make_plain_cps_train_step(model, tx, *, num_classes: int,
                              cps_loss_weight: float = 1.0, ce_weight=None,
                              usage_loss_weight: float = 0.0, depth: int = 5):
    """Plain CPS: cps = CE(p1, argmax p2) + CE(p2, argmax p1); sup = CE each.

    ``usage_loss_weight > 0`` adds the reference's ``code_usage_loss=True``
    term (deprecated/code_usage_train.py:111-130 + unet/net.py:108-131):
    usage_loss = sum(per-stage code_usage)/depth per forward.  Faithful
    parity note: code_usage comes from bincount, so the term carries NO
    gradient in the reference either — it only shifts the reported loss."""

    ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)

    def fwd(variables, x):
        out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        logits = out[0] if isinstance(out, tuple) else out
        usage = out[2] if isinstance(out, tuple) and len(out) > 2 else jnp.zeros((0,))
        return logits, usage, {**variables, "batch_stats": mut["batch_stats"]}

    def loss_fn(p1, p2, state, l_img, l_target, ul_img):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        pred_sup_1, us_l1, v1 = fwd(v1, l_img)
        pred_sup_2, us_l2, v2 = fwd(v2, l_img)
        pred_ul_1, us_ul1, v1 = fwd(v1, ul_img)
        pred_ul_2, us_ul2, v2 = fwd(v2, ul_img)
        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jax.lax.stop_gradient(jnp.argmax(pred_1, -1))
        pseudo_2 = jax.lax.stop_gradient(jnp.argmax(pred_2, -1))
        cps = ce(pred_1, pseudo_2) + ce(pred_2, pseudo_1)
        sup_1 = ce(pred_sup_1, l_target)
        sup_2 = ce(pred_sup_2, l_target)
        loss = sup_1 + sup_2 + cps_loss_weight * cps
        usage_loss = jnp.float32(0.0)
        if usage_loss_weight:
            usage_loss = sum(jnp.sum(u) / depth for u in (us_l1, us_l2, us_ul1, us_ul2))
            loss = loss + usage_loss_weight * usage_loss
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss_1=sup_1,
                                       sup_loss_2=sup_2, usage_loss=usage_loss,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_unimatch_train_step(model, tx, *, num_classes: int,
                             confidence_threshold: float = 0.95,
                             cutmix_ratio: float = 0.5, ce_weight=None):
    """UniMatch step; model must be the ``unimatch`` registry net (accepts
    need_fp).  Takes an rng key for the two CutMix draws and dropout."""

    ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)
    th = confidence_threshold

    def pseudo_of(pred):
        pmax = jnp.max(jax.nn.softmax(pred, -1), -1)
        lbl = jnp.argmax(pred, -1)
        return jax.lax.stop_gradient(jnp.where(pmax > th, lbl, 255))

    def cutmix(key, img, pred):
        mask = make_cutout_mask(key, img.shape[1:3], cutmix_ratio)
        mf = mask.astype(img.dtype)[None, :, :, None]
        img_m = img * mf + jnp.roll(img, -1, 0) * (1 - mf)
        pred_m = pred * mf + jnp.roll(pred, -1, 0) * (1 - mf)
        return img_m, pred_m

    def loss_fn(params, state, l_img, l_target, ul_img, key):
        variables = {**state.variables, "params": params}
        # teacher pass (eval mode, detached)
        pred_u = jax.lax.stop_gradient(
            model.apply(variables, ul_img, train=False)[0])
        k1, k2, kd = jax.random.split(key, 3)
        mix_in_1, mix_pred_1 = cutmix(k1, ul_img, pred_u)
        mix_in_2, mix_pred_2 = cutmix(k2, ul_img, pred_u)

        def fwd(v, x, need_fp=False):
            out, mut = model.apply(v, x, need_fp=need_fp, train=True,
                                   mutable=["batch_stats"], rngs={"dropout": kd})
            return out, {**v, "batch_stats": mut["batch_stats"]}

        (pred_l, _), variables = fwd(variables, l_img)
        (pred_ul_1, pred_ul_fp), variables = fwd(variables, ul_img, need_fp=True)
        (pred_mix_1, _), variables = fwd(variables, mix_in_1)
        (pred_mix_2, _), variables = fwd(variables, mix_in_2)

        sup = ce(pred_l, l_target)
        loss_u_1 = ce(pred_mix_1, pseudo_of(mix_pred_1))
        loss_u_2 = ce(pred_mix_2, pseudo_of(mix_pred_2))
        loss_u_fp = ce(pred_ul_fp, pseudo_of(pred_u))
        loss = (sup + 0.25 * loss_u_1 + 0.25 * loss_u_2 + 0.5 * loss_u_fp) / 2
        conf = confusion_matrix(pred_l, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats=variables["batch_stats"],
                          metrics=dict(loss=loss, sup_loss=sup, loss_u_1=loss_u_1,
                                       loss_u_2=loss_u_2, loss_u_fp=loss_u_fp,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, l_img, l_target, ul_img, key):
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.variables["params"], state, l_img, l_target, ul_img, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.variables["params"])
        return state.replace(
            variables={**state.variables,
                       "params": optax.apply_updates(state.variables["params"], updates),
                       "batch_stats": aux["batch_stats"]},
            opt_state=opt_state, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_vqpt_cps_train_step(model, tx, criterion, *, num_classes: int,
                             cps_loss_weight: float = 1.0,
                             commitment_loss_weight: float = 1.0,
                             prototype_loss_weight: float = 0.01):
    """VQPTUnet-family CPS (deprecated/train_vq_pt_unet.py:104-160): the
    nets take (x, gt) — no confidence threshold.  Pseudo-labels come from a
    detached argmax pass (``pseudo_label``, unet/net.py:228-232) and feed the
    OTHER model's prototype loss as int labels; cps loss is the configured
    criterion (dice in vq_pt_unet.json) on post-hoc argmax pseudo-labels."""

    def fwd(variables, x, gt):
        (pred, commit, usage, proto), mut = model.apply(
            variables, x, gt, train=True, mutable=["batch_stats"])
        return (pred, commit, usage, proto), {**variables, "batch_stats": mut["batch_stats"]}

    def loss_fn(p1, p2, state, l_img, l_target, ul_img):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        # pseudo_label: eval-mode forward + argmax, detached
        pl_1 = jax.lax.stop_gradient(
            jnp.argmax(model.apply(v1, ul_img, train=False)[0], -1))
        pl_2 = jax.lax.stop_gradient(
            jnp.argmax(model.apply(v2, ul_img, train=False)[0], -1))

        (pred_sup_1, c_l1, u_l1, pt_l1), v1 = fwd(v1, l_img, l_target)
        (pred_sup_2, c_l2, u_l2, pt_l2), v2 = fwd(v2, l_img, l_target)
        (pred_ul_1, c_ul1, u_ul1, pt_ul1), v1 = fwd(v1, ul_img, pl_2)
        (pred_ul_2, c_ul2, u_ul2, pt_ul2), v2 = fwd(v2, ul_img, pl_1)

        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jax.lax.stop_gradient(jnp.argmax(pred_1, -1))
        pseudo_2 = jax.lax.stop_gradient(jnp.argmax(pred_2, -1))
        cps = criterion(pred_1, pseudo_2) + criterion(pred_2, pseudo_1)
        sup_1 = criterion(pred_sup_1, l_target)
        sup_2 = criterion(pred_sup_2, l_target)
        commit = (c_l1 + c_l2 + c_ul1 + c_ul2) * commitment_loss_weight
        proto = (pt_l1 + pt_l2 + pt_ul1 + pt_ul2) * prototype_loss_weight
        loss = sup_1 + sup_2 + cps_loss_weight * cps + commit + proto
        code_usage = (u_l1 + u_l2 + u_ul1 + u_ul2) / 4.0
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss_1=sup_1,
                                       sup_loss_2=sup_2, commitment_loss=commit,
                                       prototype_loss=proto, code_usage=code_usage,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_rept_cps_train_step(model, tx, criterion, *, num_classes: int,
                             cps_loss_weight: float = 1.0,
                             commitment_loss_weight: float = 1.0,
                             prototype_loss_weight: float = 0.01):
    """Percent-family reliable-prototype CPS (deprecated/
    train_with_test_pt_pseudo_entropy_reg.py:137-210 — the trainer behind
    the vqreptunet1x1 / vqreptunet / vqretemptunet / vqreeuptunet /
    vqreptunetangular configs): nets take ``(x, gt, percent)`` where the
    prototype loss self-filters pixels at the entropy ``percent``-ile.

    Semantics mirrored exactly:
      * eval-mode INT pseudo-labels (argmax) feed the OTHER model's unsup
        pass (:150-171) — not the flagship's 4-D score maps;
      * CPS targets are entropy-REGULARIZED pseudo-labels: pixels whose
        softmax entropy is >= the ``drop_percent``-ile become 255/ignore
        (``make_regularized_pseudo_label``, :30-39 — np.percentile on host
        there, ``jnp.percentile`` on device here);
      * cps and sup losses are the configured criterion alone (:186-190 —
        no 0.5*CE mix, unlike the v2 flagship);
      * ``drop_percent`` is a TRACED scalar so the per-epoch ramp
        (``100 - unsup_loss_drop_percent*(1-epoch/num_epochs)``, :158-159)
        never retriggers compilation."""

    def fwd(variables, x, gt, percent):
        (pred, commit, usage, proto), mut = model.apply(
            variables, x, gt, percent, train=True, mutable=["batch_stats"])
        return (pred, commit, usage, proto), {**variables, "batch_stats": mut["batch_stats"]}

    def regularized_pseudo(pred, drop_percent):
        # reference make_regularized_pseudo_label (:30-39); class-major
        # transpose keeps the size-C softmax off the TPU lane dim
        n, h, w_, c = pred.shape
        z = pred.reshape(n, h * w_, c).transpose(0, 2, 1)
        prob = jax.nn.softmax(z, axis=1)
        label = jnp.argmax(prob, axis=1).reshape(n, h, w_)
        entropy = -jnp.sum(prob * jnp.log(prob + 1e-10), axis=1).reshape(n, h, w_)
        thresh = jnp.percentile(entropy.reshape(-1), drop_percent)
        return jnp.where(entropy >= thresh, 255, label)

    def loss_fn(p1, p2, state, l_img, l_target, ul_img, drop_percent):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        # eval-mode int pseudo-labels (:150-156)
        pl_1 = jax.lax.stop_gradient(
            jnp.argmax(model.apply(v1, ul_img, train=False)[0], -1))
        pl_2 = jax.lax.stop_gradient(
            jnp.argmax(model.apply(v2, ul_img, train=False)[0], -1))

        (pred_sup_1, c_l1, u_l1, pt_l1), v1 = fwd(v1, l_img, l_target, drop_percent)
        (pred_sup_2, c_l2, u_l2, pt_l2), v2 = fwd(v2, l_img, l_target, drop_percent)
        (pred_ul_1, c_ul1, u_ul1, pt_ul1), v1 = fwd(v1, ul_img, pl_2, drop_percent)
        (pred_ul_2, c_ul2, u_ul2, pt_ul2), v2 = fwd(v2, ul_img, pl_1, drop_percent)

        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jax.lax.stop_gradient(regularized_pseudo(pred_1, drop_percent))
        pseudo_2 = jax.lax.stop_gradient(regularized_pseudo(pred_2, drop_percent))
        cps = criterion(pred_1, pseudo_2) + criterion(pred_2, pseudo_1)
        sup_1 = criterion(pred_sup_1, l_target)
        sup_2 = criterion(pred_sup_2, l_target)
        commit = (c_l1 + c_l2 + c_ul1 + c_ul2) * commitment_loss_weight
        proto = (pt_l1 + pt_l2 + pt_ul1 + pt_ul2) * prototype_loss_weight
        loss = sup_1 + sup_2 + cps_loss_weight * cps + commit + proto
        code_usage = (u_l1 + u_l2 + u_ul1 + u_ul2) / 4.0
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss_1=sup_1,
                                       sup_loss_2=sup_2, commitment_loss=commit,
                                       prototype_loss=proto, code_usage=code_usage,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img, drop_percent):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img, drop_percent)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_objloss_cps_train_step(model, tx, criterion, object_criterion, *,
                                num_classes: int, batch_size: int,
                                cps_loss_weight: float = 1.0,
                                commitment_loss_weight: float = 1.0,
                                obj_loss_weight: float = 1.0):
    """Plain CPS + binary OBJECT loss (deprecated/
    train_with_test_object_loss.py:29-36, 150-182): obj_pred = sum of the
    non-background softmax channels, obj_target = (label != 0); the object
    criterion is the configured loss with num_classes=1 — which, faithfully,
    applies its sigmoid to the already-softmaxed probability."""

    def fwd(variables, x):
        out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        pred = out[0] if isinstance(out, tuple) else out
        commit = (out[1] if isinstance(out, tuple) and len(out) > 1 and out[1] is not None
                  else jnp.float32(0.0))
        return pred, commit, {**variables, "batch_stats": mut["batch_stats"]}

    def to_obj_pred(pred):
        prob = jax.nn.softmax(pred, -1)
        return jnp.sum(prob[..., 1:], axis=-1, keepdims=True)

    def loss_fn(p1, p2, state, l_img, l_target, ul_img):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        pred_sup_1, c_l1, v1 = fwd(v1, l_img)
        pred_sup_2, c_l2, v2 = fwd(v2, l_img)
        pred_ul_1, c_ul1, v1 = fwd(v1, ul_img)
        pred_ul_2, c_ul2, v2 = fwd(v2, ul_img)
        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jax.lax.stop_gradient(jnp.argmax(pred_1, -1))
        pseudo_2 = jax.lax.stop_gradient(jnp.argmax(pred_2, -1))
        cps = criterion(pred_1, pseudo_2) + criterion(pred_2, pseudo_1)
        sup = criterion(pred_sup_1, l_target) + criterion(pred_sup_2, l_target)
        # object loss: labeled targets + the OTHER model's unlabeled pseudo
        obj_t1 = jnp.where(jnp.concatenate([l_target, pseudo_1[-batch_size:]], 0) != 0, 1, 0)
        obj_t2 = jnp.where(jnp.concatenate([l_target, pseudo_2[-batch_size:]], 0) != 0, 1, 0)
        obj = (object_criterion(to_obj_pred(pred_1), jax.lax.stop_gradient(obj_t2))
               + object_criterion(to_obj_pred(pred_2), jax.lax.stop_gradient(obj_t1)))
        commit = c_l1 + c_l2 + c_ul1 + c_ul2
        loss = (sup + cps_loss_weight * cps + commitment_loss_weight * commit
                + obj_loss_weight * obj)
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss=sup,
                                       obj_loss=obj, commitment_loss=commit,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_angularv3_cps_train_step(model, tx, dice_loss, *, num_classes: int,
                                  cps_loss_weight: float = 1.0,
                                  commitment_loss_weight: float = 1.0,
                                  prototype_loss_weight: float = 0.01,
                                  ce_weight=None):
    """Angular-v3 CPS (deprecated/train_angularv3.py:140-205): nets with the
    (x, pred, split, th) signature (vqreptunetangularv3).  The unreliable
    threshold ramps per epoch ((epoch+1)/num_epochs, capped 0.7 after epoch
    70 — :155) and is passed per step; the CPS filter is the RAW max logit
    (no softmax — entropy_mask, :43-47)."""

    ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)

    def fwd(variables, x, pred, split, th):
        (out, commit, usage, aloss), mut = model.apply(
            variables, x, pred, split, th, train=True, mutable=["batch_stats"])
        return (out, commit, usage, aloss), {**variables, "batch_stats": mut["batch_stats"]}

    def entropy_mask(pred, pseudo, th):
        # raw-logit max (train_angularv3.py:46 — softmax commented out)
        return jnp.where(jnp.max(pred, -1) > th, pseudo, 255)

    def loss_fn(p1, p2, state, l_img, l_target, ul_img, th):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        s1 = jax.lax.stop_gradient(model.apply(v1, ul_img, train=False)[0])
        s2 = jax.lax.stop_gradient(model.apply(v2, ul_img, train=False)[0])
        (pred_sup_1, c_l1, u_l1, a_l1), v1 = fwd(v1, l_img, l_target, "labeled", 0.0)
        (pred_sup_2, c_l2, u_l2, a_l2), v2 = fwd(v2, l_img, l_target, "labeled", 0.0)
        (pred_ul_1, c_ul1, u_ul1, a_ul1), v1 = fwd(v1, ul_img, s2, "unlabeled", th)
        (pred_ul_2, c_ul2, u_ul2, a_ul2), v2 = fwd(v2, ul_img, s1, "unlabeled", th)
        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jnp.argmax(pred_1, -1)
        pseudo_2 = jnp.argmax(pred_2, -1)
        filt_1 = jax.lax.stop_gradient(entropy_mask(pred_1, pseudo_1, th))
        filt_2 = jax.lax.stop_gradient(entropy_mask(pred_2, pseudo_2, th))
        cps = (0.5 * ce(pred_1, filt_2) + 0.5 * ce(pred_2, filt_1)
               + dice_loss(pred_1, filt_2) + dice_loss(pred_2, filt_1))
        sup_1 = 0.5 * ce(pred_sup_1, l_target) + dice_loss(pred_sup_1, l_target)
        sup_2 = 0.5 * ce(pred_sup_2, l_target) + dice_loss(pred_sup_2, l_target)
        commit = (c_l1 + c_l2 + c_ul1 + c_ul2) * commitment_loss_weight
        proto = (a_l1 + a_l2 + a_ul1 + a_ul2) * prototype_loss_weight
        loss = sup_1 + sup_2 + cps_loss_weight * cps + commit + proto
        code_usage = (u_l1 + u_l2 + u_ul1 + u_ul2) / 4.0
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss_1=sup_1,
                                       sup_loss_2=sup_2, commitment_loss=commit,
                                       prototype_loss=proto, code_usage=code_usage,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img, th):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img, th)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_easyhard_cps_train_step(model, tx, criterion, *, num_classes: int,
                                 cutmix_ratio: float = 0.5,
                                 cps_loss_weight: float = 1.0,
                                 commitment_loss_weight: float = 1.0,
                                 prototype_loss_weight: float = 0.01):
    """Easy-hard augmentation CPS (deprecated/train_vqpt_easyhard_aug.py:
    100-170): pseudo-labels come from an EASY (dihedral) view, are
    inverse-transformed and CutMix'd with the SAME box as the hard input
    view; cps = criterion between sup argmaxes + criterion(pred_hard,
    mixed pseudo).  Nets with the (x, gt) signature (vqptunet family).

    The dihedral case is a traced int (0 identity / 1 h-flip / 2 v-flip —
    the reference's rotation branches are no-ops, data/augmentations.py
    parity note), so one compilation covers all draws."""
    from vq_seg_tpu.data.augmentations import make_cutout_mask

    def dihedral(x, case):
        # width/height axes for NHWC images (ndim 4) vs NHW label maps
        w_ax = -2 if x.ndim == 4 else -1
        h_ax = -3 if x.ndim == 4 else -2
        return jax.lax.switch(case, [lambda a: a,
                                     lambda a: jnp.flip(a, w_ax),
                                     lambda a: jnp.flip(a, h_ax)], x)

    def fwd(variables, x, gt):
        (pred, commit, usage, proto), mut = model.apply(
            variables, x, gt, train=True, mutable=["batch_stats"])
        return (pred, commit, usage, proto), {**variables, "batch_stats": mut["batch_stats"]}

    def loss_fn(p1, p2, state, l_img, l_target, ul_img, key, case):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        easy_ul = dihedral(ul_img, case)
        mask = make_cutout_mask(key, ul_img.shape[1:3], cutmix_ratio)
        mf = mask.astype(ul_img.dtype)[None, :, :, None]
        hard_ul = ul_img * mf + jnp.roll(ul_img, -1, 0) * (1 - mf)
        # pseudo from the easy view, mapped back, mixed like the hard input
        pl_1 = jnp.argmax(model.apply(v1, easy_ul, train=False)[0], -1)
        pl_2 = jnp.argmax(model.apply(v2, easy_ul, train=False)[0], -1)

        def mix_labels(pl):
            pl = dihedral(pl, case)  # inverse == forward for flips
            return pl * mask[None] + jnp.roll(pl, -1, 0) * (1 - mask[None])

        pl_1 = jax.lax.stop_gradient(mix_labels(pl_1))
        pl_2 = jax.lax.stop_gradient(mix_labels(pl_2))

        (pred_sup_1, c_l1, u_l1, pt_l1), v1 = fwd(v1, l_img, l_target)
        (pred_sup_2, c_l2, u_l2, pt_l2), v2 = fwd(v2, l_img, l_target)
        (pred_ul_1, c_ul1, u_ul1, pt_ul1), v1 = fwd(v1, hard_ul, pl_2)
        (pred_ul_2, c_ul2, u_ul2, pt_ul2), v2 = fwd(v2, hard_ul, pl_1)

        sp_1 = jax.lax.stop_gradient(jnp.argmax(pred_sup_1, -1))
        sp_2 = jax.lax.stop_gradient(jnp.argmax(pred_sup_2, -1))
        sup_cps = criterion(pred_sup_1, sp_2) + criterion(pred_sup_2, sp_1)
        unsup_cps = criterion(pred_ul_1, pl_2) + criterion(pred_ul_2, pl_1)
        cps = (sup_cps + unsup_cps) * cps_loss_weight
        sup = criterion(pred_sup_1, l_target) + criterion(pred_sup_2, l_target)
        commit = (c_l1 + c_l2 + c_ul1 + c_ul2) * commitment_loss_weight
        proto = (pt_l1 + pt_l2 + pt_ul1 + pt_ul2) * prototype_loss_weight
        loss = sup + cps + commit + proto
        code_usage = (u_l1 + u_l2 + u_ul1 + u_ul2) / 4.0
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss=sup,
                                       commitment_loss=commit, prototype_loss=proto,
                                       code_usage=code_usage, miou=m,
                                       iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img, key, case):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img, key, case)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_salient_cps_train_step(model, tx, *, num_classes: int,
                                cps_loss_weight: float = 1.0,
                                commitment_loss_weight: float = 1.0,
                                auxiliary_loss_weight: float = 1.0,
                                ce_weight=None):
    """Salient-loss CPS (deprecated/train_salient_loss.py:120-161): two
    VQUnetwithSalientloss models; CPS CE on each other's argmax pseudo-labels
    plus an MSE auxiliary loss pulling the sigmoid saliency decoders toward
    the precomputed saliency maps (nearest-resized to the decoder grid)."""

    ce = partial(cross_entropy_loss, ignore_index=255, weight=ce_weight)

    def fwd(variables, x):
        (pred, commit, usage, sal), mut = model.apply(
            variables, x, train=True, mutable=["batch_stats"])
        return pred, commit, sal, {**variables, "batch_stats": mut["batch_stats"]}

    def _sal_loss(sal_pred, sal_map):
        tgt = jax.image.resize(sal_map, sal_pred.shape[:3], method="nearest")[..., None]
        return jnp.mean((sal_pred - tgt) ** 2)

    def loss_fn(p1, p2, state, l_img, l_target, l_sal, ul_img, ul_sal):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        pred_sup_1, c_l1, sal_l1, v1 = fwd(v1, l_img)
        pred_sup_2, c_l2, sal_l2, v2 = fwd(v2, l_img)
        pred_ul_1, c_ul1, sal_ul1, v1 = fwd(v1, ul_img)
        pred_ul_2, c_ul2, sal_ul2, v2 = fwd(v2, ul_img)
        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jax.lax.stop_gradient(jnp.argmax(pred_1, -1))
        pseudo_2 = jax.lax.stop_gradient(jnp.argmax(pred_2, -1))
        cps = ce(pred_1, pseudo_2) + ce(pred_2, pseudo_1)
        sup = ce(pred_sup_1, l_target) + ce(pred_sup_2, l_target)
        commit = c_l1 + c_l2 + c_ul1 + c_ul2
        salient = (_sal_loss(sal_l1, l_sal) + _sal_loss(sal_l2, l_sal)
                   + _sal_loss(sal_ul1, ul_sal) + _sal_loss(sal_ul2, ul_sal))
        loss = (sup + cps_loss_weight * cps + commitment_loss_weight * commit
                + auxiliary_loss_weight * salient)
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, salient_loss=salient,
                                       commitment_loss=commit, miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, l_sal, ul_img, ul_sal):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, l_sal, ul_img, ul_sal)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def make_supcon_cps_train_step(model, tx, criterion, *, num_classes: int,
                               cps_loss_weight: float = 1.0,
                               commitment_loss_weight: float = 1.0,
                               sup_con_loss_weight: float = 1.0):
    """SupCon CPS (deprecated/train_supcon_unet.py:95-160): supconvqunet's
    forward(x, gt, split='label') adds the pixel supervised-contrastive aux
    loss on the LABELED pass only; unsupervised passes take the OTHER
    model's argmax pseudo-labels (no aux); cps = criterion on the
    concatenated argmaxes."""

    def fwd(variables, x, gt, split):
        (pred, commit, usage, aux), mut = model.apply(
            variables, x, gt, split, train=True, mutable=["batch_stats"])
        return (pred, commit, usage, aux), {**variables, "batch_stats": mut["batch_stats"]}

    def loss_fn(p1, p2, state, l_img, l_target, ul_img):
        v1 = {**state.variables_1, "params": p1}
        v2 = {**state.variables_2, "params": p2}
        pl_1 = jax.lax.stop_gradient(
            jnp.argmax(model.apply(v1, ul_img, train=False)[0], -1))
        pl_2 = jax.lax.stop_gradient(
            jnp.argmax(model.apply(v2, ul_img, train=False)[0], -1))
        (pred_sup_1, c_l1, u_l1, sc_1), v1 = fwd(v1, l_img, l_target, "label")
        (pred_sup_2, c_l2, u_l2, sc_2), v2 = fwd(v2, l_img, l_target, "label")
        (pred_ul_1, c_ul1, u_ul1, _), v1 = fwd(v1, ul_img, pl_2, None)
        (pred_ul_2, c_ul2, u_ul2, _), v2 = fwd(v2, ul_img, pl_1, None)
        pred_1 = jnp.concatenate([pred_sup_1, pred_ul_1], 0)
        pred_2 = jnp.concatenate([pred_sup_2, pred_ul_2], 0)
        pseudo_1 = jax.lax.stop_gradient(jnp.argmax(pred_1, -1))
        pseudo_2 = jax.lax.stop_gradient(jnp.argmax(pred_2, -1))
        cps = criterion(pred_1, pseudo_2) + criterion(pred_2, pseudo_1)
        sup = criterion(pred_sup_1, l_target) + criterion(pred_sup_2, l_target)
        commit = (c_l1 + c_l2 + c_ul1 + c_ul2) * commitment_loss_weight
        supcon = (sc_1 + sc_2) * sup_con_loss_weight
        loss = sup + cps_loss_weight * cps + commit + supcon
        code_usage = (u_l1 + u_l2 + u_ul1 + u_ul2) / 4.0
        conf = confusion_matrix(pred_sup_1, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats_1=v1["batch_stats"], batch_stats_2=v2["batch_stats"],
                          metrics=dict(loss=loss, cps_loss=cps, sup_loss=sup,
                                       sup_con_loss=supcon, commitment_loss=commit,
                                       code_usage=code_usage, miou=m,
                                       iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CPSTrainState, l_img, l_target, ul_img):
        (p1, _), (p2, _) = _split(state.variables_1), _split(state.variables_2)
        (g1, g2), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            p1, p2, state, l_img, l_target, ul_img)
        u1, o1 = tx.update(g1, state.opt_state_1, p1)
        u2, o2 = tx.update(g2, state.opt_state_2, p2)
        return state.replace(
            variables_1={**state.variables_1, "params": optax.apply_updates(p1, u1),
                         "batch_stats": aux["batch_stats_1"]},
            variables_2={**state.variables_2, "params": optax.apply_updates(p2, u2),
                         "batch_stats": aux["batch_stats_2"]},
            opt_state_1=o1, opt_state_2=o2, step=state.step + 1,
        ), aux["metrics"]

    return step


def overlapped_patches(ul_input, overlap_size: int = 240):
    """Two overlapping center crops (deprecated/semiweednet_train.py:33-42).
    NHWC; patch = overlap + overlap//3, offset by overlap//3."""
    h, w = ul_input.shape[1:3]
    add = overlap_size // 3
    patch = overlap_size + add
    hc, wc = h // 2, w // 2
    y1, x1 = hc - overlap_size // 2 - add, wc - overlap_size // 2 - add
    y2, x2 = hc - overlap_size // 2, wc - overlap_size // 2
    p1 = ul_input[:, y1:y1 + patch, x1:x1 + patch]
    p2 = ul_input[:, y2:y2 + patch, x2:x2 + patch]
    return p1, p2


def make_semiweed_train_step(model, tx, criterion, dc_criterion, *,
                             num_classes: int, overlap_size: int = 240,
                             ce_loss_weight: float = 1.0,
                             dc_loss_weight: float = 1.0):
    """SemiWeedNet contrastive semi-sup (deprecated/semiweednet_train.py:
    100-170): ONE model; CE on the labeled pass (issup=True) + diagonal-
    cosine loss between the MLP projections of two dihedral-transformed
    overlapping crops of the unlabeled batch.  Dihedral cases are traced
    ints (flips only — the rotation branches are reference no-ops)."""

    def dihedral(x, case):
        return jax.lax.switch(case, [lambda a: a,
                                     lambda a: jnp.flip(a, -2),
                                     lambda a: jnp.flip(a, -3)], x)

    def loss_fn(params, state, l_img, l_target, ul_img, case1, case2, key):
        variables = {**state.variables, "params": params}
        k1, k2, k3 = jax.random.split(key, 3)
        p1, p2 = overlapped_patches(ul_img, overlap_size)
        p1 = dihedral(p1, case1)
        p2 = dihedral(p2, case2)
        (pred_sup, _), mut = model.apply(variables, l_img, issup=True, train=True,
                                         mutable=["batch_stats"],
                                         rngs={"dropout": k1})
        variables = {**variables, "batch_stats": mut["batch_stats"]}
        (_, mlp1), mut = model.apply(variables, p1, train=True,
                                     mutable=["batch_stats"], rngs={"dropout": k2})
        variables = {**variables, "batch_stats": mut["batch_stats"]}
        (_, mlp2), mut = model.apply(variables, p2, train=True,
                                     mutable=["batch_stats"], rngs={"dropout": k3})
        ce = criterion(pred_sup, l_target)
        dc = dc_criterion(mlp1, mlp2)
        loss = ce_loss_weight * ce + dc_loss_weight * dc
        conf = confusion_matrix(pred_sup, l_target, num_classes=num_classes)
        m, iou_list = miou(conf)
        return loss, dict(batch_stats=mut["batch_stats"],
                          metrics=dict(loss=loss, ce_loss=ce, dc_loss=dc,
                                       miou=m, iou_list=iou_list))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, l_img, l_target, ul_img, case1, case2, key):
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.variables["params"], state, l_img, l_target, ul_img, case1,
            case2, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.variables["params"])
        return state.replace(
            variables={**state.variables,
                       "params": optax.apply_updates(state.variables["params"], updates),
                       "batch_stats": aux["batch_stats"]},
            opt_state=opt_state, step=state.step + 1,
        ), aux["metrics"]

    return step
