"""Class-prototype metric losses (reference models/modules/prototype.py).

Functional Flax re-designs, NHWC decoder features (N, H, W, C).  All nine
reference variants are reproduced with their *observable* semantics,
including several reference quirks that materially change gradients:

  * v1-family losses compute cosines against ``embedding.weight.data`` — a
    detach — so their prototypes receive **no gradient** and stay frozen at
    init (prototype.py:128,560,279,355).  Here: ``stop_gradient`` on the
    prototype table.
  * v2 / StableTemperatured / OnlyCW use the live weight after an *in-place*
    l2 renormalisation (``weight.data = l2norm(...)``, prototype.py:844).
    Here the forward uses ``l2norm(w)`` with gradient flow — first-order
    equivalent to renormalise-then-grad (the radial gradient component the
    reference keeps is annihilated by the next renormalisation).
  * the lazy k-means init on the first training batch (prototype.py:829-830)
    is an explicit ``init_protos=True`` phase: run once with
    ``mutable=["params"]`` and an ``rngs={"kmeans": ...}`` key before
    training (SURVEY.md §7 "stateful-to-functional conversions").
  * entropy-percentile filtering uses ``jnp.percentile`` **on device**
    instead of the reference's host ``np.percentile`` round-trip
    (prototype.py:582 — a per-step device->host sync).

Loss math (log/exp eps placement, masked means over *all* pixels, the
multiplicative ArcFace margin of v2 at prototype.py:860, the
``sum(exp(c))/t`` temperature quirk at prototype.py:746) follows the
reference exactly; tests pin these against hand-computed cases.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vq_seg_tpu.ops.kmeans import kmeans, l2norm
from vq_seg_tpu.utils.seg_tools import onehot_1d
from vq_seg_tpu.models.layers import resize_nearest, resize_bilinear


def orthogonal_loss_fn(t: jnp.ndarray) -> jnp.ndarray:
    """Eq. (2) of arXiv:2112.00384 (reference prototype.py:72-77)."""
    n = t.shape[0]
    normed = l2norm(t)
    cos = normed @ normed.T
    return jnp.sum(cos**2) / (n**2) - 1.0 / n


def arcface_phi(cosine: jnp.ndarray, margin: float, easy_margin: bool) -> jnp.ndarray:
    """phi = cos(theta + m) with the easy/hard margin fallbacks
    (reference prototype.py:853-858)."""
    cos_m, sin_m = math.cos(margin), math.sin(margin)
    th = math.cos(math.pi - margin)
    mm = math.sin(math.pi - margin) * margin
    sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        return jnp.where(cosine > 0, phi, cosine)
    return jnp.where(cosine > th, phi, cosine - mm)


def eps_softmax_ce(logits: jnp.ndarray, positive: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """-mean(log(exp(pos)/(sum exp + 1e-7) + 1e-7) [* mask])
    (reference prototype.py:864-868)."""
    sum_all = jnp.sum(jnp.exp(logits), axis=-1)
    lg = jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7)
    if mask is not None:
        lg = lg * mask
    return -jnp.mean(lg)


def entropy_mask(entropy: jnp.ndarray, percent) -> jnp.ndarray:
    """keep pixels with entropy <= percentile(entropy, percent)
    (reference prototype.py:583-585), computed on device."""
    thresh = jnp.percentile(jax.lax.stop_gradient(entropy).reshape(-1), percent)
    return (entropy <= thresh).reshape(-1)


def _flatten_with_gt(x, gt):
    """(N,H,W,C) features + (N,h,w) int labels -> (NHW, C), (NHW,) with
    nearest-resize of gt to the feature grid (reference prototype.py:821-827)."""
    n, h, w, c = x.shape
    if gt.shape[1:] != (h, w):
        gt = resize_nearest(gt.astype(jnp.float32), (h, w)).astype(jnp.int32)
    return x.reshape(n * h * w, c).astype(jnp.float32), gt.reshape(-1).astype(jnp.int32)


def class_mean_features(flat_x, flat_gt, num_classes):
    """Per-class mean feature (use_feature / class_means init).  Empty classes
    get a zero mean (the reference NaNs there — documented divergence)."""
    sums = jax.ops.segment_sum(flat_x, flat_gt, num_segments=num_classes)
    cnt = jax.ops.segment_sum(jnp.ones_like(flat_gt, jnp.float32), flat_gt, num_segments=num_classes)
    return sums / jnp.maximum(cnt, 1.0)[:, None]


class _ProtoBase(nn.Module):
    """Shared prototype-table plumbing: param creation by init mode + the
    explicit kmeans/class_means init phase."""

    num_classes: int = 3
    embedding_dim: int = 0
    # NB the reference ctor calls this arg ``init``; that name would shadow
    # flax Module.init, hence pt_init.
    pt_init: str = "kmeans"
    use_feature: bool = False

    def _embedding(self):
        k, ed = self.num_classes, self.embedding_dim
        if self.pt_init == "uniform":
            ini = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0 / k, 1.0 / k)
        elif self.pt_init in ("normal", "kmeans", "class_means"):
            ini = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default
        else:
            raise ValueError("init has to be in [uniform, normal, kmeans, class_means]")
        return self.param("embedding", ini, (k, ed))

    def _maybe_init(self, w, flat_x, flat_gt=None):
        """Explicit data-dependent init (the reference's lazy first-forward
        ``_kmeans_init``, prototype.py:876-888)."""
        if self.pt_init == "kmeans":
            means, _ = kmeans(self.make_rng("kmeans"), flat_x, self.num_classes, 10)
        elif self.pt_init == "class_means":
            means = class_mean_features(flat_x, flat_gt, self.num_classes)
        else:
            return w
        if self.is_mutable_collection("params"):
            self.put_variable("params", "embedding", means)
        return means

    def _table(self, flat_x, flat_gt, init_protos: bool):
        w = self._embedding()
        if init_protos:
            w = self._maybe_init(w, flat_x, flat_gt)
        if self.use_feature:
            w = jax.lax.stop_gradient(class_mean_features(flat_x, flat_gt, self.num_classes))
        return w


class PrototypeLoss(_ProtoBase):
    """ArcFace-margin softmax-CE over cosine to class prototypes
    (reference prototype.py:79-169).  Prototypes are *detached* (the
    reference cosines against ``weight.data``) — only encoder features learn."""

    scale: float = 1.0
    margin: float = 0.5
    easy_margin: bool = True

    @nn.compact
    def __call__(self, x, gt, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        w = jax.lax.stop_gradient(l2norm(w))
        fx = l2norm(flat_x)
        cosine = w @ fx.T  # class-major (K, M) — see v2 note on lane layout
        # eps-ed onehot (reference onehot_1d adds 1e-6 everywhere,
        # utils/seg_tools.py:23-34 — the eps leaks into the blend/positive)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0)
                  == flat_gt[None, :]).astype(jnp.float32) + 1e-6
        if self.margin != 0:
            phi = arcface_phi(cosine, self.margin, self.easy_margin)
            cosine = onehot * phi + (1.0 - onehot) * cosine
        if self.scale != 1:
            cosine = self.scale * cosine
        # NB the reference's positive is exp(sum(cosine*onehot)) with the
        # eps-ed onehot (prototype.py:151); reproduce exactly:
        positive = jnp.sum(cosine * onehot, axis=0)
        sum_all = jnp.sum(jnp.exp(cosine), axis=0)
        return -jnp.mean(jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7))


class EuclideanPrototypeLoss(_ProtoBase):
    """MSE pull toward the (detached) gt-class prototype
    (reference prototype.py:172-232)."""

    @nn.compact
    def __call__(self, x, gt, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        target = jax.lax.stop_gradient(jnp.take(w, flat_gt, axis=0))
        return jnp.mean((target - flat_x) ** 2)


class LearnableEuclideanPrototypeLoss(_ProtoBase):
    """Per-class mean distance scaled by a learnable sigmoid(alpha)
    (reference prototype.py:234-298).  Distances use the detached table."""

    @nn.compact
    def __call__(self, x, gt, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        alpha = self.param("alpha", nn.initializers.constant(-1.0), ())
        w = jax.lax.stop_gradient(w)
        d = jnp.sqrt(jnp.maximum(
            jnp.sum(flat_x**2, -1, keepdims=True) - 2 * flat_x @ w.T + jnp.sum(w**2, -1)[None, :],
            1e-12))
        onehot = jax.nn.one_hot(flat_gt, self.num_classes)
        cnt = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
        per_class = jnp.sum(d * onehot, axis=0) / cnt
        return jnp.mean(per_class) * jax.nn.sigmoid(alpha)


class NEDPrototypeLoss(_ProtoBase):
    """Negative softmax-over-distance at the gt class
    (reference prototype.py:300-383)."""

    pt_init: str = "class_means"
    temperature: float = 0.04

    @nn.compact
    def __call__(self, x, gt, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        w = jax.lax.stop_gradient(w)
        # class-major (K, M) distances; iota-mask gather instead of a lane-K
        # take_along_axis (see v2 layout note)
        d = jnp.sqrt(jnp.maximum(
            jnp.sum(w**2, -1)[:, None] - 2 * w @ flat_x.T + jnp.sum(flat_x**2, -1)[None, :],
            1e-12))
        p = jax.nn.softmax(d / self.temperature, axis=0)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) == flat_gt[None, :])
        return -jnp.mean(jnp.sum(jnp.where(onehot, p, 0.0), axis=0))


class ReliablePrototypeLoss(_ProtoBase):
    """Margin CE with entropy-percentile pixel filtering (reference
    prototype.py:500-613 — the second, one-hot definition that shadows the
    first).  Detached prototypes."""

    scale: float = 1.0
    margin: float = 0.5
    easy_margin: bool = True
    orthogonal_reg_weight: float = 0.0

    @nn.compact
    def __call__(self, x, gt, percent, entropy, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        wn = jax.lax.stop_gradient(l2norm(w))
        fx = l2norm(flat_x)
        cosine = wn @ fx.T  # class-major (K, M)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0)
                  == flat_gt[None, :]).astype(jnp.float32) + 1e-6
        if self.margin != 0:
            phi = arcface_phi(cosine, self.margin, self.easy_margin)
            cosine = onehot * phi + (1.0 - onehot) * cosine
        if self.scale != 1:
            cosine = self.scale * cosine
        mask = entropy_mask(entropy, percent).astype(cosine.dtype)
        positive = jnp.sum(cosine * onehot, axis=0)
        sum_all = jnp.sum(jnp.exp(cosine), axis=0)
        loss = -jnp.mean(jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7) * mask)
        if self.orthogonal_reg_weight > 0:
            loss = loss + orthogonal_loss_fn(w) * self.orthogonal_reg_weight
        return loss


class ReliableEuclideanPrototypeLoss(_ProtoBase):
    """Entropy-masked MSE to the gt prototype (reference prototype.py:614-683).
    Uses the *live* embedding — prototypes receive gradient here."""

    @nn.compact
    def __call__(self, x, gt, percent, entropy, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        mask = entropy_mask(entropy, percent).astype(flat_x.dtype)[:, None]
        gt_embed = jnp.take(w, flat_gt, axis=0)
        return jnp.mean((flat_x * mask - gt_embed * mask) ** 2)


class StableTemperaturedPrototypeLoss(_ProtoBase):
    """Temperatured cosine CE with entropy filtering (reference
    prototype.py:687-776).  Live renormalised prototypes; reproduces the
    reference's ``sum(exp(c)/t)`` denominator (exp *then* divide, :746)."""

    t: float = 0.1
    orthogonal_reg_weight: float = 0.0

    @nn.compact
    def __call__(self, x, gt, percent, entropy, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        wn = l2norm(w)
        fx = l2norm(flat_x)
        cosine = wn @ fx.T  # class-major (K, M)
        mask = entropy_mask(entropy, percent).astype(cosine.dtype)[None, :]
        cosine = cosine * mask
        onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0) == flat_gt[None, :])
        positive = jnp.exp(jnp.sum(jnp.where(onehot, cosine, 0.0), axis=0) / self.t)
        sum_all = jnp.sum(jnp.exp(cosine) / self.t, axis=0)
        loss = -jnp.mean(jnp.log(positive / (sum_all + 1e-7) + 1e-7))
        if self.orthogonal_reg_weight > 0:
            loss = loss + orthogonal_loss_fn(w) * self.orthogonal_reg_weight
        return loss


class ReliablePrototypeLossv2(_ProtoBase):
    """Flagship confidence-masked ArcFace prototype loss
    (reference prototype.py:778-888, call stack SURVEY.md §3.2).

    ``gt`` is either (N,h,w) int labels or an (N,h,w,C) score map; for a
    score map the loss confidence-masks at threshold ``th`` and uses argmax
    pseudo-labels (prototype.py:811-820).  The ArcFace margin is
    *multiplicative* at the gt logit (``cos_gt <- cos_gt * phi_gt``,
    prototype.py:860).  Live renormalised prototypes — gradients flow."""

    scale: float = 1.0
    margin: float = 0.5
    easy_margin: bool = True
    orthogonal_reg_weight: float = 0.0

    @nn.compact
    def __call__(self, x, gt, th=None, train: bool = True, init_protos: bool = False):
        n, h, w_, c = x.shape
        confidence_mask = None
        if gt.ndim == 4:  # score map path
            pred = gt
            if pred.shape[1:3] != (h, w_):
                pred = resize_bilinear(pred.astype(jnp.float32), (h, w_))
            # class-major softmax (C in lanes would idle 125/128 of the VPU)
            zc = pred.reshape(-1, pred.shape[-1]).astype(jnp.float32).T
            prob = jax.nn.softmax(zc, axis=0)
            confidence_mask = (jnp.max(prob, axis=0) > th).astype(jnp.float32)
            gt = jnp.argmax(pred, axis=-1)
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        wn = l2norm(w)
        fx = l2norm(flat_x)
        # class-major cosine (K, M): keeps every subsequent elementwise op,
        # the margin select, and the gt gather (an iota-mask sum — profiled
        # 17 ms/step as a lane-3 gather+scatter pair) off the lane dim
        cosine = wn @ fx.T
        phi = arcface_phi(cosine, self.margin, self.easy_margin)
        gt_onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0)
                     == flat_gt[None, :])
        # multiplicative margin at the gt position only
        cosine = jnp.where(gt_onehot, cosine * phi, cosine)
        cosine = self.scale * cosine
        positive = jnp.sum(jnp.where(gt_onehot, cosine, 0.0), axis=0)
        sum_all = jnp.sum(jnp.exp(cosine), axis=0)
        lg = jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7)
        if confidence_mask is not None:
            lg = lg * confidence_mask
        loss = -jnp.mean(lg)
        if self.orthogonal_reg_weight > 0:
            loss = loss + orthogonal_loss_fn(w) * self.orthogonal_reg_weight
        return loss


class OnlyCWPrototypeLoss(_ProtoBase):
    """Crop/weed-only prototype loss (reference prototype.py:890-987):
    background pixels are masked out, prototypes cover classes 1..K-1, and
    the computed margin phi is — faithfully — never applied (:945-951).

    ``num_classes`` is the *full* class count; the table holds K-1 non-bg
    prototypes (the reference ctor decrements, prototype.py:895-896)."""

    scale: float = 1.0
    margin: float = 0.5
    easy_margin: bool = True
    orthogonal_reg_weight: float = 0.0

    @property
    def _k(self):
        return self.num_classes - 1

    def _embedding(self):
        k, ed = self._k, self.embedding_dim
        if self.pt_init == "uniform":
            ini = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0 / k, 1.0 / k)
        else:
            ini = nn.initializers.normal(stddev=1.0)
        return self.param("embedding", ini, (k, ed))

    def _maybe_init(self, w, flat_x, flat_gt=None):
        if self.pt_init != "kmeans":
            return w
        means, _ = kmeans(self.make_rng("kmeans"), flat_x, self._k, 10)
        if self.is_mutable_collection("params"):
            self.put_variable("params", "embedding", means)
        return means

    @nn.compact
    def __call__(self, x, gt, percent, entropy, train: bool = True, init_protos: bool = False):
        flat_x, flat_gt = _flatten_with_gt(x, gt)
        w = self._table(flat_x, flat_gt, init_protos)
        wn = l2norm(w)
        fx = l2norm(flat_x)
        cosine = self.scale * (wn @ fx.T)  # class-major (K-1, M)
        mask = entropy_mask(entropy, percent) & (flat_gt != 0)
        # gt-1 indexing over the (K-1)-entry table; bg rows are masked anyway
        idx = jnp.clip(flat_gt - 1, 0, self._k - 1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0) == idx[None, :])
        positive = jnp.sum(jnp.where(onehot, cosine, 0.0), axis=0)
        sum_all = jnp.sum(jnp.exp(cosine), axis=0)
        lg = jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7) * mask.astype(cosine.dtype)
        loss = -jnp.mean(lg)
        if self.orthogonal_reg_weight > 0:
            loss = loss + orthogonal_loss_fn(w) * self.orthogonal_reg_weight
        return loss


prototype_loss_dict = {
    "prototype": PrototypeLoss,
    "euclidean": EuclideanPrototypeLoss,
    "learnable_euclidean": LearnableEuclideanPrototypeLoss,
    "ned": NEDPrototypeLoss,
    "reliable": ReliablePrototypeLoss,
    "reliable_euclidean": ReliableEuclideanPrototypeLoss,
    "stable_temperatured": StableTemperaturedPrototypeLoss,
    "reliable_v2": ReliablePrototypeLossv2,
    "only_cw": OnlyCWPrototypeLoss,
}
