"""Segmentation heads (reference models/modules/segmentation_head.py and
vq_segmentation_head.py), NHWC Flax re-designs.

  * ``SegmentationHead`` — conv(k) -> x{s} align-corners bilinear ->
    activation (segmentation_head.py:78-83).
  * ``AngularSegmentationHead``   (v1, :85-181): l1-normalised cosine
    classifier with multiplicative ArcFace margin.
  * ``AngularSegmentationHeadv2`` (:183-298): l2 norm, entropy-percentile
    filtering, class-embedding commitment loss, optional orthogonality reg.
  * ``AngularSegmentationHeadv3`` (:300-414): pseudo-label self-training
    variant taking (x, pred, split, th).
  * ``VQSegmentationHead`` (vq_segmentation_head.py:65-253): a VQ codebook as
    the classifier — per-class distance score map + STE/commitment.

Stateful reference behaviours re-expressed functionally: lazy kmeans init ->
explicit ``init_protos``/``init_codebook`` phase; in-place weight
renormalisation -> normalise-in-forward (see prototype.py module docstring).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vq_seg_tpu.models.layers import ConvPad, torch_conv_default, upsample_bilinear_ac
from vq_seg_tpu.models.modules.prototype import (
    _ProtoBase,
    arcface_phi,
    entropy_mask,
    eps_softmax_ce,
    orthogonal_loss_fn,
)
from vq_seg_tpu.ops.kmeans import l2norm
from vq_seg_tpu.ops.vq import code_usage_percent, commitment_loss, quantize_ste, vq_assign
from vq_seg_tpu.utils.seg_tools import score_mask


def l1norm(t, axis=-1, eps=1e-12):
    n = jnp.sum(jnp.abs(t), axis=axis, keepdims=True)
    return t / jnp.maximum(n, eps)


class _HeadProtoMixin(_ProtoBase):
    """ProtoBase whose embedding dim falls back to the head's conv width
    (reference v2/v3 heads embed in out_channels space,
    segmentation_head.py:204-205)."""

    out_channels: int = 3

    def _edim(self):
        return self.embedding_dim if self.embedding_dim else self.out_channels

    def _embedding(self):
        k, ed = self.num_classes, self._edim()
        if self.pt_init == "uniform":
            ini = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0 / k, 1.0 / k)
        elif self.pt_init in ("normal", "kmeans", "class_means"):
            ini = nn.initializers.normal(stddev=1.0)
        else:
            raise ValueError("init has to be in [uniform, normal, kmeans, class_means]")
        return self.param("embedding", ini, (k, ed))


class SegmentationHead(nn.Module):
    """conv -> UpsamplingBilinear2d(xS) -> activation
    (segmentation_head.py:78-83)."""

    out_channels: int
    kernel_size: int = 3
    upsampling: int = 1
    activation: Optional[Callable] = None  # e.g. softmax over channel

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvPad(self.out_channels, self.kernel_size, 1, self.kernel_size // 2,
                    use_bias=True, kernel_init=torch_conv_default)(x)
        if self.upsampling > 1:
            x = upsample_bilinear_ac(x, scale=self.upsampling)
        if self.activation is not None:
            x = self.activation(x)
        return x


class AngularSegmentationHead(_HeadProtoMixin):
    """v1 (segmentation_head.py:85-181): conv -> upsample -> l1-normalised
    cosine to class embeddings; multiplicative margin CE when training.
    Returns (softmax scores, loss)."""

    num_classes: int = 3
    embedding_dim: int = 0  # defaults to out_channels
    out_channels: int = 3
    scale: float = 1.0
    margin: float = 0.5
    kernel_size: int = 3
    upsampling: int = 2
    easy_margin: bool = True

    @nn.compact
    def __call__(self, x, gt=None, train: bool = True, init_protos: bool = False):
        x = ConvPad(self.out_channels, self.kernel_size, 1, self.kernel_size // 2,
                    use_bias=True, kernel_init=torch_conv_default)(x)
        if self.upsampling > 1:
            x = upsample_bilinear_ac(x, scale=self.upsampling)
        n, h, w_, c = x.shape
        flat_x = x.reshape(-1, c).astype(jnp.float32)
        emb = self._embedding()
        if init_protos:
            emb = self._maybe_init(emb, l1norm(flat_x))
        wn = l1norm(emb)
        fx = l1norm(flat_x)
        cosine = wn @ fx.T  # class-major (K, M) — see prototype.py layout note
        loss = jnp.float32(0.0)
        if train and gt is not None:
            flat_gt = gt.reshape(-1).astype(jnp.int32)
            phi = arcface_phi(cosine, self.margin, self.easy_margin)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0)
                      == flat_gt[None, :])
            logits = self.scale * jnp.where(onehot, cosine * phi, cosine)
            positive = jnp.sum(jnp.where(onehot, logits, 0.0), axis=0)
            sum_all = jnp.sum(jnp.exp(logits), axis=0)
            loss = -jnp.mean(jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7))
            cosine = logits
        pred = jax.nn.softmax(cosine, axis=0).T.reshape(n, h, w_, self.num_classes)
        return pred, loss


class AngularSegmentationHeadv2(_HeadProtoMixin):
    """v2 (segmentation_head.py:183-298): 1x1 conv, l2-normalised cosine,
    entropy-percentile filtering, commitment pull to class embeddings.
    Returns (softmax scores upsampled, loss)."""

    num_classes: int = 3
    out_channels: int = 3
    scale: float = 1.0
    margin: float = 0.5
    kernel_size: int = 1
    upsampling: int = 2
    easy_margin: bool = True
    orthogonal_reg_weight: float = 0.0
    # relative weight of the commitment pull folded into the returned loss
    # (the reference trainer weights angular and seghead-commit separately,
    # deprecated/train_vqash_v2.py: total_angular_loss_weight vs
    # total_seghead_commit_loss_weight — set this to their ratio)
    commit_weight: float = 1.0

    @nn.compact
    def __call__(self, x, gt=None, percent=100.0, entropy=None, train: bool = True,
                 init_protos: bool = False):
        x = ConvPad(self.out_channels, self.kernel_size, 1, self.kernel_size // 2,
                    use_bias=True, kernel_init=torch_conv_default)(x)
        n, h, w_, c = x.shape
        flat_x = x.reshape(-1, c).astype(jnp.float32)
        emb = self._embedding()
        if init_protos:
            emb = self._maybe_init(emb, flat_x)
        wn = l2norm(emb)
        fx = l2norm(flat_x)
        cosine = wn @ fx.T  # class-major (K, M)
        loss = jnp.float32(0.0)
        gt_map = None
        if train and gt is not None:
            if gt.shape[1:3] != (h, w_):
                gt = jax.image.resize(gt.astype(jnp.float32), (n, h, w_), method="nearest")
            gt_map = gt.astype(jnp.int32)
            flat_gt = gt_map.reshape(-1)
            phi = arcface_phi(cosine, self.margin, self.easy_margin)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0)
                      == flat_gt[None, :])
            logits = self.scale * jnp.where(onehot, cosine * phi, cosine)
            if entropy is not None:
                mask = entropy_mask(entropy, percent).astype(logits.dtype)[None, :]
                logits = logits * mask
            positive = jnp.sum(jnp.where(onehot, logits, 0.0), axis=0)
            sum_all = jnp.sum(jnp.exp(logits), axis=0)
            loss = -jnp.mean(jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7))
            cosine = logits
        pred = jax.nn.softmax(cosine, axis=0).T.reshape(n, h, w_, self.num_classes)
        if self.upsampling > 1:
            pred = upsample_bilinear_ac(pred, scale=self.upsampling)
        if train and gt_map is not None:
            class_feat = jax.lax.stop_gradient(jnp.take(wn, gt_map, axis=0))
            loss = loss + self.commit_weight * jnp.mean((class_feat - x) ** 2)
            if self.orthogonal_reg_weight > 0:
                loss = loss + orthogonal_loss_fn(emb) * self.orthogonal_reg_weight
        return pred, loss


class AngularSegmentationHeadv3(_HeadProtoMixin):
    """v3 (segmentation_head.py:300-414): in-head pseudo-label self-training.
    ``pred`` is a score map on the unlabeled branch ('unlabeled' split ->
    argmax pseudo-gt + confidence mask) or int labels on the labeled one."""

    num_classes: int = 3
    out_channels: int = 3
    scale: float = 1.0
    margin: float = 0.5
    kernel_size: int = 1
    upsampling: int = 1
    easy_margin: bool = True
    orthogonal_reg_weight: float = 0.0

    @nn.compact
    def __call__(self, x, pred=None, split: str = "labeled", th: float = 0.0,
                 train: bool = True, init_protos: bool = False):
        x = ConvPad(self.out_channels, self.kernel_size, 1, self.kernel_size // 2,
                    use_bias=True, kernel_init=torch_conv_default)(x)
        if self.upsampling > 1:
            x = upsample_bilinear_ac(x, scale=self.upsampling)
        n, h, w_, c = x.shape
        flat_x = x.reshape(-1, c).astype(jnp.float32)
        emb = self._embedding()
        if init_protos:
            emb = self._maybe_init(emb, l2norm(flat_x))
        wn = l2norm(emb)
        fx = l2norm(flat_x)
        cosine = wn @ fx.T  # class-major (K, M)
        result = jax.nn.softmax(cosine, axis=0).T.reshape(n, h, w_, self.num_classes)
        loss = jnp.float32(0.0)
        if train and pred is not None:
            gt = jnp.argmax(pred, axis=-1) if split == "unlabeled" else pred
            if gt.shape[1:3] != (h, w_):
                gt = jax.image.resize(gt.astype(jnp.float32), (n, h, w_), method="nearest")
            gt_map = gt.astype(jnp.int32)
            flat_gt = gt_map.reshape(-1)
            phi = arcface_phi(cosine, self.margin, self.easy_margin)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 0)
                      == flat_gt[None, :])
            logits = self.scale * jnp.where(onehot, cosine * phi, cosine)
            if split == "unlabeled":
                # NB the reference overwrites its score_mask with the resized
                # pseudo-gt (segmentation_head.py:385-387) — we use the
                # intended confidence mask (documented divergence).  ``th``
                # may be a traced scalar (the angular-v3 trainer ramps it per
                # epoch), so th<=0 disables the mask via where, not python if.
                mask = score_mask(pred, th)[..., 0]
                mask = jax.image.resize(mask.astype(jnp.float32), (n, h, w_), "nearest")
                mask = jnp.where(jnp.asarray(th) > 0, mask, jnp.ones_like(mask))
                logits = logits * mask.reshape(1, -1)
            positive = jnp.sum(jnp.where(onehot, logits, 0.0), axis=0)
            sum_all = jnp.sum(jnp.exp(logits), axis=0)
            loss = -jnp.mean(jnp.log(jnp.exp(positive) / (sum_all + 1e-7) + 1e-7))
            class_feat = jax.lax.stop_gradient(jnp.take(wn, gt_map, axis=0))
            loss = loss + jnp.mean((class_feat - x) ** 2)
            if self.orthogonal_reg_weight > 0:
                loss = loss + orthogonal_loss_fn(emb) * self.orthogonal_reg_weight
        return result, loss


class VQSegmentationHead(nn.Module):
    """A VQ codebook as classifier (vq_segmentation_head.py:65-253):
    num_embeddings == num_classes; returns (quantize, score, embed_index,
    commitment_loss, code_usage).  Euclidean score = 1 - d/sum(d);
    cosine score = similarity; both softmaxed."""

    dim: int
    num_embeddings: int
    embedding_dim: Optional[int] = None
    kmeans_init: bool = False
    kmeans_iters: int = 10
    distance: str = "euclidean"
    commitment_weight: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        from vq_seg_tpu.ops.kmeans import kmeans

        ed = self.embedding_dim or self.dim
        k = self.num_embeddings

        def _default():
            key = self.make_rng("params")
            return jax.random.uniform(key, (k, ed), jnp.float32, -1.0 / k, 1.0 / k)

        codebook = self.variable("codebook", "embedding", _default)
        x = x.astype(jnp.float32)
        n, h, w_, c = x.shape
        flat = x.reshape(-1, c)
        if init_codebook and self.kmeans_init:
            feats = l2norm(flat) if self.distance == "cosine" else flat
            means, _ = kmeans(self.make_rng("kmeans"), feats, k, self.kmeans_iters,
                              use_cosine_sim=(self.distance == "cosine"))
            codebook.value = means
        cb = codebook.value
        if self.distance == "cosine":
            feats, cb = l2norm(flat), l2norm(cb)
            sims = feats @ cb.T
            idx = jnp.argmax(sims, axis=-1).astype(jnp.int32)
            quant = jnp.take(cb, idx, axis=0)
            counts = jnp.bincount(idx, length=k)
            score = sims
        else:
            idx, quant, counts = vq_assign(flat, cb, metric="euclidean")
            # true L2 distances for the score map (cdist, not argmin shortcut)
            d = jnp.sqrt(jnp.maximum(
                jnp.sum(flat**2, -1, keepdims=True) - 2 * flat @ cb.T + jnp.sum(cb**2, -1)[None, :],
                0.0))
            score = 1.0 - d / jnp.sum(d, axis=-1, keepdims=True)
        usage = code_usage_percent(counts)
        loss = jnp.float32(0.0)
        quant_map = quant.reshape(n, h, w_, ed)
        if train:
            quant_map = quantize_ste(x, quant_map)
            if self.commitment_weight > 0:
                loss = commitment_loss(x, quant_map, self.commitment_weight)
        score = jax.nn.softmax(score.reshape(n, h, w_, k), axis=-1)
        return quant_map, score, idx.reshape(n, h, w_), loss, usage
